"""AOT stage serialization (jax.export StableHLO blobs).

Warm-start profile of the serving flow (BENCH round 4): with a hot
persistent compile cache the flagship compile-only window is still ~42 s —
imports + model init + Python TRACING of the 100-step sampler dominate,
not XLA compilation. ``jax.export`` serializes the traced+lowered module;
deserializing skips tracing entirely and the deserialized module's XLA
compile hits the persistent cache, so a restart pays only
imports + deserialize + (cached) compile + priming.

Blobs live next to the persistent compile cache
(``<repo>/.jax_cache/aot`` or ``$DD_JAX_CACHE_DIR/aot``) and are keyed by
a content hash that includes the jax version — a version bump or key
mismatch silently falls back to tracing.

The reference has no analog (torch.compile re-traces every process,
src/training/trainer.py:736-742); this is the TPU-native serving-restart
story (VERDICT r3 #9).
"""

from __future__ import annotations

import hashlib
import logging
from pathlib import Path
from typing import Any, Callable, Optional

logger = logging.getLogger(__name__)


def aot_dir() -> Optional[Path]:
    from .jax_cache import default_cache_dir
    import os
    env = os.environ.get("DD_JAX_CACHE_DIR")
    if env is not None and env.strip().lower() in ("0", "off", "none",
                                                   "disable", "disabled"):
        return None
    base = Path(env) if env else default_cache_dir()
    return base / "aot"


def stage_key(*parts: Any) -> str:
    """Content hash for a stage blob: jax version + caller-supplied parts
    (config reprs, shapes, dtypes, workload args)."""
    import jax
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    for p in parts:
        h.update(repr(p).encode())
    return h.hexdigest()[:20]


def _path(name: str, key: str) -> Optional[Path]:
    d = aot_dir()
    return None if d is None else d / f"{name}-{key}.jexp"


def load_stage(name: str, key: str) -> Optional[Callable]:
    """Deserialize a stage blob -> callable, or None (absent/stale)."""
    path = _path(name, key)
    if path is None or not path.is_file():
        return None
    try:
        import jax
        from jax import export
        exp = export.deserialize(path.read_bytes())
        logger.info("AOT stage '%s' loaded from %s", name, path)
        # exp.call alone re-dispatches uncached per invocation; the jit
        # wrapper restores the in-process dispatch cache
        return jax.jit(exp.call)
    except Exception as e:  # version skew, corrupt blob
        logger.warning("AOT stage '%s' unusable (%s); re-tracing", name, e)
        try:
            path.unlink()
        except OSError:
            pass
        return None


def save_stage(name: str, key: str, jitted_fn, *example_args) -> Callable:
    """Trace+lower ``jitted_fn`` at the example args (ShapeDtypeStructs
    fine), write the serialized module, and return its ``.call``."""
    from jax import export
    exp = export.export(jitted_fn)(*example_args)
    path = _path(name, key)
    if path is not None:
        try:
            path.parent.mkdir(parents=True, exist_ok=True)
            tmp = path.with_suffix(".tmp")
            tmp.write_bytes(exp.serialize())
            tmp.replace(path)
            logger.info("AOT stage '%s' saved to %s", name, path)
        except Exception as e:  # non-fatal: serving still works untraced
            logger.warning("AOT save of '%s' failed: %s", name, e)
    return exp.call


def get_or_build(name: str, key: str, build_jit_fn: Callable[[], Any],
                 *example_args) -> Callable:
    """Load the blob if present, else trace/export/save."""
    call = load_stage(name, key)
    if call is not None:
        return call
    return save_stage(name, key, build_jit_fn(), *example_args)


# ---------------------------------------------------------------------------
# Compiled-executable blobs (jax.experimental.serialize_executable)
#
# The jax.export path above serializes the TRACED module and still pays an
# XLA compile on load (which missed the persistent cache on this runtime —
# BASELINE r4). These blobs instead pickle the COMPILED PjRt executable:
# loading skips Python tracing AND XLA compilation entirely, so a serving
# restart pays imports + unpickle + priming. Probed working on the
# tunneled v5e runtime (round 5). Executable blobs are device- and
# version-specific — exec_key() folds in the device kind/count and jax
# version, and any deserialization failure falls back to the trace path.
# ---------------------------------------------------------------------------

_SRC_HASH_CACHE: Optional[str] = None


def _source_hash() -> str:
    """Fingerprint of the package's Python source (+ repo-root bench.py).

    A pickled executable is a SNAPSHOT of the compiled computation: unlike
    the persistent XLA compile cache (keyed on the lowered HLO), nothing
    ties it to the Python that produced it, so a code change after export
    would silently serve stale graphs. Folding the source hash into
    exec_key turns staleness into a clean cache miss (~10 ms to compute,
    cached per process)."""
    global _SRC_HASH_CACHE
    if _SRC_HASH_CACHE is None:
        h = hashlib.sha256()
        pkg_root = Path(__file__).resolve().parents[1]
        for f in sorted(pkg_root.rglob("*.py")):
            h.update(f.read_bytes())
        bench = pkg_root.parent / "bench.py"
        if bench.is_file():
            h.update(bench.read_bytes())
        _SRC_HASH_CACHE = h.hexdigest()[:16]
    return _SRC_HASH_CACHE


def exec_key(*parts: Any) -> str:
    """stage_key plus the executable-compatibility terms: device kind,
    device count (jax version is already in stage_key), and the package
    source hash (a stale blob must miss, not load)."""
    import jax
    d = jax.devices()
    return stage_key(*parts, d[0].device_kind, len(d), _source_hash())


def _exec_path(name: str, key: str) -> Optional[Path]:
    d = aot_dir()
    return None if d is None else d / f"{name}-{key}.jxec"


def load_exec(name: str, key: str) -> Optional[Callable]:
    """Deserialize a compiled-executable blob -> callable, or None."""
    path = _exec_path(name, key)
    if path is None or not path.is_file():
        return None
    try:
        import pickle

        import jax
        from jax.experimental import serialize_executable as sx
        blob, in_tree, out_tree, n_dev = pickle.loads(path.read_bytes())
        # pin execution to the executable's device count — the default is
        # ALL local devices, which breaks under a virtual multi-device
        # backend when the stage was compiled single-device
        call = sx.deserialize_and_load(
            blob, in_tree, out_tree,
            execution_devices=jax.devices()[:n_dev])
        logger.info("exec blob '%s' loaded from %s", name, path)
        return call
    except Exception as e:  # device/version skew, corrupt blob
        logger.warning("exec blob '%s' unusable (%s); re-tracing", name, e)
        try:
            path.unlink()
        except OSError:
            pass
        return None


def save_exec(name: str, key: str, compiled) -> None:
    """Serialize an already-compiled stage (jit(...).lower().compile())."""
    path = _exec_path(name, key)
    if path is None:
        return
    try:
        import pickle
        from jax.experimental import serialize_executable as sx
        blob, in_tree, out_tree = sx.serialize(compiled)
        n_dev = len(compiled.input_shardings[0][0].device_set) \
            if compiled.input_shardings[0] else 1
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(pickle.dumps((blob, in_tree, out_tree, n_dev)))
        tmp.replace(path)
        logger.info("exec blob '%s' saved to %s (%d bytes)", name, path,
                    len(blob))
    except Exception as e:  # non-fatal: restart falls back to tracing
        logger.warning("exec save of '%s' failed: %s", name, e)
