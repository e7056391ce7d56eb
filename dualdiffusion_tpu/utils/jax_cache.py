"""Persistent XLA compilation cache setup.

The ref-scale end-to-end graph takes minutes to compile cold (BENCH_r02
measured 975 s first-call for the flagship+ref-scale legs together); the
persistent cache makes every later process start pay only deserialization.

Call :func:`enable_compilation_cache` before the first ``jit`` execution in
every entry point (bench, train, sample, model server, graft entry). The
cache directory defaults to ``<repo>/.jax_cache`` and can be overridden
with ``DD_JAX_CACHE_DIR`` (set it to ``0``/``off`` to disable).

Reference context: the reference relies on torch.compile's in-memory cache
only (src/training/trainer.py:736-742) and re-pays dynamo compile per
process; a persistent on-disk cache is the JAX-native improvement.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

_DISABLE = ("0", "off", "none", "disable", "disabled")


def default_cache_dir() -> Path:
    # <repo>/.jax_cache — package lives at <repo>/dualdiffusion_tpu/utils
    return Path(__file__).resolve().parent.parent.parent / ".jax_cache"


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a durable directory.

    Returns the cache dir in use, or None if disabled. Safe to call more
    than once and before/after jax import (flags are plain config updates).
    """
    env = os.environ.get("DD_JAX_CACHE_DIR")
    if env is not None and env.strip().lower() in _DISABLE:
        return None

    import jax

    # CPU: compiles are fast and the serialized executables are AOT blobs
    # that spam machine-feature warnings on every load — only cache when a
    # dir was explicitly requested. TPU is where the minutes-long e2e
    # compiles live.
    if jax.default_backend() != "tpu" and not (env or cache_dir):
        return None
    path = Path(cache_dir or env or default_cache_dir())
    try:
        path.mkdir(parents=True, exist_ok=True)
    except OSError as e:  # read-only fs etc — run uncached
        logger.warning("compilation cache disabled (%s): %s", path, e)
        return None

    jax.config.update("jax_compilation_cache_dir", str(path))
    # cache everything that took non-trivial compile time; the default
    # (1 s) skips the many small graphs whose re-compiles add up
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    try:
        # also persist XLA's internal autotune/kernel caches on TPU; on CPU
        # "all" stores machine-feature-specific AOT blobs that warn/SIGILL
        # when the host changes, so leave the default there
        if jax.default_backend() == "tpu":
            jax.config.update("jax_persistent_cache_enable_xla_caches",
                              "all")
    except Exception:  # older jax: flag absent
        pass
    logger.info("persistent compilation cache at %s", path)
    return str(path)
