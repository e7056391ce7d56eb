"""Multi-profile EMA bank with power-function profiles, switch/feedback EMA,
bf16 archiving, and post-hoc EMA reconstruction.

Capability parity with the reference's EMA_Manager
(reference: src/training/ema.py): classic-beta or EDM2 power-function-std
profiles (:112-114), fp64 option, warmup, SwitchEMA (:323-333), feedback EMA
(:309-315), bf16 archive snapshots (:316-321), and NVIDIA Algorithm-3
post-hoc reconstruction from archived profiles (:120-130,147-191).

TPU-native design: the EMA bank is a pytree-of-pytrees living inside the
jitted train step — one fused tree-map lerp updates every profile on-device
(replacing torch._foreach_lerp_); power-function betas are computed from the
traced sample counter so the whole update stays in-graph. CPU offload is
unnecessary on TPU (HBM-resident fp32 bank; use fewer profiles + the archive
for post-hoc synthesis if memory-bound).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# NVIDIA EDM2 power-function EMA math. The std<->exponent conversion, the
# per-step beta, the profile cross-correlation, and the post-hoc mixing
# solver below transcribe Algorithms 2/3 and eqs. 121-151 of Karras et al.,
# "Analyzing and Improving the Training Dynamics of Diffusion Models"
# (arXiv:2312.02696), as published in NVIDIA's EDM2 reference code
# (NVlabs/edm2, training/phema.py) — the math has one canonical form.
# ---------------------------------------------------------------------------

def exp_to_std(exp) -> np.ndarray:
    exp = np.asarray(exp, np.float64)
    return np.sqrt((exp + 1) / (exp + 2) ** 2 / (exp + 3))


def std_to_exp(std) -> np.ndarray:
    """Relative std -> power-function exponent (eq. 126 / alg. 2)."""
    std = np.asarray(std, np.float64)
    tmp = std.flatten() ** -2
    exp = [np.roots([1, 7, 16 - t, 12 - t]).real.max() for t in tmp]
    return np.float64(exp).reshape(std.shape)


def power_function_beta(std: float, t_next, t_delta):
    """Per-step beta tracking a power-function profile (eq. 127). Works on
    traced jnp counters."""
    exp = float(std_to_exp(np.array(std)))
    return (1.0 - t_delta / t_next) ** (exp + 1.0)


def power_function_correlation(a_ofs, a_std, b_ofs, b_std) -> np.ndarray:
    a_exp = std_to_exp(a_std)
    b_exp = std_to_exp(b_std)
    t_ratio = a_ofs / b_ofs
    t_exp = np.where(a_ofs < b_ofs, b_exp, -a_exp)
    t_max = np.maximum(a_ofs, b_ofs)
    num = (a_exp + 1) * (b_exp + 1) * t_ratio ** t_exp
    den = (a_exp + b_exp + 1) * t_max
    return num / den


def solve_posthoc_coefficients(in_ofs, in_std, out_ofs, out_std) -> np.ndarray:
    """Least-squares mixing coefficients (alg. 3)."""
    in_ofs, in_std = np.broadcast_arrays(in_ofs, in_std)
    out_ofs, out_std = np.broadcast_arrays(out_ofs, out_std)
    rv = lambda x: np.asarray(x, np.float64).reshape(-1, 1)
    cv = lambda x: np.asarray(x, np.float64).reshape(1, -1)
    a = power_function_correlation(rv(in_ofs), rv(in_std), cv(in_ofs), cv(in_std))
    b = power_function_correlation(rv(in_ofs), rv(in_std), cv(out_ofs), cv(out_std))
    x = np.linalg.solve(a, b)
    return x / np.sum(x, axis=0)


# ---------------------------------------------------------------------------
# EMA bank
# ---------------------------------------------------------------------------

@dataclass
class EMAConfig:
    """One EMA profile (reference: ema.py:193-227).

    Memory options for large models (the reference's cpu_offload analog,
    ema.py:196,257-270):
      * ``store_dtype="bfloat16"`` — halve the profile's HBM footprint.
        The lerp still computes in fp32 and quantizes on store; fine for
        short-horizon EMAs, lossy for very long ones (increments below
        bf16 resolution stall).
      * ``cpu_offload=True`` — the profile lives in HOST memory as numpy
        and is updated by the Trainer after each step (one device->host
        params fetch per step, like the reference's non_blocking
        .to("cpu")). Zero HBM cost; incompatible with feedback/switch EMA
        (those write back into the in-graph train weights).
    """
    name: str
    beta: Optional[float] = None            # classic EMA
    std: Optional[float] = None             # power-function EMA
    num_warmup_steps: Optional[int] = None
    num_archive_steps: Optional[int] = None
    feedback_beta: Optional[float] = None   # lerp EMA back into train weights
    num_switch_ema_epochs: Optional[int] = None
    use_float64: bool = False
    store_dtype: str = "float32"            # float32 | bfloat16
    cpu_offload: bool = False
    include_in_validation: bool = True

    def __post_init__(self):
        if (self.beta is None) == (self.std is None):
            raise ValueError(f"ema '{self.name}': specify exactly one of beta/std")
        if self.beta is not None and not (0 <= self.beta < 1):
            raise ValueError(f"ema '{self.name}': invalid beta {self.beta}")
        if self.std is not None and self.std < 0:
            raise ValueError(f"ema '{self.name}': invalid std {self.std}")
        if self.feedback_beta is not None and not (0 <= self.feedback_beta < 1):
            raise ValueError(f"ema '{self.name}': invalid feedback_beta")
        if self.std is not None and (self.num_warmup_steps or 0) > 0:
            raise ValueError(f"ema '{self.name}': power-function ema cannot warm up")
        if self.store_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"ema '{self.name}': store_dtype must be "
                             f"float32|bfloat16, got {self.store_dtype}")
        if self.cpu_offload and (self.feedback_beta is not None
                                 or self.num_switch_ema_epochs):
            raise ValueError(f"ema '{self.name}': cpu_offload is incompatible "
                             f"with feedback/switch EMA (host profile cannot "
                             f"write back into the jitted step)")
        if self.cpu_offload and self.use_float64:
            raise ValueError(f"ema '{self.name}': host profiles are fp32")


class EMABank:
    """Functional multi-EMA: state is {name: params-pytree}; all updates are
    pure functions usable inside the jitted train step."""

    def __init__(self, configs: List[EMAConfig]) -> None:
        names = [c.name for c in configs]
        if len(set(names)) != len(names):
            raise ValueError("duplicate ema names")
        self.configs: Dict[str, EMAConfig] = {c.name: c for c in configs}
        switch = [c.name for c in configs if c.num_switch_ema_epochs]
        if len(switch) > 1:
            raise ValueError("only one EMA can be the switch EMA")
        self.switch_ema_name = switch[0] if switch else None
        self.offloaded = [c.name for c in configs if c.cpu_offload]

    def _storage_dtype(self, cfg: EMAConfig):
        if cfg.use_float64:
            return jnp.float64
        return jnp.bfloat16 if cfg.store_dtype == "bfloat16" else jnp.float32

    def _beta(self, cfg: EMAConfig, total_samples_processed, batch_size,
              global_step):
        if cfg.beta is not None:
            beta = jnp.float32(cfg.beta)
        else:
            t_next = total_samples_processed + batch_size
            beta = power_function_beta(cfg.std, t_next, batch_size)
        if cfg.num_warmup_steps:
            beta = beta * jnp.minimum(global_step / cfg.num_warmup_steps, 1.0)
        return beta

    def init(self, params) -> Dict[str, Any]:
        """In-graph (device) profiles only; cpu_offload profiles live
        host-side (host_init)."""
        out = {}
        for name, cfg in self.configs.items():
            if cfg.cpu_offload:
                continue
            dtype = self._storage_dtype(cfg)
            # jnp.array(copy=True): a same-dtype astype would ALIAS the
            # params buffer, and aliased leaves break buffer donation of
            # the train state ("attempt to donate the same buffer twice")
            out[name] = jax.tree_util.tree_map(
                lambda p: jnp.array(p, dtype=dtype, copy=True), params)
        return out

    def update(self, ema_state: Dict[str, Any], params,
               total_samples_processed, batch_size: int,
               global_step) -> tuple:
        """One EMA step for every device profile (+ feedback). Pure; call
        in-graph. Host-offloaded profiles are skipped (Trainer.host_update).

        Returns (new_ema_state, possibly-feedback-modified params).
        """
        new_state = {}
        new_params = params
        for name, cfg in self.configs.items():
            if cfg.cpu_offload:
                continue
            beta = self._beta(cfg, total_samples_processed, batch_size,
                              global_step)
            # lerp in the accumulation dtype (fp32/fp64), quantize on store
            # (bf16 storage halves HBM; see EMAConfig docstring)
            acc = jnp.float64 if cfg.use_float64 else jnp.float32
            store = self._storage_dtype(cfg)
            b = beta.astype(acc)
            ema = jax.tree_util.tree_map(
                lambda e, p: (e.astype(acc) * b
                              + p.astype(acc) * (1.0 - b)).astype(store),
                ema_state[name], params)
            new_state[name] = ema
            if cfg.feedback_beta is not None:
                fb = cfg.feedback_beta
                new_params = jax.tree_util.tree_map(
                    lambda p, e: p * fb + e.astype(p.dtype) * (1.0 - fb),
                    new_params, ema)
        return new_state, new_params

    # ---- host-offloaded profiles (reference cpu_offload, ema.py:257-270) --
    def host_init(self, params_np) -> Dict[str, Any]:
        """Initialize the host-resident profiles from a numpy params tree."""
        out = {}
        for name in self.offloaded:
            out[name] = jax.tree_util.tree_map(
                lambda p: np.asarray(p, np.float32).copy(), params_np)
        return out

    def host_update(self, host_state: Dict[str, Any], params_np,
                    total_samples_processed: int, batch_size: int,
                    global_step: int) -> Dict[str, Any]:
        """One EMA step for the host profiles (numpy, in-place on the
        state's buffers to avoid re-allocation)."""
        for name in self.offloaded:
            cfg = self.configs[name]
            b = float(self._beta(cfg, total_samples_processed, batch_size,
                                 global_step))

            def lerp(e, p):
                e *= b
                e += np.asarray(p, np.float32) * (1.0 - b)
                return e

            host_state[name] = jax.tree_util.tree_map(
                lerp, host_state[name], params_np)
        return host_state

    def get_betas(self, total_samples_processed: int, batch_size: int) -> Dict[str, float]:
        out = {}
        for name, cfg in self.configs.items():
            out[name] = cfg.beta if cfg.beta is not None else float(
                power_function_beta(cfg.std, total_samples_processed + batch_size,
                                    batch_size))
        return out

    def maybe_switch(self, ema_state: Dict[str, Any], params, epoch: int,
                     global_step: int, normalize_fn: Optional[Callable] = None):
        """SwitchEMA (reference :323-333): every N epochs, load the switch
        profile's weights into the train weights. Host-side (epoch boundary).
        Returns (params, switched_name_or_None)."""
        name = self.switch_ema_name
        if name is None:
            return params, None
        cfg = self.configs[name]
        if cfg.num_warmup_steps and global_step < cfg.num_warmup_steps:
            return params, None
        if epoch % cfg.num_switch_ema_epochs != 0:
            return params, None
        new_params = jax.tree_util.tree_map(
            lambda p, e: e.astype(p.dtype), params, ema_state[name])
        if normalize_fn is not None:
            new_params = normalize_fn(new_params)
        return new_params, name

    def validation_emas(self) -> List[str]:
        return [n for n, c in self.configs.items() if c.include_in_validation]


class AsyncHostEMA:
    """Pipelined driver for the bank's cpu_offload profiles.

    The reference updates CPU-offloaded EMA profiles with non-blocking
    device->host copies (reference: src/training/ema.py:257-270). The JAX
    analog: ``update(params, ...)`` starts the D2H transfer with
    ``copy_to_host_async`` and hands the lerp to a single worker thread, so
    the ~#params fetch overlaps the dispatch/execution of the NEXT train
    step instead of blocking it. A depth-1 queue bounds staleness to one
    step; updates apply strictly in submission order (single worker).

    ``profiles`` must only be read after ``sync()``. Worker exceptions are
    re-raised on the next ``update()``/``sync()`` call.
    """

    def __init__(self, bank: EMABank, batch_size: int):
        import queue
        import threading
        self.bank = bank
        self.batch_size = batch_size
        self.profiles: Optional[Dict[str, Any]] = None
        self._queue: Any = queue.Queue(maxsize=1)
        self._error: Optional[BaseException] = None
        self._pinned_host: Optional[bool] = None  # tri-state: untried/ok/no
        # pack the whole params tree into ONE fp32 device buffer before
        # the D2H fetch: a tree-wise device_get issues one transfer per
        # leaf, and per-transfer latency (not bandwidth) dominates on
        # remote/tunneled runtimes (measured 55 s/step for ~700 leaves /
        # 1.4 GB at ref scale vs seconds for the packed buffer)
        self._pack_fn = jax.jit(
            lambda leaves: jnp.concatenate(
                [jnp.ravel(x).astype(jnp.float32) for x in leaves]))
        self._layout = None  # (treedef, shapes, sizes) of the packed tree
        self._thread = threading.Thread(target=self._worker, daemon=True,
                                        name="async-host-ema")
        self._thread.start()

    def seed(self, params_np) -> None:
        """Seed all host profiles from a numpy params tree (call before the
        first update for pre-training-params seeding, like the in-graph
        EMABank.update which initializes from the init params)."""
        self.profiles = self.bank.host_init(params_np)

    def restore(self, profiles: Dict[str, Any]) -> None:
        """Install checkpoint-restored profiles (missing ones are re-seeded
        from the params of the first post-restore update)."""
        self.sync()
        self.profiles = profiles or None

    def update(self, params, total_samples_processed, global_step) -> None:
        """Submit one EMA step. ``params`` is the (device) params pytree of
        the JUST-COMPLETED train step; the counter args may be traced-result
        device scalars — they are only converted on the worker thread so
        this call never blocks on the step itself."""
        self._raise_pending()
        self._queue.put((self._stage_to_host(params), self._layout,
                         total_samples_processed, global_step))

    def _stage_to_host(self, params):
        """Start the D2H transfer without blocking: pack the tree into
        one fp32 buffer on device (one fused concat, ~2 HBM passes), then
        an async device_put of that single array into pinned HOST memory,
        so (a) the fetch is ONE transfer instead of one per leaf and (b)
        the queue holds a host buffer and does NOT retain an extra
        device-side params generation while the next step runs (a
        blocking-queue pipeline holding device refs measurably OOMs 16 GB
        ref-scale configs). Fallback when pinned_host is unsupported:
        copy_to_host_async on the packed buffer + its device ref."""
        leaves, treedef = jax.tree_util.tree_flatten(params)
        if self._layout is None or self._layout[0] != treedef:
            self._layout = (treedef, [l.shape for l in leaves],
                            [int(np.prod(l.shape)) for l in leaves])
        packed = self._pack_fn(leaves)
        if self._pinned_host is not False:
            try:
                s = jax.sharding.SingleDeviceSharding(
                    jax.devices()[0], memory_kind="pinned_host")
                out = jax.device_put(packed, s)
                self._pinned_host = True
                return out
            except Exception:
                if self._pinned_host:  # worked before; surface the change
                    raise
                self._pinned_host = False
        copy_async = getattr(packed, "copy_to_host_async", None)
        if copy_async is not None:
            copy_async()
        return packed

    def _unpack(self, packed_np, layout):
        """Packed fp32 host buffer -> params tree of zero-copy views."""
        treedef, shapes, sizes = layout
        views, ofs = [], 0
        for shape, size in zip(shapes, sizes):
            views.append(packed_np[ofs:ofs + size].reshape(shape))
            ofs += size
        return jax.tree_util.tree_unflatten(treedef, views)

    def sync(self) -> None:
        """Block until every submitted update has been applied."""
        self._queue.join()
        self._raise_pending()

    def close(self) -> None:
        self._queue.put(None)
        self._thread.join()

    def _raise_pending(self) -> None:
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def _worker(self) -> None:
        while True:
            item = self._queue.get()
            try:
                if item is None:
                    return
                packed, layout, tsp, step = item
                params_np = self._unpack(
                    np.asarray(jax.device_get(packed), np.float32), layout)
                if self.profiles is None:
                    # direct-driving seed (one lerp late; Trainer.train()
                    # seeds from the pre-training params via seed())
                    self.profiles = self.bank.host_init(params_np)
                    continue
                for name in self.bank.offloaded:
                    if name not in self.profiles:  # partial restore
                        self.profiles[name] = jax.tree_util.tree_map(
                            lambda p: np.asarray(p, np.float32).copy(),
                            params_np)
                self.profiles = self.bank.host_update(
                    self.profiles, params_np,
                    int(tsp) - self.batch_size, self.batch_size,
                    int(step) - 1)
            except BaseException as e:  # re-raised on next update()/sync()
                self._error = e
            finally:
                self._queue.task_done()


# ---------------------------------------------------------------------------
# archives + post-hoc reconstruction (host-side, numpy)
# ---------------------------------------------------------------------------

def save_ema_archive(ema_params, path: str, global_step: int,
                     total_samples_processed: int, std: float) -> None:
    """bf16 archive snapshot for post-hoc reconstruction (reference :316-321,
    :368-377)."""
    from flax.traverse_util import flatten_dict
    from ..utils import save_safetensors
    import ml_dtypes
    flat = flatten_dict(jax.tree_util.tree_map(np.asarray, ema_params), sep="/")
    flat = {k: v.astype(ml_dtypes.bfloat16) for k, v in flat.items()}
    save_safetensors(flat, path, metadata={
        "std": str(std), "global_step": str(global_step),
        "total_samples_processed": str(total_samples_processed)})


def reconstruct_phema(out_std: float, phema_path: str):
    """Post-hoc EMA: least-squares combination of archived snapshots
    (reference: ema.py:147-191). Returns a flat {path: np.float32 array}."""
    from ..utils import load_safetensors, load_safetensors_metadata
    emas = []
    for f in sorted(os.listdir(phema_path)):
        if not f.lower().endswith(".safetensors"):
            continue
        p = os.path.join(phema_path, f)
        meta = load_safetensors_metadata(p)
        emas.append({"path": p, "std": float(meta["std"]),
                     "n_processed": int(meta["total_samples_processed"])})
    if not emas:
        raise FileNotFoundError(f"no ema archives in {phema_path}")
    emas.sort(key=lambda e: (e["n_processed"], e["std"]))
    out_n = max(e["n_processed"] for e in emas)
    coefs = solve_posthoc_coefficients(
        np.array([e["n_processed"] for e in emas]),
        np.array([e["std"] for e in emas]),
        np.array([out_n]), np.array([out_std]))
    state: Optional[Dict[str, np.ndarray]] = None
    for i, e in enumerate(emas):
        sd = load_safetensors(e["path"])
        if state is None:
            state = {k: np.zeros(v.shape, np.float64) for k, v in sd.items()}
        for k in state:
            state[k] += np.asarray(sd[k], np.float64) * coefs[i, 0]
    return {k: v.astype(np.float32) for k, v in state.items()}
