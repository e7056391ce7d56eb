"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's HuggingFace-Accelerate DDP layer
(reference: src/training/trainer.py:242-293 and SURVEY.md §2.10/§5.8):

  * a 1-D (or 2-D data x model) ``jax.sharding.Mesh`` over ICI; DCN becomes
    the outer axis for multi-slice.
  * replicated params + batch-sharded activations via NamedSharding; grads
    are psum'd automatically under jit.
  * ``accelerator.gather`` for the stratified sigma sync is replaced by
    shared-key whole-batch sampling (training/sigma_sampler.py) — zero
    communication.

The sequence/context-parallel helpers (time-axis sharding with halo
exchange, SURVEY.md §5.7) live in parallel/sharded_ops.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass
class MeshConfig:
    data_axis: int = -1      # -1 = all devices on the data axis
    model_axis: int = 1      # tensor-parallel width (1 = pure DP)
    axis_names: Tuple[str, str] = ("data", "model")
    # multi-slice: number of DCN-connected slices/hosts. >1 lays out the
    # data axis so its outer blocks ride DCN (one all-reduce per step)
    # while model-parallel collectives stay on ICI inside a slice.
    num_dcn_slices: int = 1


def make_mesh(config: Optional[MeshConfig] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(config.model_axis, 1)
    data = n // model if config.data_axis == -1 else config.data_axis
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    slices = max(config.num_dcn_slices, 1)
    if slices > 1:
        # hybrid ICI x DCN layout: data-parallel outer blocks span DCN,
        # model parallelism stays within a slice (SURVEY.md §5.8)
        if data % slices != 0:
            raise ValueError(f"data axis {data} not divisible by "
                             f"{slices} DCN slices")
        try:
            from jax.experimental import mesh_utils
            dev_array = mesh_utils.create_hybrid_device_mesh(
                (data // slices, model), (slices, 1), devices=devices)
        except ValueError:
            # no DCN slice metadata (CPU multi-process simulation): group
            # devices by process so the outer data blocks are host-local
            ordered = sorted(devices,
                             key=lambda d: (d.process_index, d.id))
            dev_array = np.asarray(ordered).reshape(data, model)
    else:
        dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, config.axis_names)


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard axis ``batch_axis`` over the 'data' mesh axis, replicate rest."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded over
    'data'.

    Single-process: a plain sharded device_put. Multi-process: each host
    passes only ITS shard of the global batch (the per-rank DataLoader
    split) and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — no cross-host data
    movement (reference Accelerate analog: per-rank dataloaders prepared in
    trainer.py:242-248)."""
    multihost = jax.process_count() > 1

    def place(x):
        sharding = batch_sharding(mesh, x.ndim)
        if multihost:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, batch)


def replicate_state(mesh: Mesh, state):
    """Place a pytree fully replicated over the mesh. Multi-process: every
    host passes its (identical — same seed) copy and the global replicated
    array is assembled without cross-host transfers."""
    rep = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                rep, np.asarray(x)) if hasattr(x, "ndim") else x,
            state)
    return jax.device_put(state, rep)


def param_sharding_rule(mesh: Mesh, leaf: jax.Array,
                        axis_name: str = "model") -> NamedSharding:
    """Tensor-parallel / FSDP placement rule for one array.

    MPConv kernels are (out_channels, in_channels, *k) — shard the
    out-channel dim over the 'model' axis when divisible; everything else
    (biases, gains, scalars, fourier tables) is replicated. GSPMD then
    propagates: convs compute their output-channel slice locally and the
    next layer's in-channel contraction inserts the reduce-scatter /
    all-reduce (reference's DDP has no analog — the reference is
    single-node data-parallel only, trainer.py Accelerate init).
    """
    size = mesh.shape[axis_name]
    if leaf.ndim >= 2 and leaf.shape[0] % size == 0 and leaf.shape[0] >= size:
        return NamedSharding(mesh, P(axis_name))
    return NamedSharding(mesh, P())


def shard_train_state(mesh: Mesh, state, axis_name: str = "model"):
    """Place a TrainState (or any pytree mirroring the param shapes —
    optimizer moments, EMA profiles) with tensor-parallel weight sharding.

    Every array leaf goes through ``param_sharding_rule``; since Adam's
    mu/nu and each EMA profile mirror the parameter shapes, one uniform
    rule shards the whole state consistently (the FSDP property: weights,
    grads, moments and EMAs all live sharded; XLA inserts the collectives).
    """
    multihost = jax.process_count() > 1

    def place(x):
        if not hasattr(x, "ndim"):
            return x
        sharding = param_sharding_rule(mesh, x, axis_name)
        if multihost:
            # every host holds the full (identically-seeded) array; build
            # the global sharded array from host-local slices
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, sharding, lambda idx: arr[idx])
        return jax.device_put(x, sharding)
    return jax.tree_util.tree_map(place, state)
