"""GPipe-style pipeline parallelism over a mesh axis.

A stack of K identical-signature stages (e.g. repeated UNet blocks at one
resolution level) is sharded one-stage-per-device-group along a "stage"
mesh axis; microbatches stream through with `lax.ppermute` handing
activations to the next stage each tick (the standard JAX pipelining
recipe — cf. the public scaling-book pipelining chapter). The bubble is
(K-1)/(M+K-1) for M microbatches.

The reference has no pipeline parallelism (single-GPU Accelerate,
src/training/trainer.py:242-293); this exists for the multi-chip TPU
deployment story alongside dp/tp/sp (SURVEY.md §2.10) and is exercised
by tests/test_parallel.py and the driver's multi-chip dryrun.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def gpipe(fn: Callable, stage_params, x_mb: jnp.ndarray,
          axis_name: str) -> jnp.ndarray:
    """Run inside shard_map: stream microbatches through pipeline stages.

    fn(params, x) -> y must preserve x's shape. stage_params: THIS
    device's stage parameters (leading stage axis already sharded away by
    shard_map). x_mb: (M, *mb_shape) microbatches, replicated across the
    stage axis. Returns (M, *mb_shape) outputs of the last stage
    (replicated back). Stage count K = lax.psum(1, axis_name).
    """
    k = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    m = x_mb.shape[0]
    ticks = m + k - 1
    perm = [(i, (i + 1) % k) for i in range(k)]

    def tick(carry, t):
        state, outbuf = carry     # state: this stage's current activation
        # stage 0 ingests microbatch t; other stages use what arrived
        feed = jnp.where(t < m, t, 0)
        inp = jnp.where(idx == 0, x_mb[feed], state)
        out = fn(stage_params, inp)
        # last stage emits microbatch t - (k-1) at tick t
        emit = t - (k - 1)
        outbuf = jnp.where(
            (idx == k - 1) & (emit >= 0),
            jax.lax.dynamic_update_index_in_dim(
                outbuf, out, jnp.maximum(emit, 0), 0),
            outbuf)
        # hand activations to the next stage (ring; stage 0's incoming
        # wrap-around value is ignored — it reads x_mb instead)
        state = jax.lax.ppermute(out, axis_name, perm)
        return (state, outbuf), None

    state0 = jnp.zeros_like(x_mb[0])
    outbuf0 = jnp.zeros_like(x_mb)
    (_, outbuf), _ = jax.lax.scan(tick, (state0, outbuf0),
                                  jnp.arange(ticks))
    # replicate the last stage's buffer to every stage so the shard_map
    # output spec can be replicated (other stages' buffers stayed zero)
    return _bcast_from_last(outbuf, axis_name, k, idx)


def _bcast_from_last(x, axis_name, k, idx):
    # psum of (x where last stage else 0) == broadcast from the last stage
    return jax.lax.psum(jnp.where(idx == k - 1, x, jnp.zeros_like(x)),
                        axis_name)


def pipeline_apply(fn: Callable, stacked_params, x: jnp.ndarray,
                   mesh: Mesh, axis: str = "model",
                   num_microbatches: int = 4) -> jnp.ndarray:
    """Apply K pipelined stages to a batch.

    fn(params_k, x) -> y (shape-preserving); stacked_params: pytree with a
    leading stage axis of size K = mesh.shape[axis]; x: (B, ...) with
    B % num_microbatches == 0. Equivalent to sequentially applying the K
    stages (tests assert exactness vs the sequential reference).
    """
    from jax import shard_map

    b = x.shape[0]
    assert b % num_microbatches == 0
    x_mb = x.reshape((num_microbatches, b // num_microbatches) + x.shape[1:])

    pspec = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    inner = partial(_gpipe_shmap, fn, axis)
    try:  # jax >= 0.9 renamed check_rep -> check_vma
        smap = shard_map(inner, mesh=mesh,
                         in_specs=(pspec, P()), out_specs=P(),
                         check_vma=False)
    except TypeError:
        smap = shard_map(inner, mesh=mesh,
                         in_specs=(pspec, P()), out_specs=P(),
                         check_rep=False)
    out = smap(stacked_params, x_mb)
    return out.reshape((b,) + x.shape[1:])


def _gpipe_shmap(fn, axis_name, stage_params, x_mb):
    # shard_map leaves a leading stage axis of size 1 on the params
    local = jax.tree_util.tree_map(lambda p: p[0], stage_params)
    return gpipe(fn, local, x_mb, axis_name)
