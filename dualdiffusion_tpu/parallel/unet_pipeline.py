"""GPipe pipeline parallelism over the REAL UNet op schedule.

`pipeline.py` pipelines K identical shape-preserving stages; a real EDM2
UNet is an hourglass — its levels change channels AND resolution, and
encoder ops push skip activations that decoder ops consume much later.
This module pipelines `UNetCore` itself by exploiting the linear op
schedule the model exposes (`UNetCore._build_schedule` / `run_ops`):

  * the schedule is split into K contiguous, FLOP-balanced op ranges
    (one range per device along the pipeline mesh axis);
  * the inter-stage payload is the full boundary state — the activation
    `x` plus every skip tensor alive at that boundary — flattened into
    ONE fixed-size bf16 buffer, so `lax.ppermute` can hand it down the
    ring even though every boundary has different shapes;
  * each device executes ONLY its own range: inside `shard_map` a
    `lax.switch` on `axis_index` picks the branch specialized to that
    stage's boundary specs, and the branch un/packs the payload and runs
    `run_ops(lo_k, hi_k)` with just that stage's parameters;
  * parameters are per-stage ravelled into rows of a (K, P_max) fp32
    buffer sharded along the stage axis — each device materializes only
    its own stage's weights, so pipeline parallelism scales memory the
    way it is supposed to (not just compute).

Microbatches stream through with the standard GPipe schedule (bubble
(K-1)/(M+K-1)); per-microbatch conditioning `emb` rides along as a
replicated (M, mb, cemb) operand indexed by each stage's current
microbatch id, and EDM2 preconditioning / the final c_skip/c_out combine
stay outside the pipeline (they are elementwise and cheap).

The reference has no pipeline parallelism at all (single-GPU Accelerate,
src/training/trainer.py:242-293); this exists for the multi-chip TPU
deployment story (SURVEY.md §2.10) and is validated for exactness vs the
sequential forward in tests/test_parallel.py and the driver dryrun.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass
class StagePlan:
    """Static plan for pipelining one UNetCore over K stages."""
    boundaries: List[int]                 # K+1 op indices, [0, ..., n_ops]
    boundary_specs: List[Tuple[Any, List[Any]]]   # per boundary: (x_sds, [skip_sds])
    payload_len: int                      # L_max over used boundaries
    param_len: int                        # P_max over stages
    stage_unflatten: List[Callable]       # fp32 row[:P_k] -> stage param dict
    stage_param_sizes: List[int]
    n_stages: int


def _boundary_state_specs(core, variables, x, emb) -> List[Tuple[Any, List[Any]]]:
    """Abstractly evaluate run_ops one op at a time: specs[b] is the
    (x, skips) state BEFORE op b; specs[n_ops] is the final state."""
    from dualdiffusion_tpu.models.unet import UNetCore

    ops, _ = core._build_schedule()
    x_sds = jax.ShapeDtypeStruct(x.shape, jnp.bfloat16)
    emb_sds = jax.ShapeDtypeStruct(emb.shape, jnp.bfloat16)
    specs = [(x_sds, [])]
    for b in range(len(ops)):
        xx, sk = specs[-1]

        def step(v, e, xx_, sk_):
            return core.apply(v, xx_, e, list(sk_), b, b + 1,
                              method=UNetCore.run_ops)

        nx, nsk = jax.eval_shape(step, variables, emb_sds, xx, tuple(sk))
        specs.append((nx, list(nsk)))
    return specs


def _op_costs(core, specs) -> np.ndarray:
    """Analytic per-op cost ~ conv MACs: out-spatial x cin x cout."""
    ops, _ = core._build_schedule()
    costs = []
    for b, (_, _, _, cin, cout) in enumerate(ops):
        out_x = specs[b + 1][0]
        spatial = int(np.prod(out_x.shape[:-1]))  # includes batch — constant factor
        costs.append(float(spatial) * cin * cout)
    return np.asarray(costs)


def _balance(costs: np.ndarray, k: int) -> List[int]:
    """Contiguous partition of ops into k ranges with ~equal cost.
    Greedy cut at cumulative targets; every stage gets >= 1 op."""
    n = len(costs)
    assert k <= n, f"{k} stages for {n} ops"
    cum = np.concatenate([[0.0], np.cumsum(costs)])
    bounds = [0]
    for i in range(1, k):
        target = cum[-1] * i / k
        j = int(np.searchsorted(cum, target))
        j = min(max(j, bounds[-1] + 1), n - (k - i))  # keep stages non-empty
        bounds.append(j)
    bounds.append(n)
    return bounds


def _payload_sizes(spec) -> List[int]:
    x_sds, skips = spec
    return [int(np.prod(s.shape)) for s in [x_sds] + list(skips)]


def _pack_payload(tensors: Sequence[jnp.ndarray], length: int) -> jnp.ndarray:
    flat = jnp.concatenate([t.reshape(-1).astype(jnp.bfloat16)
                            for t in tensors])
    pad = length - flat.shape[0]
    return jnp.pad(flat, (0, pad)) if pad else flat


def _unpack_payload(flat: jnp.ndarray, spec) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    x_sds, skips = spec
    out, off = [], 0
    for s in [x_sds] + list(skips):
        n = int(np.prod(s.shape))
        out.append(flat[off:off + n].reshape(s.shape))
        off += n
    return out[0], out[1:]


def _stage_param_subset(params: dict, op_names: Sequence[str]) -> dict:
    sub = {name: params[name] for name in op_names if name in params}
    # UNetCore.setup registers out_gain via self.param eagerly, so every
    # stage's partial tree must carry it (one scalar — free)
    if "out_gain" in params:
        sub["out_gain"] = params["out_gain"]
    return sub


def build_stage_plan(core, variables, x, emb, n_stages: int) -> StagePlan:
    """Plan K contiguous stages over core's op schedule for input x/emb.

    x: post-precondition trunk input (B_mb, [Z,] H, W, C) — microbatch
    batch size; emb: (B_mb, cemb). All specs are microbatch-shaped.
    """
    ops, _ = core._build_schedule()
    specs = _boundary_state_specs(core, variables, x, emb)
    costs = _op_costs(core, specs)
    bounds = _balance(costs, n_stages)

    payload_len = max(sum(_payload_sizes(specs[b])) for b in bounds)
    params = variables["params"] if "params" in variables else variables
    unflattens, sizes = [], []
    for k in range(n_stages):
        lo, hi = bounds[k], bounds[k + 1]
        names = [ops[i][0] for i in range(lo, hi)]
        sub = _stage_param_subset(params, names)
        vec, unflatten = ravel_pytree(sub)
        unflattens.append(unflatten)
        sizes.append(int(vec.shape[0]))
    return StagePlan(boundaries=bounds, boundary_specs=specs,
                     payload_len=payload_len, param_len=max(sizes),
                     stage_unflatten=unflattens, stage_param_sizes=sizes,
                     n_stages=n_stages)


def unet_pipeline_apply(core, variables, x: jnp.ndarray, emb: jnp.ndarray,
                        mesh: Mesh, axis: str = "model",
                        num_microbatches: int = 4,
                        plan: Optional[StagePlan] = None,
                        stacked: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Pipelined equivalent of `core.run_ops(x, emb, [])[0]`.

    x: (B, ...) post-precondition bf16 trunk input; emb: (B, cemb).
    B % num_microbatches == 0. Returns the trunk output (pre-combine).
    Pass a prebuilt (plan, stacked) to amortize planning across calls.
    """
    from dualdiffusion_tpu.models.unet import UNetCore

    k_stages = int(mesh.shape[axis])
    b = x.shape[0]
    m = num_microbatches
    assert b % m == 0, (b, m)
    mb = b // m
    x_mb = x.reshape((m, mb) + x.shape[1:]).astype(jnp.bfloat16)
    emb_mb = emb.reshape((m, mb) + emb.shape[1:]).astype(jnp.bfloat16)

    if plan is None:
        plan = build_stage_plan(core, variables, x_mb[0], emb_mb[0], k_stages)
    if stacked is None:
        stacked = _stack_params(core, variables, plan)

    specs, bounds = plan.boundary_specs, plan.boundaries
    L = plan.payload_len
    ops, _ = core._build_schedule()

    def make_branch(k: int):
        lo, hi = bounds[k], bounds[k + 1]
        unflatten = plan.stage_unflatten[k]
        p_k = plan.stage_param_sizes[k]
        in_spec = specs[lo]

        def branch(row, flat, emb_cur):
            sub = unflatten(row[:p_k])
            xx, skips = _unpack_payload(flat, in_spec)
            nx, nskips = core.apply({"params": sub}, xx, emb_cur,
                                    skips, lo, hi, method=UNetCore.run_ops)
            return _pack_payload([nx] + list(nskips), L)

        return branch

    branches = [make_branch(k) for k in range(k_stages)]
    perm = [(i, (i + 1) % k_stages) for i in range(k_stages)]

    in_payload = jnp.stack([_pack_payload([x_mb[t]], L) for t in range(m)])

    def inner(row2, payload_mb, emb_all):
        row = row2[0]
        idx = jax.lax.axis_index(axis)
        ticks = m + k_stages - 1

        def tick(carry, t):
            state, outbuf = carry
            feed = jnp.clip(t, 0, m - 1)
            inp = jnp.where(idx == 0, payload_mb[feed], state)
            mb_id = jnp.clip(t - idx, 0, m - 1)
            out = jax.lax.switch(idx, branches, row, inp, emb_all[mb_id])
            emit = t - (k_stages - 1)
            outbuf = jnp.where(
                (idx == k_stages - 1) & (emit >= 0),
                jax.lax.dynamic_update_index_in_dim(
                    outbuf, out, jnp.maximum(emit, 0), 0),
                outbuf)
            state = jax.lax.ppermute(out, axis, perm)
            return (state, outbuf), None

        state0 = jnp.zeros((L,), jnp.bfloat16)
        outbuf0 = jnp.zeros((m, L), jnp.bfloat16)
        (_, outbuf), _ = jax.lax.scan(tick, (state0, outbuf0),
                                      jnp.arange(ticks))
        # broadcast the last stage's buffer so out_specs can be replicated
        return jax.lax.psum(
            jnp.where(idx == k_stages - 1, outbuf, jnp.zeros_like(outbuf)),
            axis)

    pspec = P(axis)
    try:  # jax >= 0.9 renamed check_rep -> check_vma
        smap = jax.shard_map(inner, mesh=mesh,
                             in_specs=(pspec, P(), P()), out_specs=P(),
                             check_vma=False)
    except TypeError:
        smap = jax.shard_map(inner, mesh=mesh,
                             in_specs=(pspec, P(), P()), out_specs=P(),
                             check_rep=False)
    out_payload = smap(stacked, in_payload, emb_mb)

    out_spec = specs[bounds[-1]]
    outs = [_unpack_payload(out_payload[t], out_spec)[0] for t in range(m)]
    y = jnp.concatenate(outs, axis=0)
    return y


def _stack_params(core, variables, plan: StagePlan) -> jnp.ndarray:
    """(K, P_max) fp32 stage-param buffer matching plan.stage_unflatten."""
    ops, _ = core._build_schedule()
    params = variables["params"] if "params" in variables else variables
    rows = []
    for k in range(plan.n_stages):
        lo, hi = plan.boundaries[k], plan.boundaries[k + 1]
        names = [ops[i][0] for i in range(lo, hi)]
        sub = _stage_param_subset(params, names)
        vec, _ = ravel_pytree(sub)
        vec = vec.astype(jnp.float32)
        pad = plan.param_len - vec.shape[0]
        rows.append(jnp.pad(vec, (0, pad)) if pad else vec)
    return jnp.stack(rows)


def pipelined_denoise(core, variables, x_in: jnp.ndarray, sigma: jnp.ndarray,
                      embeddings: Optional[jnp.ndarray], mesh: Mesh,
                      axis: str = "model", num_microbatches: int = 4,
                      x_ref: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full EDM2 denoise D(x, sigma) with the trunk pipelined over `axis`.

    Equivalent to `core.apply(variables, x_in, sigma, embeddings, x_ref)`;
    preconditioning and the c_skip/c_out combine run replicated (they are
    cheap elementwise ops), the UNet trunk streams through the pipeline.
    """
    from dualdiffusion_tpu.models.unet import UNetCore

    x, emb, c_skip, c_out = core.apply(
        variables, x_in, sigma, embeddings, x_ref,
        method=UNetCore.precondition)
    y = unet_pipeline_apply(core, variables, x, emb, mesh, axis=axis,
                            num_microbatches=num_microbatches)
    return c_skip * x_in.astype(jnp.float32) + c_out * y.astype(jnp.float32)
