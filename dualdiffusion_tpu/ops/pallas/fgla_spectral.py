"""Pallas TPU kernel: the FGLA spectral step as one fused pass.

Everything between two fgla_middle calls — the forward lane-stage DFT
matmul, FISTA momentum, phase normalization, the stereo-annealed
magnitude substitution, and the inverse lane-stage matmul — runs in one
kernel over (k1, F-block, n2) tiles:

    rr|ri = [z2r | z2i] @ W_fwd            (stacked-complex (2n2, 2n2))
    n     = (rr, ri) - mom * prev
    ang   = n / (|n| + eps)
    interp= merged + relu(t) * (spec - merged)
    z1'   = [ang_r*interp | ang_i*interp] @ W_inv

With fgla_middle this makes a full Griffin-Lim iteration exactly two
pallas_calls and zero XLA passes: the separate XLA lane matmuls +
elementwise chain measured ~6.5 ms/iter at the flagship size (the
elementwise normalize alone 2.5 ms) against ~1 ms of roofline traffic.

The annealing scalar t (iteration-dependent) arrives via SMEM; the
momentum coefficient is a compile-time constant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _spectral_kernel(t_ref, z2r_ref, z2i_ref, pr_ref, pi_ref, sp_ref,
                     mg_ref, wfwd_ref, winv_ref,
                     z1r_ref, z1i_ref, rr_ref, ri_ref, *,
                     mom: float, n2: int, n1s: int, bf: int):
    wd = z2r_ref.dtype
    z2 = jnp.concatenate([z2r_ref[0], z2i_ref[0]], axis=-1)  # (n1s, bf, 2n2)
    r2 = jnp.dot(z2.reshape(n1s * bf, 2 * n2), wfwd_ref[...].astype(wd),
                 preferred_element_type=jnp.float32)
    r2 = r2.reshape(n1s, bf, 2 * n2).astype(wd)
    rr = r2[..., :n2]
    ri = r2[..., n2:]
    rr_ref[0] = rr
    ri_ref[0] = ri

    momc = jnp.asarray(mom, wd)
    nr = (rr - momc * pr_ref[0]).astype(jnp.float32)
    ni = (ri - momc * pi_ref[0]).astype(jnp.float32)
    mag = jnp.sqrt(nr * nr + ni * ni) + 1e-12

    t = jnp.maximum(t_ref[0, 0], 0.0).astype(wd)
    sp = sp_ref[0]
    mg = mg_ref[0]
    interp = (mg + (sp - mg) * t).astype(jnp.float32)
    xr = (nr / mag * interp).astype(wd)
    xi = (ni / mag * interp).astype(wd)

    x2 = jnp.concatenate([xr, xi], axis=-1)
    z1 = jnp.dot(x2.reshape(n1s * bf, 2 * n2), winv_ref[...].astype(wd),
                 preferred_element_type=jnp.float32)
    z1 = z1.reshape(n1s, bf, 2 * n2).astype(wd)
    z1r_ref[0] = z1[..., :n2]
    z1i_ref[0] = z1[..., n2:]


@functools.partial(jax.jit, static_argnames=("mom", "block_frames",
                                             "interpret"))
def fgla_spectral(t, z2r, z2i, prev_r, prev_i, spec_w, merged_w,
                  w_fwd, w_inv, mom: float, block_frames: int = 64,
                  interpret=None):
    """One fused spectral step. All grid arrays (..., n1s, F, n2);
    t: scalar annealing lerp factor (negative = use merged only);
    w_fwd/w_inv: (2*n2, 2*n2) stacked-complex lane-stage matrices.
    Returns (z1r, z1i, rr, ri)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, n1s, f, n2 = z2r.shape
    bc = int(np.prod(lead)) if lead else 1
    bf = min(block_frames, f)
    while f % bf != 0:
        bf -= 1

    def r4(x):
        return x.reshape(bc, n1s, f, n2)

    blk = pl.BlockSpec((1, n1s, bf, n2), lambda b, ib: (b, 0, ib, 0))
    kernel = functools.partial(_spectral_kernel, mom=float(mom), n2=n2,
                               n1s=n1s, bf=bf)
    out = pl.pallas_call(
        kernel,
        grid=(bc, f // bf),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # t
            blk, blk, blk, blk, blk, blk,
            pl.BlockSpec((2 * n2, 2 * n2), lambda b, ib: (0, 0)),
            pl.BlockSpec((2 * n2, 2 * n2), lambda b, ib: (0, 0)),
        ],
        out_specs=[blk, blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct((bc, n1s, f, n2), z2r.dtype)] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(t, jnp.float32).reshape(1, 1), r4(z2r), r4(z2i),
      r4(prev_r), r4(prev_i), r4(spec_w), r4(merged_w),
      jnp.asarray(w_fwd), jnp.asarray(w_inv))
    return tuple(o.reshape(z2r.shape) for o in out)
