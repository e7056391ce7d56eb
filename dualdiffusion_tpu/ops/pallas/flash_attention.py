"""Pallas TPU flash attention (online softmax), with optional banded
(sliding-window) sparsity.

This is the framework's native counterpart of the reference's
FlexAttention-based sliding-window attention
(reference: src/modules/sliding_attention.py:31-127) and the plain SDPA in
the EDM2 attention blocks (reference: src/modules/unet_edm2_d1.py:196-217):
SURVEY.md §2.9 item 3 ("pallas flash/splash attention for the attention
blocks").

Design (one pass, no L x L logits in HBM):
  * grid = (batch*heads, q blocks, k blocks), k innermost; the TPU grid is
    sequential, so the running max / denominator / accumulator live in VMEM
    scratch that persists across the k loop and is reset at k==start.
  * online softmax in fp32 (exp(s - running_max) rescaling), accumulate
    p @ v into an fp32 scratch, divide once at the last k block.
  * banded mode: for window w, each q block visits only the k blocks
    intersecting [q_lo - w, q_hi + w] — the k index map clamps to a valid
    block and the in-kernel mask recomputes the unclamped index, so
    clamped duplicates contribute exactly 0. Complexity O(L*w) not O(L^2).
  * q/k/v blocks are zero-padded to (block, 128-lane d) by the host
    wrapper when L or D are not multiples of the tile; padded k columns
    are masked to -inf, padded d lanes multiply by zero.

`interpret=True` runs the same kernel on CPU (tests/test_flash_attention.py
checks exactness against the jnp softmax reference in fp32).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                 scale: float, block_q: int, block_k: int, seq_len: int,
                 window: Optional[int], causal: bool, nk_blocks: int,
                 k_blocks_per_q: int):
    """One (bh, iq, ik) grid step of online-softmax attention."""
    iq = pl.program_id(1)
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)          # (bq, d)
    k = k_ref[0].astype(jnp.float32)          # (bk, d)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale

    # global row/col indices; banded mode recomputes the UNCLAMPED k block
    # so rows fetched via a clamped index map are masked out entirely
    rows = iq * block_q + jax.lax.broadcasted_iota(jnp.int32,
                                                   (block_q, block_k), 0)
    if window is not None:
        k_first = _k_first_block(iq, block_q, block_k, window, nk_blocks,
                                 k_blocks_per_q)
        kb = k_first + ik
        cols = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = (jnp.abs(rows - cols) <= window) & (kb < nk_blocks)
    else:
        cols = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = jnp.ones_like(rows, jnp.bool_)
    if causal:
        mask &= rows >= cols
    mask &= cols < seq_len                      # zero-pad tail of k
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_ref[:, :1]                       # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)             # (bq, 1)
    p = jnp.exp(s - m_new)                      # (bq, bk)
    p = jnp.where(mask, p, 0.0)                 # exp(NEG_INF-m) underflow guard
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[0].astype(jnp.float32)            # (bk, d)
    pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == pl.num_programs(2) - 1)
    def _finish():
        # fully-masked rows (seq padding) have l == 0: emit 0, not nan
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[:] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def _k_first_block(iq, block_q: int, block_k: int, window: int,
                   nk_blocks: int, k_blocks_per_q: int):
    """First k block a banded q block visits (clamped to stay in range so
    the visited span [first, first + k_blocks_per_q) is always valid)."""
    lo = jnp.maximum(iq * block_q - window, 0) // block_k
    return jnp.minimum(lo, jnp.maximum(nk_blocks - k_blocks_per_q, 0))


@functools.partial(jax.jit, static_argnames=(
    "scale", "window", "causal", "block_q", "block_k", "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: Optional[float] = None,
                    window: Optional[int] = None, causal: bool = False,
                    block_q: int = 1024, block_k: int = 1024,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused attention. q/k/v: (B, H, L, D) -> (B, H, L, D).

    ``window=w`` restricts each query to keys with |i - j| <= w (the
    reference's sliding-window semantics, non-causal by default);
    ``causal=True`` additionally masks j > i.
    """
    b, h, l, d = q.shape
    assert k.shape == v.shape == (b, h, l, d)
    scale = float(scale) if scale is not None else 1.0 / float(np.sqrt(d))

    block_q = min(block_q, max(_round_up(l, 8), 8))
    block_k = min(block_k, max(_round_up(l, 8), 8))
    lp = _round_up(l, max(block_q, block_k))
    dp = _round_up(d, 128)
    nq, nk = lp // block_q, lp // block_k

    if window is not None:
        # k blocks intersecting [q_lo - w, q_hi + w]
        span = (block_q - 1) + 2 * window
        k_blocks_per_q = min(span // block_k + 2, nk)
    else:
        k_blocks_per_q = nk

    def pad(t):
        if lp == l and dp == d:
            return t
        return jnp.pad(t, ((0, 0), (0, 0), (0, lp - l), (0, dp - d)))

    qf = pad(q).reshape(b * h, lp, dp)
    kf = pad(k).reshape(b * h, lp, dp)
    vf = pad(v).reshape(b * h, lp, dp)

    if window is not None:
        def k_index(bh, iq, ik):
            return (bh, _k_first_block(iq, block_q, block_k, window, nk,
                                       k_blocks_per_q) + ik, 0)
    else:
        def k_index(bh, iq, ik):
            return (bh, ik, 0)

    kernel = functools.partial(
        _attn_kernel, scale=scale, block_q=block_q, block_k=block_k,
        seq_len=l, window=window, causal=causal, nk_blocks=nk,
        k_blocks_per_q=k_blocks_per_q)

    out = pl.pallas_call(
        kernel,
        grid=(b * h, nq, k_blocks_per_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, dp), k_index),
            pl.BlockSpec((1, block_k, dp), k_index),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp),
                               lambda bh, iq, ik: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lp, dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, dp), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qf, kf, vf)

    return out.reshape(b, h, lp, dp)[:, :, :l, :d]


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m
