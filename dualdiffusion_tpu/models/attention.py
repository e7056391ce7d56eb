"""Attention utilities: partial RoPE and sliding-window attention.

Capability parity with the reference's attention helpers:

  * partial pair-rotation RoPE with width-axis cos/sin tables
    (reference: src/modules/rope.py:26-78) — rotates the first rope_ch
    channels pairwise, leaves the tail unchanged; tables are host-side
    float64 constants.
  * sliding-window (optionally causal) attention
    (reference: src/modules/sliding_attention.py:31-127). The reference
    uses FlexAttention block masks; here a static banded mask feeds a
    masked softmax — XLA maps it to fused attention; a Pallas splash
    kernel can replace the inner product later without API change.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def build_rope_tables(length: int, rope_ch: int, base: float = 10000.0,
                      scale: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables of shape (length, rope_ch//2), float32 host constants
    (reference: rope.py:48-62)."""
    assert rope_ch % 2 == 0, "rope_ch must be even"
    if rope_ch == 0:
        return (np.zeros((length, 0), np.float32),) * 2
    inv_freq = 1.0 / (base ** (np.arange(0, rope_ch, 2, dtype=np.float64) / rope_ch))
    pos = np.arange(length, dtype=np.float64) * scale
    ang = np.outer(pos, inv_freq)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def rope_rotate_partial(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate the first 2*cos.shape[-1] channels of x pairwise
    (reference: rope.py:26-46). x: (..., L, D); cos/sin broadcastable to
    (..., L, rope_ch//2). Output layout groups rotated evens then odds then
    the tail, matching the reference."""
    rope_ch = cos.shape[-1] * 2
    x_rot = x[..., :rope_ch]
    x_tail = x[..., rope_ch:]
    x_even = x_rot[..., 0::2]
    x_odd = x_rot[..., 1::2]
    r_even = x_even * cos - x_odd * sin
    r_odd = x_odd * cos + x_even * sin
    return jnp.concatenate([r_even, r_odd, x_tail], axis=-1)


# ---------------------------------------------------------------------------
# sliding-window attention
# ---------------------------------------------------------------------------

@lru_cache(maxsize=32)
def _band_mask(seq_len: int, window: int, causal: bool) -> np.ndarray:
    q = np.arange(seq_len)[:, None]
    k = np.arange(seq_len)[None, :]
    if causal:
        mask = (q >= k) & (q - k <= window)
    else:
        mask = np.abs(q - k) <= window
    return mask


#: flash kernel dispatch threshold: measured on v5e-1 (b2 h8 d64 bf16)
#: the Pallas kernel wins from L=4096 (18.1 vs 26.4 ms dense, 1024-blocks)
#: while XLA's fused einsum+softmax wins at L=688 (9.1 vs 13.0 ms) — short
#: sequences fit one MXU tile and the kernel's grid overhead dominates
FLASH_MIN_SEQ = 2048


def _use_flash(seq_len: int) -> bool:
    return seq_len >= FLASH_MIN_SEQ and jax.default_backend() == "tpu"


def scaled_dot_product_attention(q: jnp.ndarray, k: jnp.ndarray,
                                 v: jnp.ndarray,
                                 scale: Optional[float] = None,
                                 window: Optional[int] = None,
                                 causal: bool = False,
                                 training: bool = False) -> jnp.ndarray:
    """SDPA with automatic backend choice. q/k/v: (B, H, L, D).

    Long sequences on TPU route to the Pallas flash kernel (online
    softmax, O(L*window) for banded); short ones use the fused XLA
    einsum+softmax, which is faster when L x L fits in one tile.
    ``training=True`` forces the XLA path: the flash kernel has no
    custom VJP, so it must not be reached under ``jax.grad``.
    """
    b, h, l, d = q.shape
    scale = float(scale) if scale is not None else 1.0 / float(np.sqrt(d))
    if _use_flash(l) and not training:
        from dualdiffusion_tpu.ops.pallas.flash_attention import flash_attention
        return flash_attention(q, k, v, scale=scale, window=window,
                               causal=causal)
    if window is not None:
        mask = jnp.asarray(_band_mask(l, window, causal))
    elif causal:
        mask = jnp.asarray(np.tril(np.ones((l, l), bool)))
    else:
        mask = None
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def sliding_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             window_size: int, causal: bool = False,
                             scale: Optional[float] = None) -> jnp.ndarray:
    """Banded SDPA. q/k/v: (B, H, L, D) -> (B, H, L, D)."""
    return scaled_dot_product_attention(q, k, v, scale=scale,
                                        window=window_size, causal=causal)


def rope_self_test(n: int = 31, t0: Optional[int] = None, rope_ch: int = 2) -> bool:
    """Same-sign RoPE sanity check (reference: rope.py:81-101): with Q
    holding [1,0] only at t0 and K holding [1,0] everywhere (pre-rotation),
    attention from t0 must peak at t0."""
    t0 = t0 if t0 is not None else n // 4
    d = n
    cos, sin = build_rope_tables(n, rope_ch)
    q = np.zeros((1, 1, n, d), np.float32)
    q[0, 0, t0, 0] = 1.0
    k = np.zeros((1, 1, n, d), np.float32)
    k[:, :, :, 0] = 1.0
    v = np.eye(n, d, dtype=np.float32)[None, None]
    qr = rope_rotate_partial(jnp.asarray(q), jnp.asarray(cos), jnp.asarray(sin))
    kr = rope_rotate_partial(jnp.asarray(k), jnp.asarray(cos), jnp.asarray(sin))
    logits = jnp.einsum("bhqd,bhkd->bhqk", qr, kr) / np.sqrt(d)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, jnp.asarray(v))
    peak = int(jnp.argmax(out[0, 0, t0]))
    return peak == t0
