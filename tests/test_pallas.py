"""Pallas kernel tests (interpret mode — runs on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dualdiffusion_tpu.ops.pallas.mss2d import mss2d_block_loss, mss2d_loss_fused


def test_mss2d_kernel_matches_direct(rng):
    bc, h, w, bw, stride = 2, 32, 40, 8, 2
    s = jnp.asarray(rng.standard_normal((bc, h, w)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((bc, h, w)).astype(np.float32))
    win = rng.standard_normal((bw, bw)).astype(np.float32)
    weight = np.abs(rng.standard_normal((bw, bw // 2 + 1))).astype(np.float32)

    total = 0.0
    n_rows = (h - bw) // stride + 1
    n_cols = (w - bw) // stride + 1
    sn, tn = np.asarray(s), np.asarray(t)
    for b in range(bc):
        for i in range(n_rows):
            for j in range(n_cols):
                bs = sn[b, i * stride:i * stride + bw,
                        j * stride:j * stride + bw] * win
                bt = tn[b, i * stride:i * stride + bw,
                        j * stride:j * stride + bw] * win
                total += (np.abs(np.abs(np.fft.rfft2(bs))
                                 - np.abs(np.fft.rfft2(bt))) * weight).sum()

    got = float(mss2d_block_loss(s, t, bw, stride, win, weight, interpret=True))
    assert abs(got - total) / abs(total) < 1e-4


def test_mss2d_fused_multiscale(rng):
    s = jnp.asarray(rng.standard_normal((1, 2, 40, 64)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((1, 2, 40, 64)).astype(np.float32))
    # (8 -> jnp fallback path, 32 -> fused kernel path)
    loss = float(mss2d_loss_fused(s, t, block_widths=(8, 32), interpret=True))
    assert np.isfinite(loss) and loss > 0
    zero = float(mss2d_loss_fused(s, s, block_widths=(8, 32), interpret=True))
    assert zero < 1e-6
    # the fused kernel computes the identical math as the jnp unfold path
    ref = float(mss2d_loss_fused(s, t, block_widths=(8, 32),
                                 min_fused_bw=10_000, interpret=True))
    assert abs(loss - ref) / ref < 1e-4
