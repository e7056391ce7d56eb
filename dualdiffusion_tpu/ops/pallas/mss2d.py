"""Pallas TPU kernel: fused 2D multi-scale spectral loss.

This is the framework's native-kernel counterpart of the reference's
commented-out CUDA extension (reference: src/training/module_trainers/
dae_trainer_m1.py:211-276 — a JIT `mss_loss_2d_cuda` whose sources the tree
never shipped; SURVEY.md §2.9 item 1 flags it as the clearest Pallas
candidate).

The jnp reference implementation (training/losses.py MSSLoss2D)
materializes the unfolded block tensor (B, C, nH, nW, bw, bw) in HBM — a
(bw/stride)^2 memory blowup (64x at bw=64, overlap 8). This kernel DMAs
overlapping row-strips of the sample/target spectrograms into VMEM
(overlap is inexpressible with standard BlockSpecs, so strips are copied
manually from HBM with double-buffer-ready async copies) and computes
window -> 2D DFT (small MXU matmuls) -> |.| -> weighted |diff| -> sum per
block without materializing anything.

`interpret=True` runs it on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=16)
def _dft_bases(bw: int):
    """Full DFT along rows (bw x bw) and rfft along cols (bw x bins)."""
    n = np.arange(bw, dtype=np.float64)
    full = np.exp(-2j * np.pi * np.outer(n, n) / bw)
    bins = bw // 2 + 1
    half = np.exp(-2j * np.pi * np.outer(n, n[:bins]) / bw)
    return (full.real.astype(np.float32), full.imag.astype(np.float32),
            half.real.astype(np.float32), half.imag.astype(np.float32))


def _mss2d_kernel(sample_hbm, target_hbm, window_ref, cr_ref, ci_ref,
                  kr_ref, ki_ref, weight_ref, out_ref, s_scr, t_scr, sems,
                  *, bw: int, stride: int, n_cols: int, chunks: int):
    b = pl.program_id(0)
    i = pl.program_id(1)

    cp_s = pltpu.make_async_copy(sample_hbm.at[b, pl.ds(i, chunks)],
                                 s_scr, sems.at[0])
    cp_t = pltpu.make_async_copy(target_hbm.at[b, pl.ds(i, chunks)],
                                 t_scr, sems.at[1])
    cp_s.start()
    cp_t.start()
    cp_s.wait()
    cp_t.wait()

    w = s_scr.shape[-1]
    strip_s = s_scr[:].reshape(bw, w)
    strip_t = t_scr[:].reshape(bw, w)
    win = window_ref[:]

    def fft2_mag(blk):
        rr = jnp.dot(cr_ref[:].T, blk, preferred_element_type=jnp.float32)
        ri = jnp.dot(ci_ref[:].T, blk, preferred_element_type=jnp.float32)
        gr = (jnp.dot(rr, kr_ref[:], preferred_element_type=jnp.float32)
              - jnp.dot(ri, ki_ref[:], preferred_element_type=jnp.float32))
        gi = (jnp.dot(rr, ki_ref[:], preferred_element_type=jnp.float32)
              + jnp.dot(ri, kr_ref[:], preferred_element_type=jnp.float32))
        return jnp.sqrt(gr * gr + gi * gi)

    def body(j, acc):
        blk_s = jax.lax.dynamic_slice(strip_s, (0, j * stride), (bw, bw)) * win
        blk_t = jax.lax.dynamic_slice(strip_t, (0, j * stride), (bw, bw)) * win
        diff = jnp.abs(fft2_mag(blk_s) - fft2_mag(blk_t)) * weight_ref[:]
        return acc + jnp.sum(diff)

    out_ref[0, 0] = jax.lax.fori_loop(0, n_cols, body, jnp.float32(0.0))


def mss2d_block_loss(sample: jnp.ndarray, target: jnp.ndarray, bw: int,
                     stride: int, window: np.ndarray, weight: np.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused single-block-size 2D MSS term (forward).

    sample/target: (BC, H, W) fp32 spectrograms, already reflect-padded by
    bw//2; window: (bw, bw); weight: (bw, bw//2+1) frequency weights.
    Returns the summed weighted |mag diff| over all block positions.
    """
    bc, h, w = sample.shape
    assert h % stride == 0 and bw % stride == 0
    n_rows = (h - bw) // stride + 1
    n_cols = (w - bw) // stride + 1
    chunks = bw // stride
    cr, ci, kr, ki = _dft_bases(bw)

    sv = sample.reshape(bc, h // stride, stride, w)
    tv = target.reshape(bc, h // stride, stride, w)

    out = pl.pallas_call(
        functools.partial(_mss2d_kernel, bw=bw, stride=stride,
                          n_cols=n_cols, chunks=chunks),
        grid=(bc, n_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda b, i: (b, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, n_rows), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((chunks, stride, w), jnp.float32),
            pltpu.VMEM((chunks, stride, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(sv, tv, jnp.asarray(window, jnp.float32), jnp.asarray(cr),
      jnp.asarray(ci), jnp.asarray(kr), jnp.asarray(ki),
      jnp.asarray(weight, jnp.float32))
    return out.sum()


def mss2d_loss_fused(sample: jnp.ndarray, target: jnp.ndarray,
                     block_widths: Tuple[int, ...] = (8, 16, 32, 64),
                     block_overlap: int = 8,
                     interpret: bool = False) -> jnp.ndarray:
    """Multi-scale fused 2D MSS over (B, C, H, W) pairs with the reference's
    flat-top window and product frequency weighting (matches
    training.losses.MSSLoss2D defaults up to the per-block mean->sum
    normalization, which this applies per block size)."""
    from ...training.losses import _window_2d
    b, c = sample.shape[:2]
    s = sample.reshape((-1,) + sample.shape[2:]).astype(jnp.float32)
    t = target.reshape((-1,) + target.shape[2:]).astype(jnp.float32)
    total = jnp.float32(0.0)
    for bw in block_widths:
        if bw > sample.shape[-1]:
            continue
        stride = max(bw // block_overlap, 1)
        pad = bw // 2
        sp = jnp.pad(s, [(0, 0), (pad, pad), (pad, pad)], mode="reflect")
        tp = jnp.pad(t, [(0, 0), (pad, pad), (pad, pad)], mode="reflect")
        # pad H to a stride multiple (framing requirement)
        extra = (-sp.shape[1]) % stride
        if extra:
            sp = jnp.pad(sp, [(0, 0), (0, extra), (0, 0)])
            tp = jnp.pad(tp, [(0, 0), (0, extra), (0, 0)])
        win = _window_2d("flat_top", bw)
        fh = np.fft.fftfreq(bw, d=1.0 / bw)
        fw = np.fft.rfftfreq(bw, d=1.0 / bw)
        weight = ((np.abs(fh)[:, None] + 1) * (np.abs(fw)[None, :] + 1)).astype(np.float32)
        n_rows = (sp.shape[1] - bw) // stride + 1
        n_cols = (sp.shape[2] - bw) // stride + 1
        norm = b * c * n_rows * n_cols * bw * (bw // 2 + 1)
        total = total + mss2d_block_loss(sp, tp, bw, stride, win, weight,
                                         interpret=interpret) / norm
    return total
