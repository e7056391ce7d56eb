"""Fast Griffin-Lim (FGLA) phase reconstruction with momentum and
stereo-coherent annealing, as a single jitted ``lax.fori_loop``.

Semantics match the reference's griffinlim
(reference: src/modules/formats/old/phase_recovery.py:39-129):

  * momentum' = momentum / (1 + momentum); update
    ``angles = normalize(rebuilt - momentum' * prev)`` (FISTA-style).
  * flat (all-ones) phase init by default, optional random init.
  * stereo-coherent annealing: iterate on the L/R-merged magnitude, lerping
    toward per-channel magnitudes only once i/n_iter exceeds
    ``stereo_coherence`` (reference :62-90).

TPU-first differences: the whole loop runs on-device under jit (the
reference runs a Python loop of cuFFT calls); complex spectra are carried as
(real, imag) pairs so every FFT routes through ops.fft's matmul backend on
TPU; iteration count is a static trace-time constant.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .stft import (istft as _istft, istft_pair as _istft_pair,
                   stft as _sfft, stft_pair as _stft_pair)


def spsi_phase(mag: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """SPSI initial phases from magnitudes alone, with phase locking
    (the full Single-Pass Spectrogram Inversion of Beauregard, Harish &
    Wyse 2015, vectorized for jit instead of per-frame python loops):

      1. per-bin instantaneous frequency by quadratic interpolation of
         the magnitude ridge, integrated over frames:
         phi_acc[t, k] = sum_{u<=t} 2*pi*hop*(k + p[u, k])/n_fft;
      2. per-frame local peak picking, nearest-peak assignment for every
         bin via two cumulative maxima (no data-dependent loops);
      3. phase locking: every bin takes its governing peak's accumulated
         phase plus the window main-lobe ramp pi*(k - k_peak), keeping
         cross-bin phase coherent inside each sinusoid's lobe.

    The reference initializes FGLA with flat phases
    (/root/reference/src/modules/formats/old/phase_recovery.py:97-101).
    On the production input — mel-filterbank-inverted (inconsistent)
    magnitudes at n_fft=6400/hop=256 — this init at 100 iterations
    reaches LOWER spectral convergence error than flat at 200 (0.054 vs
    0.081 on the bench probe signal; flat plateaus by ~150 iters), i.e.
    half the iterations at better quality. Without locking (per-bin
    integration only) the init is barely better than flat there.
    Measured in tests/test_fgla_fast.py and scripts/fgla_probe.py;
    optional via ``phase_init="spsi"``.

    mag: (..., frames, bins) linear magnitudes. Returns phases of the same
    shape, fp32.
    """
    k_bins = mag.shape[-1]
    a = mag[..., :-2]
    b = mag[..., 1:-1]
    c = mag[..., 2:]
    denom = a - 2.0 * b + c
    p = 0.5 * (a - c) / jnp.where(jnp.abs(denom) > 1e-12, denom, jnp.inf)
    p = jnp.clip(p, -0.5, 0.5)
    p = jnp.pad(p, [(0, 0)] * (mag.ndim - 1) + [(1, 1)])
    khat = jnp.arange(k_bins, dtype=jnp.float32) + p
    omega = 2.0 * jnp.pi * hop_length * khat / n_fft
    phi_acc = jnp.cumsum(omega.astype(jnp.float32), axis=-2)

    # per-frame local peaks; ties broken rightward (> left, >= right)
    left = jnp.pad(mag[..., :-1], [(0, 0)] * (mag.ndim - 1) + [(1, 0)])
    right = jnp.pad(mag[..., 1:], [(0, 0)] * (mag.ndim - 1) + [(0, 1)])
    is_peak = (mag > left) & (mag >= right)
    idx = jnp.arange(k_bins)
    big = 10 * k_bins
    kaxis = mag.ndim - 1
    lp = jax.lax.cummax(jnp.where(is_peak, idx, -big), axis=kaxis)
    rp = -jax.lax.cummax(jnp.where(is_peak, -idx, -big)[..., ::-1],
                         axis=kaxis)[..., ::-1]
    kp = jnp.where((idx - lp) <= (rp - idx), lp, rp)
    kp = jnp.clip(kp, 0, k_bins - 1)     # frames with no peak at all
    phi_pk = jnp.take_along_axis(phi_acc, kp, axis=-1)
    return phi_pk + jnp.pi * (idx - kp).astype(jnp.float32)


def griffinlim(specgram: jnp.ndarray, window: np.ndarray, n_fft: int,
               hop_length: int, n_iter: int = 200, momentum: float = 0.99,
               stereo: bool = True, stereo_coherence: float = 0.67,
               length: Optional[int] = None, rand_init: bool = False,
               key: Optional[jax.Array] = None,
               backend: Optional[str] = None,
               work_dtype: str = "float32",
               phase_init: str = "flat") -> jnp.ndarray:
    """Reconstruct audio from magnitudes.

    specgram: (B, C, frames, bins) linear magnitudes (note frames-major
    layout, unlike the reference's (.., bins, frames)).
    Returns (B, C, T) with T = (frames-1)*hop (or ``length``).

    ``work_dtype="bfloat16"`` carries the iterated phases/spectra in bf16
    (half the HBM traffic; the final magnitude-weighted istft stays fp32) —
    the loop is self-correcting so convergence quality is barely affected.
    """
    if not 0 <= momentum < 1:
        raise ValueError(f"momentum must be in [0, 1), got {momentum}")
    mom = momentum / (1.0 + momentum)

    b, c = specgram.shape[:2]
    spec = specgram.astype(jnp.float32)
    if stereo and c > 1:
        merged = jnp.mean(spec, axis=1, keepdims=True)
        merged = jnp.broadcast_to(merged, spec.shape)
    else:
        merged = spec
    # materialize the loop-invariant magnitudes so the caller's producer
    # chain (mel unscale matmul, **(1/abs_exponent), transposes) can never
    # be rematerialized inside the loop when composed into a larger jit
    spec, merged = jax.lax.optimization_barrier((spec, merged))

    if phase_init not in ("flat", "spsi"):
        raise ValueError(f"phase_init must be 'flat' or 'spsi', got "
                         f"{phase_init!r}")
    if rand_init:
        if key is None:
            key = jax.random.PRNGKey(0)
        kr, ki = jax.random.split(key)
        ang_r = jax.random.normal(kr, spec.shape, jnp.float32)
        ang_i = jax.random.normal(ki, spec.shape, jnp.float32)
    elif phase_init == "spsi":
        phi = spsi_phase(spec, n_fft, hop_length)
        ang_r = jnp.cos(phi)
        ang_i = jnp.sin(phi)
    else:
        ang_r = jnp.ones_like(spec)
        ang_i = jnp.zeros_like(spec)

    istft_fn = partial(_istft, window=window, n_fft=n_fft,
                       hop_length=hop_length, backend=backend)
    istft_pair_fn = partial(_istft_pair, window=window, n_fft=n_fft,
                            hop_length=hop_length, backend=backend)
    stft_pair_fn = partial(_stft_pair, window=window, n_fft=n_fft,
                           hop_length=hop_length, backend=backend)

    wd = jnp.dtype(work_dtype)

    spec_w = spec.astype(wd)
    merged_w = merged.astype(wd)
    mom_w = jnp.asarray(mom, wd)

    def body(i, carry):
        # the WHOLE iteration runs in the work dtype — transforms AND the
        # elementwise chain (each fp32 pass over the (B,C,frames,bins)
        # spectra costs ~140 MB of HBM at the flagship size); the loop is
        # self-correcting, and the final istft below stays fp32
        ang_r, ang_i, prev_r, prev_i = carry
        t = (i.astype(jnp.float32) / n_iter - stereo_coherence).astype(wd)
        interp = jnp.where(t > 0, merged_w + (spec_w - merged_w) * t, merged_w)
        x_r = ang_r * interp
        x_i = ang_i * interp
        inverse = istft_pair_fn(x_r, x_i)
        rr, ri = stft_pair_fn(inverse)
        # small-n FFT paths compute fp32 regardless of input dtype
        rr, ri = rr.astype(wd), ri.astype(wd)
        nr = rr - mom_w * prev_r
        ni = ri - mom_w * prev_i
        mag = jnp.sqrt(nr * nr + ni * ni) + jnp.asarray(1e-12, wd)
        return (nr / mag, ni / mag, rr, ri)

    init = (ang_r.astype(wd), ang_i.astype(wd),
            jnp.zeros_like(ang_r, wd), jnp.zeros_like(ang_i, wd))
    ang_r, ang_i, _, _ = jax.lax.fori_loop(0, n_iter, body, init)
    ang_r = ang_r.astype(jnp.float32)
    ang_i = ang_i.astype(jnp.float32)
    return istft_fn(jax.lax.complex(ang_r * spec, ang_i * spec), length=length)
