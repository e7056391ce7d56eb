"""MDCT / IMDCT / MCLT as MXU matmuls against precomputed bases.

The reference computes the lapped MDCT via unfold -> window -> pre-twiddle ->
FFT -> post-twiddle (reference: src/utils/mdct/functional.py:52-131, inverse
:136-211; complex MCLT variant src/utils/mclt.py:87-130). Every step is a
fixed linear map for a given window, so the TPU-native formulation folds the
whole chain into one real (or complex-pair) basis matrix built host-side in
float64: a frame of length L maps to N = L/2 coefficients via a single
(L, N) matmul — ideal for the MXU at this project's fixed sizes (L = 512).

Output layout matches the reference: ``mdct`` returns (..., N, frames)
(freq-major), ``mclt`` returns (..., frames, N).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .stft import frame_signal, overlap_add
from .windows import get_window

_PREC = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=16)
def _mdct_bases(window_key: Tuple, win_length: int):
    """Forward/backward MDCT bases with all scaling folded in.

    forward:  spec[k]  = sum_n frame[n] * Bf[n, k]   (+ i * Bf_im for MCLT)
    backward: frame[n] = sum_k spec[k]  * Bi[k, n]
    """
    window = _window_from_key(window_key, win_length)
    L = win_length
    N = L // 2
    n = np.arange(L, dtype=np.float64)
    k = np.arange(N, dtype=np.float64)
    scaling = 1.0 / np.sqrt(L * N)
    # forward: window * pre_twiddle e^{-i pi n / L} * DFT * post_twiddle
    pre = np.exp(-1j * np.pi / L * n)                       # (L,)
    post = np.exp(-1j * np.pi / L * (L / 2 + 1) * (k + 0.5))  # (N,)
    dft = np.exp(-2j * np.pi * np.outer(n, k) / L)          # (L, N)
    bf = (window[:, None] * pre[:, None] * dft) * post[None, :] * scaling
    # backward: pre2 on k, 2N-point DFT over k, post2 on n, * 2 * window
    pre2 = np.exp(-1j * np.pi / (2 * N) * (N + 1) * k)      # (N,)
    n_out = np.arange(0.5 + N / 2, 2 * N + N / 2 + 0.5, dtype=np.float64)
    post2 = np.exp(-1j * np.pi / (2 * N) * n_out) / N       # (L,)
    dft2 = np.exp(-2j * np.pi * np.outer(k, np.arange(L)) / L)  # (N, L)
    bi = np.real(pre2[:, None] * dft2 * post2[None, :]) * 2.0 * window[None, :] / scaling
    return (bf.real.astype(np.float32), bf.imag.astype(np.float32),
            bi.astype(np.float32))


def _window_from_key(window_key: Tuple, win_length: int) -> np.ndarray:
    name, kwargs = window_key
    return get_window(name, win_length, **dict(kwargs))


def _win_key(window_fn: str, window_kwargs: Optional[dict]) -> Tuple:
    return (window_fn, tuple(sorted((window_kwargs or {}).items())))


def mdct(x: jnp.ndarray, win_length: int, window_fn: str = "sin_mdct",
         window_kwargs: Optional[dict] = None, padding: bool = True,
         return_complex: bool = False):
    """MDCT of (..., T) -> (..., N, frames), N = win_length//2.

    With ``return_complex=True`` returns the complex MCLT coefficients as a
    (real, imag) pair of real arrays (TPU-friendly split representation).
    Framing/padding matches the reference (reflect pad by hop, frames =
    ceil(T/hop) + 1 after the trailing-frame drop).
    """
    bf_r, bf_i, _ = _mdct_bases(_win_key(window_fn, window_kwargs), win_length)
    hop = win_length // 2
    t = x.shape[-1]
    n_frames = -(-t // hop) + 1
    if padding:
        padw = [(0, 0)] * (x.ndim - 1) + [(hop, (n_frames + 1) * hop - t)]
        x = jnp.pad(x, padw, mode="reflect")
    frames = frame_signal(x, win_length, hop)          # (..., F+1, L)
    if padding:
        frames = frames[..., :-1, :]                   # drop trailing frame
    xr = frames.astype(jnp.float32)
    re = jnp.matmul(xr, jnp.asarray(bf_r), precision=_PREC)
    re = jnp.swapaxes(re, -1, -2)                      # (..., N, F)
    if not return_complex:
        return re
    im = jnp.matmul(xr, jnp.asarray(bf_i), precision=_PREC)
    return re, jnp.swapaxes(im, -1, -2)


def imdct(spec: jnp.ndarray, win_length: int, window_fn: str = "sin_mdct",
          window_kwargs: Optional[dict] = None, padding: bool = True) -> jnp.ndarray:
    """Inverse MDCT of (..., N, frames) -> (..., T), T = hop*(frames-1)."""
    _, _, bi = _mdct_bases(_win_key(window_fn, window_kwargs), win_length)
    hop = win_length // 2
    y = jnp.swapaxes(spec, -1, -2).astype(jnp.float32)  # (..., F, N)
    frames = jnp.matmul(y, jnp.asarray(bi), precision=_PREC)  # (..., F, L)
    sig = overlap_add(frames, hop)
    if padding:
        sig = sig[..., hop: sig.shape[-1] - hop]
    return sig


# ---------------------------------------------------------------------------
# MCLT (the older complex lapped transform; reference: src/utils/mclt.py)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _mclt_bases(window_key: Tuple, block_width: int):
    (name, kwargs_t) = window_key
    kwargs = dict(kwargs_t)
    exponent = kwargs.pop("exponent", 1.0)
    if exponent == 0:
        window = np.ones(block_width, dtype=np.float64)
    else:
        window = get_window(name, block_width, **kwargs) ** exponent
    L = block_width
    N = L // 2
    n = np.arange(L, dtype=np.float64)
    k = np.arange(N, dtype=np.float64) + 0.5
    pre = np.exp(-1j * np.pi / 2 / N * n)
    post = np.exp(-1j * np.pi / 2 / N * (N + 1) * k)
    # forward fft norm="forward" (divide by L), output scale 2*sqrt(N)
    dft = np.exp(-2j * np.pi * np.outer(n, np.arange(N)) / L) / L
    bf = (window * pre)[:, None] * dft * post[None, :] * (2.0 * N ** 0.5)
    # inverse: ifft(x/post, norm="backward" => 1/L, n=L)/pre * window,
    # final *2 sqrt(N)
    idft = np.exp(2j * np.pi * np.outer(np.arange(N), n) / L) / L  # (N, L)
    bi = (1.0 / post)[:, None] * idft * (window / pre)[None, :] * (2.0 * N ** 0.5)
    return (bf.real.astype(np.float32), bf.imag.astype(np.float32),
            bi.real.astype(np.float32), bi.imag.astype(np.float32))


def mclt(x: jnp.ndarray, block_width: int, window_fn: str = "hann",
         window_exponent: float = 1.0):
    """Complex MCLT of (..., T) -> (real, imag) each (..., frames, N).

    ``window_exponent`` raises the named window to a power (the reference's
    blackman_harris**17/58 and hann**e tuned windows, src/utils/mclt.py:104).
    """
    bf_r, bf_i, _, _ = _mclt_bases(
        _win_key(window_fn, {"exponent": window_exponent}), block_width)
    hop = block_width // 2
    t = x.shape[-1]
    pad_r = hop + (hop - t % hop) % hop
    padw = [(0, 0)] * (x.ndim - 1) + [(hop, pad_r)]
    x = jnp.pad(x, padw, mode="reflect")
    frames = frame_signal(x, block_width, hop).astype(jnp.float32)
    re = jnp.matmul(frames, jnp.asarray(bf_r), precision=_PREC)
    im = jnp.matmul(frames, jnp.asarray(bf_i), precision=_PREC)
    return re, im


def imclt(spec_r: jnp.ndarray, spec_i: jnp.ndarray, block_width: int,
          window_fn: str = "hann", window_exponent: float = 1.0) -> jnp.ndarray:
    """Inverse MCLT of (..., frames, N) pair -> real (..., T)."""
    _, _, bi_r, bi_i = _mclt_bases(
        _win_key(window_fn, {"exponent": window_exponent}), block_width)
    hop = block_width // 2
    frames = (jnp.matmul(spec_r, jnp.asarray(bi_r), precision=_PREC)
              - jnp.matmul(spec_i, jnp.asarray(bi_i), precision=_PREC))
    sig = overlap_add(frames, hop)
    return sig[..., hop: sig.shape[-1] - hop]
