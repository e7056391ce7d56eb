"""FFT backend abstraction for TPU.

XLA's TPU FFT support is limited (non-power-of-2 sizes fall off the fast
path), so every DSP op in this framework routes real FFTs through this module
instead of calling ``jnp.fft`` directly. Two backends:

  * ``"fft"``     — ``jnp.fft.rfft/irfft`` (always correct; fast on CPU).
  * ``"matmul"``  — DFT as an MXU matmul against precomputed cos/sin bases.
    For the fixed, known-at-trace-time sizes used by this project
    (512-pt MDCT, 4096/6400-pt STFT) the bases are compile-time constants
    living in HBM and the transform becomes one or two large matmuls —
    the TPU-native formulation (SURVEY.md §2.9 item 4).

``set_default_backend`` flips the global default; "auto" picks matmul on TPU
and fft elsewhere. Matmul bases are cached per (n, dtype).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_DEFAULT_BACKEND = "auto"

# transforms at least this long use a two-stage Cooley-Tukey factorization
# in the matmul backend (cost N*(N1+N2) instead of N^2)
_FACTORIZE_MIN_N = 1024

# MXU precision for the matmul-DFT stages:
#   "highest" = f32 (6-pass bf16 emulation on TPU, exact)
#   "high"    = bf16_3x (~3-pass, ~f32-quality for these magnitudes)
#   "default" = single-pass bf16 (fastest; fine for iterative FGLA phases)
_MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def set_default_backend(backend: str) -> None:
    global _DEFAULT_BACKEND
    assert backend in ("auto", "fft", "matmul")
    _DEFAULT_BACKEND = backend


def set_matmul_precision(name: str) -> None:
    """Set the MXU precision used by the matmul-DFT backend."""
    global _MATMUL_PRECISION
    _MATMUL_PRECISION = {"highest": jax.lax.Precision.HIGHEST,
                         "high": jax.lax.Precision.HIGH,
                         "default": jax.lax.Precision.DEFAULT}[name]


def _resolve(backend: Optional[str]) -> str:
    b = backend or _DEFAULT_BACKEND
    if b == "auto":
        return "matmul" if jax.default_backend() == "tpu" else "fft"
    return b


@functools.lru_cache(maxsize=32)
def _rdft_basis(n: int):
    """(n, n//2+1) cos/sin bases for rfft: X = x @ (C - iS)."""
    k = np.arange(n // 2 + 1, dtype=np.float64)
    t = np.arange(n, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(t, k) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _irdft_basis(n: int):
    """(n//2+1, n) bases for irfft: x = Re(X) @ A + Im(X) @ B."""
    k = np.arange(n // 2 + 1, dtype=np.float64)
    t = np.arange(n, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(k, t) / n
    w = np.full(n // 2 + 1, 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    a = (w[:, None] * np.cos(ang) / n).astype(np.float32)
    b = (-w[:, None] * np.sin(ang) / n).astype(np.float32)
    return a, b




def _work_dtype(dt) -> jnp.dtype:
    """bf16 inputs stay bf16 through the matmul-DFT stages (halves HBM
    traffic of the big frame/spectrum tensors; MXU takes bf16 natively at
    'default'/'high' precision); everything else computes in fp32."""
    return jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32


def _best_factorization(n: int) -> Optional[tuple]:
    """Pick n = n1*n2 with n1,n2 as close to sqrt(n) as possible."""
    best = None
    r = int(np.sqrt(n))
    for n1 in range(r, 1, -1):
        if n % n1 == 0:
            best = (n1, n // n1)
            break
    return best


@functools.lru_cache(maxsize=16)
def _ct_bases(n: int):
    """Two-stage Cooley-Tukey constants for a full complex DFT of size n=n1*n2.

    x viewed as (n1, n2) with index t = t1*n2 + t2;  output k = k1 + n1*k2.
    X[k1, k2] = sum_t2 [ W_n^{t2*k1} * sum_t1 x[t1,t2] W_n1^{t1*k1} ] W_n2^{t2*k2}
    i.e. DFT_n1 along axis0, twiddle, DFT_n2 along axis1.
    """
    n1, n2 = _best_factorization(n)
    def dft_mat(m):
        idx = np.arange(m)
        w = np.exp(-2j * np.pi * np.outer(idx, idx) / m)
        return w
    f1 = dft_mat(n1)                                # (n1, n1) applied on t1
    f2 = dft_mat(n2)                                # (n2, n2) applied on t2
    t2 = np.arange(n2)[:, None]
    k1 = np.arange(n1)[None, :]
    tw = np.exp(-2j * np.pi * (t2 * k1) / n)        # (n2, n1)
    return n1, n2, (f1.real.astype(np.float32), f1.imag.astype(np.float32)), \
        (f2.real.astype(np.float32), f2.imag.astype(np.float32)), \
        (tw.real.astype(np.float32), tw.imag.astype(np.float32))


def _cmatmul(ar, ai, br, bi, prec=None):
    """(ar + i ai) @ (br + i bi) as four real MXU matmuls (3-mult Karatsuba
    is slower on MXU than 4 plain matmuls due to extra adds)."""
    prec = prec or _MATMUL_PRECISION
    rr = jnp.matmul(ar, br, precision=prec) - jnp.matmul(ai, bi, precision=prec)
    ri = jnp.matmul(ar, bi, precision=prec) + jnp.matmul(ai, br, precision=prec)
    return rr, ri


def _fft_ct(xr: jnp.ndarray, xi: Optional[jnp.ndarray], n: int):
    """Two-stage Cooley-Tukey full complex DFT via MXU matmuls.

    Input (..., n) split real/imag (xi=None for real input); returns
    (real, imag) each (..., n) with standard DFT ordering.
    """
    n1, n2, (f1r, f1i), (f2r, f2i), (twr, twi) = _ct_bases(n)
    lead = xr.shape[:-1]
    prec = _MATMUL_PRECISION
    wd = _work_dtype(xr.dtype)
    f1r, f1i = jnp.asarray(f1r, wd), jnp.asarray(f1i, wd)
    f2r, f2i = jnp.asarray(f2r, wd), jnp.asarray(f2i, wd)
    twr, twi = twr.astype(wd), twi.astype(wd)
    ar = xr.reshape(lead + (n1, n2)).astype(wd)
    ai = xi.reshape(lead + (n1, n2)).astype(wd) if xi is not None else None
    # stage 1: DFT over t1 (contract axis -2 with f1): y[k1, t2]
    yr = jnp.einsum("...tn,tk->...kn", ar, f1r, precision=prec)
    yi = jnp.einsum("...tn,tk->...kn", ar, f1i, precision=prec)
    if ai is not None:
        yr = yr - jnp.einsum("...tn,tk->...kn", ai, f1i, precision=prec)
        yi = yi + jnp.einsum("...tn,tk->...kn", ai, f1r, precision=prec)
    # twiddle: multiply by W_n^{t2*k1}; y is (..., k1, t2), tw is (t2, k1)
    twr_t, twi_t = twr.T, twi.T                    # (n1, n2)
    zr = yr * twr_t - yi * twi_t
    zi = yr * twi_t + yi * twr_t
    # stage 2: DFT over t2: X[k1, k2] — contract last axis with f2
    xrr, xri = _cmatmul(zr, zi, f2r, f2i)
    # X[k] with k = k1 + n1*k2 -> transpose (k2 major)
    full_r = jnp.swapaxes(xrr, -1, -2).reshape(lead + (n,))
    full_i = jnp.swapaxes(xri, -1, -2).reshape(lead + (n,))
    return full_r, full_i


@functools.lru_cache(maxsize=16)
def _pack_twiddles(n: int):
    """e^{-2 pi i k / n} for k = 0..n/2 (forward) and its conjugate."""
    k = np.arange(n // 2 + 1, dtype=np.float64)
    ang = 2.0 * np.pi * k / n
    return (np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32))


def _rfft_pair_ct(x: jnp.ndarray, n: int):
    """Packed real FFT: one half-size complex CT transform + O(n) combine.

    z[m] = x[2m] + i x[2m+1]; X built from Z and its reversal — half the
    matmul data movement of a full-size transform and no hermitian pass.
    Returns (real, imag).
    """
    m = n // 2
    if m % 2 != 0 or _best_factorization(m) is None or _best_factorization(m)[0] == 1:
        full_r, full_i = _fft_ct(x, None, n)
        bins = n // 2 + 1
        return full_r[..., :bins], full_i[..., :bins]
    lead = x.shape[:-1]
    wd = _work_dtype(x.dtype)
    xe = x[..., 0::2].astype(wd)
    xo = x[..., 1::2].astype(wd)
    zr, zi = _fft_ct(xe, xo, m)
    # Z[(M-k) mod M]: index 0 stays, rest reversed
    zr_rev = jnp.concatenate([zr[..., :1], jnp.flip(zr[..., 1:], -1)], axis=-1)
    zi_rev = jnp.concatenate([zi[..., :1], jnp.flip(zi[..., 1:], -1)], axis=-1)
    # extend to k = 0..M (bins) with Z[M] = Z[0]
    zr_e = jnp.concatenate([zr, zr[..., :1]], axis=-1)
    zi_e = jnp.concatenate([zi, zi[..., :1]], axis=-1)
    zr_r = jnp.concatenate([zr_rev, zr_rev[..., :1]], axis=-1)
    zi_r = jnp.concatenate([zi_rev, zi_rev[..., :1]], axis=-1)
    # Xe = (Z + conj(Zrev))/2 ; Xo = (Z - conj(Zrev))/(2i)
    xe_r = 0.5 * (zr_e + zr_r)
    xe_i = 0.5 * (zi_e - zi_r)
    xo_r = 0.5 * (zi_e + zi_r)
    xo_i = -0.5 * (zr_e - zr_r)
    twr, twi = _pack_twiddles(n)
    twr, twi = twr.astype(xe_r.dtype), twi.astype(xe_r.dtype)
    out_r = xe_r + xo_r * twr - xo_i * twi
    out_i = xe_i + xo_r * twi + xo_i * twr
    return out_r, out_i


def _rfft_matmul_ct(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return jax.lax.complex(*_rfft_pair_ct(x, n))


def _irfft_pair_ct(sr: jnp.ndarray, si: jnp.ndarray, n: int) -> jnp.ndarray:
    """Packed inverse real FFT: O(n) combine + one half-size complex inverse
    CT transform (even/odd interleave), avoiding the hermitian extension and
    a full-size transform entirely. Takes (real, imag)."""
    m = n // 2
    bins = n // 2 + 1
    wd = _work_dtype(sr.dtype)
    sr = sr[..., :bins].astype(wd)
    si = si[..., :bins].astype(wd)
    if m % 2 != 0 or _best_factorization(m) is None or _best_factorization(m)[0] == 1:
        ext_r = jnp.flip(sr[..., 1: n - bins + 1], axis=-1)
        ext_i = -jnp.flip(si[..., 1: n - bins + 1], axis=-1)
        fr = jnp.concatenate([sr, ext_r], axis=-1)
        fi = jnp.concatenate([si, ext_i], axis=-1)
        yr, _ = _fft_ct(fr, -fi, n)
        return yr / n
    # irfft semantics: the DC and Nyquist bins are treated as real
    si = si.at[..., 0].set(0.0).at[..., -1].set(0.0)
    # Xe[k] = (X[k] + conj(X[M-k]))/2 ; Xo[k] = (X[k]-conj(X[M-k]))*tw+ / 2
    xr_rev = jnp.flip(sr, axis=-1)   # X[M-k], k = 0..M
    xi_rev = jnp.flip(si, axis=-1)
    xe_r = 0.5 * (sr + xr_rev)
    xe_i = 0.5 * (si - xi_rev)
    dr = 0.5 * (sr - xr_rev)
    di = 0.5 * (si + xi_rev)
    twr, twi = _pack_twiddles(n)     # e^{-i ang}; conj -> (twr, -twi)
    twr, twi = twr.astype(dr.dtype), twi.astype(dr.dtype)
    xo_r = dr * twr + di * twi       # (dr + i di) * e^{+i ang} real part
    xo_i = di * twr - dr * twi
    # Z[k] = Xe[k] + i Xo[k], k = 0..M-1
    zr = (xe_r - xo_i)[..., :m]
    zi = (xe_i + xo_r)[..., :m]
    # z = IDFT_M(Z) = conj(DFT_M(conj(Z))) / M
    yr, yi = _fft_ct(zr, -zi, m)
    zr_t = yr / m
    zi_t = -yi / m
    # interleave: x[2m] = Re z, x[2m+1] = Im z
    out = jnp.stack([zr_t, zi_t], axis=-1)
    return out.reshape(out.shape[:-2] + (n,))


def _irfft_matmul_ct(spec: jnp.ndarray, n: int) -> jnp.ndarray:
    return _irfft_pair_ct(jnp.real(spec), jnp.imag(spec), n)


def rfft(x: jnp.ndarray, n: Optional[int] = None, backend: Optional[str] = None) -> jnp.ndarray:
    """Real FFT along the last axis -> complex (..., n//2+1)."""
    n = n or x.shape[-1]
    if _resolve(backend) == "fft":
        return jnp.fft.rfft(x, n=n)
    if x.shape[-1] != n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
        x = jnp.pad(x, pad)
    if n >= _FACTORIZE_MIN_N and _best_factorization(n) is not None \
            and _best_factorization(n)[0] > 1:
        return _rfft_matmul_ct(x, n)
    c, s = _rdft_basis(n)
    xr = x.astype(jnp.float32)
    re = jnp.matmul(xr, c, precision=_MATMUL_PRECISION)
    im = -jnp.matmul(xr, s, precision=_MATMUL_PRECISION)
    return jax.lax.complex(re, im)


def irfft(x: jnp.ndarray, n: Optional[int] = None, backend: Optional[str] = None) -> jnp.ndarray:
    """Inverse real FFT along the last axis -> real (..., n)."""
    n = n or 2 * (x.shape[-1] - 1)
    if _resolve(backend) == "fft":
        return jnp.fft.irfft(x, n=n)
    if n >= _FACTORIZE_MIN_N and _best_factorization(n) is not None \
            and _best_factorization(n)[0] > 1:
        return _irfft_matmul_ct(x, n)
    a, b = _irdft_basis(n)
    re = jnp.real(x).astype(jnp.float32)
    im = jnp.imag(x).astype(jnp.float32)
    bins = n // 2 + 1
    re, im = re[..., :bins], im[..., :bins]
    return (jnp.matmul(re, a, precision=_MATMUL_PRECISION)
            + jnp.matmul(im, b, precision=_MATMUL_PRECISION))


def rfft_pair(x: jnp.ndarray, n: Optional[int] = None,
              backend: Optional[str] = None):
    """Real FFT -> (real, imag) pair, skipping the complex64 packing pass
    (one full-tensor copy each way at FGLA sizes)."""
    n = n or x.shape[-1]
    if _resolve(backend) == "fft":
        out = jnp.fft.rfft(x, n=n)
        return jnp.real(out), jnp.imag(out)
    if x.shape[-1] != n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
        x = jnp.pad(x, pad)
    if n >= _FACTORIZE_MIN_N and _best_factorization(n) is not None \
            and _best_factorization(n)[0] > 1:
        return _rfft_pair_ct(x, n)
    c, s_ = _rdft_basis(n)
    xr = x.astype(jnp.float32)
    return (jnp.matmul(xr, c, precision=_MATMUL_PRECISION),
            -jnp.matmul(xr, s_, precision=_MATMUL_PRECISION))


def irfft_pair(re: jnp.ndarray, im: jnp.ndarray, n: Optional[int] = None,
               backend: Optional[str] = None) -> jnp.ndarray:
    """Inverse real FFT from a (real, imag) pair -> real signal."""
    n = n or 2 * (re.shape[-1] - 1)
    if _resolve(backend) == "fft":
        return jnp.fft.irfft(jax.lax.complex(re.astype(jnp.float32),
                                             im.astype(jnp.float32)), n=n)
    if n >= _FACTORIZE_MIN_N and _best_factorization(n) is not None \
            and _best_factorization(n)[0] > 1:
        return _irfft_pair_ct(re, im, n)
    a, b = _irdft_basis(n)
    bins = n // 2 + 1
    re = re[..., :bins].astype(jnp.float32)
    im = im[..., :bins].astype(jnp.float32)
    return (jnp.matmul(re, a, precision=_MATMUL_PRECISION)
            + jnp.matmul(im, b, precision=_MATMUL_PRECISION))


def fft_c(xr: jnp.ndarray, xi: jnp.ndarray, n: int, backend: Optional[str] = None):
    """Complex FFT along last axis given (real, imag) parts -> (real, imag).

    Used by the MDCT/MCLT twiddle path where inputs are already split.
    """
    if _resolve(backend) == "fft":
        out = jnp.fft.fft(jax.lax.complex(xr, xi), n=n)
        return jnp.real(out), jnp.imag(out)
    fr, fi = _full_dft_basis(n)
    if xr.shape[-1] != n:
        pad = [(0, 0)] * (xr.ndim - 1) + [(0, n - xr.shape[-1])]
        xr, xi = jnp.pad(xr, pad), jnp.pad(xi, pad)
    return _cmatmul(xr.astype(jnp.float32), xi.astype(jnp.float32), fr, fi)


@functools.lru_cache(maxsize=16)
def _full_dft_basis(n: int):
    idx = np.arange(n, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(idx, idx) / n
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)
