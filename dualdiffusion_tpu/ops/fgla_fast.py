"""Fast FGLA: digit-order polyphase formulation of the Griffin-Lim loop.

Numerically equivalent to ops.fgla.griffinlim (same momentum / stereo
annealing semantics, reference: src/modules/formats/old/phase_recovery.py:
39-129) but restructured so one iteration is pure MXU matmuls plus
elementwise work in a single consistent layout:

  * Spectra live on the Cooley-Tukey DIGIT GRID (k1, k2) with
    k = k1 + n1*k2, n = n1*n2, n2 = 128 (one lane tile). The forward
    transform is decimation-in-time (digit-ordered output), the inverse is
    decimation-in-frequency (digit-ordered input), so the loop NEVER
    reorders bins — the O(n)-element transposes/copies XLA inserted
    between CT stages of the natural-order path (measured: ~10 full-size
    layout copies, ~1.4 GB/iter at the flagship size) vanish. Target
    magnitudes are permuted into digit order ONCE outside the loop.
  * Time-domain frames live on the matching polyphase grid (t1, t2),
    t = t1*n2 + t2 — rows of 128 samples. hop = hop_rows * n2, so
    overlap-add and re-framing are row-aligned shifts.
  * The loop state is the full hermitian spectrum (n bins, digit order).
    Hermitian symmetry is preserved by every step (magnitudes are
    symmetric, phase ops are elementwise, transforms of real frames are
    hermitian), so taking Re() of the inverse is exact.
  * The window -> OLA -> envelope -> reflect-pad -> reframe -> window
    middle runs either as jnp ops (reference implementation, any backend)
    or as one fused Pallas kernel holding the signal rows in VMEM
    (ops/pallas/ola_reframe.py).

The final waveform is synthesized by the existing fp32 istft path for
bit-compatibility with ops.fgla at the output boundary.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as _fft
from .stft import istft as _istft, _overlap_add_np, _pad_center


# ---------------------------------------------------------------------------
# digit-order CT transforms
# ---------------------------------------------------------------------------

def _digit_factorization(n: int, n2: int = 128):
    assert n % n2 == 0, f"n={n} must be a multiple of {n2}"
    return n // n2, n2


@functools.lru_cache(maxsize=8)
def _digit_bases(n: int, n2: int = 128, n1p: Optional[int] = None):
    """DIT bases for the (n1, n2) digit grid (see _fft._ct_bases for the
    factorized-DFT identity; here outputs stay on the grid).

    ``n1p`` zero-pads the n1 axis of every basis to a TPU-sublane-aligned
    storage size: padded t1/k1 rows then contribute/receive exactly zero,
    so grid arrays may carry garbage-free zero pad rows end-to-end.
    """
    return _digit_bases_cached(n, n2, n1p or (n // n2))


@functools.lru_cache(maxsize=8)
def _digit_bases_cached(n: int, n2: int, n1p: int):
    n1, n2 = _digit_factorization(n, n2)
    i1 = np.arange(n1)
    i2 = np.arange(n2)
    f1 = np.zeros((n1p, n1p), np.complex128)              # (t1, k1)
    f1[:n1, :n1] = np.exp(-2j * np.pi * np.outer(i1, i1) / n1)
    f2 = np.exp(-2j * np.pi * np.outer(i2, i2) / n2)      # (t2, k2)
    tw = np.zeros((n1p, n2), np.complex128)               # (k1, t2)
    tw[:n1] = np.exp(-2j * np.pi * np.outer(i1, i2) / n)
    c = lambda m: (m.real.astype(np.float32), m.imag.astype(np.float32))
    return n1, n2, c(f1), c(f2), c(tw)


def dft_digit_fwd(x: jnp.ndarray, n: int, prec=None):
    """Real frames (..., n1[p], n2) [t1, t2] -> digit-order spectrum
    (re, im) each (..., n1[p], n2) [k1, k2], k = k1 + n1*k2. Pad rows
    (t1 >= n1) are ignored; pad output rows are zero."""
    n1, n2, (f1r, f1i), (f2r, f2i), (twr, twi) = _digit_bases(
        n, x.shape[-1], x.shape[-2])
    prec = prec or _fft._MATMUL_PRECISION
    wd = _fft._work_dtype(x.dtype)
    x = x.astype(wd)
    e = functools.partial(jnp.einsum, precision=prec)
    # stage 1: contract t1 -> (k1, t2)
    yr = e("...tw,tk->...kw", x, jnp.asarray(f1r, wd))
    yi = e("...tw,tk->...kw", x, jnp.asarray(f1i, wd))
    # twiddle W_n^{k1 t2}
    twr = jnp.asarray(twr, wd)
    twi = jnp.asarray(twi, wd)
    zr = yr * twr - yi * twi
    zi = yr * twi + yi * twr
    # stage 2: contract t2 (lane dim) -> (k1, k2)
    f2r = jnp.asarray(f2r, wd)
    f2i = jnp.asarray(f2i, wd)
    xr = e("...kw,wj->...kj", zr, f2r) - e("...kw,wj->...kj", zi, f2i)
    xi = e("...kw,wj->...kj", zr, f2i) + e("...kw,wj->...kj", zi, f2r)
    return xr, xi


def dft_digit_inv(xr: jnp.ndarray, xi: jnp.ndarray, n: int, prec=None):
    """Digit-order spectrum (..., n1[p], n2) [k1, k2] -> real frames
    (..., n1[p], n2) [t1, t2] (Re of the inverse DFT; exact for hermitian
    input). DIF: consumes digit order directly — no reordering."""
    n1, n2, (f1r, f1i), (f2r, f2i), (twr, twi) = _digit_bases(
        n, xr.shape[-1], xr.shape[-2])
    prec = prec or _fft._MATMUL_PRECISION
    wd = _fft._work_dtype(xr.dtype)
    xr = xr.astype(wd)
    xi = xi.astype(wd)
    e = functools.partial(jnp.einsum, precision=prec)
    # stage 1: contract k2 with conj(f2)/n2 -> (k1, t2)
    g2r = jnp.asarray(f2r / n2, wd)       # conj: (re, -im)
    g2i = jnp.asarray(-f2i / n2, wd)
    yr = e("...kj,wj->...kw", xr, g2r.T) - e("...kj,wj->...kw", xi, g2i.T)
    yi = e("...kj,wj->...kw", xr, g2i.T) + e("...kj,wj->...kw", xi, g2r.T)
    # conj twiddle
    twr = jnp.asarray(twr, wd)
    twi = jnp.asarray(twi, wd)
    zr = yr * twr + yi * twi
    zi = yi * twr - yr * twi
    # stage 2: contract k1 with conj(f1)/n1, Re only -> (t1, t2)
    g1r = jnp.asarray(f1r / n1, wd)
    g1i = jnp.asarray(f1i / n1, wd)       # conj handled in the combination
    out = e("...kw,kt->...tw", zr, g1r) + e("...kw,kt->...tw", zi, g1i)
    return out


def natural_to_digit(x: jnp.ndarray, n: int):
    """(..., n) natural bin order -> (..., n1, n2) digit grid [k1, k2]."""
    n1, n2 = _digit_factorization(n)
    # k = k1 + n1*k2: natural order is k2-major -> reshape (n2, n1), swap
    return jnp.swapaxes(x.reshape(x.shape[:-1] + (n2, n1)), -1, -2)


def digit_to_natural(x: jnp.ndarray, n: int):
    n1, n2 = _digit_factorization(n)
    return jnp.swapaxes(x, -1, -2).reshape(x.shape[:-2] + (n,))


def hermitian_extend(re: jnp.ndarray, im: jnp.ndarray, n: int):
    """(..., n//2+1) half spectrum -> (..., n) full hermitian spectrum."""
    bins = n // 2 + 1
    er = jnp.flip(re[..., 1:n - bins + 1], axis=-1)
    ei = -jnp.flip(im[..., 1:n - bins + 1], axis=-1)
    return (jnp.concatenate([re, er], axis=-1),
            jnp.concatenate([im, ei], axis=-1))


# ---------------------------------------------------------------------------
# polyphase middle: window -> OLA -> envelope -> reflect -> reframe -> window
# ---------------------------------------------------------------------------

def _reflect_edge_rows(core: jnp.ndarray, p: int, left: bool):
    """Mirror rows for torch-style reflect padding on a row grid.

    core: (..., R, n2) core signal rows (n2 samples per row). Returns the
    p pad rows in padded (top-down) order. With pad sample j = r*n2 + t2:
    the left pad maps j -> core sample p*n2 - j, the right pad maps
    j -> L - 2 - j (L = R*n2), exactly torch's 'reflect'.
    """
    if left:
        # pad_row[r][t2>=1] = core_row[p-1-r][n2-t2];
        # pad_row[r][0]     = core_row[p-r][0]
        a = jnp.flip(core[..., :p, :], axis=-2)       # a[r] = core_row[p-1-r]
        b = jnp.flip(core[..., 1:p + 1, :], axis=-2)  # b[r] = core_row[p-r]
        flipped = jnp.roll(jnp.flip(a, axis=-1), 1, axis=-1)
        return jnp.concatenate([b[..., :1], flipped[..., 1:]], axis=-1)
    # pad_row[r][t2<=n2-2] = core_row[R-1-r][n2-2-t2];
    # pad_row[r][n2-1]     = core_row[R-2-r][n2-1]
    r_tot = core.shape[-2]
    a = jnp.flip(core[..., r_tot - p:, :], axis=-2)            # core_row[R-1-r]
    b = jnp.flip(core[..., r_tot - p - 1:r_tot - 1, :], axis=-2)  # R-2-r
    flipped = jnp.roll(jnp.flip(a, axis=-1), -1, axis=-1)
    return jnp.concatenate([flipped[..., :-1], b[..., -1:]], axis=-1)


def ola_reframe_jnp(y: jnp.ndarray, win_g: jnp.ndarray, inv_env: jnp.ndarray,
                    hop_rows: int) -> jnp.ndarray:
    """Reference implementation of the fused middle on the polyphase grid.

    y: (..., F, n1, n2) raw inverse-DFT frames. win_g: (n1, n2) window.
    inv_env: (R, n2) reciprocal squared-window envelope over the OLA'd
    signal rows, R = (F-1)*hop_rows + n1. Returns (..., F, n1, n2)
    windowed re-framed frames.
    """
    f, n1, n2 = y.shape[-3:]
    h = hop_rows
    r_tot = (f - 1) * h + n1
    yw = y * win_g
    # OLA: frame t's row r1 lands on sig row t*h + r1
    sig = jnp.zeros(y.shape[:-3] + (r_tot, n2), y.dtype)
    for r1 in range(n1):
        rows = _dilate_rows(yw[..., :, r1, :], h)      # row t -> t*h
        pad_lo = r1
        pad_hi = max(0, r_tot - rows.shape[-2] - r1)
        pad = [(0, 0)] * (rows.ndim - 2) + [(pad_lo, pad_hi), (0, 0)]
        seg = jnp.pad(rows, pad)[..., :r_tot, :]
        sig = sig + seg
    sig = sig * inv_env.astype(sig.dtype)
    # crop n_fft//2 rows each side, reflect-pad back to the same length
    p = n1 // 2
    core = sig[..., p:r_tot - p, :]
    left = _reflect_edge_rows(core, p, left=True)
    right = _reflect_edge_rows(core, p, left=False)
    padded = jnp.concatenate([left, core, right], axis=-2)
    # reframe: frame t = padded rows [t*h, t*h + n1): one strided slice
    # per polyphase row (n1 slices, NOT f slices)
    cols = [jax.lax.slice_in_dim(padded, r1, r1 + (f - 1) * h + 1, stride=h,
                                 axis=-2) for r1 in range(n1)]
    frames = jnp.stack(cols, axis=-2)                  # (..., f, n1, n2)
    return frames * win_g


def _dilate_rows(rows: jnp.ndarray, h: int) -> jnp.ndarray:
    """(..., F, n2) -> (..., F*h, n2) with input row t at output row t*h."""
    if h == 1:
        return rows
    z = jnp.zeros(rows.shape[:-1] + (h - 1,) + rows.shape[-1:], rows.dtype)
    out = jnp.concatenate([rows[..., :, None, :], z], axis=-2)
    return out.reshape(rows.shape[:-2] + (rows.shape[-2] * h,) + rows.shape[-1:])


# ---------------------------------------------------------------------------
# the loop
# ---------------------------------------------------------------------------

def griffinlim_fast(specgram: jnp.ndarray, window: np.ndarray, n_fft: int,
                    hop_length: int, n_iter: int = 200,
                    momentum: float = 0.99, stereo: bool = True,
                    stereo_coherence: float = 0.67,
                    length: Optional[int] = None,
                    work_dtype: str = "bfloat16",
                    use_pallas: Optional[bool] = None,
                    fuse_transforms: Optional[bool] = None,
                    fuse_iteration: Optional[bool] = None,
                    phase_init: str = "flat") -> jnp.ndarray:
    """Drop-in equivalent of ops.fgla.griffinlim (flat phase init) using the
    digit-order polyphase iteration. specgram: (B, C, frames, bins).

    ``fuse_iteration`` (default: on-TPU when the geometry allows) runs
    the whole Griffin-Lim iteration as ONE pallas_call with an r-state
    carry and a pipelined, halo-free OLA (ops/pallas/fgla_iter.py).
    ``fuse_transforms`` (the older two-kernel path, kept as fallback)
    puts the sublane CT stages + twiddles inside the Pallas middle kernel
    (ops/pallas/fgla_middle.py) and the lane matmuls + spectral step in a
    second kernel.
    """
    if not 0 <= momentum < 1:
        raise ValueError(f"momentum must be in [0, 1), got {momentum}")
    mom = momentum / (1.0 + momentum)
    n2 = 128
    n1 = n_fft // n2
    assert n_fft % n2 == 0 and hop_length % n2 == 0
    hop_rows = hop_length // n2
    win = _pad_center(np.asarray(window, np.float64), n_fft)
    win_g_np = win.reshape(n1, n2)

    b, c, f, bins = specgram.shape
    assert bins == n_fft // 2 + 1
    spec = specgram.astype(jnp.float32)
    if stereo and c > 1:
        merged = jnp.mean(spec, axis=1, keepdims=True)
        merged = jnp.broadcast_to(merged, spec.shape)
    else:
        merged = spec

    # storage-pad the k1/t1 grid axis to the TPU sublane tile; the padded
    # rows stay exactly zero through transforms (zero basis rows) and
    # elementwise steps (zero magnitudes)
    n1p = -(-n1 // 8) * 8

    # full hermitian magnitudes on the digit grid, fixed through the loop
    def to_digit_mag(m):
        full_r, _ = hermitian_extend(m, jnp.zeros_like(m), n_fft)
        g = natural_to_digit(full_r, n_fft)
        return jnp.pad(g, [(0, 0)] * (g.ndim - 2) + [(0, n1p - n1), (0, 0)])

    spec_g, merged_g = jax.lax.optimization_barrier(
        (to_digit_mag(spec), to_digit_mag(merged)))

    # optional SPSI phase seeding (ops/fgla.spsi_phase) on the digit grid;
    # None means flat unit phases
    ang0 = None
    if phase_init == "spsi":
        from .fgla import spsi_phase
        phi = spsi_phase(spec, n_fft, hop_length)

        def to_digit(x):
            fr, fi = hermitian_extend(jnp.cos(phi) * x, jnp.sin(phi) * x,
                                      n_fft)
            out = []
            for g in (natural_to_digit(fr, n_fft),
                      natural_to_digit(fi, n_fft)):
                out.append(jnp.pad(g, [(0, 0)] * (g.ndim - 2)
                                   + [(0, n1p - n1), (0, 0)]))
            return tuple(out)

        ang0 = to_digit(jnp.ones_like(phi))
    elif phase_init != "flat":
        raise ValueError(f"phase_init must be 'flat' or 'spsi', got "
                         f"{phase_init!r}")

    # squared-window OLA envelope over signal rows (host-side constant)
    r_tot = (f - 1) * hop_rows + n1
    env = _overlap_add_np(np.broadcast_to(win ** 2, (f, n_fft)), hop_length)
    # keep the host numpy envelope: _loop_fused_iter slices its parity
    # rows host-side, and jnp-ifying first would turn it into a tracer
    # under an outer jit (the production sample_to_raw path IS jitted)
    inv_env_np = (1.0 / np.maximum(env, 1e-11)).astype(np.float32) \
        .reshape(r_tot, n2)
    inv_env = jnp.asarray(inv_env_np)

    wd = jnp.dtype(work_dtype)
    spec_w = spec_g.astype(wd)
    merged_w = merged_g.astype(wd)
    mom_w = jnp.asarray(mom, wd)
    win_gp = np.zeros((n1p, n2), np.float32)
    win_gp[:n1] = win_g_np
    win_g = jnp.asarray(win_gp, wd)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    from .pallas.fgla_iter import fgla_iter_supported
    iter_ok = hop_rows == 2 and n1 % 2 == 0 and fgla_iter_supported(f, n1)
    if fuse_iteration is None:
        # Default ON: measured on v5e (scripts/fgla_probe.py, 200 iters at
        # the flagship 5504x3201 geometry) the single-kernel loop runs
        # 1.12 s vs 1.82 s for the two-kernel path at equal convergence
        # (conv_err 0.0388 vs 0.0385). DD_FGLA_FUSE_ITER=0 forces the
        # two-kernel fallback.
        import os
        gate = os.environ.get("DD_FGLA_FUSE_ITER", "1") != "0"
        # an EXPLICIT fuse_transforms=True is a request for the two-kernel
        # path — only the all-default case dispatches to the fused iteration
        fuse_iteration = (use_pallas and fuse_transforms is None
                          and iter_ok and gate)
    elif fuse_iteration and not iter_ok:
        raise ValueError(
            f"fuse_iteration requires hop == 256, even n1 and a supported "
            f"frame count (got hop_rows={hop_rows}, n1={n1}, F={f})")
    if fuse_iteration:
        return _loop_fused_iter(spec, spec_w, merged_w, win_gp, inv_env_np,
                                mom, n_fft, n1, n1p, n2, n_iter,
                                stereo_coherence, wd, bins, length, win,
                                ang0=ang0)
    if fuse_transforms is None:
        from .pallas.fgla_middle import fgla_middle_supported
        fuse_transforms = use_pallas and fgla_middle_supported(f, n1)
    if fuse_transforms:
        return _loop_fused(spec, spec_w, merged_w, win_gp, inv_env, mom,
                           n_fft, n1, n1p, n2, hop_length, n_iter,
                           stereo_coherence, wd, bins, length, win,
                           ang0=ang0)
    if use_pallas:
        from .pallas.ola_reframe import ola_reframe

        def middle(y):
            return ola_reframe(y, win_g, inv_env, n1_true=n1,
                               hop_rows=hop_rows)
    else:
        def middle(y):
            yt = y[..., :n1, :]
            y2 = ola_reframe_jnp(yt, win_g[:n1], inv_env.astype(wd),
                                 hop_rows)
            return jnp.pad(y2, [(0, 0)] * (y2.ndim - 2)
                           + [(0, n1p - n1), (0, 0)])

    def body(i, carry):
        ang_r, ang_i, prev_r, prev_i = carry
        t = (i.astype(jnp.float32) / n_iter - stereo_coherence).astype(wd)
        interp = jnp.where(t > 0, merged_w + (spec_w - merged_w) * t,
                           merged_w)
        xr = ang_r * interp
        xi = ang_i * interp
        y = dft_digit_inv(xr, xi, n_fft)
        y2 = middle(y)
        rr, ri = dft_digit_fwd(y2, n_fft)
        rr, ri = rr.astype(wd), ri.astype(wd)
        nr = rr - mom_w * prev_r
        ni = ri - mom_w * prev_i
        mag = jnp.sqrt(nr * nr + ni * ni) + jnp.asarray(1e-12, wd)
        return (nr / mag, ni / mag, rr, ri)

    shape = (b, c, f, n1p, n2)
    if ang0 is None:
        a0_r = jnp.zeros(shape, wd).at[..., :n1, :].set(1.0)
        a0_i = jnp.zeros(shape, wd)
    else:
        a0_r, a0_i = (a.astype(wd) for a in ang0)
    init = (a0_r, a0_i,
            jnp.zeros(shape, wd), jnp.zeros(shape, wd))
    ang_r, ang_i, _, _ = jax.lax.fori_loop(0, n_iter, body, init)

    # back to natural half-spectrum order for the final fp32 synthesis
    ang_r = digit_to_natural(ang_r.astype(jnp.float32)[..., :n1, :],
                             n_fft)[..., :bins]
    ang_i = digit_to_natural(ang_i.astype(jnp.float32)[..., :n1, :],
                             n_fft)[..., :bins]
    return _istft(jax.lax.complex(ang_r * spec, ang_i * spec), win, n_fft,
                  hop_length, length=length)


def _loop_fused_iter(spec, spec_w, merged_w, win_gp, inv_env, mom, n_fft,
                     n1, n1p, n2, n_iter, stereo_coherence, wd, bins,
                     length, win, ang0=None):
    """One-pallas-call-per-iteration loop (ops/pallas/fgla_iter.py):
    HBM state is just (r_k, r_{k-1}); the kernel re-derives the phase
    input from the momentum-normalized previous spectra. Two loop
    segments: while the annealing factor t_k <= 0 the kernel variant
    that never fetches spec_w runs (interp == merged exactly)."""
    from .pallas.fgla_iter import _OVER, fgla_iter

    b, c, f = spec_w.shape[:3]
    # k1-major grids: (B, C, n1p, F, n2)
    spec_k = jnp.swapaxes(spec_w, 2, 3)
    merged_k = jnp.swapaxes(merged_w, 2, 3)
    spec_k, merged_k = jax.lax.optimization_barrier((spec_k, merged_k))

    _, _, (f1r, f1i), (f2r, f2i), (twr, twi) = _digit_bases(n_fft, n2, n1p)
    lane_inv = (f2r / n2, -f2i / n2)         # conj(f2)/n2
    lane_fwd = (f2r, f2i)
    ctw = (twr, -twi)
    ftw = (twr, twi)
    g_stack = np.hstack([(f1r / n1).T, (f1i / n1).T])    # (n1p, 2*n1p)
    f_stack = np.vstack([f1r.T, f1i.T])                  # (2*n1p, n1p)

    # parity-bank envelope rows, padded for the kernel's emission windows
    env = np.asarray(inv_env, np.float32)  # host constant (see caller)
    need = f + _OVER
    env_e = env[0::2]
    env_o = env[1::2]
    env_e = jnp.asarray(np.pad(env_e, ((0, need - env_e.shape[0]), (0, 0))))
    env_o = jnp.asarray(np.pad(env_o, ((0, need - env_o.shape[0]), (0, 0))))

    mom = float(mom)
    mom_w = jnp.asarray(mom, wd)
    sc = float(stereo_coherence)

    def call(k, carry, use_spec):
        (rk_r, rk_i), (rp_r, rp_i) = carry
        t = k.astype(jnp.float32) / n_iter - sc
        rr, ri = fgla_iter(t, rk_r, rk_i, rp_r, rp_i, spec_k, merged_k,
                           win_gp, env_e, env_o, ctw, ftw, g_stack,
                           f_stack, lane_inv, lane_fwd, mom=mom,
                           n1_true=n1, use_spec=use_spec)
        return ((rr, ri), (rk_r, rk_i))

    shape = (b, c, n1p, f, n2)
    zeros = jnp.zeros(shape, wd)
    # iteration 0 unrolled: seeding r_0 = merged * ang0 reproduces the
    # requested phase init (normalize(merged*ang0 - 0) is ang0 on live
    # bins, dead bins contribute 0 either way) -- but the seed must NOT
    # leak into iteration 1's momentum term (the legacy loop has prev = 0
    # there), so prev is reset to zero right after
    if ang0 is None:
        seed = (merged_k, zeros)
    else:
        a0r = jnp.swapaxes(ang0[0].astype(wd), 2, 3)
        a0i = jnp.swapaxes(ang0[1].astype(wd), 2, 3)
        seed = (merged_k * a0r, merged_k * a0i)
    carry = call(jnp.asarray(0), (seed, (zeros, zeros)),
                 use_spec=sc < 0)                 # t_0 = -sc

    carry = (carry[0], (zeros, zeros))
    k_cross = min(n_iter, max(1, int(np.floor(sc * n_iter + 1e-9)) + 1))
    if k_cross > 1:
        carry = jax.lax.fori_loop(
            1, k_cross, lambda k, s: call(k, s, use_spec=False), carry)
    if k_cross < n_iter:
        carry = jax.lax.fori_loop(
            k_cross, n_iter, lambda k, s: call(k, s, use_spec=True), carry)
    (rn_r, rn_i), (rp_r, rp_i) = carry

    nr = rn_r - mom_w * rp_r
    ni = rn_i - mom_w * rp_i
    mag = jnp.sqrt(nr * nr + ni * ni) + jnp.asarray(1e-12, wd)
    ang_r = nr / mag
    ang_i = ni / mag

    def to_natural(x):
        x = x.astype(jnp.float32)[..., :n1, :, :]        # (b,c,n1,f,n2)
        x = jnp.transpose(x, (0, 1, 3, 4, 2))            # (b,c,f,n2,n1)
        return x.reshape(b, c, f, n1 * n2)[..., :bins]

    ang_r = to_natural(ang_r)
    ang_i = to_natural(ang_i)
    return _istft(jax.lax.complex(ang_r * spec, ang_i * spec), win, n_fft,
                  hop_length=n2 * 2, length=length)


def _loop_fused(spec, spec_w, merged_w, win_gp, inv_env, mom, n_fft, n1,
                n1p, n2, hop_length, n_iter, stereo_coherence, wd, bins,
                length, win, ang0=None):
    """k1-major fused iteration: lane-stage matmuls + elementwise in XLA,
    everything touching the sublane grid axis inside fgla_middle."""
    from .pallas.fgla_middle import fgla_middle

    b, c, f = spec_w.shape[:3]
    # k1-major state: (B, C, n1p, F, n2)
    spec_k = jnp.swapaxes(spec_w, 2, 3)
    merged_k = jnp.swapaxes(merged_w, 2, 3)
    spec_k, merged_k = jax.lax.optimization_barrier((spec_k, merged_k))

    _, _, (f1r, f1i), (f2r, f2i), (twr, twi) = _digit_bases(n_fft, n2, n1p)
    # lane-stage matrices as ONE stacked-complex (2*n2 x 2*n2) matmul:
    # [xr | xi] @ [[Mr, Mi], [-Mi, Mr]] = [xr@Mr - xi@Mi | xr@Mi + xi@Mr].
    # Measured on v5e: (M,128)@(128,128) runs at 12 TFLOP/s (bandwidth
    # floor), (M,256)@(256,256) at 40 — one wide matmul beats four narrow
    g2r, g2i = f2r / n2, -f2i / n2
    w_inv = jnp.asarray(np.block([[g2r, g2i], [-g2i, g2r]]), wd)
    w_fwd = jnp.asarray(np.block([[f2r, f2i], [-f2i, f2r]]), wd)
    # kernel constants: conjugated/forward twiddles, stacked n1-stage bases
    ctw = (twr, -twi)
    ftw = (twr, twi)
    g_stack = np.hstack([(f1r / n1).T, (f1i / n1).T])    # (n1p, 2*n1p)
    f_stack = np.vstack([f1r.T, f1i.T])                  # (2*n1p, n1p)

    prec = _fft._MATMUL_PRECISION

    def mm(x, m):
        return jnp.matmul(x, m, precision=prec)

    from .pallas.fgla_spectral import fgla_spectral
    mom = float(mom)
    mom_w = jnp.asarray(mom, wd)

    # x_0 = ang0 * interp(t_0) = ang0 * merged (t_0 < 0)
    shape = (b, c, n1p, f, n2)
    if ang0 is None:
        x0 = (merged_k, jnp.zeros(shape, wd))
    else:
        x0 = (merged_k * jnp.swapaxes(ang0[0].astype(wd), 2, 3),
              merged_k * jnp.swapaxes(ang0[1].astype(wd), 2, 3))
    z1_0 = mm(jnp.concatenate(x0, axis=-1), w_inv)

    def body(i, carry):
        z1r, z1i, prev_r, prev_i = carry
        # project x_i, then the fused spectral step builds x_{i+1}'s
        # lane-stage input with the NEXT annealing factor
        z2r, z2i = fgla_middle(z1r, z1i, win_gp, inv_env, ctw, ftw,
                               g_stack, f_stack, n1_true=n1)
        t_next = (i.astype(jnp.float32) + 1.0) / n_iter - stereo_coherence
        z1r, z1i, rr, ri = fgla_spectral(t_next, z2r, z2i, prev_r, prev_i,
                                         spec_k, merged_k, w_fwd, w_inv,
                                         mom=mom)
        return (z1r, z1i, rr, ri)

    init = (z1_0[..., :n2], z1_0[..., n2:],
            jnp.zeros(shape, wd), jnp.zeros(shape, wd))
    z1r, z1i, prev_r, prev_i = jax.lax.fori_loop(0, n_iter - 1, body, init)

    # final projection (iteration n_iter-1) unrolled: the loop carry has
    # no explicit phases, so recover ang_n in plain XLA once
    z2r, z2i = fgla_middle(z1r, z1i, win_gp, inv_env, ctw, ftw,
                           g_stack, f_stack, n1_true=n1)
    r2 = mm(jnp.concatenate([z2r, z2i], axis=-1), w_fwd)
    rr = r2[..., :n2].astype(wd)
    ri = r2[..., n2:].astype(wd)
    nr = rr - mom_w * prev_r
    ni = ri - mom_w * prev_i
    mag = jnp.sqrt(nr * nr + ni * ni) + jnp.asarray(1e-12, wd)
    ang_r = nr / mag
    ang_i = ni / mag

    def to_natural(x):
        x = x.astype(jnp.float32)[..., :n1, :, :]        # (b,c,n1,f,n2)
        x = jnp.transpose(x, (0, 1, 3, 4, 2))            # (b,c,f,n2,n1)
        return x.reshape(b, c, f, n1 * n2)[..., :bins]

    ang_r = to_natural(ang_r)
    ang_i = to_natural(ang_i)
    return _istft(jax.lax.complex(ang_r * spec, ang_i * spec), win, n_fft,
                  hop_length, length=length)
