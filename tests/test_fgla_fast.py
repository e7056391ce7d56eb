"""Digit-order polyphase FGLA: transforms, fused middle, loop parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: see pytest.ini

from dualdiffusion_tpu.ops import get_window
from dualdiffusion_tpu.ops.fgla import griffinlim
from dualdiffusion_tpu.ops.fgla_fast import (dft_digit_fwd, dft_digit_inv,
                                             digit_to_natural,
                                             griffinlim_fast,
                                             hermitian_extend,
                                             natural_to_digit,
                                             ola_reframe_jnp)
from dualdiffusion_tpu.ops.pallas.ola_reframe import ola_reframe
from dualdiffusion_tpu.ops.stft import stft


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_digit_transforms_match_numpy_fft(rng):
    n = 1024
    x = jnp.asarray(rng.standard_normal((3, n // 128, 128)).astype(np.float32))
    xr, xi = dft_digit_fwd(x, n)
    want = np.fft.fft(np.asarray(x).reshape(3, n))
    got = (np.asarray(digit_to_natural(xr, n))
           + 1j * np.asarray(digit_to_natural(xi, n)))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5
    y = dft_digit_inv(xr, xi, n)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-6)


def test_digit_transforms_padded_rows_zero(rng):
    """Sublane-padded t1/k1 rows stay exactly zero through both
    directions (zero basis rows), even with finite garbage in the pad rows
    (NaN garbage would leak as NaN*0 — the ola_reframe kernel therefore
    zeroes its output pad rows explicitly)."""
    n = 1280                               # n1 = 10 -> padded to 16
    x = rng.standard_normal((2, 16, 128)).astype(np.float32)
    x[:, 10:] = 1e30                       # finite garbage must not leak
    xr, xi = dft_digit_fwd(jnp.asarray(x), n)
    assert np.isfinite(np.asarray(xr)).all()
    assert np.abs(np.asarray(xr)[:, 10:]).max() == 0.0
    y = dft_digit_inv(xr, xi, n)
    clean = x.copy()
    clean[:, 10:] = 0.0
    np.testing.assert_allclose(np.asarray(y)[:, :10],
                               clean[:, :10], atol=2e-5)


def test_hermitian_extend_matches_full_fft(rng):
    n = 512
    s = rng.standard_normal(n).astype(np.float32)
    half = np.fft.rfft(s)
    er, ei = hermitian_extend(jnp.asarray(half.real.astype(np.float32))[None],
                              jnp.asarray(half.imag.astype(np.float32))[None],
                              n)
    full = np.fft.fft(s)
    np.testing.assert_allclose(np.asarray(er)[0], full.real, rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(ei)[0], full.imag, rtol=1e-4,
                               atol=1e-3)


@pytest.mark.parametrize("f,n1,n1s,bfr", [
    (40, 10, 16, 10),     # padded storage, multi-block
    (64, 8, 8, 16),       # unpadded
    (24, 10, 16, 24),     # single block
    (86, 50, 56, 43),     # flagship n1, clamped halo (tb > F)
])
def test_ola_reframe_kernel_matches_jnp(rng, f, n1, n1s, bfr):
    y = jnp.asarray(rng.standard_normal((1, 2, f, n1s, 128)).astype(np.float32))
    win = np.zeros((n1s, 128), np.float32)
    win[:n1] = rng.random((n1, 128)) + 0.1
    inv_env = jnp.asarray(
        rng.random(((f - 1) * 2 + n1, 128)).astype(np.float32) + 0.5)
    want = ola_reframe_jnp(y[..., :n1, :], jnp.asarray(win[:n1]), inv_env, 2)
    got = ola_reframe(y, jnp.asarray(win), inv_env, n1_true=n1,
                      block_frames=bfr, interpret=True)
    np.testing.assert_allclose(np.asarray(got[..., :n1, :]),
                               np.asarray(want), atol=2e-5)
    if n1s > n1:
        assert np.abs(np.asarray(got[..., n1:, :])).max() == 0.0


def _tone_mag(n_fft, hop, frames):
    win = get_window("hann_power", n_fft, exponent=8.0)
    t = np.arange((frames - 1) * hop) / 32000
    sig = np.stack([np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 991 * t),
                    np.sin(2 * np.pi * 440 * t) * 0.8]).astype(np.float32)[None]
    mag = jnp.abs(stft(jnp.asarray(sig), win, n_fft, hop, backend="fft"))
    return mag, win


def test_griffinlim_fast_converges_like_legacy():
    """Same spectral-convergence quality as ops.fgla.griffinlim (the two
    amplify different rounding noise in dead bins, so waveforms diverge
    chaotically — quality, not samples, is the parity criterion)."""
    n_fft, hop, frames = 1280, 256, 41
    mag, win = _tone_mag(n_fft, hop, frames)

    def conv_err(out):
        m2 = jnp.abs(stft(out, win, n_fft, hop, backend="fft"))
        return float(jnp.linalg.norm(m2 - mag) / jnp.linalg.norm(mag))

    a = griffinlim(mag, win, n_fft, hop, n_iter=40, momentum=0.99,
                   work_dtype="float32", backend="fft")
    b = griffinlim_fast(mag, win, n_fft, hop, n_iter=40, momentum=0.99,
                        work_dtype="float32", use_pallas=False)
    ea, eb = conv_err(a), conv_err(b)
    assert eb < max(2.0 * ea, 0.15), (ea, eb)


def test_griffinlim_fast_single_iteration_matches_legacy():
    """One projection step (before chaos can amplify noise) matches the
    legacy loop closely on live bins."""
    n_fft, hop, frames = 1280, 256, 41
    mag, win = _tone_mag(n_fft, hop, frames)
    a = np.asarray(griffinlim(mag, win, n_fft, hop, n_iter=1, momentum=0.99,
                              work_dtype="float32", backend="fft"))
    b = np.asarray(griffinlim_fast(mag, win, n_fft, hop, n_iter=1,
                                   momentum=0.99, work_dtype="float32",
                                   use_pallas=False))
    denom = np.abs(a).max()
    assert np.abs(a - b).max() / denom < 0.02


def test_fgla_middle_fused_matches_composition(rng):
    """fgla_middle (transforms-in-kernel) == jnp composition of
    conj-twiddle -> inverse n1-stage -> polyphase middle -> forward
    n1-stage -> twiddle, on the k1-major grid."""
    from dualdiffusion_tpu.ops.fgla_fast import _digit_bases
    from dualdiffusion_tpu.ops.pallas.fgla_middle import fgla_middle

    n_fft, n2, n1, n1p, f = 1280, 128, 10, 16, 40
    _, _, (f1r, f1i), _, (twr, twi) = _digit_bases(n_fft, n2, n1p)
    z1r = jnp.asarray(rng.standard_normal((1, 2, n1p, f, n2)).astype(np.float32))
    z1i = jnp.asarray(rng.standard_normal((1, 2, n1p, f, n2)).astype(np.float32))
    z1r = z1r.at[..., n1:, :, :].set(0.0)
    z1i = z1i.at[..., n1:, :, :].set(0.0)
    win = np.zeros((n1p, n2), np.float32)
    win[:n1] = rng.random((n1, n2)) + 0.1
    inv_env = jnp.asarray(
        rng.random(((f - 1) * 2 + n1, n2)).astype(np.float32) + 0.5)
    g_stack = np.hstack([(f1r / n1).T, (f1i / n1).T])
    f_stack = np.vstack([f1r.T, f1i.T])
    got = fgla_middle(z1r, z1i, win, inv_env, (twr, -twi), (twr, twi),
                      g_stack, f_stack, n1_true=n1, interpret=True)

    def kmaj_to_fmaj(x):
        return jnp.swapaxes(x, 2, 3)

    zr, zi = kmaj_to_fmaj(z1r), kmaj_to_fmaj(z1i)
    twr_j, twi_j = jnp.asarray(twr), jnp.asarray(twi)
    tzr = zr * twr_j + zi * twi_j
    tzi = zi * twr_j - zr * twi_j
    g1r, g1i = jnp.asarray(f1r / n1), jnp.asarray(f1i / n1)
    y = (jnp.einsum("...kw,kt->...tw", tzr, g1r)
         + jnp.einsum("...kw,kt->...tw", tzi, g1i))
    y2 = ola_reframe_jnp(y[..., :n1, :], jnp.asarray(win[:n1]), inv_env, 2)
    y2 = jnp.pad(y2, [(0, 0)] * 3 + [(0, n1p - n1), (0, 0)])
    z2r = jnp.einsum("...tw,tk->...kw", y2, jnp.asarray(f1r))
    z2i = jnp.einsum("...tw,tk->...kw", y2, jnp.asarray(f1i))
    want_r = kmaj_to_fmaj(z2r * twr_j - z2i * twi_j)
    want_i = kmaj_to_fmaj(z2r * twi_j + z2i * twr_j)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want_r),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want_i),
                               atol=3e-5)


def test_fgla_iter_kernel_matches_middle_composition(rng):
    """One fgla_iter pallas_call == jnp lane stages sandwiching the
    verified fgla_middle kernel (the x-derivation, lane matmuls and
    spectral step all live inside the fused kernel)."""
    from dualdiffusion_tpu.ops.fgla_fast import _digit_bases
    from dualdiffusion_tpu.ops.pallas.fgla_iter import _OVER, fgla_iter
    from dualdiffusion_tpu.ops.pallas.fgla_middle import fgla_middle

    n_fft, n2, n1, n1p, f = 1280, 128, 10, 16, 40
    b, c = 1, 2
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, c, n1p, f, n2)).astype(np.float32)
    ).at[..., n1:, :, :].set(0.0)
    rk_r, rk_i, rp_r, rp_i = mk(), mk(), mk(), mk()
    sp = jnp.abs(mk())
    mg = jnp.abs(mk())
    win_gp = np.zeros((n1p, n2), np.float32)
    win_gp[:n1] = rng.random((n1, n2)).astype(np.float32) + 0.1
    r_tot = (f - 1) * 2 + n1
    inv_env = jnp.asarray(rng.random((r_tot, n2)).astype(np.float32) + 0.5)

    _, _, (f1r, f1i), (f2r, f2i), (twr, twi) = _digit_bases(n_fft, n2, n1p)
    g_stack = np.hstack([(f1r / n1).T, (f1i / n1).T])
    f_stack = np.vstack([f1r.T, f1i.T])
    envn = np.asarray(inv_env, np.float32)
    need = f + _OVER
    env_e = jnp.asarray(np.pad(envn[0::2],
                               ((0, need - envn[0::2].shape[0]), (0, 0))))
    env_o = jnp.asarray(np.pad(envn[1::2],
                               ((0, need - envn[1::2].shape[0]), (0, 0))))
    mom, t = 0.4975, 0.3
    rr, ri = fgla_iter(jnp.asarray(t, jnp.float32), rk_r, rk_i, rp_r, rp_i,
                       sp, mg, win_gp, env_e, env_o, (twr, -twi), (twr, twi),
                       g_stack, f_stack, (f2r / n2, -f2i / n2), (f2r, f2i),
                       mom=mom, n1_true=n1, use_spec=True, interpret=True)

    # reference: x-derivation + jnp lane stages around fgla_middle
    nr = rk_r - mom * rp_r
    ni = rk_i - mom * rp_i
    inv = jax.lax.rsqrt(nr * nr + ni * ni + 1e-20)
    interp = mg + (sp - mg) * max(t, 0.0)
    xr = nr * inv * interp
    xi = ni * inv * interp
    gr, gi = jnp.asarray(f2r / n2), jnp.asarray(-f2i / n2)
    ur = jnp.einsum("...kj,jw->...kw", xr, gr) - jnp.einsum(
        "...kj,jw->...kw", xi, gi)
    ui = jnp.einsum("...kj,jw->...kw", xr, gi) + jnp.einsum(
        "...kj,jw->...kw", xi, gr)
    mid_r, mid_i = fgla_middle(ur, ui, win_gp, inv_env, (twr, -twi),
                               (twr, twi), g_stack, f_stack, n1_true=n1,
                               interpret=True)
    mr, mi = jnp.asarray(f2r), jnp.asarray(f2i)
    want_r = (jnp.einsum("...kw,wj->...kj", mid_r, mr)
              - jnp.einsum("...kw,wj->...kj", mid_i, mi))
    want_i = (jnp.einsum("...kw,wj->...kj", mid_r, mi)
              + jnp.einsum("...kw,wj->...kj", mid_i, mr))
    scale = float(jnp.abs(want_r).max())
    np.testing.assert_allclose(np.asarray(rr), np.asarray(want_r),
                               atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(ri), np.asarray(want_i),
                               atol=1e-4 * scale)


def test_griffinlim_fused_iteration_matches_and_converges():
    """fuse_iteration=True: single-iteration parity with the jnp loop and
    equal-or-better spectral convergence at 40 iterations."""
    n_fft, hop, frames = 1280, 256, 41
    mag, win = _tone_mag(n_fft, hop, frames)
    mag = mag[:, :, :40]                  # fgla_iter needs a supported F

    a1 = np.asarray(griffinlim_fast(mag, win, n_fft, hop, n_iter=1,
                                    momentum=0.99, work_dtype="float32",
                                    use_pallas=False, fuse_transforms=False,
                                    fuse_iteration=False))
    b1 = np.asarray(griffinlim_fast(mag, win, n_fft, hop, n_iter=1,
                                    momentum=0.99, work_dtype="float32",
                                    fuse_iteration=True))
    assert np.abs(a1 - b1).max() / np.abs(a1).max() < 0.02

    def conv_err(out):
        m2 = jnp.abs(stft(out, win, n_fft, hop, backend="fft"))
        f2 = min(m2.shape[2], mag.shape[2])
        return float(jnp.linalg.norm(m2[:, :, :f2] - mag[:, :, :f2])
                     / jnp.linalg.norm(mag))

    a = griffinlim_fast(mag, win, n_fft, hop, n_iter=40, momentum=0.99,
                        work_dtype="float32", use_pallas=False,
                        fuse_transforms=False, fuse_iteration=False)
    b = griffinlim_fast(mag, win, n_fft, hop, n_iter=40, momentum=0.99,
                        work_dtype="float32", fuse_iteration=True)
    ea, eb = conv_err(a), conv_err(b)
    assert eb < max(1.5 * ea, 0.2), (ea, eb)


def test_griffinlim_fused_iteration_unsupported_raises():
    """Forcing fuse_iteration on an unsupported frame count fails fast
    with a clear error instead of an assert deep inside the kernel."""
    n_fft, hop, frames = 1280, 256, 41
    mag, win = _tone_mag(n_fft, hop, frames)   # F=41 has no valid block
    with pytest.raises(ValueError, match="fuse_iteration"):
        griffinlim_fast(mag, win, n_fft, hop, n_iter=1,
                        work_dtype="float32", fuse_iteration=True)


def test_griffinlim_fused_converges():
    n_fft, hop, frames = 1280, 256, 40
    mag, win = _tone_mag(n_fft, hop, frames + 1)
    mag = mag[:, :, :frames]              # fused path needs F % 8 == 0

    def conv_err(out):
        m2 = jnp.abs(stft(out, win, n_fft, hop, backend="fft"))
        f2 = min(m2.shape[2], mag.shape[2])
        return float(jnp.linalg.norm(m2[:, :, :f2] - mag[:, :, :f2])
                     / jnp.linalg.norm(mag))

    a = griffinlim_fast(mag, win, n_fft, hop, n_iter=40, momentum=0.99,
                        work_dtype="float32", use_pallas=False,
                        fuse_transforms=False)
    b = griffinlim_fast(mag, win, n_fft, hop, n_iter=40, momentum=0.99,
                        work_dtype="float32", fuse_transforms=True)
    ea, eb = conv_err(a), conv_err(b)
    assert eb < max(1.5 * ea, 0.2), (ea, eb)


def _rich_mag(n_fft, hop, frames, exponent=8.0):
    """Tones + chirp + AM: enough spectral structure that phase-init
    quality measurably changes convergence (pure tones converge almost
    instantly from any init)."""
    win = np.asarray(get_window("hann_power", n_fft, exponent=exponent))
    rng = np.random.default_rng(7)
    t = np.arange((frames + 1) * hop) / 32000
    sig = sum(0.2 * np.sin(2 * np.pi * f * t) for f in (220.0, 473.0, 881.0))
    sig = sig + 0.1 * np.sin(2 * np.pi * (200 + 40 * t) * t)
    sig = sig + 0.02 * rng.standard_normal(sig.shape)
    sig = np.stack([sig, 0.8 * sig]).astype(np.float32)[None]
    mag = jnp.abs(stft(jnp.asarray(sig), win, n_fft, hop, backend="fft"))
    return mag[:, :, :frames], win


def test_spsi_phase_init_converges_faster():
    """phase_init='spsi' (integrated instantaneous-frequency seed,
    ops/fgla.spsi_phase) beats the reference's flat init at equal
    iteration count — the basis for SpectrogramFormatConfig.fgla_phase_init.

    Measured at the production geometry (n_fft=6400, hann^32, hop 256):
    conv_err 0.063 vs 0.094 at 30 iters, 0.044 vs 0.054 at 60. This test
    runs a cheaper geometry with the same ordering (the advantage flips
    only for narrow windows on a small FFT, e.g. 1280-pt hann^32 — which
    is why the option defaults to "flat" and is chosen per config)."""
    n_fft, hop, frames = 1280, 256, 80
    mag, win = _rich_mag(n_fft, hop, frames)

    def conv_err(out):
        m2 = jnp.abs(stft(out, win, n_fft, hop, backend="fft"))
        f2 = min(m2.shape[2], mag.shape[2])
        return float(jnp.linalg.norm(m2[:, :, :f2] - mag[:, :, :f2])
                     / jnp.linalg.norm(mag))

    kw = dict(n_iter=30, momentum=0.99, work_dtype="float32",
              use_pallas=False, fuse_transforms=False, fuse_iteration=False)
    e_flat = conv_err(griffinlim_fast(mag, win, n_fft, hop,
                                      phase_init="flat", **kw))
    e_spsi = conv_err(griffinlim_fast(mag, win, n_fft, hop,
                                      phase_init="spsi", **kw))
    assert e_spsi < 0.95 * e_flat, (e_flat, e_spsi)


def test_spsi_locked_beats_flat_on_mel_inverted_mags():
    """On the PRODUCTION decode input — mel-filterbank-inverted
    (inconsistent) magnitudes — phase-locked SPSI at HALF the iterations
    reaches lower spectral convergence error than flat init, which
    plateaus (measured 0.053 @30 vs 0.070 @60 at this geometry; 0.054
    @100 vs 0.081 @200 at the production n_fft=6400 geometry)."""
    from dualdiffusion_tpu.ops.fgla import griffinlim
    from dualdiffusion_tpu.ops.mel import FrequencyScale
    n_fft, hop, frames = 1280, 256, 80
    win = np.asarray(get_window("hann_power", n_fft, exponent=32.0))
    rng = np.random.default_rng(3)
    t = np.arange((frames - 1) * hop) / 32000
    sig = sum(0.2 * np.sin(2 * np.pi * f * t * (1 + 0.001 * np.sin(2 * np.pi * 2 * t)))
              for f in (220.0, 330.0, 440.0, 880.0))
    sig = sig + 0.1 * np.sin(2 * np.pi * (200 + 40 * t) * t)
    sig = sig + 0.02 * rng.standard_normal(sig.shape)
    audio = jnp.asarray(np.stack([sig, sig * 0.8]).astype(np.float32)[None])
    exact = jnp.abs(stft(audio, win, n_fft, hop, backend="fft"))[:, :, :frames]
    fs = FrequencyScale(freq_scale="mel", freq_min=20.0, freq_max=16000.0,
                        sample_rate=32000, num_stft_bins=n_fft // 2 + 1,
                        num_filters=64)
    mag = jnp.swapaxes(fs.unscale(fs.scale(jnp.swapaxes(exact, -1, -2))),
                       -1, -2)

    def conv_err(out):
        got = jnp.abs(stft(out, win, n_fft, hop, backend="fft"))
        f2 = min(got.shape[2], mag.shape[2])
        return float(jnp.linalg.norm(got[:, :, :f2] - mag[:, :, :f2])
                     / jnp.linalg.norm(mag))

    kw = dict(momentum=0.99, work_dtype="float32", backend="fft")
    e_flat = conv_err(griffinlim(mag, win, n_fft, hop, n_iter=60,
                                 phase_init="flat", **kw))
    e_spsi = conv_err(griffinlim(mag, win, n_fft, hop, n_iter=30,
                                 phase_init="spsi", **kw))
    assert e_spsi < e_flat, (e_flat, e_spsi)


def test_spsi_init_single_iteration_matches_legacy():
    """The digit-grid SPSI seed equals the legacy loop's natural-order
    seed: one projection step stays within live-bin tolerance."""
    n_fft, hop, frames = 1280, 256, 41
    mag, win = _tone_mag(n_fft, hop, frames)
    a = np.asarray(griffinlim(mag, win, n_fft, hop, n_iter=1, momentum=0.99,
                              work_dtype="float32", backend="fft",
                              phase_init="spsi"))
    b = np.asarray(griffinlim_fast(mag, win, n_fft, hop, n_iter=1,
                                   momentum=0.99, work_dtype="float32",
                                   use_pallas=False, phase_init="spsi"))
    assert np.abs(a - b).max() / np.abs(a).max() < 0.02


def test_spsi_fused_paths_match_plain():
    """Both Pallas loop variants reproduce the SPSI seeding of the plain
    jnp loop (k1-major swapaxes + r-state carry seed)."""
    n_fft, hop, frames = 1280, 256, 40
    mag, win = _tone_mag(n_fft, hop, frames + 1)
    mag = mag[:, :, :frames]
    kw = dict(n_iter=1, momentum=0.99, work_dtype="float32",
              phase_init="spsi")
    a = np.asarray(griffinlim_fast(mag, win, n_fft, hop, use_pallas=False,
                                   fuse_transforms=False,
                                   fuse_iteration=False, **kw))
    b = np.asarray(griffinlim_fast(mag, win, n_fft, hop,
                                   fuse_iteration=True, **kw))
    c = np.asarray(griffinlim_fast(mag, win, n_fft, hop,
                                   fuse_transforms=True,
                                   fuse_iteration=False, **kw))
    assert np.abs(a - b).max() / np.abs(a).max() < 0.02
    assert np.abs(a - c).max() / np.abs(a).max() < 0.02


def test_griffinlim_fast_traces_under_outer_jit():
    """The production decode path jits the WHOLE sample_to_raw graph, so
    every loop variant must trace cleanly inside an enclosing jit
    (regression: the fused-iteration loop np.asarray'd the OLA envelope,
    which is a tracer-safe host constant only if never jnp-ified first)."""
    n_fft, hop, frames = 1280, 256, 40
    mag, win = _tone_mag(n_fft, hop, frames + 1)
    mag = mag[:, :, :frames]
    for kw in (dict(use_pallas=False, fuse_transforms=False,
                    fuse_iteration=False),
               dict(fuse_transforms=True, fuse_iteration=False),
               dict(fuse_iteration=True),
               dict(fuse_iteration=True, phase_init="spsi")):
        fg = jax.jit(lambda m, _kw=kw: griffinlim_fast(
            m, win, n_fft, hop, n_iter=2, momentum=0.99,
            work_dtype="float32", **_kw))
        out = np.asarray(fg(mag))
        assert np.isfinite(out).all(), kw
