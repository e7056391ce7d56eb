import numpy as np
import jax.numpy as jnp

from dualdiffusion_tpu.ops import (FrequencyScale, griffinlim, stft,
                                   get_window, mel_density)


def make_scale(**kw):
    defaults = dict(freq_scale="mel", freq_min=20.0, freq_max=16000.0,
                    sample_rate=32000, num_stft_bins=513, num_filters=128)
    defaults.update(kw)
    return FrequencyScale(**defaults)


def test_filterbank_shape_and_coverage():
    fs = make_scale()
    f = fs.filters
    assert f.shape == (513, 128)
    assert (f >= 0).all()
    # every filter has support
    assert (f.max(axis=0) > 0).all()


def test_scale_unscale_projection(rng):
    """scale(unscale(m)) == m exactly (filters^T pinv is a right inverse
    because filters^T has full row rank at the project's bins/filters
    ratios; at 513 bins / 128 filters the lowest mel filters collide)."""
    fs = make_scale(num_stft_bins=1025)
    m = jnp.asarray(np.abs(rng.standard_normal((2, 128, 16))).astype(np.float32))
    lin = fs.unscale(m, rectify=False)
    m2 = fs.scale(lin)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), rtol=1e-3, atol=1e-3)


def test_unscale_matches_lstsq(rng):
    import numpy.linalg as la
    fs = make_scale(num_stft_bins=129, num_filters=32)
    m = np.abs(rng.standard_normal((32, 4))).astype(np.float32)
    ours = np.asarray(fs.unscale(jnp.asarray(m)[None], rectify=False))[0]
    ref = la.lstsq(fs.filters.T, m, rcond=None)[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_slaney_norm():
    fs = make_scale(filter_norm="slaney")
    f = fs.filters
    assert f.shape == (513, 128)
    # slaney-normalized filters have roughly equal energy -> peak decays with freq
    assert f[:, :8].max() > f[:, -8:].max()


def test_mel_density():
    d = np.asarray(mel_density(np.array([0.0, 700.0])))
    np.testing.assert_allclose(d, [1127.0 / 700.0, 1127.0 / 1400.0], rtol=1e-6)


def test_griffinlim_recovers_spectral_content(rng):
    """FGLA on a pure tone: reconstructed audio's magnitudes must converge to
    the target magnitudes (the classic GL convergence criterion)."""
    sr, n_fft, hop = 8000, 256, 64
    t = np.arange(4096) / sr
    audio = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 440 * t)])
    audio = audio.astype(np.float32)[None]  # (1, 2, T)
    win = get_window("hann", n_fft)
    target = jnp.abs(stft(jnp.asarray(audio), win, n_fft, hop, backend="fft"))
    recon = griffinlim(target, win, n_fft, hop, n_iter=32, momentum=0.99,
                       stereo=True, stereo_coherence=0.5, backend="fft")
    got = jnp.abs(stft(recon, win, n_fft, hop, backend="fft"))
    err = float(jnp.linalg.norm(got - target) / jnp.linalg.norm(target))
    assert err < 0.05, f"relative spectral error {err}"


def test_griffinlim_stereo_coherence_runs(rng):
    mag = jnp.asarray(np.abs(rng.standard_normal((1, 2, 20, 129))).astype(np.float32))
    win = get_window("hann", 256)
    out = griffinlim(mag, win, 256, 64, n_iter=4, stereo=True)
    assert out.shape == (1, 2, 19 * 64)
    assert np.isfinite(np.asarray(out)).all()
