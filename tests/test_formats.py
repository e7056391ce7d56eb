import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dualdiffusion_tpu.models.formats import (SpectrogramFormat,
                                              SpectrogramFormatConfig,
                                              MSMDCTDualFormat,
                                              MSMDCTDualFormatConfig,
                                              MDCTFormat, MDCTFormatConfig,
                                              RawFormat, RawFormatConfig,
                                              get_format_class)


@pytest.fixture(scope="module")
def audio():
    sr = 32000
    t = np.arange(2 * sr) / sr
    sig = sum(0.15 * np.sin(2 * np.pi * f * t) for f in (220.0, 330.0, 440.0, 880.0))
    return np.stack([sig, np.roll(sig, 100)]).astype(np.float32)[None]  # (1,2,T)


def test_registry():
    cls, cfg_cls = get_format_class("spectrogram")
    assert cls is SpectrogramFormat and cfg_cls is SpectrogramFormatConfig
    with pytest.raises(KeyError):
        get_format_class("bogus")


def test_spectrogram_shapes(audio):
    # reduced-size config for test speed
    cfg = SpectrogramFormatConfig(window_duration_ms=40, padded_duration_ms=40,
                                  num_frequencies=64, num_fgla_iters=8)
    fmt = SpectrogramFormat(cfg)
    sample = fmt.raw_to_sample(jnp.asarray(audio))
    assert sample.shape[0] == 1 and sample.shape[1] == 64 and sample.shape[3] == 2
    expected_frames = fmt.get_num_frames(audio.shape[-1])
    assert sample.shape[2] == expected_frames


def test_spectrogram_roundtrip_quality(audio):
    """Encode + FGLA decode, then re-encode: mel MSE must be small."""
    cfg = SpectrogramFormatConfig(window_duration_ms=40, padded_duration_ms=40,
                                  num_frequencies=128, num_fgla_iters=32)
    fmt = SpectrogramFormat(cfg)
    x = jnp.asarray(audio)
    sample = fmt.raw_to_sample(x)
    recon = fmt.sample_to_raw(sample)
    assert recon.shape[0] == 1 and recon.shape[1] == 2
    sample2 = fmt.raw_to_sample(recon[..., :fmt.get_audio_len(sample.shape[2])])
    n = min(sample.shape[2], sample2.shape[2])
    mse = float(jnp.mean((sample[:, :, :n] - sample2[:, :, :n]) ** 2))
    scale = float(jnp.mean(sample ** 2))
    assert mse / scale < 0.05, f"relative mel MSE {mse/scale}"


def test_ms_mdct_dual_mel_spec(audio):
    fmt = MSMDCTDualFormat(MSMDCTDualFormatConfig())
    x = jnp.asarray(audio)
    mel = fmt.raw_to_mel_spec(x)
    assert mel.shape[1] == 256 and mel.shape[3] == 2
    assert bool(jnp.isfinite(mel).all())
    # normalization constants put the mel spec near zero mean / unit scale
    assert abs(float(mel.mean())) < 3.0


def test_ms_mdct_dual_mdct_roundtrip(audio):
    fmt = MSMDCTDualFormat(MSMDCTDualFormatConfig())
    x = jnp.asarray(audio)
    coeffs = fmt.raw_to_mdct(x)
    assert coeffs.shape[1] == 256
    recon = fmt.mdct_to_raw(coeffs)
    n = min(recon.shape[-1], x.shape[-1])
    np.testing.assert_allclose(np.asarray(recon[..., :n]), np.asarray(x[..., :n]),
                               atol=1e-4)


def test_ms_mdct_dual_phase_psd(audio):
    fmt = MSMDCTDualFormat(MSMDCTDualFormatConfig())
    phase, psd = fmt.raw_to_mdct_phase_psd(jnp.asarray(audio))
    assert phase.shape == psd.shape
    # phase in [-sqrt2, sqrt2] (normalized +-1 * sqrt2)
    assert float(jnp.abs(phase).max()) <= 2.0 ** 0.5 + 1e-5


def test_ms_mdct_dual_mel_to_linear(audio):
    fmt = MSMDCTDualFormat(MSMDCTDualFormatConfig())
    mel = fmt.raw_to_mel_spec(jnp.asarray(audio))
    lin = fmt.mel_spec_to_linear(mel)
    assert lin.shape[1] == fmt.config.ms_num_stft_bins - 1
    assert bool(jnp.isfinite(lin).all())


def test_ms_mdct_random_phase_aug(audio):
    fmt = MSMDCTDualFormat(MSMDCTDualFormatConfig())
    x = jnp.asarray(audio)
    a = fmt.raw_to_mdct(x, random_phase_augmentation=True, key=jax.random.PRNGKey(1))
    b = fmt.raw_to_mdct(x, random_phase_augmentation=True, key=jax.random.PRNGKey(2))
    assert float(jnp.abs(a - b).max()) > 1e-3  # different rotations
    # magnitude of the complex coefficient is invariant, real part differs
    assert a.shape == b.shape


def test_mdct_format_dual_channel(audio):
    fmt = MDCTFormat(MDCTFormatConfig())
    x = jnp.asarray(audio)
    single = fmt.raw_to_mdct(x)
    dual = fmt.raw_to_mdct(x, dual_channel=True)
    assert dual.shape[-1] == 2 * single.shape[-1] or dual.shape[1] == 2 * single.shape[1]
    recon = fmt.mdct_to_raw(single)
    n = min(recon.shape[-1], x.shape[-1])
    np.testing.assert_allclose(np.asarray(recon[..., :n]), np.asarray(x[..., :n]),
                               atol=1e-4)


@pytest.mark.parametrize("dual,atol", [(False, 1e-3), (True, 1.2e-1)])
def test_raw_format_roundtrip(audio, dual, atol):
    # dual-channel (analytic signal) roundtrip is approximate near clip
    # edges: reflect-padding the complex analytic signal is not the analytic
    # signal of the reflect-padded input. The reference has the identical
    # error (verified numerically vs src/modules/formats/raw.py formulas,
    # max err 0.044 on both).
    fmt = RawFormat(RawFormatConfig(dual_channel=dual))
    x = jnp.asarray(audio[..., :32768])
    s = fmt.raw_to_sample(x)
    assert s.shape[1] == (2 if dual else 1)
    y = fmt.sample_to_raw(s)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=atol)
    if dual:  # interior is much tighter (edge artifacts decay inward)
        err = np.abs(np.asarray(y) - np.asarray(x))[..., 2048:-2048]
        assert err.max() < 1e-2


def test_ms_mdct_dual_mel_matches_torch_golden(audio):
    """Golden: the multi-window blended mel spec equals an independent torch
    evaluation of the published math (RMS-normed hann^e windows, normalized
    stft, mel-density division, RMS-normed slaney filters, gaussian window
    blending; reference: ms_mdct_dual_2.py:100-216)."""
    torch = pytest.importorskip("torch")
    cfg = MSMDCTDualFormatConfig()
    fmt = MSMDCTDualFormat(cfg)
    x = np.asarray(audio)[:, :, :32768]
    ours = np.asarray(fmt.raw_to_mel_spec(jnp.asarray(x)))   # (B,F,T',C)

    xt = torch.from_numpy(x.reshape(-1, x.shape[-1]))
    blended = None
    dens = torch.from_numpy(fmt.ms_stft_mel_density)
    filters = torch.from_numpy(fmt.ms_filters)
    for i, e in enumerate(cfg.ms_window_exponents):
        win = torch.from_numpy(fmt.ms_windows[i]).float()
        spec = torch.stft(xt, n_fft=cfg.ms_window_length,
                          hop_length=cfg.ms_hop_length, window=win,
                          center=True, pad_mode="reflect", normalized=True,
                          onesided=True, return_complex=True).abs()
        spec = spec / dens[None, :, None]
        mel = torch.matmul(spec.transpose(-1, -2), filters).transpose(-1, -2)
        mel = mel * torch.from_numpy(
            fmt.ms_filter_window_weights[:, i])[None, :, None]
        blended = mel if blended is None else blended + mel
    ref = (blended ** cfg.ms_abs_exponent + cfg.raw_to_mel_spec_offset) \
        / cfg.raw_to_mel_spec_scale
    ref = ref.reshape(x.shape[0], x.shape[1], *ref.shape[1:]).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))                     # (B,F,T',C)
    # noise-floor bins (|blended| ~ 1e-5 of peak) disagree at fp32 between
    # jnp and torch FFTs and the **0.25 compression makes that visible in
    # absolute mel units; audible-content bins match tightly
    d = np.abs(ours - ref)
    assert d.max() < 0.06, d.max()
    assert np.median(d) < 5e-3
    loud = ref > ref.mean()
    np.testing.assert_allclose(ours[loud], ref[loud], rtol=1e-3, atol=1e-3)


def test_pitch_shift_augmentation_format():
    """Pitch-shift encode augmentation: a format with min/max frequency
    scaled by 2**(semitones/12) shifts the mel filter centers by the same
    rate (reference: processes/encode.py:223-227)."""
    import dataclasses
    import numpy as np
    from dualdiffusion_tpu.models.formats.ms_mdct_dual import (
        MSMDCTDualFormat, MSMDCTDualFormatConfig)
    base = MSMDCTDualFormatConfig(ms_freq_min=20.0)
    fmt = MSMDCTDualFormat(base)
    rate = 2.0 ** (-2 / 12.0)
    shifted_cfg = dataclasses.replace(
        base, ms_freq_min=base.ms_freq_min * rate,
        ms_freq_max_override=base.ms_freq_max * rate)
    shifted = MSMDCTDualFormat(shifted_cfg)
    # mel spacing is nonlinear, so interior centers scale only approximately
    # (the endpoints scale exactly — same as the reference's augmentation)
    np.testing.assert_allclose(shifted.ms_filter_center_hz,
                               np.asarray(fmt.ms_filter_center_hz) * rate,
                               rtol=0.1)
    ratio = (np.asarray(shifted.ms_filter_center_hz)
             / np.asarray(fmt.ms_filter_center_hz))
    assert (ratio < 1.0).all()  # every filter shifted down
    # mel spec still computes with the shifted bank
    import jax.numpy as jnp
    audio = jnp.zeros((1, 2, 8192))
    mel = shifted.raw_to_mel_spec(audio)
    assert mel.shape[1] == base.ms_num_filters
