"""End-to-end parity tests against THE REFERENCE's own torch format stack
(BASELINE.json north-star criterion: spectral MSE < 1e-3 vs reference).

The reference implementation at /root/reference is executed directly on CPU
torch (its format code paths: old/spectrogram.py SpectrogramConverter +
PhaseRecovery, ms_mdct_dual_2.py MS_MDCT_DualFormat, frequency_scale.py)
against this repo's JAX formats on the same synthetic clip.

Unavailable third-party modules that the reference imports but does NOT use
in these code paths (pyjson5, dotenv, mutagen, pyloudnorm, librosa) are
stubbed; torchaudio.transforms.Spectrogram — which IS in the compute path —
is shimmed faithfully with torch.stft (power=None -> complex STFT, matching
torchaudio's implementation).
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: see pytest.ini

torch = pytest.importorskip("torch")

REFERENCE_SRC = Path("/root/reference/src")


def _install_stubs():
    def blank(name, attrs=()):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for a in attrs:
            setattr(m, a, object)
        sys.modules[name] = m
        return m

    # config deps (import-time only; env constants resolve to None/"")
    pj = blank("pyjson5")
    pj.load = lambda f: __import__("json").load(f)
    dv = blank("dotenv")
    dv.load_dotenv = lambda *a, **k: None
    blank("mutagen")
    blank("mutagen.flac", attrs=("FLAC",))
    blank("mutagen.id3")
    pl = blank("pyloudnorm")
    pl.Meter = object
    blank("librosa")

    # torchaudio: faithful Spectrogram shim over torch.stft
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        tr = types.ModuleType("torchaudio.transforms")
        fn = types.ModuleType("torchaudio.functional")

        class Spectrogram(torch.nn.Module):
            def __init__(self, n_fft, win_length=None, hop_length=None,
                         pad=0, window_fn=torch.hann_window, power=2.0,
                         normalized=False, wkwargs=None, center=True,
                         pad_mode="reflect", onesided=True):
                super().__init__()
                self.n_fft = n_fft
                self.win_length = win_length or n_fft
                self.hop_length = hop_length or self.win_length // 2
                self.pad = pad
                self.power = power
                self.normalized = normalized
                self.center = center
                self.pad_mode = pad_mode
                self.onesided = onesided
                window = window_fn(self.win_length, **(wkwargs or {}))
                self.register_buffer("window", window)

            def forward(self, waveform):
                if self.pad > 0:
                    waveform = torch.nn.functional.pad(
                        waveform, (self.pad, self.pad))
                shape = waveform.shape
                wav = waveform.reshape(-1, shape[-1])
                # torchaudio's normalized: True/"frame_length" -> torch.stft
                # normalized; "window" -> divide by the window's L2 norm
                frame_norm = self.normalized in (True, "frame_length")
                spec = torch.stft(wav, self.n_fft, self.hop_length,
                                  self.win_length, self.window,
                                  center=self.center, pad_mode=self.pad_mode,
                                  normalized=frame_norm,
                                  onesided=self.onesided, return_complex=True)
                if self.normalized == "window":
                    spec = spec / self.window.pow(2.0).sum().sqrt()
                spec = spec.reshape(shape[:-1] + spec.shape[-2:])
                if self.power is not None:
                    spec = spec.abs() ** self.power
                return spec

        tr.Spectrogram = Spectrogram
        ta.transforms = tr
        ta.functional = fn
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tr
        sys.modules["torchaudio.functional"] = fn

    if str(REFERENCE_SRC) not in sys.path:
        sys.path.append(str(REFERENCE_SRC))


@pytest.fixture(scope="module")
def clip():
    """4 s music-like stereo clip @ 32 kHz: harmonics + noise floor."""
    sr = 32000
    t = np.arange(4 * sr) / sr
    rng = np.random.default_rng(7)
    sig = np.zeros_like(t)
    for f0, a in ((110, 0.4), (220, 0.25), (331, 0.18), (442, 0.1),
                  (1000, 0.05), (3500, 0.02)):
        sig += a * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi))
    sig += rng.standard_normal(t.shape) * 0.003
    left = sig
    right = np.roll(sig, 11) * 0.9 + rng.standard_normal(t.shape) * 0.003
    return np.stack([left, right]).astype(np.float32) * 0.25


def _rel_mse(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(((a - b) ** 2).mean() / max((b ** 2).mean(), 1e-20))


@pytest.fixture(scope="module")
def ref_modules():
    if not REFERENCE_SRC.is_dir():
        pytest.skip("reference tree not mounted")
    _install_stubs()
    from modules.formats.old.spectrogram import (  # noqa: E402
        SpectrogramConverter, SpectrogramFormatConfig)
    from modules.formats.ms_mdct_dual_2 import (  # noqa: E402
        MS_MDCT_DualFormat, MS_MDCT_DualFormatConfig)
    return (SpectrogramConverter, SpectrogramFormatConfig,
            MS_MDCT_DualFormat, MS_MDCT_DualFormatConfig)


def test_spectrogram_format_parity(ref_modules, clip):
    """audio -> mel spectrogram must match the reference < 1e-3 rel MSE."""
    (SpectrogramConverter, RefCfg, _, _) = ref_modules
    ref_cfg = RefCfg(sample_rate=32000, num_fgla_iters=32)
    # the reference's old config reads a field renamed in its base class
    ref_cfg.sample_raw_channels = 2
    ref = SpectrogramConverter(ref_cfg)
    ref_spec = ref.audio_to_spectrogram(torch.from_numpy(clip)[None])

    from dualdiffusion_tpu.models.formats.spectrogram import (
        SpectrogramFormat, SpectrogramFormatConfig)
    mine = SpectrogramFormat(SpectrogramFormatConfig(num_fgla_iters=32))
    my_spec = mine.raw_to_mel_spec(clip[None])         # (B, F, T', C)
    my_spec_cf = np.transpose(np.asarray(my_spec), (0, 3, 1, 2))

    assert ref_spec.shape == my_spec_cf.shape, (ref_spec.shape,
                                                my_spec_cf.shape)
    mse = _rel_mse(my_spec_cf, ref_spec.numpy())
    assert mse < 1e-3, f"spectrogram rel MSE vs reference: {mse}"


def test_fgla_decode_parity(ref_modules, clip):
    """mel -> FGLA audio: re-encoded spectrograms of both reconstructions
    must agree (< 1e-3 rel MSE) and this repo's spectral convergence must
    not be worse than the reference's."""
    (SpectrogramConverter, RefCfg, _, _) = ref_modules
    n_iters = 100  # cross-MSE meets 1e-3 from ~100 iters (both still far
    # from converged at 32; measured: cross 8.2e-4 @100, 6.6e-4 @200)
    ref_cfg = RefCfg(sample_rate=32000, num_fgla_iters=n_iters)
    ref_cfg.sample_raw_channels = 2
    ref = SpectrogramConverter(ref_cfg)
    spec_t = ref.audio_to_spectrogram(torch.from_numpy(clip)[None])
    ref_audio = ref.spectrogram_to_audio(spec_t, quiet=True).numpy()

    from dualdiffusion_tpu.models.formats.spectrogram import (
        SpectrogramFormat, SpectrogramFormatConfig)
    mine = SpectrogramFormat(SpectrogramFormatConfig(num_fgla_iters=n_iters))
    mel = mine.raw_to_mel_spec(clip[None])
    sample = (mel - mine.config.sample_mean) * mine.config.raw_to_sample_scale
    my_audio = np.asarray(mine.sample_to_raw(sample))

    assert my_audio.shape == ref_audio.shape
    # compare in the spectral domain (phases legitimately differ)
    ref_spec2 = ref.audio_to_spectrogram(torch.from_numpy(ref_audio)).numpy()
    my_spec2 = ref.audio_to_spectrogram(
        torch.from_numpy(my_audio.astype(np.float32))).numpy()
    mse = _rel_mse(my_spec2, ref_spec2)
    assert mse < 1e-3, f"FGLA reconstruction rel MSE vs reference: {mse}"

    # spectral convergence: distance of each reconstruction to the target
    tgt = spec_t.numpy()
    conv_ref = _rel_mse(ref_spec2, tgt)
    conv_mine = _rel_mse(my_spec2, tgt)
    assert conv_mine <= conv_ref * 1.05, (conv_mine, conv_ref)


def test_ms_mdct_dual_v2_parity(ref_modules, clip):
    """MS_MDCT_Dual v2: blended mel spec, mel->linear conditioning, and the
    MDCT round-trip must match the reference < 1e-3 rel MSE."""
    (_, _, MS_MDCT_DualFormat, RefCfg) = ref_modules
    ref_cfg = RefCfg(sample_rate=32000, num_raw_channels=2)
    ref = MS_MDCT_DualFormat(ref_cfg)

    from dualdiffusion_tpu.models.formats.ms_mdct_dual import (
        MSMDCTDualFormat, MSMDCTDualFormatConfig)
    mine = MSMDCTDualFormat(MSMDCTDualFormatConfig())

    crop = mine.get_raw_crop_width(clip.shape[-1])
    a_np = clip[:, :crop]
    a_t = torch.from_numpy(a_np)[None]

    ref_mel = ref.raw_to_mel_spec(a_t).numpy()          # (B, C, F, T')
    my_mel = np.asarray(mine.raw_to_mel_spec(a_np[None]))
    my_mel_cf = np.transpose(my_mel, (0, 3, 1, 2))
    w = min(ref_mel.shape[-1], my_mel_cf.shape[-1])
    mse = _rel_mse(my_mel_cf[..., :w], ref_mel[..., :w])
    assert mse < 1e-3, f"ms_mdct_dual mel rel MSE vs reference: {mse}"

    # mel -> linear PSD conditioning (lstsq in the reference, pinv here)
    ref_lin = ref.mel_spec_to_linear(torch.from_numpy(
        ref_mel[..., :w]).float()).numpy()
    my_lin = np.asarray(mine.mel_spec_to_linear(
        np.transpose(my_mel_cf[..., :w], (0, 2, 3, 1))))
    my_lin_cf = np.transpose(my_lin, (0, 3, 1, 2))
    mse_lin = _rel_mse(my_lin_cf, ref_lin)
    assert mse_lin < 1e-3, f"mel->linear rel MSE vs reference: {mse_lin}"

    # MDCT analysis + synthesis round trip
    ref_mdct = ref.raw_to_mdct(a_t).numpy()             # (B, C, N, frames)
    my_mdct = np.asarray(mine.raw_to_mdct(a_np[None]))  # (B, N, frames, C)
    my_mdct_cf = np.transpose(my_mdct, (0, 3, 1, 2))
    wf = min(ref_mdct.shape[-1], my_mdct_cf.shape[-1])
    mse_mdct = _rel_mse(my_mdct_cf[..., :wf], ref_mdct[..., :wf])
    assert mse_mdct < 1e-3, f"MDCT rel MSE vs reference: {mse_mdct}"

    ref_raw = ref.mdct_to_raw(torch.from_numpy(ref_mdct).float()).numpy()
    my_raw = np.asarray(mine.mdct_to_raw(my_mdct))
    wr = min(ref_raw.shape[-1], my_raw.shape[-1])
    mse_raw = _rel_mse(my_raw[..., :wr], ref_raw[..., :wr])
    assert mse_raw < 1e-3, f"IMDCT audio rel MSE vs reference: {mse_raw}"


def test_ms_mdct_dual_v1_parity(ref_modules, clip):
    """MS_MDCT_Dual v1 (dual blackman-harris blend): mel spec,
    mel->mdct-psd conditioning, and the MCLT path must match the reference
    < 1e-3 rel MSE."""
    _install_stubs()
    from modules.formats.ms_mdct_dual import (  # noqa: E402
        MS_MDCT_DualFormat as RefV1, MS_MDCT_DualFormatConfig as RefV1Cfg)
    ref = RefV1(RefV1Cfg(sample_rate=32000, num_raw_channels=2))

    from dualdiffusion_tpu.models.formats.ms_mdct_dual_v1 import (
        MSMDCTDualV1Format, MSMDCTDualV1FormatConfig)
    mine = MSMDCTDualV1Format(MSMDCTDualV1FormatConfig())

    crop = mine.get_raw_crop_width(clip.shape[-1])
    a_np = clip[:, :crop]
    a_t = torch.from_numpy(a_np)[None]

    ref_mel = ref.raw_to_mel_spec(a_t).numpy()          # (B, C, F, T')
    my_mel = np.transpose(np.asarray(mine.raw_to_mel_spec(a_np[None])),
                          (0, 3, 1, 2))
    w = min(ref_mel.shape[-1], my_mel.shape[-1])
    mse = _rel_mse(my_mel[..., :w], ref_mel[..., :w])
    assert mse < 1e-3, f"v1 mel rel MSE vs reference: {mse}"

    ref_psd = ref.mel_spec_to_mdct_psd(
        torch.from_numpy(ref_mel[..., :w]).float()).numpy()
    my_psd = np.transpose(np.asarray(mine.mel_spec_to_mdct_psd(
        np.transpose(my_mel[..., :w], (0, 2, 3, 1)))), (0, 3, 1, 2))
    mse_psd = _rel_mse(my_psd, ref_psd)
    assert mse_psd < 1e-3, f"v1 mel->mdct_psd rel MSE vs reference: {mse_psd}"

    ref_mdct = ref.raw_to_mdct(a_t).numpy()             # (B, C, N, frames)
    my_mdct = np.transpose(np.asarray(mine.raw_to_mdct(a_np[None])),
                           (0, 3, 1, 2))
    wf = min(ref_mdct.shape[-1], my_mdct.shape[-1])
    mse_m = _rel_mse(my_mdct[..., :wf], ref_mdct[..., :wf])
    assert mse_m < 1e-3, f"v1 MCLT rel MSE vs reference: {mse_m}"

    ref_raw = ref.mdct_to_raw(torch.from_numpy(ref_mdct).float()).numpy()
    my_raw = np.asarray(mine.mdct_to_raw(my_mdct.transpose(0, 2, 3, 1)))
    wr = min(ref_raw.shape[-1], my_raw.shape[-1])
    mse_r = _rel_mse(my_raw[..., :wr], ref_raw[..., :wr])
    assert mse_r < 1e-3, f"v1 IMCLT audio rel MSE vs reference: {mse_r}"
