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


# ---------------------------------------------------------------------------
# model-level parity: identical weights into the reference's torch UNet and
# this repo's UNet (VERDICT r2 #6)
# ---------------------------------------------------------------------------

def _reduced_ddec_configs():
    """One reduced DDEC-style config expressed in both frameworks
    (reference defaults: unet_edm2_q4_ddec.py:43-69 at 1/2 scale)."""
    from dualdiffusion_tpu.models.unet import UNetConfig
    common = dict(in_channels=2, out_channels=2, in_channels_emb=0,
                  in_num_freqs=32, in_psd_freqs=256,
                  sigma_max=11.0, sigma_min=0.0002,
                  model_channels=16, channel_mult=(1, 2),
                  channel_mult_noise=4, channel_mult_emb=4,
                  channels_per_head=16, num_layers_per_block=2,
                  mlp_multiplier=2, logvar_channels=32)
    jax_cfg = UNetConfig(double_midblock=True, **common)
    return common, jax_cfg


@pytest.fixture(scope="module")
def ref_ddec_pair(ref_modules):
    """(torch module, jax model, converted variables) with IDENTICAL
    weights — the reference's own unet_edm2_q4_ddec.py executed on CPU."""
    import jax
    import jax.numpy as jnp
    from modules.unets.unet_edm2_q4_ddec import UNet as RefUNet, UNet_Config
    from dualdiffusion_tpu.models.convert import torch_unet_state_to_variables
    from dualdiffusion_tpu.models.unet import UNet

    common, jax_cfg = _reduced_ddec_configs()
    tcfg = UNet_Config(**dict(common, channel_mult=list(common["channel_mult"]),
                              double_midblock=True))
    torch.manual_seed(0)
    ref = RefUNet(tcfg)
    # nonzero scalars so gains/modulation actually participate
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if p.ndim == 0:
                p.copy_(torch.tensor(0.37))
    ref = ref.eval().float()

    model = UNet(jax_cfg)
    key = jax.random.PRNGKey(0)
    template = model.init(key, jnp.zeros((1, 32, 16, 2)), jnp.ones((1,)),
                          None, jnp.zeros((1, 256, 16, 2)),
                          method=UNet.init_all)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = torch_unet_state_to_variables(state, template)
    return ref, model, variables


def test_unet_ddec_forward_parity(ref_ddec_pair):
    """UNet forward (EDM2 preconditioning + PSD-conditioned trunk) matches
    the reference < 1e-3 rel MSE with identical weights (reference:
    unet_edm2_q4_ddec.py:224-303)."""
    import jax.numpy as jnp
    ref, model, variables = ref_ddec_pair
    rng = np.random.default_rng(3)
    B, F, W = 2, 32, 64
    x = rng.standard_normal((B, F, W, 2)).astype(np.float32)
    xr = (rng.standard_normal((B, 256, W, 2)) ** 2).astype(np.float32)
    sigma = np.asarray([0.5, 7.0], np.float32)

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    torch.from_numpy(sigma), None, None,
                    torch.from_numpy(xr.transpose(0, 3, 1, 2)))
    y_ref = y_ref.numpy().transpose(0, 2, 3, 1)

    y = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(sigma),
                               None, jnp.asarray(xr)))
    assert _rel_mse(y, y_ref) < 1e-3, _rel_mse(y, y_ref)

    # the per-sigma loss logvar head too (logvar_linear(logvar_fourier))
    from dualdiffusion_tpu.models.unet import UNet
    lv = np.asarray(model.apply(variables, jnp.asarray(sigma),
                                method=UNet.get_sigma_loss_logvar)).reshape(-1)
    with torch.no_grad():
        lv_ref = ref.get_sigma_loss_logvar(
            torch.from_numpy(sigma)).numpy().reshape(-1)
    np.testing.assert_allclose(lv, lv_ref, rtol=1e-4, atol=1e-5)


def test_sampler_trajectory_parity(ref_ddec_pair):
    """10-step Heun EDM sampling trajectory matches a faithful torch
    transcription of the reference's sampler update rule
    (dual_diffusion_pipeline.py:649-737: init noise * sqrt(sigma0^2+sd^2),
    Heun midpoint at sigma_hat=max(sigma_next, sigma_min), final-step t=0,
    input_perturbation=0 -> no per-step re-noising) running the reference's
    own torch UNet, from the SAME x_T."""
    import jax
    import jax.numpy as jnp
    ref, model, variables = ref_ddec_pair

    B, F, W = 1, 32, 64
    steps = 10
    sigma_max, sigma_min, sigma_data = 11.0, 0.0002, 1.0
    rng = np.random.default_rng(11)
    xr = (rng.standard_normal((B, 256, W, 2)) ** 2).astype(np.float32)
    noise = rng.standard_normal((B, F, W, 2)).astype(np.float32)

    from dualdiffusion_tpu.sampling import SampleParams, edm_sample
    sp = SampleParams(steps=steps, cfg_scale=1.0, use_heun=True,
                      schedule="linear", input_perturbation=0.0,
                      init_noise_mode="sigma_plus_data",
                      renormalize_per_step=False)

    def denoise(x, sigma, x_ref):
        return model.apply(variables, x, sigma, None, x_ref)

    out, _ = edm_sample(denoise, (B, F, W, 2), sp, sigma_max, sigma_min,
                        sigma_data, jax.random.PRNGKey(0),
                        init_noise=jnp.asarray(noise), use_cfg=False,
                        x_ref=jnp.asarray(xr), return_debug=False)
    out = np.asarray(out)

    # --- torch transcription of the reference loop -----------------------
    from dualdiffusion_tpu.sampling.schedule import get_schedule
    sched = get_schedule("linear", steps, sigma_max=sigma_max,
                         sigma_min=sigma_min, rho=sp.rho)
    t_xr = torch.from_numpy(xr.transpose(0, 3, 1, 2))
    sample = torch.from_numpy(noise.transpose(0, 3, 1, 2)) * \
        float(np.sqrt(sched[0] ** 2 + sigma_data ** 2))
    with torch.no_grad():
        for i, (s_curr, s_next) in enumerate(zip(sched[:-1], sched[1:])):
            s_curr, s_next = float(s_curr), float(s_next)
            sig = torch.full((B,), s_curr)
            m = ref(sample, sig, None, None, t_xr).float()
            sigma_hat = max(s_next, sigma_min)
            t_hat = sigma_hat / s_curr
            x_hat = torch.lerp(m, sample, t_hat)
            m_hat = ref(x_hat, torch.full((B,), t_hat * s_curr), None, None,
                        t_xr).float()
            m = torch.lerp(m, m_hat, 0.5)
            t = s_next / s_curr if (i + 1) < steps else 0.0
            sample = torch.lerp(m, sample, t)
    # my sampler's final normalize-to-sigma_data (sampler.py:261; mp
    # normalize: per-sample unit RMS with eps=1e-4 additive)
    rms = sample.square().mean(dim=(1, 2, 3), keepdim=True).sqrt()
    sample = sample / (1e-4 + rms)
    ref_out = sample.numpy().transpose(0, 2, 3, 1)

    # tolerance: single-eval parity sits at the bf16 noise floor
    # (~1e-4 rel MSE, both frameworks use bf16 internals); 20 model evals
    # compound it — the update RULE itself is checked exactly below
    assert _rel_mse(out, ref_out) < 3e-3, _rel_mse(out, ref_out)


def test_sampler_update_rule_exact():
    """The EDM sampler update rule alone (no bf16 model noise): my
    edm_sample vs the torch transcription of the reference loop
    (dual_diffusion_pipeline.py:649-737) with the SAME deterministic fp32
    denoiser must agree to float tolerance."""
    import jax
    import jax.numpy as jnp
    from dualdiffusion_tpu.sampling import SampleParams, edm_sample
    from dualdiffusion_tpu.sampling.schedule import get_schedule

    B, F, W = 1, 8, 16
    steps = 10
    sigma_max, sigma_min, sigma_data = 11.0, 0.0002, 1.0
    rng = np.random.default_rng(5)
    noise = rng.standard_normal((B, F, W, 2)).astype(np.float32)
    target = rng.standard_normal((B, F, W, 2)).astype(np.float32) * 0.7

    def denoise_np(x, sigma):
        # analytic single-gaussian denoiser: D(x) = lerp toward target
        s2 = sigma[..., None, None, None] ** 2
        return (x * sigma_data ** 2 + target * s2) / (sigma_data ** 2 + s2)

    # renormalize_per_step=False: the reference's diffusion_decode has the
    # per-step renorm commented out (:728-729); its __call__ superset keeps
    # it (:531) — pin the diffusion_decode semantics here
    sp = SampleParams(steps=steps, cfg_scale=1.0, use_heun=True,
                      schedule="linear", input_perturbation=0.0,
                      init_noise_mode="sigma_plus_data",
                      renormalize_per_step=False)
    out, _ = edm_sample(lambda x, s: denoise_np(x, s), (B, F, W, 2), sp,
                        sigma_max, sigma_min, sigma_data,
                        jax.random.PRNGKey(0), init_noise=jnp.asarray(noise),
                        use_cfg=False, return_debug=False)
    out = np.asarray(out)

    sched = get_schedule("linear", steps, sigma_max=sigma_max,
                         sigma_min=sigma_min, rho=sp.rho)
    t_t = torch.from_numpy(target)
    sample = torch.from_numpy(noise) *         float(np.sqrt(sched[0] ** 2 + sigma_data ** 2))

    def denoise_t(x, sigma):
        s2 = sigma ** 2
        return (x * sigma_data ** 2 + t_t * s2) / (sigma_data ** 2 + s2)

    for i, (s_curr, s_next) in enumerate(zip(sched[:-1], sched[1:])):
        s_curr, s_next = float(s_curr), float(s_next)
        m = denoise_t(sample, torch.tensor(s_curr))
        sigma_hat = max(s_next, sigma_min)
        t_hat = sigma_hat / s_curr
        x_hat = torch.lerp(m, sample, t_hat)
        m_hat = denoise_t(x_hat, torch.tensor(t_hat * s_curr))
        m = torch.lerp(m, m_hat, 0.5)
        t = s_next / s_curr if (i + 1) < steps else 0.0
        sample = torch.lerp(m, sample, t)
    rms = sample.square().mean(dim=(1, 2, 3), keepdim=True).sqrt()
    ref_out = (sample / (1e-4 + rms)).numpy()

    assert _rel_mse(out, ref_out) < 1e-9, _rel_mse(out, ref_out)


def test_filtered_resample_3d_parity(ref_modules):
    """Kaiser-sinc 3D filtered resamplers + filtered MP-SiLU 3D match the
    reference's torch implementations (resample.py:162-280) exactly."""
    from utils.resample import (FilteredDownsample3D, FilteredUpsample3D,
                                Filtered_MP_Silu_3D, FilteredDownsample1D3,
                                FilteredUpsample1D3)
    import jax.numpy as jnp
    from dualdiffusion_tpu.models.layers import (
        filtered_downsample_3d, filtered_upsample_3d, filtered_mp_silu_3d,
        filtered_downsample_1d3, filtered_upsample_1d3)

    rng = np.random.default_rng(17)
    x = rng.standard_normal((2, 2, 16, 24, 3)).astype(np.float32)  # BZHWC
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))              # BCZHW

    pairs = [
        (lambda a: filtered_downsample_3d(a),
         FilteredDownsample3D()),
        (lambda a: filtered_upsample_3d(a),
         FilteredUpsample3D()),
        (lambda a: filtered_mp_silu_3d(a),
         Filtered_MP_Silu_3D()),
        (lambda a: filtered_downsample_1d3(a),
         FilteredDownsample1D3()),
        (lambda a: filtered_upsample_1d3(a),
         FilteredUpsample1D3()),
    ]
    for jf, tm in pairs:
        y = np.asarray(jf(jnp.asarray(x)))
        with torch.no_grad():
            yt = tm(xt).numpy().transpose(0, 2, 3, 4, 1)
        assert y.shape == yt.shape, (type(tm).__name__, y.shape, yt.shape)
        err = np.abs(y - yt).max()
        assert err < 1e-5, (type(tm).__name__, err)


def test_clap_chunking_parity():
    """The dual-CLAP audio chunker (mono mix, 48 kHz resample, 10 s chunk
    split with tail TRUNCATION) must match the reference's math
    (clap.py:85-104) — checked with a mocked encoder-free path."""
    from dualdiffusion_tpu.models.embeddings import CLAPEmbedding, CLAPConfig

    emb = CLAPEmbedding(CLAPConfig())
    sr = emb.config.sample_rate          # 48000
    chunk = int(emb.config.audio_embedding_duration * sr)

    rng = np.random.default_rng(23)
    # stereo audio already at 48 kHz, 2.37 chunks long
    audio = rng.standard_normal((2, int(chunk * 2.37))).astype(np.float32)
    chunks = emb._chunk_audio(audio, sr)

    # reference transcription (clap.py:85-86 mono mix, :100-104 truncation)
    mono = torch.from_numpy(audio).mean(dim=0)
    t_chunks = mono[:mono.shape[0] // chunk * chunk].reshape(-1, chunk)
    assert chunks.shape == tuple(t_chunks.shape) == (2, chunk)
    np.testing.assert_allclose(chunks, t_chunks.numpy(), atol=1e-6)

    # too-short audio raises, as the reference does (clap.py:101-102)
    with pytest.raises(ValueError):
        emb._chunk_audio(audio[:, : chunk // 2], sr)


def test_clap_window_interp_parity(ref_modules, tmp_path):
    """The dataloader's CLAP embedding window average with spherical
    endpoint interpolation matches a torch transcription of the
    reference's (training/dataset.py:203-236), using the reference's own
    mp_sum/normalize."""
    from modules.mp_tools import mp_sum as t_mp_sum, normalize as t_norm
    from dualdiffusion_tpu.dataset.dataloader import (DatasetConfig,
                                                      DualDiffusionDataset)
    from dualdiffusion_tpu.utils import save_safetensors
    import json as _json

    rng = np.random.default_rng(31)
    emb_len, dim = 7, 24
    embs = rng.standard_normal((emb_len, dim)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
    lat_w = 256
    # latents whose row 0 encodes the column index -> recover the random
    # crop offset from the loaded sample
    lats = np.zeros((1, 2, 4, lat_w), np.float16)
    lats[0, 0, 0, :] = np.arange(lat_w, dtype=np.float16)
    p = tmp_path / "x0.safetensors"
    save_safetensors({"latents": lats, "clap_audio_embeddings": embs}, p)
    rec = {"file_name": "x0.wav", "sample_rate": 32000,
           "sample_length": 999999, "post_norm_lufs": -20.0,
           "latents_file_name": str(p), "latents_length": lat_w,
           "latents_num_variations": 1,
           "latents_has_audio_embeddings": True,
           "latents_has_text_embeddings": False}
    (tmp_path / "train.jsonl").write_text(_json.dumps(rec))

    crop_w = 64
    raw_crop = 1408768 // 4
    cfg = DatasetConfig(data_dir=str(tmp_path),
                        load_datatypes=("latents", "audio_embeddings"),
                        latents_crop_width=crop_w, raw_crop_width=raw_crop)
    ds = DualDiffusionDataset(cfg)
    for trial in range(5):
        out = ds.load_sample(rec)
        t0 = int(out["latents"][0, 0, 0])          # recovered crop offset
        got = out["audio_embeddings"]

        # --- reference transcription (dataset.py:214-236) ----------------
        dur = cfg.audio_embedding_duration
        spl = raw_crop / 32000 / crop_w            # seconds per latent px
        e0 = t0 * spl / dur
        e1 = (t0 + crop_w) * spl / dur
        start = float(np.clip(e0 - 0.5, 0, emb_len - 1))
        end = float(np.clip(e1 - 0.5, start, emb_len - 1))
        si, sf = int(start), start % 1.0
        ei, ef = int(end), end % 1.0
        te = torch.from_numpy(embs)
        selected = te[si: ei + 1].clone()
        if sf > 0 and si + 1 < emb_len:
            selected[0] = t_norm(t_mp_sum(te[si], te[si + 1], sf))
        if ef > 0 and ei + 1 < emb_len:
            selected[-1] = t_norm(t_mp_sum(te[ei], te[ei + 1], ef))
        want = t_norm(selected.sum(dim=0)).numpy()

        # scale convention deviation (documented): this repo stores/returns
        # unit-L2 embeddings, the reference unit-RMS (= L2 * sqrt(dim)).
        # UNet.get_embeddings RMS-normalizes its input (unet.py:491, as the
        # reference does), so only the DIRECTION is load-bearing.
        got_d = got / np.linalg.norm(got)
        want_d = want / np.linalg.norm(want)
        np.testing.assert_allclose(got_d, want_d, atol=2e-4,
                                   err_msg=f"trial {trial} t0={t0}")


def test_posthoc_ema_reconstruction_parity(tmp_path):
    """Post-hoc EMA (NVIDIA alg. 3): both the solved coefficients and the
    full archive->weights reconstruction must match the reference's torch
    implementation (/root/reference/src/training/ema.py:120-191) on the
    same synthetic archive directory."""
    _install_stubs()
    from training.ema import (reconstruct_phema as ref_reconstruct,
                              solve_posthoc_coefficients as ref_solve)
    import safetensors.torch as st

    from dualdiffusion_tpu.training.ema import (reconstruct_phema,
                                                solve_posthoc_coefficients)

    in_ofs = np.array([1e4, 2e4, 2e4, 3e4])
    in_std = np.array([0.05, 0.05, 0.1, 0.1])
    for out_std in (0.08, 0.15, 0.2):
        a = solve_posthoc_coefficients(in_ofs, in_std, np.array([3e4]),
                                       np.array([out_std]))
        b = ref_solve(in_ofs, in_std, np.array([3e4]), np.array([out_std]))
        np.testing.assert_allclose(a, b, rtol=1e-12)

    # full reconstruction over a synthetic archive dir
    rng = np.random.default_rng(3)
    for i, (std, n) in enumerate(zip(in_std, in_ofs)):
        sd = {"w": torch.from_numpy(rng.standard_normal((8, 16))
                                    .astype(np.float32)),
              "b": torch.from_numpy(rng.standard_normal(4)
                                    .astype(np.float32))}
        st.save_file(sd, str(tmp_path / f"ema_{i}.safetensors"),
                     metadata={"std": str(std),
                               "total_samples_processed": str(int(n)),
                               "global_step": str(int(n) // 10)})

    ref_out = ref_reconstruct(0.15, str(tmp_path), quiet=True)
    my_out = reconstruct_phema(0.15, str(tmp_path))
    assert set(ref_out) == set(my_out)
    for k in ref_out:
        np.testing.assert_allclose(my_out[k], ref_out[k].numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_sigma_sampler_quantile_parity():
    """Every sigma distribution, fed IDENTICAL quantiles, must produce the
    reference's sigmas exactly (the stochastic stratification layer is
    orthogonal — it only generates the quantiles). Reference:
    /root/reference/src/training/sigma_sampler.py:111-212."""
    import jax.numpy as jnp
    _install_stubs()
    from training.sigma_sampler import (SigmaSampler as RefSampler,
                                        SigmaSamplerConfig as RefConfig)

    from dualdiffusion_tpu.training import (SigmaSampler,
                                            SigmaSamplerConfig)

    q = np.linspace(0.001, 0.999, 257).astype(np.float64)
    qt = torch.from_numpy(q)

    cases = [
        dict(distribution="ln_normal", dist_offset=-0.4, dist_scale=1.0),
        dict(distribution="ln_sech", dist_offset=0.3, dist_scale=1.0),
        dict(distribution="ln_sech", dist_offset=-0.2, dist_scale=1.3),
        dict(distribution="ln_sech^2", dist_offset=0.1, dist_scale=0.8),
        dict(distribution="ln_linear"),
        dict(distribution="linear", dist_scale=2.0),
        dict(distribution="scale_invariant", dist_scale=1.0),
    ]
    for kw in cases:
        ref = RefSampler(RefConfig(sigma_max=200.0, sigma_min=0.03, **kw))
        ref_s = ref.sample_fn(quantiles=qt).numpy()
        mine = SigmaSampler(SigmaSamplerConfig(sigma_max=200.0,
                                               sigma_min=0.03, **kw))
        fn = {"ln_normal": mine._ln_normal, "ln_sech": mine._ln_sech,
              "ln_sech^2": mine._ln_sech2, "ln_linear": mine._ln_linear,
              "linear": mine._linear,
              "scale_invariant": mine._scale_invariant}[kw["distribution"]]
        my_s = np.asarray(fn(jnp.asarray(q, jnp.float32)))
        np.testing.assert_allclose(my_s, ref_s, rtol=2e-4,
                                   err_msg=str(kw))

    # ln_pdf: same (sanitization-off) pdf, same quantiles -> same sigmas
    rng = np.random.default_rng(5)
    pdf = (rng.random(127) + 0.1).astype(np.float32)
    ref = RefSampler(RefConfig(distribution="ln_pdf",
                               dist_pdf=torch.from_numpy(pdf.copy()),
                               sigma_pdf_sanitization=False))
    ref_s = ref.sample_fn(quantiles=qt).numpy()
    mine = SigmaSampler(SigmaSamplerConfig(distribution="ln_pdf"))
    my_s = np.asarray(mine._ln_pdf(jnp.asarray(q, jnp.float32),
                                   jnp.asarray(pdf)))
    np.testing.assert_allclose(my_s, ref_s, rtol=2e-4)


def test_mp_primitives_parity():
    """Primitives NOT exercised by the UNet-forward golden (wavelets,
    lowpass, patchify, 1d/3d resamples, midside, space_to_channel,
    interleaved mp_cat, MPFourier) compared elementwise against the
    reference's torch mp_tools (layouts mapped NCHW <-> channel-last).
    Reference: /root/reference/src/modules/mp_tools.py:42-330."""
    import jax.numpy as jnp
    _install_stubs()
    import modules.mp_tools as ref

    from dualdiffusion_tpu.models import mp
    from dualdiffusion_tpu.models.layers import MPFourier

    rng = np.random.default_rng(11)

    def t_of(a):
        return torch.from_numpy(np.ascontiguousarray(a))

    def close(mine, theirs, tol=1e-5, msg=""):
        np.testing.assert_allclose(np.asarray(mine, np.float32),
                                   theirs.numpy(), rtol=tol, atol=tol,
                                   err_msg=msg)

    x = rng.standard_normal((2, 3, 8, 12)).astype(np.float32)  # NCHW
    x_cl = np.transpose(x, (0, 2, 3, 1))                       # NHWC

    # normalize / normalize_groups (groups along channels)
    close(mp.normalize(jnp.asarray(x)), ref.normalize(t_of(x)), msg="normalize")
    xg = rng.standard_normal((2, 6, 8, 12)).astype(np.float32)
    mine_g = mp.normalize_groups(jnp.asarray(np.transpose(xg, (0, 2, 3, 1))), 3)
    close(np.transpose(np.asarray(mine_g), (0, 3, 1, 2)),
          ref.normalize_groups(t_of(xg), 3), msg="normalize_groups")

    # resample 1d/2d/3d
    x1 = rng.standard_normal((2, 3, 16)).astype(np.float32)    # (B,C,T)
    for mode in ("down", "up"):
        close(np.swapaxes(np.asarray(
            mp.resample_1d(jnp.asarray(np.swapaxes(x1, 1, 2)), mode)), 1, 2),
            ref.resample_1d(t_of(x1), mode), msg=f"resample_1d {mode}")
        close(np.transpose(np.asarray(
            mp.resample_2d(jnp.asarray(x_cl), mode)), (0, 3, 1, 2)),
            ref.resample_2d(t_of(x), mode), msg=f"resample_2d {mode}")
    x3 = rng.standard_normal((2, 3, 2, 8, 12)).astype(np.float32)  # B,C,Z,H,W
    x3_cl = np.transpose(x3, (0, 2, 3, 4, 1))                      # B,Z,H,W,C
    for mode in ("down", "up"):
        close(np.transpose(np.asarray(
            mp.resample_3d(jnp.asarray(x3_cl), mode)), (0, 4, 1, 2, 3)),
            ref.resample_3d(t_of(x3), mode), msg=f"resample_3d {mode}")

    # patchify / space_to_channel (+ inverses; channel order (c, ph, pw))
    pats = mp.patchify_2d(jnp.asarray(x_cl), 4, 3)
    close(np.transpose(np.asarray(pats), (0, 3, 1, 2)),
          ref.patchify_2d(t_of(x), 4, 3), msg="patchify_2d")
    close(np.transpose(np.asarray(mp.unpatchify_2d(pats, 4, 3)), (0, 3, 1, 2)),
          ref.unpatchify_2d(ref.patchify_2d(t_of(x), 4, 3), 4, 3),
          msg="unpatchify_2d")
    close(np.transpose(np.asarray(
        mp.space_to_channel_2d(jnp.asarray(x_cl))), (0, 3, 1, 2)),
        ref.space_to_channel_2d(t_of(x)), msg="space_to_channel_2d")
    # NOTE: the reference's space_to_channel_3d is broken upstream (7-dim
    # view permuted with 6 dims, mp_tools.py:192 raises for ANY input —
    # dead code there); only the inverse direction can be goldened. This
    # repo's space_to_channel_3d is instead verified as the exact inverse
    # of channel_to_space_3d (round-trip test in tests/test_mp.py).
    x3p = rng.standard_normal((2, 12, 2, 4, 6)).astype(np.float32)
    x3p_cl = np.transpose(x3p, (0, 2, 3, 4, 1))
    close(np.transpose(np.asarray(
        mp.channel_to_space_3d(jnp.asarray(x3p_cl))), (0, 4, 1, 2, 3)),
        ref.channel_to_space_3d(t_of(x3p)), msg="channel_to_space_3d")

    # midside (axis-generic in this repo; reference is NCHW dim 1)
    x2 = rng.standard_normal((2, 2, 8, 12)).astype(np.float32)
    close(mp.midside_transform(jnp.asarray(x2), channel_axis=1),
          ref.midside_transform(t_of(x2)), msg="midside")

    # wavelets
    mine_w = mp.wavelet_decompose_2d(jnp.asarray(x_cl), num_levels=3)
    ref_w = ref.wavelet_decompose_2d(t_of(x), num_levels=3)
    for i, (a, b) in enumerate(zip(mine_w, ref_w)):
        close(np.transpose(np.asarray(a), (0, 3, 1, 2)), b,
              msg=f"wavelet level {i}")
    close(np.transpose(np.asarray(
        mp.wavelet_recompose_2d(mine_w)), (0, 3, 1, 2)),
        ref.wavelet_recompose_2d(ref_w), msg="wavelet_recompose")

    # lowpass (circular + square masks)
    for circ in (True, False):
        close(np.transpose(np.asarray(mp.lowpass_2d(
            jnp.asarray(x_cl), blur_width=4.0, use_circular_filter=circ)),
            (0, 3, 1, 2)),
            ref.lowpass_2d(t_of(x), blur_width=4.0, use_circular_filter=circ),
            tol=1e-4, msg=f"lowpass circ={circ}")

    # mp_cat interleave (channel axis)
    a = rng.standard_normal((2, 4, 8, 12)).astype(np.float32)
    b = rng.standard_normal((2, 4, 8, 12)).astype(np.float32)
    mine_i = mp.mp_cat_interleave(
        jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(b, (0, 2, 3, 1))), axis=-1, t=0.3)
    close(np.transpose(np.asarray(mine_i), (0, 3, 1, 2)),
          ref.mp_cat_interleave(t_of(a), t_of(b), t=0.3),
          msg="mp_cat_interleave")

    # MPFourier: deterministic erfinv-spaced freqs -> exact feature match
    s = rng.standard_normal(6).astype(np.float32)
    mod = MPFourier(num_channels=32)
    mine_f = mod.apply({}, jnp.asarray(s))
    close(mine_f, ref.MPFourier(32)(t_of(s)), tol=1e-4, msg="MPFourier")


def test_mss2d_loss_parity():
    """MSSLoss2D (the DAE trainers' recon loss) vs the reference's torch
    implementation across window/weighting/midside/mse/phase variants.
    Reference: /root/reference/src/training/loss/multiscale_spectral.py:121-297."""
    import jax.numpy as jnp
    _install_stubs()
    from training.loss.multiscale_spectral import (MSSLoss2D as RefLoss,
                                                   MSSLoss2DConfig as RefCfg)

    from dualdiffusion_tpu.training.losses import MSSLoss2D, MSSLoss2DConfig

    rng = np.random.default_rng(13)
    s = rng.standard_normal((2, 2, 32, 48)).astype(np.float32)
    t = (s + 0.1 * rng.standard_normal((2, 2, 32, 48))).astype(np.float32)

    cases = [
        dict(),
        dict(block_window_fn="hann", frequency_weighting="f^2"),
        dict(use_midside_transform="cat", phase_loss_scale=0.5),
        dict(use_midside_transform="none", use_mse_loss=True),
        dict(frequency_weighting="dynamic", block_widths=(8, 16),
             block_width_weight_exponent=-0.5),
    ]
    for kw in cases:
        ref = RefLoss(RefCfg(**kw), device=torch.device("cpu"))
        ref_loss = ref.mss_loss(torch.from_numpy(s), torch.from_numpy(t))
        if isinstance(ref_loss, tuple):
            ref_loss = ref_loss[0]
        mine = MSSLoss2D(MSSLoss2DConfig(**kw))
        my_loss = np.asarray(mine(jnp.asarray(s), jnp.asarray(t)))
        np.testing.assert_allclose(my_loss, ref_loss.numpy(), rtol=2e-4,
                                   err_msg=str(kw))


def test_sampling_schedule_parity():
    """Every named sigma schedule equals the reference's for the same
    (steps, sigma range, rho, t_start). Reference:
    /root/reference/src/sampling/schedule.py:30-79."""
    _install_stubs()
    from sampling.schedule import SamplingSchedule as RefSched

    from dualdiffusion_tpu.sampling.schedule import SamplingSchedule

    assert set(SamplingSchedule.get_schedules_list()) == \
        set(RefSched.get_schedules_list())
    for name in RefSched.get_schedules_list():
        for kw in (dict(sigma_max=200.0, sigma_min=0.03),
                   dict(sigma_max=11.0, sigma_min=2e-4, rho=3.0),
                   dict(sigma_max=80.0, sigma_min=0.002, t_start=0.6)):
            ref_s = RefSched.get_schedule(name, 50, **kw).numpy()
            my_s = np.asarray(SamplingSchedule.get_schedule(name, 50, **kw))
            # fp32: tiny tail sigmas carry ~1e-6 relative rounding
            np.testing.assert_allclose(
                my_s, ref_s, rtol=5e-4, atol=1e-6 * np.abs(ref_s).max(),
                err_msg=f"{name} {kw}")


def test_wavelet_loss_parity():
    """Laplacian-pyramid wavelet loss vs the reference (both midside modes
    goldened; level weights 4^(-i*e)). Reference:
    /root/reference/src/training/loss/wavelet.py:38-84."""
    import jax.numpy as jnp
    _install_stubs()
    from training.loss.wavelet import (WaveletLoss as RefLoss,
                                       WaveletLoss_Config as RefCfg)

    from dualdiffusion_tpu.training.losses import wavelet_loss

    rng = np.random.default_rng(17)
    s = rng.standard_normal((2, 2, 16, 24)).astype(np.float32)
    t = (s + 0.2 * rng.standard_normal(s.shape)).astype(np.float32)
    s_cl = np.transpose(s, (0, 2, 3, 1))
    t_cl = np.transpose(t, (0, 2, 3, 1))

    for midside in ("none", "stack"):
        ref = RefLoss(RefCfg(levels=3, level_weight_exponent=0.75,
                             use_midside_transform=midside))
        ref_loss, _ = ref.wavelet_loss(torch.from_numpy(s),
                                       torch.from_numpy(t))
        mine = wavelet_loss(jnp.asarray(s_cl), jnp.asarray(t_cl),
                            num_levels=3, level_exponent=0.75,
                            use_midside=midside == "stack")
        np.testing.assert_allclose(np.asarray(mine), ref_loss.numpy(),
                                   rtol=2e-5, err_msg=midside)


def test_newton_schulz5_parity():
    """Muon's quintic Newton-Schulz orthogonalization core vs the
    reference (which runs in bf16; this repo runs fp32 — tolerance covers
    the bf16 rounding). Reference: /root/reference/src/training/nor_muon.py:72-107."""
    import jax.numpy as jnp
    _install_stubs()
    from training.nor_muon import _zeropower_via_newtonschulz5 as ref_ns5

    from dualdiffusion_tpu.training.optim import _newton_schulz5

    rng = np.random.default_rng(19)
    for shape in ((16, 48), (48, 16), (32, 32)):
        g = rng.standard_normal(shape).astype(np.float32)
        ref_o = ref_ns5(torch.from_numpy(g)[None]).float().numpy()[0]
        my_o = np.asarray(_newton_schulz5(jnp.asarray(g)))
        # directions must agree; bf16 NS amplifies rounding ~1e-2
        denom = np.abs(ref_o).max()
        assert np.abs(my_o - ref_o).max() / denom < 5e-2, shape
        # and the output must be near-orthogonal (singular values ~1)
        s = np.linalg.svd(my_o if shape[0] <= shape[1] else my_o.T,
                          compute_uv=False)
        assert (np.abs(s - 1.0) < 0.35).all(), (shape, s)


def test_mdct_and_raw_format_parity():
    """Standalone MDCT format (single + dual channel MCLT) and the Raw
    format (mel-density pre-emphasis, analytic dual channel) vs the
    reference on the same clip. Layouts: this repo is channel-last
    (B, bins, frames, C); the reference is (B, bins, C, frames) with dual
    MCLT concatenated on the bins axis. References:
    /root/reference/src/modules/formats/{mdct.py:58-118, raw.py:58-104}."""
    import jax.numpy as jnp
    _install_stubs()
    from modules.formats.mdct import (MDCT_Format as RefMDCT,
                                      MDCT_FormatConfig as RefMDCTCfg)
    from modules.formats.raw import (RawFormat as RefRaw,
                                     RawFormatConfig as RefRawCfg)

    from dualdiffusion_tpu.models.formats.mdct import (MDCTFormat,
                                                       MDCTFormatConfig)
    from dualdiffusion_tpu.models.formats.raw import (RawFormat,
                                                      RawFormatConfig)

    rng = np.random.default_rng(23)
    raw = rng.standard_normal((1, 2, 32768)).astype(np.float32) * 0.1

    ref = RefMDCT(RefMDCTCfg())
    mine = MDCTFormat(MDCTFormatConfig())
    r1 = ref.raw_to_mdct(torch.from_numpy(raw)).numpy()
    m1 = np.transpose(
        np.asarray(mine.raw_to_mdct(jnp.asarray(raw))), (0, 1, 3, 2))
    np.testing.assert_allclose(m1, r1, atol=2e-5 * np.abs(r1).max())
    r_back = ref.mdct_to_raw(torch.from_numpy(r1)).numpy()
    m_back = np.asarray(mine.mdct_to_raw(mine.raw_to_mdct(jnp.asarray(raw))))
    np.testing.assert_allclose(m_back, r_back,
                               atol=2e-5 * np.abs(r_back).max())

    rd = ref.raw_to_mdct(torch.from_numpy(raw), dual_channel=True).numpy()
    md = np.asarray(mine.raw_to_mdct(jnp.asarray(raw), dual_channel=True))
    bins = md.shape[1]
    md_ref_layout = np.concatenate(
        [np.transpose(md[..., :2], (0, 1, 3, 2)),
         np.transpose(md[..., 2:], (0, 1, 3, 2))], axis=1)
    assert md_ref_layout.shape == rd.shape, (md.shape, rd.shape)
    np.testing.assert_allclose(md_ref_layout, rd,
                               atol=2e-5 * np.abs(rd).max())

    for dual in (False, True):
        ref_r = RefRaw(RefRawCfg(dual_channel=dual))
        my_r = RawFormat(RawFormatConfig(dual_channel=dual))
        a = ref_r.scale(torch.from_numpy(raw)).numpy()
        b = np.asarray(my_r.raw_to_sample(jnp.asarray(raw)))
        np.testing.assert_allclose(b, a, atol=2e-5 * np.abs(a).max(),
                                   err_msg=f"raw scale dual={dual}")
        ar = ref_r.unscale(torch.from_numpy(a)).numpy()
        br = np.asarray(my_r.sample_to_raw(jnp.asarray(b)))
        np.testing.assert_allclose(br, ar, atol=2e-5 * np.abs(ar).max(),
                                   err_msg=f"raw unscale dual={dual}")


def test_dae_forward_parity():
    """DAE encode/decode with IDENTICAL weights vs the reference's torch
    q4 DAE (model-level parity beyond the UNet golden). Reference:
    /root/reference/src/modules/daes/dae_edm2_q4.py:205-350."""
    import jax
    import jax.numpy as jnp
    _install_stubs()
    from modules.daes.dae_edm2_q4 import DAE as RefDAE, DAE_Config as RefCfg

    from dualdiffusion_tpu.models.convert import torch_dae_state_to_variables
    from dualdiffusion_tpu.models.dae import DAE, DAEConfig

    ref = RefDAE(RefCfg(in_channels=2, out_channels=2, latent_channels=4,
                        model_channels=16, channel_mult_enc=(1, 2),
                        channel_mult_dec=(1, 2), in_channels_emb=0,
                        num_enc_layers_per_block=2,
                        num_dec_layers_per_block=1)).eval()
    # the reference normalizes MP weights only on optimizer steps; force
    # one normalization so both sides run on the same normalized weights
    ref.normalize_weights()
    state = {k: v.numpy() for k, v in ref.state_dict().items()}

    cfg = DAEConfig(in_channels=2, out_channels=2, latent_channels=4,
                    model_channels=16, channel_mult_enc=(1, 2),
                    channel_mult_dec=(1, 2), num_enc_layers_per_block=2,
                    num_dec_layers_per_block=1, compute_dtype="float32")
    model = DAE(cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 2)))
    variables = torch_dae_state_to_variables(state, template,
                                             num_levels=2, num_enc_layers=2,
                                             num_dec_layers=1)

    rng = np.random.default_rng(29)
    x = rng.standard_normal((2, 2, 16, 32)).astype(np.float32)  # NCHW
    x_cl = np.transpose(x, (0, 2, 3, 1))

    with torch.no_grad():
        ref_lat = ref.encode(torch.from_numpy(x), None).numpy()
        ref_rec = ref.decode(torch.from_numpy(ref_lat), None).numpy()
    my_lat = np.asarray(model.apply(variables, jnp.asarray(x_cl),
                                    method=DAE.encode))
    my_rec = np.asarray(model.apply(
        variables, jnp.asarray(np.transpose(ref_lat, (0, 2, 3, 1))),
        method=DAE.decode))

    lat_err = np.abs(np.transpose(my_lat, (0, 3, 1, 2)) - ref_lat).max() \
        / np.abs(ref_lat).max()
    rec_err = np.abs(np.transpose(my_rec, (0, 3, 1, 2)) - ref_rec).max() \
        / np.abs(ref_rec).max()
    assert lat_err < 1e-3, lat_err
    assert rec_err < 1e-3, rec_err


def test_discriminator_forward_parity():
    """CLAP-conditioned discriminator (j3) with IDENTICAL weights vs the
    reference: logits + hidden KLD must match (< 1e-3). Covers the
    reflect-W conv padding, the learned residual balance, the
    no-activation label embedding and the ddof=1 KLD variance.
    Reference: /root/reference/src/modules/discs/disc_j3.py:44-240."""
    import jax
    import jax.numpy as jnp
    _install_stubs()
    from modules.discs.disc_j3 import (Discriminator_J3 as RefDisc,
                                       Discriminator_J3_Config as RefCfg)

    from dualdiffusion_tpu.models.discriminator import (Discriminator,
                                                        DiscriminatorConfig)

    ref = RefDisc(RefCfg(in_channels_emb=32, model_channels=8,
                         channel_mult_emb=4, num_layers=2)).eval()
    ref.normalize_weights()
    state = {k: v.numpy() for k, v in ref.state_dict().items()}

    cfg = DiscriminatorConfig(in_channels_emb=32, model_channels=8,
                              channel_mult_emb=4, num_layers=2)
    model = Discriminator(cfg)
    rng = np.random.default_rng(31)
    x = rng.standard_normal((2, 2, 16, 24)).astype(np.float32)  # B,C,H,W
    emb_in = rng.standard_normal((2, 32)).astype(np.float32)
    # reference folds stereo into Z with ONE data channel (disc_j3.py:232)
    x5 = x[:, None].transpose(0, 2, 3, 4, 1)         # (B, Z=2, H, W, C=1)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(x5),
                          jnp.asarray(emb_in), method=Discriminator.init_all)

    from flax.traverse_util import flatten_dict, unflatten_dict
    flat_t = flatten_dict(template["params"])
    out = dict(flat_t)
    for key, val in state.items():
        parts = key.replace("disc.disc.", "blocks#").replace(
            "disc.", "").split(".")
        if parts[0].startswith("blocks#"):
            parts = [parts[0].replace("blocks#layer", "blocks_")] + parts[1:]
        path = tuple(p for p in parts[:-1]) + (
            {"weight": "w_mp", "bias": "bias"}.get(parts[-1], parts[-1]),)
        tval = flat_t[path]
        out[path] = jnp.asarray(np.asarray(val, np.float32)
                                .reshape(np.shape(tval)))
    variables = dict(template, params=unflatten_dict(out))

    with torch.no_grad():
        ref_emb = ref.get_embeddings(torch.from_numpy(emb_in))
        ref_logits = ref(torch.from_numpy(x), None, ref_emb, training=False)
        _, ref_kld = ref.disc(
            torch.from_numpy(x[:, None]),
            ref_emb.unsqueeze(-1).unsqueeze(-1).unsqueeze(-1))
    my_emb = model.apply(variables, jnp.asarray(emb_in),
                         method=Discriminator.get_embeddings)
    my_logits, my_kld = model.apply(variables, jnp.asarray(x5), my_emb)

    # my_logits: (B, Z, H, W, 1) -> reference 4d (B, Z(C), H, W)
    ml = np.asarray(my_logits)[..., 0]
    rl = ref_logits.numpy()
    assert np.abs(ml - rl).max() / np.abs(rl).max() < 1e-3
    np.testing.assert_allclose(np.asarray(my_kld), ref_kld.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_vae_forward_parity():
    """Legacy uniform-target-SNR KL VAE with IDENTICAL weights vs the
    reference's AutoencoderKL_EDM2: encode latents + decode output match
    < 1e-3. Reference: /root/reference/src/modules/old/vaes/vae_edm2.py:51-290."""
    import jax
    import jax.numpy as jnp
    _install_stubs()
    # vae_edm2.py imports the pre-move path "modules.vaes.vae"; the base
    # now lives under modules/old/vaes (stale upstream import) — alias it
    import importlib
    vae_base = importlib.import_module("modules.old.vaes.vae")
    sys.modules.setdefault("modules.vaes", types.ModuleType("modules.vaes"))
    sys.modules["modules.vaes.vae"] = vae_base
    from modules.old.vaes.vae_edm2 import (AutoencoderKL_EDM2 as RefVAE,
                                           DualDiffusionVAE_EDM2Config
                                           as RefCfg)

    from dualdiffusion_tpu.models.vae import VAE, VAEConfig

    kw = dict(in_channels=2, out_channels=2, latent_channels=4,
              label_dim=16, model_channels=8, channel_mult=(1, 2),
              channel_mult_emb=2, num_layers_per_block=1)
    ref = RefVAE(RefCfg(**kw)).eval()
    ref.normalize_weights()
    state = {k: v.numpy() for k, v in ref.state_dict().items()}

    model = VAE(VAEConfig(**kw))
    rng = np.random.default_rng(37)
    x = rng.standard_normal((2, 2, 16, 24)).astype(np.float32)   # NCHW
    labels = rng.standard_normal((2, 16)).astype(np.float32)
    lf_mel = rng.standard_normal(16).astype(np.float32)          # sample res
    lf_lat = rng.standard_normal(8).astype(np.float32)           # latent res

    x_cl = np.transpose(x, (0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(x_cl),
                          jnp.asarray(labels), method=VAE.init_all)

    # positional mapping reference ModuleDict order == this repo's lists
    enc_names, idx = [], 0
    L, n = 2, kw["num_layers_per_block"]
    for level in range(L):
        if level > 0:
            enc_names.append(f"block{level}_down")
        enc_names += [f"block{level}_layer{i}" for i in range(n)]
    dec_names = []
    for level in reversed(range(L)):
        if level == L - 1:
            dec_names += [f"block{level}_in0", f"block{level}_in1"]
        else:
            dec_names.append(f"block{level}_up")
        dec_names += [f"block{level}_layer{i}" for i in range(n + 1)]
    enc_idx = {nm: i for i, nm in enumerate(enc_names)}
    dec_idx = {nm: i for i, nm in enumerate(dec_names)}

    from flax.traverse_util import flatten_dict, unflatten_dict
    flat_t = flatten_dict(template["params"])
    out = dict(flat_t)
    for key, val in state.items():
        parts = key.split(".")
        if parts == ["latents_logvar"]:
            continue  # unused in the reference too
        if parts[0] == "enc":
            if parts[1] == "conv_in":
                path = ("conv_in",)
            else:
                path = (f"enc_{enc_idx[parts[1]]}",) + tuple(parts[2:-1])
        elif parts[0] == "dec":
            path = (f"dec_{dec_idx[parts[1]]}",) + tuple(parts[2:-1])
        else:
            path = tuple(parts[:-1])
        leaf = {"weight": "w_mp", "bias": "bias"}.get(parts[-1], parts[-1])
        if parts[-1] in ("out_gain", "latents_out_gain",
                         "recon_loss_logvar", "emb_gain"):
            path, leaf = path, parts[-1]
        path = path + (leaf,)
        tval = flat_t[path]
        out[path] = jnp.asarray(np.asarray(val, np.float32)
                                .reshape(np.shape(tval)))
    variables = dict(template, params=unflatten_dict(out))

    class _Fmt:
        def get_ln_freqs(self, xt):
            lf = lf_mel if xt.shape[2] == 16 else lf_lat
            return torch.from_numpy(
                np.broadcast_to(lf[None, None, :, None],
                                (xt.shape[0], 1, len(lf), xt.shape[3]))
                .astype(np.float32).copy())

    with torch.no_grad():
        # NOT ref.get_embeddings: the reference replaces the labels with
        # torch.randn_like (vae_edm2.py:230, "mysteriously generates
        # sharper output") — compute the deterministic embedding path
        from modules.mp_tools import mp_silu as ref_mp_silu
        from modules.mp_tools import normalize as ref_normalize
        ref_emb = ref_mp_silu(ref.emb_label(
            ref_normalize(torch.from_numpy(labels))))
        ref_dist = ref.encode(torch.from_numpy(x), ref_emb, _Fmt())
        ref_lat = ref_dist.mode().numpy()
        ref_rec = ref.decode(torch.from_numpy(ref_lat), ref_emb,
                             _Fmt()).numpy()
    my_emb = model.apply(variables, jnp.asarray(labels),
                         method=VAE.get_embeddings)
    np.testing.assert_allclose(np.asarray(my_emb), ref_emb.numpy(),
                               rtol=1e-4, atol=1e-5)
    my_dist = model.apply(variables, jnp.asarray(x_cl), my_emb,
                          jnp.asarray(lf_mel), method=VAE.encode)
    my_lat = np.asarray(my_dist.mean)
    my_rec = np.asarray(model.apply(
        variables, jnp.asarray(np.transpose(ref_lat, (0, 2, 3, 1))),
        my_emb, jnp.asarray(lf_lat), method=VAE.decode))

    lat_err = np.abs(np.transpose(my_lat, (0, 3, 1, 2)) - ref_lat).max() \
        / np.abs(ref_lat).max()
    rec_err = np.abs(np.transpose(my_rec, (0, 3, 1, 2)) - ref_rec).max() \
        / np.abs(ref_rec).max()
    assert lat_err < 1e-3, lat_err
    assert rec_err < 1e-3, rec_err


def test_unet_d1_3d_forward_parity():
    """The d1-series 3D latent UNet (the reference's current latent
    diffusion architecture) with IDENTICAL weights: stereo-folded E-variant
    convs (reflect-W padding, back-reflect Z == circular wrap at Z=2,
    (2,3,3) io kernels, plain 1x1 skips, no biases), constant + ln-freq
    input channels, double mid block with attention, grouped MLPs, full
    spatial attention. Reference: /root/reference/src/modules/unets/
    unet_edm2_d1.py:44-368."""
    import jax
    import jax.numpy as jnp
    _install_stubs()
    from modules.unets.unet_edm2_d1 import UNet_D1, UNet_D1_Config

    from dualdiffusion_tpu.models.convert import torch_unet_state_to_variables
    from dualdiffusion_tpu.models.unet import UNet, UNetConfig

    ref = UNet_D1(UNet_D1_Config(
        in_channels=4, out_channels=4, in_channels_emb=16, in_num_freqs=8,
        model_channels=8, channel_mult=(1, 2), channel_mult_noise=2,
        channel_mult_emb=2, channels_per_head=8, num_layers_per_block=1,
        attn_levels=(1,), mlp_multiplier=2, mlp_groups=2,
        emb_linear_groups=2, logvar_channels=16, double_midblock=True,
        midblock_attn=True, add_constant_channel=True)).eval()
    ref.normalize_weights()
    state = {k: v.float().numpy() for k, v in ref.state_dict().items()}
    # the d1 forward hard-casts embeddings to bf16 (unet_edm2_d1.py:348)
    # and mp_sum requires matching dtypes -> run the reference in bf16,
    # exactly how its from_pretrained serves it
    ref = ref.to(dtype=torch.bfloat16)

    cfg = UNetConfig(in_channels=4, out_channels=4, in_channels_emb=16,
                     in_num_freqs=8, model_channels=8, channel_mult=(1, 2),
                     channel_mult_noise=2, channel_mult_emb=2,
                     channels_per_head=8, num_layers_per_block=1,
                     attn_levels=(1,), attn_axis="full", mlp_multiplier=2,
                     mlp_groups=2, emb_linear_groups=2, logvar_channels=16,
                     double_midblock=True, midblock_attn=True, use_3d=True,
                     io_kernel_z=2, conv_w_pad="reflect",
                     io_bias=False, always_skip=True,
                     add_constant_channel=True,
                     add_ln_freqs_channel=True)
    model = UNet(cfg)

    rng = np.random.default_rng(41)
    b, z, h, w = 2, 2, 8, 12
    x5 = rng.standard_normal((b, 4, z, h, w)).astype(np.float32)  # B,C,Z,H,W
    x4 = x5.reshape(b, 4 * z, h, w)                  # tensor_5d_to_4d order
    emb_in = rng.standard_normal((b, 16)).astype(np.float32)
    sigma = np.array([3.0, 0.5], np.float32)
    ln_freqs = np.log2(np.linspace(40.0, 8000.0, h)).astype(np.float32)
    x_cl = np.transpose(x5, (0, 2, 3, 4, 1))         # B,Z,H,W,C

    template = model.init(jax.random.PRNGKey(0), jnp.asarray(x_cl),
                          jnp.asarray(sigma), jnp.asarray(emb_in),
                          method=UNet.init_all)
    variables = torch_unet_state_to_variables(state, template)

    class _Fmt:
        class ms_freq_scale:
            @staticmethod
            def get_unscaled(n, device=None):
                # n = h + 2; the reference drops the endpoints
                full = np.concatenate([[20.0], np.linspace(40.0, 8000.0,
                                                           n - 2), [16000.0]])
                return torch.from_numpy(full.astype(np.float32))

    with torch.no_grad():
        ref_emb = ref.get_embeddings(torch.from_numpy(emb_in),
                                     torch.ones(b))
        ref_out = ref(torch.from_numpy(x4), torch.from_numpy(sigma),
                      _Fmt(), ref_emb).float().numpy()
        ref_lv = ref.get_sigma_loss_logvar(
            torch.from_numpy(sigma)).float().numpy()

    my_emb = model.apply(variables, jnp.asarray(emb_in), jnp.ones((b,)),
                         method=UNet.get_embeddings)
    np.testing.assert_allclose(np.asarray(my_emb), ref_emb.float().numpy(),
                               rtol=5e-2, atol=5e-2)
    my_out = np.asarray(model.apply(variables, jnp.asarray(x_cl),
                                    jnp.asarray(sigma), my_emb,
                                    ln_freqs=jnp.asarray(ln_freqs)))
    my_lv = np.asarray(model.apply(variables, jnp.asarray(sigma),
                                   method=UNet.get_sigma_loss_logvar))

    # ours (B,Z,H,W,C) -> reference 4d (B, C*Z, H, W)
    mo = np.transpose(my_out, (0, 4, 1, 2, 3)).reshape(b, 4 * z, h, w)
    err = np.abs(mo - ref_out).max() / np.abs(ref_out).max()
    # bf16 internals on both sides; identical weights
    assert err < 2e-2, err
    np.testing.assert_allclose(my_lv.reshape(-1), ref_lv.reshape(-1),
                               rtol=2e-2, atol=2e-3)


def test_mel_cascade_parity():
    """MelCascade transition matrices and forward/inverse transforms vs the
    reference's torch implementation. Reference:
    /root/reference/src/modules/mel_cascade.py:28-235."""
    import jax.numpy as jnp
    _install_stubs()
    import modules.mel_cascade as ref_mc

    from dualdiffusion_tpu.models import mel_cascade as mc

    # frequency grids + transition matrix construction
    for n, alpha in ((64, 0.0), (64, 0.5), (48, 1.0)):
        a = mc.get_frequency_grid(n, alpha)
        b = ref_mc.get_frequency_grid(n, alpha)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
    src = ref_mc.get_frequency_grid(64, 0.0)
    tgt = ref_mc.get_frequency_grid(32, 0.5)
    A_ref = ref_mc.build_transition_matrix(
        torch.from_numpy(np.asarray(src, np.float32)),
        torch.from_numpy(np.asarray(tgt, np.float32))).numpy()
    A_my = mc.build_transition_matrix(np.asarray(src, np.float32),
                                      np.asarray(tgt, np.float32))
    np.testing.assert_allclose(np.asarray(A_my), A_ref, atol=1e-5)

    # full cascade forward on a random spectrogram-like input
    rng = np.random.default_rng(43)
    x = np.abs(rng.standard_normal((2, 2, 64, 12))).astype(np.float32)
    ref = ref_mc.MelCascade(num_bins=64, num_stages=2)
    mine = mc.MelCascade(num_bins=64, num_stages=2)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    my_out = mine(jnp.asarray(x))
    if isinstance(ref_out, (list, tuple)):
        ref_out = ref_out[-1]
    np.testing.assert_allclose(np.asarray(my_out), ref_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_clap_normalize_concat_parity(ref_modules):
    """Drive the REFERENCE's CLAP_Embedding.encode_audio with injected
    deterministic stand-in models and this framework's CLAPEmbedding with
    equivalent stand-ins: the surrounding math — mono downmix, 10 s chunk
    truncation, per-model mp-normalize (RMS-1 scale, NOT unit L2), and
    1024-d concatenation — must produce IDENTICAL embeddings
    (clap.py:85-110; the frozen model weights themselves are the
    documented substitution, see models/embeddings.py docstring)."""
    del ref_modules  # fixture only for stubs + sys.path
    from modules.embeddings.clap import CLAP_Config, CLAP_Embedding

    from dualdiffusion_tpu.models.embeddings import CLAPConfig, CLAPEmbedding

    sr = 48000
    chunk = 10 * sr
    rng = np.random.default_rng(7)
    audio = rng.standard_normal((2, int(chunk * 2.6))).astype(np.float32)

    # deterministic "models": chunk (n, 480000) -> features (n, 512)
    def feats1(t):
        return t[:, :512] * 3.0 + 0.25

    def feats2(t):
        return t[:, 512:1024] * -2.0 + 0.5

    # ---- reference side ----
    ref = CLAP_Embedding(CLAP_Config())

    class _Proc:
        def __call__(self, audios=None, return_tensors=None,
                     sampling_rate=None, **kw):
            return {"input_features": torch.stack(
                [torch.as_tensor(np.asarray(a)) for a in audios])}

    class _M1:
        def get_audio_features(self, f):
            return feats1(f)

    class _M2:
        def get_audio_embedding_from_data(self, a, use_tensor=True):
            return feats2(a)

    ref.clap_processor = _Proc()
    ref.clap_model1 = _M1()
    ref.clap_model2 = _M2()
    ref_out = ref.encode_audio(torch.from_numpy(audio), sr).numpy()

    # ---- this framework ----
    ours = CLAPEmbedding(CLAPConfig())

    class _OurProc:
        def __call__(self, audios=None, sampling_rate=None,
                     return_tensors=None, **kw):
            return {"input_features": torch.stack(
                [torch.as_tensor(np.asarray(a)) for a in audios])}

    class _OurM:
        def __init__(self, fn):
            self.fn = fn

        def get_audio_features(self, input_features):
            return self.fn(input_features)

    ours._models = [(_OurM(feats1), _OurProc()), (_OurM(feats2), _OurProc())]
    our_out = ours.encode_audio(audio, sr)

    assert ref_out.shape == our_out.shape == (2, 1024)
    # the reference half-embeddings are RMS-1 scaled (L2 ~ sqrt(512)):
    # catches a unit-L2 normalization substitution immediately
    assert abs(np.linalg.norm(ref_out[0, :512]) - np.sqrt(512)) < 1.0
    np.testing.assert_allclose(our_out, ref_out, atol=1e-5)


def test_clap_golden():
    """Verify CLAPEmbedding against the captured golden
    (scripts/capture_clap_golden.py). Skipped unless both the golden file
    and the CLAP weights are locally available (zero-egress builds have
    neither; run the capture script wherever weights exist)."""
    golden_path = (Path(__file__).parent / "goldens" /
                   "clap_golden.safetensors")
    if not golden_path.is_file():
        pytest.skip("no CLAP golden captured (see capture_clap_golden.py)")
    import sys as _sys
    _sys.path.insert(0, str(Path(__file__).parents[1] / "scripts"))
    from capture_clap_golden import FIXTURE_TEXTS, fixture_clip

    from dualdiffusion_tpu.models.embeddings import CLAPEmbedding
    from dualdiffusion_tpu.utils import load_safetensors

    enc = CLAPEmbedding()
    try:
        enc._load()
    except RuntimeError as e:
        pytest.skip(f"CLAP weights unavailable: {e}")
    golden = load_safetensors(golden_path)
    audio_emb = enc.encode_audio(fixture_clip(), 48000)
    np.testing.assert_allclose(audio_emb,
                               np.asarray(golden["audio_embeddings"]),
                               atol=1e-4)
    text_emb = enc.encode_text(FIXTURE_TEXTS)
    np.testing.assert_allclose(text_emb,
                               np.asarray(golden["text_embeddings"]),
                               atol=1e-4)
