"""MS+MDCT dual format (current generation): multi-window blended mel
spectrogram for the DAE/latent-UNet path + MDCT coefficients for the
diffusion-decoder path.

Capability parity with the reference's MS_MDCT_DualFormat v2
(reference: src/modules/formats/ms_mdct_dual_2.py:35-381):

  * N hann**e windows (e = 9/32/112), each RMS-normalized, each STFT'd
    (normalized, 4096-pt, 256-hop); magnitudes divided by the stft-bin mel
    density, projected through a slaney triangular mel filterbank
    (RMS-normalized per filter), and blended per mel filter with gaussian
    weights on log(ideal filter width / window width) (:141-152, :204-215).
  * mel spec = blended**0.25, affine-normalized (:216).
  * ``mel_spec_to_linear``: pinv mel-unscale * sqrt(mel density), last bin
    dropped — the DDEC conditioning (:219-224).
  * MDCT path: 512-sample sin/kbd/vorbis window MDCT, mel-density
    normalized, optional random phase augmentation, phase/psd split
    (:250-291).

Layouts: mel spec (B, F=256, T, C); MDCT (B, N=256, frames, C).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import FrequencyScale, get_window, mdct as _mdct, imdct as _imdct, mel_density, stft
from .format import Format, FormatConfig, register_format


@dataclass
class MSMDCTDualFormatConfig(FormatConfig):
    # mdct params (reference defaults ms_mdct_dual_2.py:40-55)
    raw_to_mdct_scale: float = 0.00395184212251821011433253029603
    mdct_psd_scale: float = 0.07179056842448940381561506832112
    mdct_psd_offset: float = -0.1806843343919556
    mdct_psd_exponent: float = 0.25
    mdct_phase_scale: float = 1.0
    mdct_window_len: int = 512
    mdct_window_func: str = "sin"  # sin | kaiser_bessel_derived | vorbis

    # mel-spec params
    raw_to_mel_spec_scale: float = 0.48693139085749312574067728443989
    raw_to_mel_spec_offset: float = -1.530891040808645
    mel_spec_to_linear_scale: float = 15.11100987193986714324861053997
    mel_spec_to_linear_offset: float = 0.0
    ms_abs_exponent: float = 0.25
    ms_freq_min: float = 0.0
    ms_freq_max_override: Optional[float] = None  # pitch-shift augmentation
    ms_num_filters: int = 256
    ms_ideal_num_filter_bins: float = 3.0
    ms_window_length: int = 4096
    ms_blend_sharpness: float = 30.0
    ms_window_exponents: Tuple[float, ...] = (9.0, 32.0, 112.0)

    @property
    def mdct_num_frequencies(self) -> int:
        return self.mdct_window_len // 2

    @property
    def mdct_frame_hop_length(self) -> int:
        return self.mdct_window_len // 2

    @property
    def ms_num_stft_bins(self) -> int:
        return self.ms_window_length // 2 + 1

    @property
    def ms_hop_length(self) -> int:
        return self.mdct_frame_hop_length

    @property
    def ms_width_alignment(self) -> int:
        return self.mdct_frame_hop_length // 2

    @property
    def ms_freq_max(self) -> float:
        return self.ms_freq_max_override or self.sample_rate / 2


_MDCT_WINDOW_MAP = {"sin": "sin_mdct", "kaiser_bessel_derived": "kbd_mdct",
                    "vorbis": "vorbis"}


@register_format("ms_mdct_dual")
class MSMDCTDualFormat(Format):
    config_class = MSMDCTDualFormatConfig

    def __init__(self, config: MSMDCTDualFormatConfig) -> None:
        super().__init__(config)
        cfg = config

        # ----- mel-spec setup (all host-side float64 constants) ------------
        hann = get_window("hann", cfg.ms_window_length, periodic=True)
        windows = np.stack([hann ** e for e in cfg.ms_window_exponents])
        windows = windows / np.sqrt((windows ** 2).mean(axis=1, keepdims=True))
        self.ms_windows = windows

        self.ms_freq_scale = FrequencyScale(
            freq_scale="mel", freq_min=cfg.ms_freq_min, freq_max=cfg.ms_freq_max,
            sample_rate=cfg.sample_rate, num_stft_bins=cfg.ms_num_stft_bins,
            num_filters=cfg.ms_num_filters, filter_norm="slaney",
            filter_shape="triangular")

        mel_freqs = self.ms_freq_scale.get_unscaled(cfg.ms_num_filters + 2)
        self.ms_filter_center_hz = mel_freqs[1:-1]
        bandwidths = mel_freqs[2:] - mel_freqs[:-2]
        num_filter_bins = bandwidths / cfg.sample_rate * cfg.ms_num_stft_bins * 2
        ideal_widths = cfg.ms_ideal_num_filter_bins / num_filter_bins * cfg.ms_window_length

        # filters RMS-normalized per filter (reference :136-138); filters
        # shifted entirely past Nyquist (pitch-shift augmentation) are empty
        # — leave them zero instead of dividing by zero
        raw_filters = self.ms_freq_scale.filters.astype(np.float64)
        rms = np.sqrt((raw_filters ** 2).mean(axis=0, keepdims=True))
        filters = raw_filters / np.maximum(rms, 1e-12)
        self.ms_filters = filters.astype(np.float32)
        # mel_spec_to_linear inverts via the RAW (un-normalized) slaney
        # filterbank — the reference's runtime lstsq goes through
        # ms_freq_scale.filters, NOT the RMS-normalized forward bank
        # (reference :220 unscale + frequency_scale.py:130-142); its
        # minimum-norm lstsq solution equals this precomputed pinv
        self._filters_pinv = np.linalg.pinv(raw_filters.T,
                                            rcond=1e-10).astype(np.float32)

        # effective window widths (reference :141-144)
        window_widths = np.array([2 * np.arccos(2.0 ** (-1.0 / e)) / np.pi * 2 * cfg.ms_window_length
                                  for e in cfg.ms_window_exponents])
        weights = np.zeros((cfg.ms_num_filters, len(cfg.ms_window_exponents)))
        for i in range(cfg.ms_num_filters):
            w = np.exp(-cfg.ms_blend_sharpness * np.log(ideal_widths[i] / window_widths) ** 2)
            weights[i] = w / w.sum()
        self.ms_filter_window_weights = weights.astype(np.float32)

        stft_hz = np.linspace(0, cfg.sample_rate / 2, cfg.ms_num_stft_bins)
        self.ms_stft_mel_density = np.asarray(mel_density(stft_hz), np.float32)

        # ----- mdct setup ---------------------------------------------------
        mdct_hz = (np.arange(cfg.mdct_num_frequencies) + 0.5) * cfg.sample_rate / cfg.mdct_window_len
        self.mdct_mel_density = np.asarray(mel_density(mdct_hz), np.float32)
        self.mdct_window_fn = _MDCT_WINDOW_MAP[cfg.mdct_window_func]

    # ---- shape math (reference :179-199) ----------------------------------
    def _get_num_mel_frames(self, raw_len: int) -> int:
        return 1 + raw_len // self.config.ms_hop_length

    def get_raw_crop_width(self, raw_length: Optional[int] = None) -> int:
        cfg = self.config
        raw_length = raw_length or cfg.default_raw_length
        n = self._get_num_mel_frames(raw_length)
        n = n // cfg.ms_width_alignment * cfg.ms_width_alignment
        return (n - 1) * cfg.ms_hop_length

    def get_mel_spec_shape(self, bsz: int = 1, raw_length: Optional[int] = None) -> Tuple[int, ...]:
        w = self.get_raw_crop_width(raw_length)
        return (bsz, self.config.ms_num_filters, self._get_num_mel_frames(w),
                self.config.num_raw_channels)

    def get_mdct_shape(self, bsz: int = 1, raw_length: Optional[int] = None) -> Tuple[int, ...]:
        w = self.get_raw_crop_width(raw_length)
        n_bins = self.config.mdct_num_frequencies
        return (bsz, n_bins, w // n_bins + 1, self.config.num_raw_channels)

    def get_mdct_shape_for_mel_frames(self, bsz: int,
                                      n_mel_frames: int) -> Tuple[int, ...]:
        """MDCT sample shape aligned 1:1 with a mel spec of ``n_mel_frames``
        frames. The mel hop and the MDCT frame hop are the same 256 samples
        by construction (``ms_hop_length == mdct_frame_hop_length``), so the
        two grids agree frame-for-frame — this is the format-derived
        alignment the DDEC conditioning relies on
        (reference: ms_mdct_dual_2.py:180-248 width alignment math)."""
        cfg = self.config
        assert cfg.ms_hop_length == cfg.mdct_frame_hop_length, (
            "mel and MDCT hops must match for DDEC conditioning alignment")
        return (bsz, cfg.mdct_num_frequencies, n_mel_frames,
                cfg.num_raw_channels)

    def get_sample_shape(self, bsz: int = 1, raw_length: Optional[int] = None) -> Tuple[int, ...]:
        return self.get_mel_spec_shape(bsz, raw_length)

    # ---- mel-spec path -----------------------------------------------------
    def raw_to_mel_spec(self, raw: jnp.ndarray) -> jnp.ndarray:
        """(B, C, T) -> (B, F=256, T', C) blended, normalized mel spec."""
        cfg = self.config
        blended = None
        dens = jnp.asarray(self.ms_stft_mel_density)          # (bins,)
        filters = jnp.asarray(self.ms_filters)                # (bins, F)
        for i in range(len(cfg.ms_window_exponents)):
            spec = stft(raw.astype(jnp.float32), self.ms_windows[i],
                        cfg.ms_window_length, cfg.ms_hop_length,
                        normalized=True)                      # (B,C,frames,bins)
            mag = jnp.abs(spec) / dens
            mel = jnp.matmul(mag, filters)                    # (B,C,frames,F)
            mel = mel * jnp.asarray(self.ms_filter_window_weights[:, i])
            blended = mel if blended is None else blended + mel
        mel = blended ** cfg.ms_abs_exponent
        mel = (mel + cfg.raw_to_mel_spec_offset) / cfg.raw_to_mel_spec_scale
        return jnp.transpose(mel, (0, 3, 2, 1))               # (B,F,T',C)

    raw_to_sample = raw_to_mel_spec

    def mel_spec_to_linear(self, mel_spec: jnp.ndarray) -> jnp.ndarray:
        """(B, F, T', C) -> (B, bins-1, T', C) linear PSD conditioning
        (reference :219-224)."""
        cfg = self.config
        ms = (mel_spec * cfg.raw_to_mel_spec_scale - cfg.raw_to_mel_spec_offset)
        ms = jnp.maximum(ms, 0.0) ** (1.0 / cfg.ms_abs_exponent)
        # unscale via pinv of the RMS-normalized filterbank
        p = jnp.asarray(self._filters_pinv)                   # (bins, F)
        lin = jnp.einsum("bftc,nf->bntc", ms, p)
        lin = lin * jnp.sqrt(jnp.asarray(self.ms_stft_mel_density))[None, :, None, None]
        lin = lin[:, :-1]                                     # drop last stft bin
        return (lin + cfg.mel_spec_to_linear_offset) / cfg.mel_spec_to_linear_scale

    def sample_to_raw_fgla(self, mel_spec: jnp.ndarray,
                           n_fgla_iters: int = 200,
                           key: Optional[jax.Array] = None,
                           phase_init: Optional[str] = None) -> jnp.ndarray:
        """FGLA fallback decode for the dual format: mel -> linear PSD ->
        Griffin-Lim on the 4096-pt STFT grid. The reference decodes this
        format only through the DDEC; this provides the legacy FGLA path so
        a ddec-less pipeline can still produce audio."""
        from ...ops import get_window, griffinlim
        cfg = self.config
        lin = self.mel_spec_to_linear(mel_spec)
        lin = lin * cfg.mel_spec_to_linear_scale - cfg.mel_spec_to_linear_offset
        lin = jnp.maximum(lin, 0.0)
        # restore the dropped last stft bin
        lin = jnp.pad(lin, [(0, 0), (0, 1), (0, 0), (0, 0)])
        mag = jnp.transpose(lin, (0, 3, 2, 1))  # (B, C, frames, bins)
        win = get_window("hann", cfg.ms_window_length, periodic=True)
        return griffinlim(mag, win, cfg.ms_window_length, cfg.ms_hop_length,
                          n_iter=n_fgla_iters, stereo=cfg.num_raw_channels == 2,
                          key=key, phase_init=phase_init or "flat")

    # ---- mdct path -----------------------------------------------------------
    def raw_to_mdct(self, raw: jnp.ndarray, random_phase_augmentation: bool = False,
                    key: Optional[jax.Array] = None) -> jnp.ndarray:
        """(B, C, T) -> (B, N, frames, C) normalized MDCT coefficients."""
        cfg = self.config
        re, im = _mdct(raw.astype(jnp.float32), cfg.mdct_window_len,
                       window_fn=self.mdct_window_fn, return_complex=True)
        re, im = self._maybe_phase_rotate(re, im, random_phase_augmentation, key)
        out = re / self.mdct_mel_density[:, None] / cfg.raw_to_mdct_scale
        return jnp.transpose(out, (0, 2, 3, 1))               # (B,N,frames,C)

    def mdct_to_raw(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """(B, N, frames, C) -> (B, C, T)."""
        cfg = self.config
        x = jnp.transpose(coeffs, (0, 3, 1, 2))               # (B,C,N,frames)
        x = x * self.mdct_mel_density[:, None] * cfg.raw_to_mdct_scale
        return _imdct(x, cfg.mdct_window_len, window_fn=self.mdct_window_fn)

    sample_to_raw = mdct_to_raw

    def _maybe_phase_rotate(self, re, im, enabled: bool, key: Optional[jax.Array]):
        if not enabled:
            return re, im
        if key is None:
            key = jax.random.PRNGKey(0)
        theta = jax.random.uniform(key, (re.shape[0],)) * 2 * jnp.pi
        c = jnp.cos(theta)[:, None, None]
        s = jnp.sin(theta)[:, None, None]
        return re * c - im * s, re * s + im * c

    def normalize_psd(self, psd: jnp.ndarray) -> jnp.ndarray:
        return (psd + self.config.mdct_psd_offset) / self.config.mdct_psd_scale

    def unnormalize_psd(self, psd: jnp.ndarray) -> jnp.ndarray:
        return psd * self.config.mdct_psd_scale - self.config.mdct_psd_offset

    def raw_to_mdct_phase_psd(self, raw: jnp.ndarray,
                              random_phase_augmentation: bool = False,
                              key: Optional[jax.Array] = None):
        """(B, C, T) -> (phase, psd), each (B, N, frames, C)
        (reference :278-291)."""
        cfg = self.config
        re, im = _mdct(raw.astype(jnp.float32), cfg.mdct_window_len,
                       window_fn=self.mdct_window_fn, return_complex=True)
        re, im = self._maybe_phase_rotate(re, im, random_phase_augmentation, key)
        psd = jnp.sqrt(re * re + im * im)
        phase = jnp.clip(re / jnp.maximum(psd, 1e-20), -1.0, 1.0) * 2.0 ** 0.5
        psd = (psd / self.mdct_mel_density[:, None]) ** cfg.mdct_psd_exponent
        phase = jnp.transpose(phase, (0, 2, 3, 1)) / cfg.mdct_phase_scale
        psd = self.normalize_psd(jnp.transpose(psd, (0, 2, 3, 1)))
        return phase, psd
