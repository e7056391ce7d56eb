"""MS+MDCT dual format **v1**: dual blackman-harris window mel spectrogram
blended by squared mel density, plus an MCLT/MDCT path for DDEC
conditioning.

Capability parity with the reference's MS_MDCT_DualFormat v1
(reference: src/modules/formats/ms_mdct_dual.py:35-329):

  * two spectrograms with blackman-harris**17 (low: frequency resolution)
    and **58 (high: time resolution) windows, window-L2-normalized STFTs,
    blended per stft bin with weight (mel_density / max)**2 (:110-188).
  * mel scale via slaney triangular filters on blended/(mel density),
    ** ms_abs_exponent * scale + offset (:229-257).
  * ``mel_spec_to_mdct_psd``: pinv mel-unscale to 2048 linear bins for the
    MDCT-domain DDEC conditioning (:259-270) — the runtime lstsq becomes a
    precomputed pinv matmul (SURVEY.md §7.4).
  * optional high-pass pre-filter: rfft-domain linear ramp from
    ``ms_freq_min`` to the lowest mel filter frequency (:190-207).
  * MDCT path: 512-sample kaiser-bessel-derived MCLT, mel-density
    normalized, optional dual-channel (real+imag) output and random phase
    augmentation (:291-325).

v2 (ms_mdct_dual.py here) supersedes this format in the reference too; v1
is provided for checkpoint/config compatibility (SURVEY.md §8 checklist).

Layouts: mel spec (B, F=256, T', C); MDCT (B, N=256, frames, C or 2C).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import (FrequencyScale, get_window, imclt as _imclt,
                    mclt as _mclt, mel_density, stft)
from .format import Format, FormatConfig, register_format


@dataclass
class MSMDCTDualV1FormatConfig(FormatConfig):
    # scales for audio pre-normalized to -20 LUFS (reference :42-48)
    raw_to_mel_spec_scale: float = 50.0
    raw_to_mel_spec_offset: float = 0.0
    mel_spec_to_mdct_psd_scale: float = 0.18
    mel_spec_to_mdct_psd_offset: float = 0.0
    mdct_to_raw_scale: float = 2.0
    raw_to_mdct_scale: float = 12.1

    mdct_window_len: int = 512
    mdct_window_func: str = "kaiser_bessel_derived"  # or "sin"
    mdct_psd_num_bins: int = 2048
    mdct_dual_channel: bool = False

    ms_abs_exponent: float = 1.0
    ms_freq_min: float = 0.0
    ms_width_alignment: int = 128
    ms_num_frequencies: int = 256
    ms_step_size_ms: int = 8
    ms_window_duration_ms: int = 128
    ms_padded_duration_ms: int = 128
    ms_window_exponent_low: float = 17.0
    ms_window_exponent_high: Optional[float] = 58.0
    ms_window_func: str = "blackman_harris"  # or "hann"

    @property
    def mdct_num_frequencies(self) -> int:
        return self.mdct_window_len // 2

    @property
    def ms_frame_padded_length(self) -> int:
        return int(self.ms_padded_duration_ms / 1000.0 * self.sample_rate)

    @property
    def ms_win_length(self) -> int:
        return int(self.ms_window_duration_ms / 1000.0 * self.sample_rate)

    @property
    def ms_frame_hop_length(self) -> int:
        return int(self.ms_step_size_ms / 1000.0 * self.sample_rate)

    @property
    def ms_num_stft_bins(self) -> int:
        return self.ms_frame_padded_length // 2 + 1


def _ms_window(cfg: MSMDCTDualV1FormatConfig, exponent: float) -> np.ndarray:
    if cfg.ms_window_func == "blackman_harris":
        win = get_window("blackman_harris", cfg.ms_win_length) ** exponent
    else:
        win = get_window("hann_power", cfg.ms_win_length, exponent=exponent,
                         periodic=True)
    # torchaudio normalized="window": divide by the window's L2 norm
    return (win / np.sqrt((win ** 2).sum())).astype(np.float64)


@register_format("ms_mdct_dual_v1")
class MSMDCTDualV1Format(Format):
    config_class = MSMDCTDualV1FormatConfig

    def __init__(self, config: MSMDCTDualV1FormatConfig) -> None:
        super().__init__(config)
        cfg = config
        self.win_low = _ms_window(cfg, cfg.ms_window_exponent_low)
        self.win_high = (_ms_window(cfg, cfg.ms_window_exponent_high)
                         if cfg.ms_window_exponent_high is not None else None)

        self.ms_freq_scale = FrequencyScale(
            freq_scale="mel", freq_min=cfg.ms_freq_min,
            freq_max=cfg.sample_rate / 2, sample_rate=cfg.sample_rate,
            num_stft_bins=cfg.ms_num_stft_bins,
            num_filters=cfg.ms_num_frequencies, filter_norm="slaney",
            filter_shape="triangular")
        self.ms_lowest_filter_freq = float(
            self.ms_freq_scale.get_unscaled(cfg.ms_num_frequencies + 2)[1])

        stft_hz = np.linspace(0, cfg.sample_rate / 2, cfg.ms_num_stft_bins)
        self.ms_stft_mel_density = np.asarray(mel_density(stft_hz), np.float32)

        # blend weight per stft bin: (mel density / max)^2 (reference :184-188)
        dens = np.asarray(mel_density(stft_hz), np.float64)
        self.spec_blend_weight = ((dens / dens.max()) ** 2).astype(np.float32)

        # psd unscale: the reference solves lstsq through the RAW slaney
        # filterbank at runtime; when mdct_psd_num_bins == ms_num_stft_bins-1
        # it reuses the main bank and crops the last bin (reference :155-168)
        if cfg.mdct_psd_num_bins == cfg.ms_num_stft_bins - 1:
            psd_filters = self.ms_freq_scale.filters
            self._psd_crop_last = True
        else:
            psd_scale = FrequencyScale(
                freq_scale="mel", freq_min=cfg.ms_freq_min,
                freq_max=cfg.sample_rate / 2, sample_rate=cfg.sample_rate,
                num_stft_bins=cfg.mdct_psd_num_bins,
                num_filters=cfg.ms_num_frequencies, filter_norm="slaney",
                filter_shape="triangular")
            psd_filters = psd_scale.filters
            self._psd_crop_last = False
        self._psd_pinv = np.linalg.pinv(
            np.asarray(psd_filters, np.float64).T, rcond=1e-10).astype(np.float32)

        mdct_hz = (np.arange(cfg.mdct_num_frequencies) + 0.5) \
            * cfg.sample_rate / cfg.mdct_window_len
        self.mdct_mel_density = np.asarray(mel_density(mdct_hz), np.float32)
        self._mclt_window = ("kaiser_bessel_derived"
                             if cfg.mdct_window_func == "kaiser_bessel_derived"
                             else cfg.mdct_window_func)

    # ---- high-pass pre-filter (reference :190-207) -------------------------
    def high_pass(self, raw: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        cutoff = cfg.ms_freq_min
        if cutoff <= 0 or (self.ms_lowest_filter_freq - cutoff) <= 0:
            return raw
        t = raw.shape[-1]
        pads = [(0, 0)] * (raw.ndim - 1) + [(t // 2, t // 2)]
        xp = jnp.pad(raw.astype(jnp.float32), pads, mode="reflect")
        rfft = jnp.fft.rfft(xp, axis=-1, norm="ortho")
        freqs = np.fft.rfftfreq(xp.shape[-1], d=1.0 / cfg.sample_rate)
        filt = np.clip((freqs - cutoff)
                       / (self.ms_lowest_filter_freq - cutoff), 0.0, 1.0)
        out = jnp.fft.irfft(rfft * jnp.asarray(filt, rfft.dtype),
                            n=xp.shape[-1], axis=-1, norm="ortho")
        return out[..., t // 2: -(t // 2)]

    # ---- shape math (reference :215-245) -----------------------------------
    def _get_num_ms_frames(self, raw_len: int) -> int:
        cfg = self.config
        return 1 + (raw_len + cfg.ms_frame_padded_length
                    - cfg.ms_win_length) // cfg.ms_frame_hop_length

    def get_raw_crop_width(self, raw_length: Optional[int] = None) -> int:
        cfg = self.config
        raw_length = raw_length or cfg.default_raw_length
        n = self._get_num_ms_frames(raw_length)
        n = n // cfg.ms_width_alignment * cfg.ms_width_alignment
        return ((n - 1) * cfg.ms_frame_hop_length + cfg.ms_win_length
                - cfg.ms_frame_padded_length)

    def get_mel_spec_shape(self, bsz: int = 1,
                           raw_length: Optional[int] = None) -> Tuple[int, ...]:
        w = self.get_raw_crop_width(raw_length)
        return (bsz, self.config.ms_num_frequencies,
                self._get_num_ms_frames(w), self.config.num_raw_channels)

    def get_mdct_shape(self, bsz: int = 1,
                       raw_length: Optional[int] = None) -> Tuple[int, ...]:
        cfg = self.config
        w = self.get_raw_crop_width(raw_length)
        n = cfg.mdct_num_frequencies
        c = cfg.num_raw_channels * (2 if cfg.mdct_dual_channel else 1)
        return (bsz, n, w // n + 1, c)

    def get_sample_shape(self, bsz: int = 1,
                         raw_length: Optional[int] = None) -> Tuple[int, ...]:
        return self.get_mel_spec_shape(bsz, raw_length)

    # ---- mel-spec path ------------------------------------------------------
    def raw_to_mel_spec(self, raw: jnp.ndarray) -> jnp.ndarray:
        """(B, C, T) -> (B, F, T', C)."""
        cfg = self.config
        raw = self.high_pass(raw)
        blend = jnp.asarray(self.spec_blend_weight)

        def mag(win):
            sp = stft(raw.astype(jnp.float32), win,
                      cfg.ms_frame_padded_length, cfg.ms_frame_hop_length)
            return jnp.abs(sp)                       # (B, C, frames, bins)

        spec = mag(self.win_low)
        if self.win_high is not None:
            spec = spec * blend + mag(self.win_high) * (1.0 - blend)
        spec = spec / jnp.asarray(self.ms_stft_mel_density)
        filters = jnp.asarray(self.ms_freq_scale.filters)  # (bins, F)
        mel = jnp.matmul(spec, filters)              # (B, C, frames, F)
        mel = (mel ** cfg.ms_abs_exponent * cfg.raw_to_mel_spec_scale
               + cfg.raw_to_mel_spec_offset)
        return jnp.transpose(mel, (0, 3, 2, 1))      # (B, F, T', C)

    raw_to_sample = raw_to_mel_spec

    def mel_spec_to_mdct_psd(self, mel_spec: jnp.ndarray) -> jnp.ndarray:
        """(B, F, T', C) -> (B, psd_bins, T', C) linear PSD conditioning
        (reference :259-270)."""
        cfg = self.config
        # NOTE: the reference does NOT undo raw_to_mel_spec_scale here —
        # it is folded into mel_spec_to_mdct_psd_scale (reference :261-270)
        ms = mel_spec - cfg.raw_to_mel_spec_offset
        ms = jnp.maximum(ms, 0.0) ** (1.0 / cfg.ms_abs_exponent)
        p = jnp.asarray(self._psd_pinv)              # (bins, F)
        lin = jnp.einsum("bftc,nf->bntc", ms, p)
        if self._psd_crop_last:
            lin = lin[:, :-1]
        return (lin * cfg.mel_spec_to_mdct_psd_scale
                + cfg.mel_spec_to_mdct_psd_offset)

    # ---- mdct path ------------------------------------------------------------
    def raw_to_mdct(self, raw: jnp.ndarray,
                    random_phase_augmentation: bool = False,
                    key: Optional[jax.Array] = None) -> jnp.ndarray:
        """(B, C, T) -> (B, N, frames, C or 2C)."""
        cfg = self.config
        raw = self.high_pass(raw)
        re, im = _mclt(raw.astype(jnp.float32), cfg.mdct_window_len,
                       window_fn=self._mclt_window)
        if random_phase_augmentation:
            if key is None:
                key = jax.random.PRNGKey(0)
            theta = jax.random.uniform(key, (re.shape[0],)) * 2 * jnp.pi
            c = jnp.cos(theta)[:, None, None, None]
            s = jnp.sin(theta)[:, None, None, None]
            re, im = re * c - im * s, re * s + im * c
        if cfg.mdct_dual_channel:
            out = jnp.concatenate([re, im], axis=1)  # (B, 2C, frames, N)
        else:
            out = re
        out = jnp.transpose(out, (0, 3, 2, 1))       # (B, N, frames, C')
        return (out / self.mdct_mel_density.reshape(1, -1, 1, 1)
                * cfg.raw_to_mdct_scale)

    def raw_to_mdct_psd(self, raw: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        raw = self.high_pass(raw)
        re, im = _mclt(raw.astype(jnp.float32), cfg.mdct_window_len,
                       window_fn=self._mclt_window)
        mag = jnp.sqrt(re * re + im * im)
        out = jnp.transpose(mag, (0, 3, 2, 1))
        return (out / self.mdct_mel_density.reshape(1, -1, 1, 1)
                * cfg.raw_to_mdct_scale / np.sqrt(2.0))

    def mdct_to_raw(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """(B, N, frames, C or 2C) -> (B, C, T)."""
        cfg = self.config
        x = coeffs * self.mdct_mel_density.reshape(1, -1, 1, 1) \
            / cfg.raw_to_mdct_scale
        x = jnp.transpose(x, (0, 3, 2, 1))           # (B, C', frames, N)
        if cfg.mdct_dual_channel:
            c = x.shape[1] // 2
            re, im = x[:, :c], x[:, c:]
        else:
            re, im = x, jnp.zeros_like(x)
        raw = _imclt(re, im, cfg.mdct_window_len, window_fn=self._mclt_window)
        return raw * cfg.mdct_to_raw_scale

    sample_to_raw = mdct_to_raw
