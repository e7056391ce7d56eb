"""Mel-spectrogram format with FGLA phase reconstruction (the flagship
audio <-> 2D path of the north star).

Capability parity with the reference's SpectrogramFormat
(reference: src/modules/formats/old/spectrogram.py:33-275): tuned
hann**32 window (200 ms window, 8 ms hop), 256 mel bins 20 Hz - 16 kHz,
abs**0.25 compression, inverse via pseudoinverse mel-unscale + 200-iteration
momentum FGLA with stereo-coherent annealing.

TPU-native notes: the STFT/FGLA run as jitted matmul-DFT graphs; the
per-call lstsq of the reference is a precomputed pinv matmul; all loops are
lax.fori_loop (SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import FrequencyScale, get_window, griffinlim, stft, istft
from .format import Format, FormatConfig, register_format


@dataclass
class SpectrogramFormatConfig(FormatConfig):
    # scaling for audio pre-normalized to -20 LUFS
    raw_to_sample_scale: float = 2.247
    sample_to_raw_scale: float = 0.445
    sample_mean: float = 1.295
    abs_exponent: float = 0.25

    # FFT parameters
    step_size_ms: int = 8
    window_duration_ms: int = 200
    padded_duration_ms: int = 200
    window_exponent: float = 32.0
    window_periodic: bool = True

    # frequency scale
    freq_scale_type: str = "mel"
    num_frequencies: int = 256
    min_frequency: int = 20
    max_frequency: int = 16000
    freq_scale_norm: Optional[str] = None

    # phase recovery
    num_fgla_iters: int = 200
    fgla_momentum: float = 0.99
    stereo_coherence: float = 0.67
    fgla_work_dtype: str = "float32"   # "bfloat16" halves loop HBM traffic
    # "spsi" seeds FGLA with phase-locked SPSI phases (ops/fgla.spsi_phase)
    # instead of the reference's flat init — same loop; on mel-inverted
    # magnitudes (this format's decode input) 100 iterations reach LOWER
    # spectral error than flat at 200 (measured in tests/test_fgla_fast.py)
    fgla_phase_init: str = "flat"

    @property
    def stereo(self) -> bool:
        return self.num_raw_channels == 2

    @property
    def padded_length(self) -> int:
        return int(self.padded_duration_ms / 1000.0 * self.sample_rate)

    @property
    def win_length(self) -> int:
        return int(self.window_duration_ms / 1000.0 * self.sample_rate)

    @property
    def hop_length(self) -> int:
        return int(self.step_size_ms / 1000.0 * self.sample_rate)

    @property
    def num_stft_bins(self) -> int:
        return self.padded_length // 2 + 1


@register_format("spectrogram")
class SpectrogramFormat(Format):
    config_class = SpectrogramFormatConfig

    def __init__(self, config: SpectrogramFormatConfig) -> None:
        super().__init__(config)
        self.window = get_window("hann_power", config.win_length,
                                 exponent=config.window_exponent,
                                 periodic=config.window_periodic)
        self.freq_scale = FrequencyScale(
            freq_scale=config.freq_scale_type,
            freq_min=config.min_frequency,
            freq_max=config.max_frequency,
            sample_rate=config.sample_rate,
            num_stft_bins=config.num_stft_bins,
            num_filters=config.num_frequencies,
            filter_norm=config.freq_scale_norm,
        )

    # ---- shape math (reference: old/spectrogram.py:160-172) --------------
    def get_num_frames(self, audio_len: int) -> int:
        cfg = self.config
        return 1 + (audio_len + cfg.padded_length - cfg.win_length) // cfg.hop_length

    def get_audio_len(self, num_frames: int) -> int:
        cfg = self.config
        return (num_frames - 1) * cfg.hop_length + cfg.win_length - cfg.padded_length

    def get_raw_crop_width(self, raw_length: Optional[int] = None) -> int:
        raw_length = raw_length or self.config.default_raw_length
        num_frames = self.get_num_frames(raw_length)
        if num_frames >= 128:
            num_frames = num_frames // 128 * 128
        elif num_frames >= 1:
            # sub-128-frame lengths (tiny models / tests): the reference's
            # 128-frame floor (old/spectrogram.py:172-174) would floor to
            # ZERO frames here; use the largest power of two <= num_frames
            # instead, which preserves UNet/DAE width divisibility
            num_frames = 1 << (num_frames.bit_length() - 1)
        else:
            raise ValueError(
                f"requested length {raw_length} is shorter than one "
                f"spectrogram frame")
        return self.get_audio_len(num_frames)

    def get_sample_shape(self, bsz: int = 1, raw_length: Optional[int] = None) -> Tuple[int, ...]:
        # explicit lengths route through the crop width too (128-frame
        # floor) so generate() and encode_input_audio() agree for any
        # requested length (reference: old/spectrogram.py:208-215)
        raw_length = self.get_raw_crop_width(raw_length)
        return (bsz, self.config.num_frequencies, self.get_num_frames(raw_length),
                self.config.num_raw_channels)

    # ---- transforms -------------------------------------------------------
    def raw_to_sample(self, raw: jnp.ndarray) -> jnp.ndarray:
        """(B, C, T) audio -> (B, F, T', C) normalized mel spectrogram
        ((mel**0.25 - sample_mean) * raw_to_sample_scale; reference:
        old/spectrogram.py:218-226)."""
        mel = self.raw_to_mel_spec(raw)
        return (mel - self.config.sample_mean) * self.config.raw_to_sample_scale

    def raw_to_mel_spec(self, raw: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        spec = stft(raw.astype(jnp.float32), self.window, cfg.padded_length,
                    cfg.hop_length)                       # (B, C, frames, bins)
        mag = jnp.abs(spec)
        mel = self.freq_scale.scale(jnp.swapaxes(mag, -1, -2))  # (B, C, F_mel, frames)
        mel = mel ** cfg.abs_exponent
        return jnp.transpose(mel, (0, 2, 3, 1))           # (B, F_mel, frames, C)

    def sample_to_raw(self, sample: jnp.ndarray, n_fgla_iters: Optional[int] = None,
                      key: Optional[jax.Array] = None,
                      phase_init: Optional[str] = None) -> jnp.ndarray:
        """(B, F, T', C) -> (B, C, T) via mel unscale + FGLA.

        ``phase_init`` overrides the config's FGLA phase init ("flat" or
        "spsi"); Pipeline.generate passes SampleParams.fgla_phase_init
        (production default: spsi@100 — BASELINE.md r4 quality evidence)."""
        cfg = self.config
        phase_init = phase_init or cfg.fgla_phase_init
        mel = sample / cfg.raw_to_sample_scale + cfg.sample_mean
        mel = jnp.maximum(jnp.transpose(mel, (0, 3, 1, 2)), 0.0)            # (B,C,F,T')
        mag_lin = self.freq_scale.unscale(mel ** (1.0 / cfg.abs_exponent))  # (B,C,bins,T')
        mag_lin = jnp.swapaxes(mag_lin, -1, -2)           # frames-major
        # digit-order polyphase FGLA (ops/fgla_fast.py) on TPU when the
        # geometry supports it (hop = 2 lane rows); ~1.3x the legacy loop
        # and the base for the fused Pallas middle. (key only matters for
        # rand_init, which this path does not use — flat init, as the
        # reference defaults; fgla.griffinlim ignores key then too.)
        if jax.default_backend() == "tpu" \
                and cfg.padded_length % 128 == 0 and cfg.hop_length == 256:
            from ...ops.fgla_fast import griffinlim_fast
            from ...ops.pallas.ola_reframe import ola_reframe_supported
            frames = mag_lin.shape[-2]
            n1 = cfg.padded_length // 128
            if ola_reframe_supported(frames, n1):
                return griffinlim_fast(
                    mag_lin, self.window, cfg.padded_length, cfg.hop_length,
                    n_iter=n_fgla_iters or cfg.num_fgla_iters,
                    momentum=cfg.fgla_momentum, stereo=cfg.stereo,
                    stereo_coherence=cfg.stereo_coherence,
                    work_dtype=cfg.fgla_work_dtype,
                    phase_init=phase_init)
        return griffinlim(mag_lin, self.window, cfg.padded_length, cfg.hop_length,
                          n_iter=n_fgla_iters or cfg.num_fgla_iters,
                          momentum=cfg.fgla_momentum, stereo=cfg.stereo,
                          stereo_coherence=cfg.stereo_coherence, key=key,
                          work_dtype=cfg.fgla_work_dtype,
                          phase_init=phase_init)

    def get_ln_freqs(self) -> jnp.ndarray:
        """log-spaced mel center frequencies, normalized (used as a
        positional channel by some UNet variants; reference:
        old/spectrogram.py:240-244)."""
        freqs = self.freq_scale.get_unscaled(self.config.num_frequencies + 2)[1:-1]
        ln = np.log(freqs)
        ln = (ln - ln.mean()) / ln.std()
        return jnp.asarray(ln, jnp.float32)
