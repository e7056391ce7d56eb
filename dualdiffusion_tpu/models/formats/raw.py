"""Raw-waveform format with FFT-domain mel-density pre-emphasis and optional
dual-channel analytic-signal representation.

Capability parity with the reference's RawFormat
(reference: src/modules/formats/raw.py:33-104): reflect-pad by half length,
ortho rfft, optional per-sample random phase rotation, mean-normalized
mel-density division, irfft (single channel) or complex ifft stacked as
real/imag (dual channel).

Layout: (B, D, C, T) where D = 1 (single) or 2 (real/imag).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import mel_density
from .format import Format, FormatConfig, register_format


@dataclass
class RawFormatConfig(FormatConfig):
    default_raw_length: int = 1409024
    dual_channel: bool = False
    mel_density_scaling: bool = True
    scale: float = 39.05
    width_alignment: int = 2048


@register_format("raw")
class RawFormat(Format):
    config_class = RawFormatConfig

    def get_raw_crop_width(self, raw_length: Optional[int] = None) -> int:
        cfg = self.config
        raw_length = raw_length or cfg.default_raw_length
        return raw_length // cfg.width_alignment * cfg.width_alignment

    def get_sample_shape(self, bsz: int = 1, raw_length: Optional[int] = None) -> Tuple[int, ...]:
        cfg = self.config
        return (bsz, int(cfg.dual_channel) + 1, cfg.num_raw_channels,
                self.get_raw_crop_width(raw_length))

    def _density(self, padded_len: int) -> np.ndarray:
        freq = np.fft.rfftfreq(padded_len, d=1.0 / self.config.sample_rate)
        d = np.asarray(mel_density(freq), np.float64)
        return (d / d.mean()).astype(np.float32)

    def raw_to_sample(self, raw: jnp.ndarray, random_phase_augmentation: bool = False,
                      key: Optional[jax.Array] = None) -> jnp.ndarray:
        cfg = self.config
        t = raw.shape[-1]
        pad = [(0, 0)] * (raw.ndim - 1) + [(t // 2, t // 2)]
        xp = jnp.pad(raw.astype(jnp.float32), pad, mode="reflect")
        rfft = jnp.fft.rfft(xp, axis=-1, norm="ortho")
        if random_phase_augmentation:
            key = key if key is not None else jax.random.PRNGKey(0)
            theta = jax.random.uniform(key, (rfft.shape[0],)) * 2 * jnp.pi
            rot = jnp.exp(1j * theta)[:, None, None]
            rfft = rfft * rot
        if cfg.mel_density_scaling:
            rfft = rfft / jnp.asarray(self._density(xp.shape[-1]))
        if not cfg.dual_channel:
            y = jnp.fft.irfft(rfft, n=xp.shape[-1], axis=-1, norm="ortho")
            y = y[..., t // 2: t // 2 + t]
            return y[:, None] * cfg.scale
        # analytic dual-channel: inverse complex fft of the onesided spectrum
        full = jnp.zeros(xp.shape[:-1] + (xp.shape[-1],), jnp.complex64)
        full = full.at[..., : rfft.shape[-1]].set(rfft)
        y = jnp.fft.ifft(full, axis=-1, norm="ortho")
        y = jnp.stack([jnp.real(y), jnp.imag(y)], axis=1)
        return y[..., t // 2: t // 2 + t] * (cfg.scale * 2.0)

    scale = raw_to_sample

    def sample_to_raw(self, sample: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        if not cfg.dual_channel:
            x = sample[:, 0] / cfg.scale
            t = x.shape[-1]
            pad = [(0, 0)] * (x.ndim - 1) + [(t // 2, t // 2)]
            xp = jnp.pad(x.astype(jnp.float32), pad, mode="reflect")
            rfft = jnp.fft.rfft(xp, axis=-1, norm="ortho")
        else:
            # the factor 2 from scale() is cancelled by the one-sided /2 below
            x = (sample[:, 0] + 1j * sample[:, 1]) / cfg.scale
            t = x.shape[-1]
            pad = [(0, 0)] * (x.ndim - 1) + [(t // 2, t // 2)]
            xp = jnp.pad(x.astype(jnp.complex64), pad, mode="reflect")
            ft = jnp.fft.fft(xp, axis=-1, norm="ortho")
            rfft = ft[..., : ft.shape[-1] // 2 + 1] / 2.0
        if cfg.mel_density_scaling:
            rfft = rfft * jnp.asarray(self._density(xp.shape[-1]))
        y = jnp.fft.irfft(rfft, n=xp.shape[-1], axis=-1, norm="ortho")
        return y[..., t // 2: t // 2 + t]

    unscale = sample_to_raw
