"""Standalone MDCT format (256-sample window, optional dual-channel
real+imag MCLT output, mel-density normalization).

Capability parity with the reference's MDCT_Format
(reference: src/modules/formats/mdct.py:35-118). Layout here is
(B, N, frames, C) channel-last (reference uses (B, N, C, frames)).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import mdct as _mdct, imdct as _imdct, mel_density
from .format import Format, FormatConfig, register_format
from .ms_mdct_dual import _MDCT_WINDOW_MAP


@dataclass
class MDCTFormatConfig(FormatConfig):
    default_raw_length: int = 1409024
    width_alignment: int = 32768
    mdct_to_raw_scale: float = 1.0
    raw_to_mdct_scale: float = 196.36579562832198
    mdct_window_len: int = 256
    mdct_window_func: str = "sin"

    @property
    def mdct_num_frequencies(self) -> int:
        return self.mdct_window_len // 2


@register_format("mdct")
class MDCTFormat(Format):
    config_class = MDCTFormatConfig

    def __init__(self, config: MDCTFormatConfig) -> None:
        super().__init__(config)
        hz = (np.arange(config.mdct_num_frequencies) + 0.5) * config.sample_rate / config.mdct_window_len
        self.mdct_mel_density = np.asarray(mel_density(hz), np.float32)
        self.window_fn = _MDCT_WINDOW_MAP[config.mdct_window_func]

    def get_raw_crop_width(self, raw_length: Optional[int] = None) -> int:
        cfg = self.config
        raw_length = raw_length or cfg.default_raw_length
        return raw_length // cfg.width_alignment * cfg.width_alignment - cfg.mdct_num_frequencies

    def get_sample_shape(self, bsz: int = 1, raw_length: Optional[int] = None) -> Tuple[int, ...]:
        cfg = self.config
        w = self.get_raw_crop_width((raw_length or cfg.default_raw_length) + cfg.mdct_num_frequencies)
        n = cfg.mdct_num_frequencies
        return (bsz, n, (w + n) // n, cfg.num_raw_channels)

    def raw_to_mdct(self, raw: jnp.ndarray, random_phase_augmentation: bool = False,
                    dual_channel: bool = False, key: Optional[jax.Array] = None) -> jnp.ndarray:
        cfg = self.config
        re, im = _mdct(raw.astype(jnp.float32), cfg.mdct_window_len,
                       window_fn=self.window_fn, return_complex=True)  # (B,C,N,F)
        if random_phase_augmentation:
            key = key if key is not None else jax.random.PRNGKey(0)
            theta = jax.random.uniform(key, (re.shape[0],)) * 2 * jnp.pi
            c = jnp.cos(theta)[:, None, None, None]
            s = jnp.sin(theta)[:, None, None, None]
            re, im = re * c - im * s, re * s + im * c
        dens = self.mdct_mel_density[:, None]
        if dual_channel:
            out = jnp.concatenate([re / dens, im / dens], axis=1) * cfg.raw_to_mdct_scale
        else:
            out = re / dens * cfg.raw_to_mdct_scale
        return jnp.transpose(out, (0, 2, 3, 1))  # (B, N, frames, C or 2C)

    raw_to_sample = raw_to_mdct

    def mdct_to_raw(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = jnp.transpose(coeffs, (0, 3, 1, 2))
        x = x * self.mdct_mel_density[:, None] / cfg.raw_to_mdct_scale
        return _imdct(x, cfg.mdct_window_len, window_fn=self.window_fn) * cfg.mdct_to_raw_scale

    sample_to_raw = mdct_to_raw

    def raw_to_mdct_psd(self, raw: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        re, im = _mdct(raw.astype(jnp.float32), cfg.mdct_window_len,
                       window_fn=self.window_fn, return_complex=True)
        psd = jnp.sqrt(re * re + im * im) / self.mdct_mel_density[:, None] * cfg.raw_to_mdct_scale
        return jnp.transpose(psd, (0, 2, 3, 1))
