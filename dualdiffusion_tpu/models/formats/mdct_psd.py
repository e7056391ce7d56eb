"""MDCT-PSD format: PSD-conditioned MDCT experiments with the P2M
(patch-to-MDCT) 2D lapped transform.

Capability parity with the reference's MDCT_PSD_Format
(reference: src/modules/formats/mdct_psd.py:35-236):

  * FFT-domain linear-ramp high-pass pre-filter (low_cut 20-28.9 Hz);
  * mel-density-normalized MDCT and MDCT-PSD transforms;
  * PSD scaling/unscaling of MDCT coefficients (mdct/(psd+eps)*scale);
  * P2M: a 2D lapped MDCT over (freq, time) blocks of the MDCT spectrogram
    (reference: src/utils/mdct/functional.py:213-230 mdct2/imdct2), folded
    to channels.
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
class MDCTPSDFormatConfig(FormatConfig):
    default_raw_length: int = 1409024
    width_alignment: int = 32768
    low_cut_start_hz: float = 28.862
    low_cut_end_hz: float = 20.0
    raw_to_mdct_scale: float = 275.47124      # stereo @ -20 LUFS
    mdct_psd_scale: float = 1.1785113
    mdct_psd_eps: float = 1e-2
    mdct_window_len: int = 512
    mdct_window_func: str = "sin"
    mdct_psd_to_p2m_scale: float = 30.9832693
    p2m_psd_scale: float = 1.765726368
    p2m_psd_eps: float = 1e-2
    p2m_use_midside_transform: bool = True
    p2m_block_width: int = 16
    p2m_window_func: str = "sin"

    @property
    def mdct_num_frequencies(self) -> int:
        return self.mdct_window_len // 2

    @property
    def p2m_num_frequencies(self) -> int:
        return self.p2m_block_width ** 2 // 4

    @property
    def p2m_block_hop_length(self) -> int:
        return self.p2m_block_width // 2


def mdct2(x: jnp.ndarray, block_width: int, window_fn: str = "sin_mdct"):
    """2D lapped MDCT of (..., H, W) -> (..., Nh, Nw, Fh, Fw) equivalent,
    applied as 1D MDCT over W then over H (reference: functional.py:213-219).
    Returns (..., N, Fh, N, Fw) flattened to (..., N*N, Fh, Fw) by caller.
    """
    # over last axis (W): (..., H, N, Fw)
    a = _mdct(x, block_width, window_fn=window_fn)
    # now over H: move H to last, transform, restore
    a = jnp.moveaxis(a, -3, -1)            # (..., N, Fw, H)
    b = _mdct(a, block_width, window_fn=window_fn)  # (..., N, Fw, N2, Fh)
    return b


def imdct2(y: jnp.ndarray, block_width: int, window_fn: str = "sin_mdct"):
    a = _imdct(y, block_width, window_fn=window_fn)   # (..., N, Fw, H)
    a = jnp.moveaxis(a, -1, -3)                       # (..., H, N, Fw)
    return _imdct(a, block_width, window_fn=window_fn)


@register_format("mdct_psd")
class MDCTPSDFormat(Format):
    config_class = MDCTPSDFormatConfig

    def __init__(self, config: MDCTPSDFormatConfig) -> None:
        super().__init__(config)
        hz = (np.arange(config.mdct_num_frequencies) + 0.5) * \
            config.sample_rate / config.mdct_window_len
        self.mdct_mel_density = np.asarray(mel_density(hz), np.float32)
        self.window_fn = _MDCT_WINDOW_MAP.get(config.mdct_window_func,
                                              config.mdct_window_func)
        self.p2m_window_fn = _MDCT_WINDOW_MAP.get(config.p2m_window_func,
                                                  config.p2m_window_func)

    # ---- high-pass (reference :100-113) -----------------------------------
    def _high_pass(self, raw: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        cutoff = cfg.low_cut_end_hz
        if cutoff <= 0 or (cfg.low_cut_start_hz - cutoff) <= 0:
            return raw
        t = raw.shape[-1]
        pad = [(0, 0)] * (raw.ndim - 1) + [(t // 2, t // 2)]
        xp = jnp.pad(raw.astype(jnp.float32), pad, mode="reflect")
        rfft = jnp.fft.rfft(xp, axis=-1, norm="ortho")
        freq = np.fft.rfftfreq(xp.shape[-1], d=1.0 / cfg.sample_rate)
        filt = np.clip((freq - cutoff) / (cfg.low_cut_start_hz - cutoff), 0, 1)
        y = jnp.fft.irfft(rfft * jnp.asarray(filt, jnp.float32),
                          n=xp.shape[-1], axis=-1, norm="ortho")
        return y[..., t // 2: t // 2 + t]

    # ---- shapes -------------------------------------------------------------
    def get_raw_crop_width(self, raw_length: Optional[int] = None) -> int:
        cfg = self.config
        raw_length = raw_length or cfg.default_raw_length
        return raw_length // cfg.width_alignment * cfg.width_alignment \
            - cfg.mdct_num_frequencies

    def get_sample_shape(self, bsz: int = 1, raw_length: Optional[int] = None):
        cfg = self.config
        w = self.get_raw_crop_width((raw_length or cfg.default_raw_length)
                                    + cfg.mdct_num_frequencies)
        n = cfg.mdct_num_frequencies
        return (bsz, n, (w + n) // n, cfg.num_raw_channels)

    # ---- mdct ---------------------------------------------------------------
    def raw_to_mdct(self, raw: jnp.ndarray, random_phase_augmentation: bool = False,
                    key: Optional[jax.Array] = None) -> jnp.ndarray:
        cfg = self.config
        raw = self._high_pass(raw)
        re, im = _mdct(raw, cfg.mdct_window_len, window_fn=self.window_fn,
                       return_complex=True)
        if random_phase_augmentation:
            key = key if key is not None else jax.random.PRNGKey(0)
            theta = jax.random.uniform(key, (re.shape[0],)) * 2 * jnp.pi
            c = jnp.cos(theta)[:, None, None]
            s = jnp.sin(theta)[:, None, None]
            re = re * c - im * s
        out = re / self.mdct_mel_density[:, None] * cfg.raw_to_mdct_scale
        return jnp.transpose(out, (0, 2, 3, 1))

    raw_to_sample = raw_to_mdct

    def raw_to_mdct_psd(self, raw: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        raw = self._high_pass(raw)
        re, im = _mdct(raw, cfg.mdct_window_len, window_fn=self.window_fn,
                       return_complex=True)
        psd = jnp.sqrt(re ** 2 + im ** 2) / self.mdct_mel_density[:, None] \
            * cfg.raw_to_mdct_scale / 2.0 ** 0.5
        return jnp.transpose(psd, (0, 2, 3, 1))

    def mdct_to_raw(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = jnp.transpose(coeffs, (0, 3, 1, 2))
        x = x * self.mdct_mel_density[:, None] / cfg.raw_to_mdct_scale
        return _imdct(x, cfg.mdct_window_len, window_fn=self.window_fn)

    sample_to_raw = mdct_to_raw

    # ---- psd scaling ----------------------------------------------------------
    def scale_mdct_from_psd(self, mdct_c: jnp.ndarray, psd: jnp.ndarray):
        cfg = self.config
        return mdct_c / (psd + cfg.mdct_psd_eps) * cfg.mdct_psd_scale

    def unscale_mdct_from_psd(self, mdct_c: jnp.ndarray, psd: jnp.ndarray):
        cfg = self.config
        return mdct_c * (psd + cfg.mdct_psd_eps) / cfg.mdct_psd_scale

    # ---- p2m (2D lapped MDCT) --------------------------------------------------
    def mdct_to_p2m(self, mdct_c: jnp.ndarray) -> jnp.ndarray:
        """2D lapped transform of the MDCT spectrogram.

        (B, N, F, C) mdct -> (B, Fh_blocks, Fw_blocks, C * p2m_freqs)
        channel-last, p2m_freqs = block_width^2/4 per-block 2D frequencies
        folded with the audio channels (the reference folds to channels the
        same way, mdct_psd.py p2m methods).
        """
        cfg = self.config
        from ..mp import midside_transform
        x = jnp.transpose(mdct_c, (0, 3, 1, 2))           # (B, C, N, F)
        if cfg.p2m_use_midside_transform:
            x = midside_transform(x, channel_axis=1)
        y = mdct2(x, cfg.p2m_block_width, self.p2m_window_fn)
        # y: (B, C, Nw, Fw, Nh, Fh) with Nw = Nh = block_width/2
        b, c, nw, fw, nh, fh = y.shape
        y = jnp.transpose(y, (0, 5, 3, 1, 4, 2))          # (B, Fh, Fw, C, Nh, Nw)
        return y.reshape(b, fh, fw, c * nh * nw) * cfg.mdct_psd_to_p2m_scale

    def p2m_to_mdct(self, p2m: jnp.ndarray, num_channels: int = 2) -> jnp.ndarray:
        """Inverse of mdct_to_p2m -> (B, N, F, C)."""
        cfg = self.config
        from ..mp import midside_transform
        b, fh, fw, cnn = p2m.shape
        n = cfg.p2m_block_width // 2
        y = (p2m / cfg.mdct_psd_to_p2m_scale).reshape(b, fh, fw, num_channels, n, n)
        y = jnp.transpose(y, (0, 3, 5, 2, 4, 1))          # (B, C, Nw, Fw, Nh, Fh)
        x = imdct2(y, cfg.p2m_block_width, self.p2m_window_fn)  # (B, C, N, F)
        if cfg.p2m_use_midside_transform:
            x = midside_transform(x, channel_axis=1)
        return jnp.transpose(x, (0, 2, 3, 1))
