"""CLAP-conditioned discriminator for adversarial / authenticity training.

Capability parity with the reference's Discriminator_J3
(reference: src/modules/discs/disc_j3.py:44-210 + disc.py:32-49):

  * stereo-folded (B, Z=2, H, W, C) conv stack of emb-modulated MP blocks
    with a learned sigmoid residual balance (init sigmoid(-0.7));
  * per-block hidden-activation KL penalty (mean^2 + var - 1 - log var)
    accumulated across layers;
  * constant ones channel appended at the input, learned input gain+shift;
  * ``forward(samples, embeddings) -> (logits_map, hidden_kld)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import MPConv
from .mp import mp_silu, normalize, resample_3d


@dataclass
class DiscriminatorConfig:
    in_channels: int = 1
    in_channels_emb: int = 1024
    in_num_freqs: int = 256
    model_channels: int = 32
    channel_mult_emb: int = 12
    num_layers: int = 6
    mlp_multiplier: int = 2
    mlp_groups: int = 1
    clip_act: float = 256.0
    kernel: Tuple[int, int, int] = (1, 3, 3)


class DiscBlock(nn.Module):
    cfg: DiscriminatorConfig
    in_channels: int
    out_channels: int
    emb_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: Optional[jnp.ndarray],
                 training: bool = False):
        cfg = self.cfg
        c_mid = self.out_channels * cfg.mlp_multiplier
        y = MPConv(self.in_channels, c_mid, cfg.kernel, groups=cfg.mlp_groups,
                   w_pad_mode="reflect",
                   name="conv_res0")(mp_silu(x), training=training)
        if self.emb_channels > 0 and emb is not None:
            g = self.param("emb_gain", nn.initializers.zeros, ())
            c = MPConv(self.emb_channels, c_mid, (), name="emb_linear")(
                emb, gain=g, training=training) + 1.0
            y = y * c.reshape((c.shape[0],) + (1,) * (y.ndim - 2) + (c.shape[-1],)).astype(y.dtype)
        y = MPConv(c_mid, self.out_channels, cfg.kernel, groups=cfg.mlp_groups,
                   w_pad_mode="reflect",
                   name="conv_res1")(mp_silu(y), training=training)
        if self.in_channels != self.out_channels or cfg.mlp_groups > 1:
            x = MPConv(self.in_channels, self.out_channels, (1, 1, 1),
                       name="conv_skip")(x, training=training)
        # learned residual balance, init sigmoid(-0.7) ~ 0.33 (reference :139)
        rb = self.param("res_balance",
                        lambda k, s: jnp.asarray(-0.7, jnp.float32), ())
        t = jax.nn.sigmoid(rb)
        x = (x + (y - x) * t) / jnp.sqrt((1 - t) ** 2 + t ** 2)
        if cfg.clip_act is not None:
            x = jnp.clip(x, -cfg.clip_act, cfg.clip_act)
        # hidden-activation KL penalty (reference :160-164)
        dims = tuple(range(1, x.ndim))
        mean = x.mean(axis=dims)
        var = jnp.clip(x.var(axis=dims, ddof=1), min=1e-2)  # torch var: ddof=1
        kld = mean ** 2 + var - 1.0 - jnp.log(var)
        return x, kld


class Discriminator(nn.Module):
    """(B, Z, H, W, C) samples -> (logits_map, hidden_kld (B,))."""
    cfg: DiscriminatorConfig

    def setup(self):
        cfg = self.cfg
        cemb = (cfg.model_channels * cfg.channel_mult_emb
                if cfg.in_channels_emb > 0 else 0)
        self._cemb = cemb
        if cfg.in_channels_emb > 0:
            self.emb_label = MPConv(cfg.in_channels_emb, cemb, ())
        self.input_gain = self.param("input_gain", nn.initializers.ones, ())
        self.input_shift = self.param("input_shift", nn.initializers.zeros, ())
        self.conv_in = MPConv(cfg.in_channels + 1, cfg.model_channels,
                              cfg.kernel, w_pad_mode="reflect")
        self.blocks = [DiscBlock(cfg, cfg.model_channels, cfg.model_channels, cemb)
                       for _ in range(cfg.num_layers)]
        self.conv_out = MPConv(cfg.model_channels, 1, cfg.kernel,
                               w_pad_mode="reflect")

    def get_embeddings(self, emb_in: jnp.ndarray, training: bool = False):
        if self.cfg.in_channels_emb <= 0:
            return None
        # unlike the UNet/DAE, the discriminator does NOT activate its
        # label embedding (reference disc_j3.py:221-225)
        return self.emb_label(normalize(emb_in, axis=-1), training=training)

    def init_all(self, samples: jnp.ndarray,
                 emb_in: Optional[jnp.ndarray] = None):
        """Init entry point touching every head (flax creates params only
        for traced modules)."""
        emb = self.get_embeddings(emb_in) if emb_in is not None else None
        return self(samples, emb)

    def __call__(self, samples: jnp.ndarray,
                 embeddings: Optional[jnp.ndarray] = None,
                 training: bool = False):
        x = jnp.concatenate(
            [samples, jnp.ones(samples.shape[:-1] + (1,), samples.dtype)], axis=-1)
        x = self.conv_in(x, gain=self.input_gain, training=training) + self.input_shift
        kld = jnp.zeros((x.shape[0],), jnp.float32)
        for block in self.blocks:
            x, k = block(x, embeddings, training=training)
            kld = kld + k
        logits = self.conv_out(x, training=training)
        return logits, kld
