"""Legacy KL VAE with uniform target SNR (the reference's first-generation
stage-1 autoencoder).

Capability parity with the reference's AutoencoderKL_EDM2
(reference: src/modules/old/vaes/vae_edm2.py:48,151-271):

  * MP conv encoder/decoder with emb-modulated blocks;
  * a constant channel + the format's normalized ln-freq positional channel
    concatenated to encoder/decoder inputs (:259-268);
  * **uniform target SNR latents** (README Dec/2023 finding): fixed
    ``noise_logvar = log(1/(snr^2+1))`` — no learned per-pixel logvar —
    with ``latents_out_gain`` initialized to the matching target std;
  * IsotropicGaussianDistribution latents with mode/sample/kl.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import MPConv
from .mp import mp_silu, mp_sum, normalize, resample_2d


class IsotropicGaussianDistribution(NamedTuple):
    """Latent distribution with a shared scalar noise logvar."""
    mean: jnp.ndarray
    logvar: jnp.ndarray  # scalar

    def mode(self) -> jnp.ndarray:
        return self.mean

    def sample(self, key: jax.Array) -> jnp.ndarray:
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(key, self.mean.shape,
                                                   self.mean.dtype)

    def kl(self) -> jnp.ndarray:
        """KL(N(mean, var) || N(0,1)) per sample."""
        var = jnp.exp(self.logvar)
        return 0.5 * jnp.sum(self.mean ** 2 + var - 1.0 - self.logvar,
                             axis=tuple(range(1, self.mean.ndim)))


@dataclass
class VAEConfig:
    in_channels: int = 2
    out_channels: int = 2
    latent_channels: int = 4
    label_dim: int = 512
    model_channels: int = 64
    channel_mult: Tuple[int, ...] = (1, 2, 3, 5)
    channel_mult_emb: Optional[int] = None
    num_layers_per_block: int = 2
    res_balance: float = 0.3
    mlp_multiplier: int = 1
    mlp_groups: int = 1
    target_snr: float = 32.0


class VAEBlock(nn.Module):
    """The old-style EDM2 2D block the legacy VAE is built from
    (reference: old/vaes/vae_edm2.py:51-149): UNet-like — mp_silu BEFORE
    conv_res0, unconditional encoder pixel norm, emb modulation followed
    by mp_silu (no grouped normalize) — unlike the q4 DAEBlock."""
    in_channels: int
    out_channels: int
    emb_channels: int
    flavor: str = "enc"
    resample_mode: str = "keep"
    res_balance: float = 0.3
    mlp_multiplier: int = 1
    clip_act: float = 256.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: Optional[jnp.ndarray] = None,
                 training: bool = False) -> jnp.ndarray:
        x = resample_2d(x, mode=self.resample_mode)
        if self.flavor == "enc":
            if self.in_channels != self.out_channels:
                x = MPConv(self.in_channels, self.out_channels, (1, 1),
                           name="conv_skip")(x, training=training)
            x = normalize(x, axis=-1)  # pixel norm (always, unlike q4 DAE)
        c_mid = self.out_channels * self.mlp_multiplier
        c_in0 = self.out_channels if self.flavor == "enc" else self.in_channels
        y = MPConv(c_in0, c_mid, (3, 3),
                   name="conv_res0")(mp_silu(x), training=training)
        if self.emb_channels > 0 and emb is not None:
            g = self.param("emb_gain", nn.initializers.zeros, ())
            c = MPConv(self.emb_channels, c_mid, (),
                       name="emb_linear")(emb, gain=g, training=training) + 1.0
            y = y * c[:, None, None, :].astype(y.dtype)
        y = mp_silu(y)
        y = MPConv(c_mid, self.out_channels, (3, 3),
                   name="conv_res1")(y, training=training)
        if self.flavor == "dec" and self.in_channels != self.out_channels:
            x = MPConv(self.in_channels, self.out_channels, (1, 1),
                       name="conv_skip")(x, training=training)
        x = mp_sum(x, y, t=self.res_balance)
        return jnp.clip(x, -self.clip_act, self.clip_act)


class VAE(nn.Module):
    """AutoencoderKL with uniform-target-SNR latents."""
    cfg: VAEConfig

    @property
    def num_levels(self) -> int:
        return len(self.cfg.channel_mult)

    @property
    def downsample_ratio(self) -> int:
        return 2 ** (self.num_levels - 1)

    def setup(self):
        cfg = self.cfg
        cblock = [cfg.model_channels * m for m in cfg.channel_mult]
        cemb = (cfg.model_channels * cfg.channel_mult_emb
                if cfg.channel_mult_emb else max(cblock))
        self._cemb = cemb
        self.emb_label = MPConv(cfg.label_dim, cemb, ())
        self.recon_loss_logvar = self.param("recon_loss_logvar",
                                            nn.initializers.zeros, ())

        bkw = dict(emb_channels=cemb, res_balance=cfg.res_balance,
                   mlp_multiplier=cfg.mlp_multiplier)

        # encoder: down blocks keep the previous level's channels; the
        # layer blocks do the channel transition (reference :182-200)
        enc = []
        cout = cfg.in_channels + 2  # const + ln-freq positional channel
        self.conv_in = MPConv(cout, cblock[0], (3, 3))
        cout = cblock[0]
        for level, ch in enumerate(cblock):
            if level > 0:
                enc.append(VAEBlock(cout, cout, flavor="enc",
                                    resample_mode="down", **bkw))
            for _ in range(cfg.num_layers_per_block):
                enc.append(VAEBlock(cout, ch, flavor="enc", **bkw))
                cout = ch
        self.enc = enc
        self.conv_latents_out = MPConv(cout, cfg.latent_channels, (3, 3))

        # uniform target SNR (reference :168-171)
        target_noise_std = float(np.sqrt(1.0 / (cfg.target_snr ** 2 + 1)))
        target_sample_std = float(np.sqrt(1.0 - target_noise_std ** 2))
        self.latents_out_gain = self.param(
            "latents_out_gain",
            lambda k, s: jnp.asarray(target_sample_std, jnp.float32), ())
        self.out_gain = self.param("out_gain", nn.initializers.ones, ())

        # decoder: two mid blocks at the deepest level, up blocks keep
        # channels, num_layers+1 layer blocks per level with the channel
        # transition in the layers (reference :205-222)
        dec = []
        self.conv_latents_in = MPConv(cfg.latent_channels + 2, cblock[-1], (3, 3))
        cout = cblock[-1]
        for level, ch in reversed(list(enumerate(cblock))):
            if level == self.num_levels - 1:
                dec.append(VAEBlock(cout, cout, flavor="dec", **bkw))
                dec.append(VAEBlock(cout, cout, flavor="dec", **bkw))
            else:
                dec.append(VAEBlock(cout, cout, flavor="dec",
                                    resample_mode="up", **bkw))
            for _ in range(cfg.num_layers_per_block + 1):
                dec.append(VAEBlock(cout, ch, flavor="dec", **bkw))
                cout = ch
        self.dec = dec
        self.conv_out = MPConv(cout, cfg.out_channels, (3, 3))

    # ---- helpers -------------------------------------------------------
    def init_all(self, x: jnp.ndarray, emb_in: Optional[jnp.ndarray] = None):
        """Init entry point touching every head (flax creates params only
        for traced modules)."""
        emb = self.get_embeddings(emb_in) if emb_in is not None else None
        return self(x, emb)

    def get_embeddings(self, emb_in: jnp.ndarray, training: bool = False):
        return mp_silu(self.emb_label(normalize(emb_in, axis=-1),
                                      training=training))

    def get_recon_loss_logvar(self):
        return self.recon_loss_logvar

    def get_target_snr(self) -> float:
        return self.cfg.target_snr

    def get_latent_shape(self, sample_shape):
        b, h, w, _ = sample_shape
        ds = self.downsample_ratio
        return (b, h // ds, w // ds, self.cfg.latent_channels)

    def _aux_channels(self, x: jnp.ndarray,
                      ln_freqs: Optional[jnp.ndarray]) -> jnp.ndarray:
        """const 1s channel + normalized ln-freq positional channel
        (reference :259-268)."""
        ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
        if ln_freqs is None:
            h = x.shape[1]
            lf = np.log(np.linspace(20.0, 16000.0, h))
            lf = (lf - lf.mean()) / lf.std()
            ln_freqs = jnp.asarray(lf, x.dtype)
        pos = jnp.broadcast_to(ln_freqs[None, :, None, None],
                               x.shape[:-1] + (1,)).astype(x.dtype)
        return jnp.concatenate([x, ones, pos], axis=-1)

    # ---- core ----------------------------------------------------------
    def encode(self, x: jnp.ndarray, embeddings: Optional[jnp.ndarray] = None,
               ln_freqs: Optional[jnp.ndarray] = None,
               training: bool = False) -> IsotropicGaussianDistribution:
        x = self._aux_channels(x, ln_freqs)
        x = self.conv_in(x, training=training)
        for block in self.enc:
            x = block(x, embeddings, training=training)
        latents = self.conv_latents_out(x, gain=self.latents_out_gain,
                                        training=training)
        noise_logvar = jnp.asarray(
            np.log(1.0 / (self.cfg.target_snr ** 2 + 1)), jnp.float32)
        return IsotropicGaussianDistribution(latents, noise_logvar)

    def decode(self, latents: jnp.ndarray,
               embeddings: Optional[jnp.ndarray] = None,
               ln_freqs: Optional[jnp.ndarray] = None,
               training: bool = False) -> jnp.ndarray:
        x = self._aux_channels(latents, ln_freqs)
        x = self.conv_latents_in(x, training=training)
        for block in self.dec:
            x = block(x, embeddings, training=training)
        return self.conv_out(x, gain=self.out_gain, training=training)

    def __call__(self, x: jnp.ndarray, embeddings: Optional[jnp.ndarray] = None,
                 key: Optional[jax.Array] = None, training: bool = True):
        dist = self.encode(x, embeddings, training=training)
        latents = dist.sample(key) if key is not None else dist.mode()
        recon = self.decode(latents, embeddings, training=training)
        return latents, recon, dist
