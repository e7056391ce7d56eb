"""DAE — the stage-1 autoencoder (flax.linen, channel-last).

Capability parity with the reference's current DAE
(reference: src/modules/daes/dae_edm2_q4.py:91-405):

  * plain conv encoder (x2^L down) / decoder built from MP blocks;
  * LatentStatsTracker: EMA of per-channel and global latent mean/var kept
    as a mutable flax "stats" collection (reference :42-89);
  * optional latent noise injection during training (reference :340-350);
  * learned recon-loss logvar scalar; out_gain;
  * overlap-discard ``tiled_encode`` for arbitrary-length clips
    (reference :352-405) — the sharded multi-device version lives in
    parallel/ (SURVEY.md §5.7);
  * supersampled-latent variant (reference: dae_edm2_d3.py:337-354): the
    encoder runs at full resolution and the latent projection is average-
    pooled by ``downsample_ratio``, guaranteeing sub-latent-pixel shift
    equivariance (enable with ``supersampled=True``). Deliberate deviation:
    the d3-series experiment uses the OLD 3D block (mp_silu before
    conv_res0, dae_edm2_d3.py:195); this repo applies the supersampling
    idea on the CURRENT q4 block (weight-goldened against the reference),
    per SURVEY §7.1's one-parameterized-implementation-per-role stance.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import MPConv
from .mp import mp_silu, mp_sum, normalize, normalize_groups, resample_2d


@dataclass
class DAEConfig:
    in_channels: int = 2
    out_channels: int = 2
    in_channels_emb: int = 0
    in_num_freqs: int = 256
    latent_channels: int = 8

    model_channels: int = 64
    channel_mult_enc: Tuple[int, ...] = (1, 2, 4, 8)
    channel_mult_dec: Tuple[int, ...] = (1, 2, 4, 8)
    channel_mult_emb: int = 4
    num_enc_layers_per_block: int = 3
    num_dec_layers_per_block: int = 3
    res_balance: float = 0.3
    clip_act: float = 256.0
    mlp_multiplier: int = 2
    mlp_groups: int = 1
    emb_linear_groups: int = 1
    add_pixel_norm: bool = False
    latent_stats_momentum: float = 0.99
    supersampled: bool = False   # d3-series shift-equivariant encoder
    # compute dtype for conv activations (fp32 io; the reference trains
    # bf16 via torch autocast, trainer.py:336-338)
    compute_dtype: str = "bfloat16"
    #: W-packing layout optimization for low-channel levels (exact
    #: semantics; see UNetConfig.w_pack_channels): fold W so each level
    #: runs at >= this many channels. 0 disables.
    w_pack_channels: int = 0


class DAEBlock(nn.Module):
    """MP residual block (reference: dae_edm2_q4.py:120-204)."""
    cfg: DAEConfig
    in_channels: int
    out_channels: int
    emb_channels: int
    flavor: Literal["enc", "dec"] = "enc"
    resample_mode: Literal["keep", "up", "down"] = "keep"

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: Optional[jnp.ndarray] = None,
                 training: bool = False, w_pack: int = 1) -> jnp.ndarray:
        """``w_pack``: W-packing factor (layout only, exact semantics —
        see UNetBlock). 'keep' blocks receive/return packed tensors;
        'up'/'down' blocks receive UNPACKED input, resample, then pack."""
        cfg = self.cfg
        wp = w_pack
        assert wp == 1 or cfg.mlp_groups == 1, \
            "W-packing requires ungrouped DAE blocks"
        if wp > 1 and self.resample_mode == "keep":
            pass                                   # already packed
        else:
            x = resample_2d(x, mode=self.resample_mode)
            if wp > 1:
                from .unet import _pack_w
                x = _pack_w(x, wp)
        if self.flavor == "enc":
            if self.in_channels != self.out_channels:
                x = MPConv(self.in_channels, self.out_channels, (1, 1),
                           name="conv_skip")(x, training=training, w_pack=wp)
            if cfg.add_pixel_norm:
                if wp > 1:
                    from .unet import _packed_pixel_norm
                    x = _packed_pixel_norm(x, wp)
                else:
                    x = normalize(x, axis=-1)

        c_mid = self.out_channels * cfg.mlp_multiplier
        c_in0 = self.out_channels if self.flavor == "enc" else self.in_channels
        # unlike the UNet block there is NO activation before conv_res0
        # (reference dae_edm2_q4.py:180 applies conv_res0 to x directly;
        # the only mid-block activation is the normalized mp_silu below)
        y = MPConv(c_in0, c_mid, (3, 3), groups=cfg.mlp_groups,
                   name="conv_res0")(x, training=training, w_pack=wp)

        if self.emb_channels > 0 and emb is not None:
            emb_gain = self.param("emb_gain", nn.initializers.zeros, ())
            c = MPConv(self.emb_channels, c_mid, (), groups=cfg.emb_linear_groups,
                       name="emb_linear")(emb, gain=emb_gain, training=training) + 1.0
            if wp > 1:  # per-channel gain tiles over pack positions
                c = jnp.tile(c, (1, wp))
            y = y * c[:, None, None, :].astype(y.dtype)

        if wp > 1:
            # unit-RMS norm over each packed position's TRUE channels
            y5 = y.reshape(y.shape[:-1] + (wp, c_mid))
            y = mp_silu(normalize(y5, axis=-1)).reshape(y.shape)
        else:
            y = mp_silu(normalize_groups(y, groups=cfg.mlp_groups))
        y = MPConv(c_mid, self.out_channels, (3, 3), groups=cfg.mlp_groups,
                   name="conv_res1")(y, training=training, w_pack=wp)

        if self.flavor == "dec" and self.in_channels != self.out_channels:
            x = MPConv(self.in_channels, self.out_channels, (1, 1),
                       name="conv_skip")(x, training=training, w_pack=wp)
        x = mp_sum(x, y, t=cfg.res_balance)
        if cfg.clip_act is not None:
            x = jnp.clip(x, -cfg.clip_act, cfg.clip_act)
        return x


class DAE(nn.Module):
    """Stage-1 autoencoder. Latents: (B, H/ds, W/ds, latent_channels)."""
    cfg: DAEConfig

    @property
    def num_levels(self) -> int:
        return len(self.cfg.channel_mult_dec)

    @property
    def downsample_ratio(self) -> int:
        return 2 ** (self.num_levels - 1)

    def setup(self):
        cfg = self.cfg
        enc_ch = [cfg.model_channels * m for m in cfg.channel_mult_enc]
        dec_ch = [cfg.model_channels * m for m in cfg.channel_mult_dec]
        cemb = (cfg.model_channels * cfg.channel_mult_emb * cfg.mlp_multiplier
                if cfg.in_channels_emb > 0 else 0)
        self._cemb = cemb
        if cfg.in_channels_emb > 0:
            self.emb_label = MPConv(cfg.in_channels_emb, cemb, ())

        enc = []
        cin = enc_ch[0]
        self.conv_in = MPConv(cfg.in_channels, cin, (5, 5), use_bias=True)
        # the encoder's depth is its OWN mult list: a supersampled (d3)
        # encoder may be a single full-resolution level while the decoder
        # has the full hourglass (reference dae_edm2_d3.py: flat
        # num_enc_layers encoder, pool after projection)
        assert cfg.supersampled or len(enc_ch) == len(dec_ch), \
            "asymmetric enc/dec levels require supersampled=True"
        for level in range(len(enc_ch)):
            cout = enc_ch[level]
            if level > 0:
                mode = "keep" if cfg.supersampled else "down"
                enc.append(DAEBlock(cfg, cin, cout, cemb, flavor="enc",
                                    resample_mode=mode))
            for _ in range(cfg.num_enc_layers_per_block):
                enc.append(DAEBlock(cfg, cout, cout, cemb, flavor="enc"))
            cin = cout
        self.enc = enc

        self.conv_latents_out = MPConv(enc_ch[-1], cfg.latent_channels, (3, 3))
        self.conv_latents_in = MPConv(cfg.latent_channels, dec_ch[-1], (3, 3),
                                      use_bias=True)

        dec = []
        cin = dec_ch[-1]
        for level in reversed(range(self.num_levels)):
            cout = dec_ch[level]
            mode = "keep" if level == self.num_levels - 1 else "up"
            dec.append(DAEBlock(cfg, cin, cout, cemb, flavor="dec",
                                resample_mode=mode))
            for _ in range(cfg.num_dec_layers_per_block):
                dec.append(DAEBlock(cfg, cout, cout, cemb, flavor="dec"))
            cin = cout
        self.dec = dec
        self.conv_out = MPConv(dec_ch[0], cfg.out_channels, (5, 5))

        self.out_gain = self.param("out_gain", nn.initializers.ones, ())
        self.recon_loss_logvar = self.param("recon_loss_logvar",
                                            nn.initializers.zeros, ())

        # latent stats tracker (mutable collection "stats")
        lc = cfg.latent_channels
        self.stats_mean = self.variable("stats", "latents_mean",
                                        lambda: jnp.zeros((lc,), jnp.float32))
        self.stats_var = self.variable("stats", "latents_var",
                                       lambda: jnp.ones((lc,), jnp.float32))
        self.stats_gmean = self.variable("stats", "latents_global_mean",
                                         lambda: jnp.zeros((), jnp.float32))
        self.stats_gvar = self.variable("stats", "latents_global_var",
                                        lambda: jnp.ones((), jnp.float32))

    # ---- embeddings ---------------------------------------------------------
    def get_embeddings(self, emb_in: jnp.ndarray, training: bool = False):
        if self.cfg.in_channels_emb <= 0:
            return None
        return mp_silu(self.emb_label(normalize(emb_in, axis=-1), training=training))

    def get_recon_loss_logvar(self) -> jnp.ndarray:
        return self.recon_loss_logvar

    # ---- shape math -----------------------------------------------------------
    def get_latent_shape(self, sample_shape: Sequence[int]) -> Tuple[int, ...]:
        b, h, w, _ = sample_shape
        ds = self.downsample_ratio
        return (b, h // ds, w // ds, self.cfg.latent_channels)

    def get_sample_shape(self, latent_shape: Sequence[int]) -> Tuple[int, ...]:
        b, h, w, _ = latent_shape
        ds = self.downsample_ratio
        return (b, h * ds, w * ds, self.cfg.out_channels)

    # ---- core ---------------------------------------------------------------
    def _pack_factor(self, channels: int, w: int) -> int:
        """W-packing factor for one block (layout only, exact semantics;
        see DAEConfig.w_pack_channels / UNetCore._pack_factor)."""
        cfg = self.cfg
        if cfg.w_pack_channels <= 0 or cfg.mlp_groups > 1:
            return 1
        p = max(cfg.w_pack_channels // channels, 1)
        while p > 1 and w % p != 0:
            p //= 2
        return p

    def _run_blocks(self, blocks, x: jnp.ndarray,
                    embeddings: Optional[jnp.ndarray],
                    training: bool) -> jnp.ndarray:
        """Apply a block list with per-block W-packing (pack/unpack are
        free reshapes; x is unpacked at every boundary)."""
        from .unet import _pack_w, _unpack_w
        for block in blocks:
            w = x.shape[2]
            if block.resample_mode == "down":
                w //= 2
            elif block.resample_mode == "up":
                w *= 2
            p = self._pack_factor(block.out_channels, w)
            if p > 1 and block.resample_mode == "keep":
                x = _pack_w(x, p)
            x = _unpack_w(block(x, embeddings, training=training, w_pack=p),
                          p)
        return x

    def encode(self, x: jnp.ndarray, embeddings: Optional[jnp.ndarray] = None,
               training: bool = False) -> jnp.ndarray:
        from .unet import _pack_w, _unpack_w
        x = x.astype(jnp.dtype(self.cfg.compute_dtype))
        # 5x5 io convs need pack reach 2p+1 >= kw, i.e. p >= 2
        p_in = self._pack_factor(self.conv_in.out_channels, x.shape[2])
        if 2 * p_in + 1 >= self.conv_in.kernel[-1] and p_in > 1:
            x = _unpack_w(self.conv_in(_pack_w(x, p_in), training=training,
                                       w_pack=p_in), p_in)
        else:
            x = self.conv_in(x, training=training)
        x = self._run_blocks(self.enc, x, embeddings, training)
        latents = self.conv_latents_out(x, training=training).astype(jnp.float32)
        if self.cfg.supersampled and self.downsample_ratio > 1:
            # supersampled-latent: pool AFTER projection (dae_edm2_d3.py:349)
            ds = self.downsample_ratio
            latents = resample_2d(latents, "down", ratio=ds)
        if training:
            self._track_stats(latents)
        return latents

    def _track_stats(self, latents: jnp.ndarray) -> None:
        m = self.cfg.latent_stats_momentum
        lx = jax.lax.stop_gradient(latents.astype(jnp.float32))
        ch_mean = lx.mean(axis=(0, 1, 2))
        ch_var = lx.var(axis=(0, 1, 2), ddof=1)
        self.stats_mean.value = self.stats_mean.value * m + ch_mean * (1 - m)
        self.stats_var.value = self.stats_var.value * m + ch_var * (1 - m)
        self.stats_gmean.value = self.stats_gmean.value * m + lx.mean() * (1 - m)
        self.stats_gvar.value = self.stats_gvar.value * m + lx.var(ddof=1) * (1 - m)

    def normalize_latents(self, latents: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
        """(x - tracked mean) / tracked std (reference :77-89)."""
        std = jnp.sqrt(self.stats_var.value + eps)
        return ((latents - self.stats_mean.value) / std).astype(latents.dtype)

    def unnormalize_latents(self, latents: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
        std = jnp.sqrt(self.stats_var.value + eps)
        return (latents * std + self.stats_mean.value).astype(latents.dtype)

    def decode(self, latents: jnp.ndarray, embeddings: Optional[jnp.ndarray] = None,
               training: bool = False) -> jnp.ndarray:
        from .unet import _pack_w, _unpack_w
        x = latents.astype(jnp.dtype(self.cfg.compute_dtype))
        x = self.conv_latents_in(x, training=training)
        x = self._run_blocks(self.dec, x, embeddings, training)
        p_out = self._pack_factor(self.conv_out.in_channels, x.shape[2])
        if 2 * p_out + 1 >= self.conv_out.kernel[-1] and p_out > 1:
            out = _unpack_w(self.conv_out(_pack_w(x, p_out),
                                          gain=self.out_gain,
                                          training=training, w_pack=p_out),
                            p_out)
        else:
            out = self.conv_out(x, gain=self.out_gain, training=training)
        return out.astype(jnp.float32)

    def __call__(self, samples: jnp.ndarray,
                 embeddings: Optional[jnp.ndarray] = None,
                 latents_sigma: Optional[jnp.ndarray] = None,
                 noise_key: Optional[jax.Array] = None, training: bool = True):
        """Training forward: returns (latents, reconstruction, pre_norm_latents)
        (reference :340-350, incl. optional latent noise injection)."""
        pre_norm = self.encode(samples, embeddings, training=training)
        latents = pre_norm
        if latents_sigma is not None and noise_key is not None:
            latents = latents + latents_sigma * jax.random.normal(
                noise_key, latents.shape, latents.dtype)
        recon = self.decode(latents, embeddings, training=training)
        return latents, recon, pre_norm


def tiled_encode(apply_fn, params, x: jnp.ndarray,
                 embeddings: Optional[jnp.ndarray], downsample_ratio: int,
                 latent_channels: int, max_chunk: int = 6144,
                 overlap: int = 256) -> jnp.ndarray:
    """Overlap-discard chunked encode for long clips
    (reference: dae_edm2_q4.py:352-405). ``apply_fn(params, chunk, emb)``
    must run DAE.encode. Host-side Python loop with static chunk shapes —
    each unique chunk width compiles once.
    """
    ds = downsample_ratio
    w = x.shape[2]
    assert max_chunk % ds == 0 and overlap % ds == 0 and w % ds == 0
    if w <= max_chunk:
        return apply_fn(params, x, embeddings)
    out_overlap = overlap // ds
    min_chunk = overlap * 3
    pieces = []
    pos = 0
    step = max_chunk - overlap * 2
    starts = list(range(0, w, step))
    lat_w = w // ds
    latents = jnp.zeros((x.shape[0], x.shape[1] // ds, lat_w, latent_channels),
                        x.dtype)
    for w_start in starts:
        chunk_start = max(0, w_start)
        chunk_end = min(w, w_start + max_chunk)
        if chunk_end - chunk_start < min_chunk:
            chunk_start -= min_chunk - (chunk_end - chunk_start)
        chunk = x[:, :, chunk_start:chunk_end]
        lat = apply_fn(params, chunk, embeddings)
        out_start, out_end = chunk_start // ds, chunk_end // ds
        first = w_start == 0
        last = chunk_end == w
        v0 = 0 if first else out_overlap
        v1 = lat.shape[2] if last else lat.shape[2] - out_overlap
        d0 = out_start if first else out_start + out_overlap
        d1 = out_end if last else out_end - out_overlap
        latents = jax.lax.dynamic_update_slice(
            latents, lat[:, :, v0:v1], (0, 0, d0, 0))
    return latents


def top_pca_components(x: jnp.ndarray, n_pca: int = 4) -> jnp.ndarray:
    """Per-sample PCA projection of latent channels for visualization
    (reference: daes/dae.py:34-56). x: (B, H, W, C) channel-last latents ->
    (B, H, W, n_pca) projections onto the top principal components.

    TPU-native: batched via vmap + one SVD on the (HW, C) matrix per sample
    (C is small, so the SVD is tiny; no per-sample Python loop)."""
    b, h, w, c = x.shape
    n_pca = min(n_pca, c)

    def one(xb):
        flat = xb.reshape(h * w, c).astype(jnp.float32)
        centered = flat - flat.mean(axis=0, keepdims=True)
        # principal directions = right singular vectors of the centered data
        _, _, vt = jnp.linalg.svd(centered, full_matrices=False)
        proj = centered @ vt[:n_pca].T                   # (HW, n_pca)
        return proj.reshape(h, w, n_pca)

    return jax.vmap(one)(x)
