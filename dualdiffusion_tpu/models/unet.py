"""EDM2 magnitude-preserving UNet (flax.linen, channel-last, TPU-native).

One parameterized implementation covering the reference's UNet roles
(SURVEY.md §2.4 — "one parameterized implementation per role"):

  * latent-diffusion MP-UNet (reference: src/modules/unets/unet_edm2_d1.py
    :90-330): stereo-folded 3D convs (z-wraparound), encoder pixel norm,
    emb-modulated residual blocks with mp_sum balance, emb-modulated
    q/k-normalized self-attention, CFG-ready label embeddings.
  * diffusion decoder / DDEC (reference: src/modules/unets/
    unet_edm2_q4_ddec.py:152-303): 2D convs, no label embedding, linear-PSD
    reference conditioning folded to channels and mp_cat'd with the input.

EDM2 preconditioning is in-model (reference: unet_edm2_q4_ddec.py:260-303):
c_skip/c_out/c_in/c_noise with bf16 internals and fp32 io. The per-sigma
loss logvar head (logvar_linear(logvar_fourier(log sigma/4))) drives the NLL
loss weight and adaptive sigma sampling.

Attention is configurable per SURVEY.md §5.7: "freq" merges time (and
stereo) into batch — attention cost linear in clip length; "time" merges
freq into batch; "full" attends over all positions (the d1 behavior).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import MPConv, MPFourier
from .mp import mp_cat, mp_silu, mp_sum, normalize, resample_2d, resample_3d

# W-pack factor policy for down/up resample blocks: "channels" (pack by the
# destination level's channel count — measured faster on v5e, see
# scripts/ddec_probe.py) or "cin" (pack by the channels the block actually
# runs at — maximal lane density but an extra relayout at the boundary).
import os as _os
_DOWNUP_PACK_POLICY = _os.environ.get("DD_WPACK_DOWNUP", "channels")


@dataclass
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    in_channels_emb: int = 0            # label/CLAP embedding dim (0 = none)
    in_num_freqs: int = 256
    in_psd_freqs: int = 0               # DDEC: linear PSD bins in x_ref (0 = no ref)

    sigma_max: float = 200.0
    sigma_min: float = 0.03
    sigma_data: float = 1.0

    model_channels: int = 64
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    channel_mult_noise: Optional[int] = None
    channel_mult_emb: Optional[int] = None
    num_layers_per_block: int = 2
    attn_levels: Tuple[int, ...] = ()
    attn_axis: Literal["freq", "time", "full"] = "freq"
    midblock_attn: bool = False
    double_midblock: bool = False
    channels_per_head: int = 64
    label_balance: float = 0.5
    concat_balance: float = 0.5
    res_balance: float = 0.3
    attn_balance: float = 0.3
    clip_act: float = 256.0
    mlp_multiplier: int = 1
    mlp_groups: int = 1
    emb_linear_groups: int = 1
    dropout: float = 0.0
    logvar_channels: int = 128
    use_3d: bool = False                # stereo-folded (B, Z, H, W, C) convs
    input_kernel: Tuple[int, int] = (3, 3)
    #: z-kernel for conv_in/conv_out in 3D mode (the d1-series uses 2 —
    #: stereo-wrapped io convs; reference: unet_edm2_d1.py:268,304)
    io_kernel_z: int = 1
    #: z-kernel for 1x1 skip convs in 3D mode: 2 = stereo-wrapped
    #: (b-series, unet_edm2_b4_3d.py:154), 1 = plain (d1-series)
    skip_kernel_z: int = 2
    #: bias on conv_in (the q-series MPConv has one; the d1-series
    #: MPConv3D_E has no bias anywhere)
    io_bias: bool = True
    #: apply the 1x1 skip conv in EVERY block (the d1-series builds it
    #: unconditionally, unet_edm2_d1.py:157; the q-series only when
    #: channels change)
    always_skip: bool = False
    #: W-axis conv padding: "zeros" (torch default; q-series) or "reflect"
    #: (the d1-series MPConv3D_E; reference: unet_edm2_d1.py:60-66)
    conv_w_pad: str = "zeros"
    #: concat a constant ones channel / the format's standardized ln-freq
    #: positional channel to the input (reference: unet_edm2_d1.py:259,351)
    add_constant_channel: bool = False
    add_ln_freqs_channel: bool = False
    #: rematerialize each residual block's activations in the backward
    #: pass (jax.checkpoint) — trades ~30% more FLOPs for O(depth) less
    #: activation memory; required to train the 356M reference-scale
    #: model at batch 8 on a 16 GB chip. Inference paths are unaffected.
    remat_blocks: bool = False
    #: W-axis packing target (TPU layout optimization, exact semantics):
    #: levels whose channel count is below this fold p = target//channels
    #: adjacent W positions into the channel (lane) dim, with the conv
    #: kernels expanded equivalently (layers.py MPConv._packed_conv). Keeps
    #: the 128-lane MXU dim dense for low-channel levels — the DDEC's
    #: 256x5504 grid at 32 ch ran at 4x lane padding waste and ~150 layout
    #: copies per forward without it. 0 disables; 128 is the natural
    #: target. Ignored for use_3d and attention levels.
    w_pack_channels: int = 0


def _conv_kernel(cfg: UNetConfig, k: Tuple[int, int], kz: int = 1) -> Tuple[int, ...]:
    return ((kz,) + k) if cfg.use_3d else k


def _pack_w(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/p, p*C). Linear memory order is unchanged
    (W-major then C), so this is a free reshape."""
    if p == 1:
        return x
    b, h, w, c = x.shape
    return x.reshape(b, h, w // p, p * c)


def _unpack_w(x: jnp.ndarray, p: int) -> jnp.ndarray:
    if p == 1:
        return x
    b, h, wp, pc = x.shape
    return x.reshape(b, h, wp * p, pc // p)


def _mp_cat_packed(a: jnp.ndarray, b: jnp.ndarray, p: int,
                   t: float) -> jnp.ndarray:
    """mp_cat over TRUE channels of two W-packed tensors (channel order
    (j, c)): concat per pack position j, preserving exact semantics."""
    if p == 1:
        return mp_cat(a, b, axis=-1, t=t)
    a5 = a.reshape(a.shape[:-1] + (p, a.shape[-1] // p))
    b5 = b.reshape(b.shape[:-1] + (p, b.shape[-1] // p))
    out = mp_cat(a5, b5, axis=-1, t=t)
    return out.reshape(a.shape[:-1] + (p * out.shape[-1],))


def _packed_pixel_norm(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Pixel norm over each packed position's TRUE channel vector."""
    if p == 1:
        return normalize(x, axis=-1)
    x5 = x.reshape(x.shape[:-1] + (p, x.shape[-1] // p))
    return normalize(x5, axis=-1).reshape(x.shape)


class UNetBlock(nn.Module):
    """Emb-modulated MP residual block with optional self-attention
    (reference: unet_edm2_d1.py:120-222 / unet_edm2_q4_ddec.py:71-151)."""
    cfg: UNetConfig
    in_channels: int
    out_channels: int
    emb_channels: int
    flavor: Literal["enc", "dec"] = "enc"
    resample_mode: Literal["keep", "up", "down"] = "keep"
    use_attention: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: Optional[jnp.ndarray],
                 training: bool = False, w_pack: int = 1) -> jnp.ndarray:
        """``w_pack``: W-packing factor for this block's level (see
        UNetConfig.w_pack_channels; static python int). Contract: 'keep'
        blocks receive/return tensors packed at w_pack; 'up'/'down' blocks
        receive UNPACKED input, resample, then pack."""
        cfg = self.cfg
        wp = w_pack
        assert wp == 1 or not (self.use_attention or cfg.use_3d
                               or cfg.mlp_groups > 1), \
            "W-packing requires 2D, attention-free, ungrouped blocks"
        resample = resample_3d if cfg.use_3d else resample_2d
        x = resample(x, mode=self.resample_mode)
        if wp > 1 and self.resample_mode != "keep":
            x = _pack_w(x, wp)

        if self.flavor == "enc":
            if cfg.always_skip or self.in_channels != self.out_channels:
                x = MPConv(self.in_channels, self.out_channels,
                           _conv_kernel(cfg, (1, 1), kz=cfg.skip_kernel_z
                                        if cfg.use_3d else 1),
                           name="conv_skip")(x, training=training, w_pack=wp)
            x = _packed_pixel_norm(x, wp)  # pixel norm over true channels

        c_mid = self.out_channels * cfg.mlp_multiplier
        c_in_res0 = self.out_channels if self.flavor == "enc" else self.in_channels
        # with mlp_groups > 1 the pair of grouped convs passes the
        # dot_general batch-major (G, B, ..., C/g) layout straight through
        # (the elementwise modulation between them is layout-agnostic),
        # paying XLA's group relayout once per chain instead of per conv
        import os
        # the Pallas implicit-GEMM kernel consumes/produces merged NHWC;
        # disable the batch-major layout threading when the kernel will
        # actually take the pair (inference by default; training only with
        # the separate TRAIN opt-in) so MPConv can route it
        pallas_takes = (os.environ.get("DD_GROUPED_PALLAS_CONV", "0") == "1"
                        and (not training or os.environ.get(
                            "DD_GROUPED_PALLAS_CONV_TRAIN", "0") == "1"))
        grouped = (cfg.mlp_groups > 1
                   and os.environ.get("DD_GROUPED_CONV_NATIVE", "0") != "1"
                   and not pallas_takes)
        # Pallas kernel-layout threading across the res0/res1 pair
        # (DD_PALLAS_PAIR=1): the intermediate stays in the kernel's
        # native (G, B, H, c, W) layout — the elementwise silu/emb-gain
        # between the convs is layout-agnostic — so the NHWC relayout
        # copies are paid once per pair instead of per conv (the r4
        # profile attributed ~0.7 s of the ref-scale sampler to them).
        # Inference-only (the *_pre entry has no VJP).
        pair_mode = os.environ.get("DD_PALLAS_PAIR", "0")
        pallas_pair = (pallas_takes and not training and pair_mode != "0"
                       and not cfg.use_3d and wp == 1
                       and cfg.conv_w_pad != "reflect"
                       and cfg.dropout == 0.0
                       and (cfg.mlp_groups > 1 or pair_mode == "all"))
        if pallas_pair:
            from ..ops.pallas.grouped_conv import supported
            # both convs of the pair must fit (res0 checked at c_mid out,
            # res1 at c_mid in)
            mid_shape = x.shape[:-1] + (c_mid,)
            pallas_pair = (
                supported(x.shape, (3, 3), 1, cfg.mlp_groups,
                          itemsize=2, c_out=c_mid)
                and supported(mid_shape, (3, 3), 1, cfg.mlp_groups,
                              itemsize=2, c_out=self.out_channels))
        pair_w = x.shape[-2]
        y = MPConv(c_in_res0, c_mid, _conv_kernel(cfg, (3, 3)),
                   groups=cfg.mlp_groups, w_pad_mode=cfg.conv_w_pad,
                   name="conv_res0")(
            mp_silu(x), training=training, grouped_out=grouped, w_pack=wp,
            pallas_out=pallas_pair)

        if self.emb_channels > 0 and emb is not None:
            emb_gain = self.param("emb_gain", nn.initializers.zeros, ())
            c = MPConv(self.emb_channels, c_mid, (), groups=cfg.emb_linear_groups,
                       name="emb_linear")(emb, gain=emb_gain, training=training) + 1.0
            if grouped:
                # (B, c_mid) group-major -> (G, B, 1, ..., 1, c_mid/G)
                cg = c.reshape(c.shape[0], cfg.mlp_groups, -1)
                cg = jnp.moveaxis(cg, 1, 0)
                c = cg.reshape(cg.shape[:2] + (1,) * (y.ndim - 3)
                               + cg.shape[-1:])
            elif pallas_pair:
                # kernel layout (G, B, H, c/G, W): gain broadcasts over
                # H (axis 2) and W (axis 4)
                cg = c.reshape(c.shape[0], cfg.mlp_groups, -1)
                c = jnp.moveaxis(cg, 1, 0)[:, :, None, :, None]
            else:
                if wp > 1:  # per-channel gain tiles over pack positions
                    c = jnp.tile(c, (1, wp))
                c = c.reshape((c.shape[0],) + (1,) * (y.ndim - 2) + (c.shape[-1],))
            y = y * c.astype(y.dtype)
        y = mp_silu(y)

        if cfg.dropout > 0 and training:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - cfg.dropout, y.shape)
            # magnitude-preserving dropout fix (reference: _d1.py:186-187)
            y = jnp.where(keep, y / (1.0 - cfg.dropout), 0.0) * (1.0 - cfg.dropout) ** 0.5

        y = MPConv(c_mid, self.out_channels, _conv_kernel(cfg, (3, 3)),
                   groups=cfg.mlp_groups, w_pad_mode=cfg.conv_w_pad,
                   name="conv_res1")(
            y, training=training, grouped_in=grouped, w_pack=wp,
            pallas_in=pallas_pair, pallas_w=pair_w)

        if self.flavor == "dec" and (cfg.always_skip
                                     or self.in_channels != self.out_channels):
            x = MPConv(self.in_channels, self.out_channels,
                       _conv_kernel(cfg, (1, 1), kz=cfg.skip_kernel_z
                                    if cfg.use_3d else 1),
                       name="conv_skip")(x, training=training, w_pack=wp)
        x = mp_sum(x, y, t=cfg.res_balance)

        if self.use_attention:
            x = self._attention(x, emb, training)

        if cfg.clip_act is not None:
            x = jnp.clip(x, -cfg.clip_act, cfg.clip_act)
        return x

    def _attention(self, x: jnp.ndarray, emb: Optional[jnp.ndarray],
                   training: bool) -> jnp.ndarray:
        """q/k-normalized SDPA with emb-modulated qk and v gains
        (reference: unet_edm2_d1.py:196-217)."""
        cfg = self.cfg
        ch = self.out_channels
        num_heads = max(ch // cfg.channels_per_head, 1)

        def modulate(name: str):
            if self.emb_channels > 0 and emb is not None:
                g = self.param(f"emb_gain_{name}", nn.initializers.zeros, ())
                c = MPConv(self.emb_channels, ch, (), name=f"emb_linear_{name}")(
                    emb, gain=g, training=training) + 1.0
                return c.reshape((c.shape[0],) + (1,) * (x.ndim - 2) + (ch,)).astype(x.dtype)
            return jnp.ones((), x.dtype)

        qk = MPConv(ch, ch * 2, _conv_kernel(cfg, (1, 1)), name="attn_qk")(
            x * modulate("qk"), training=training)
        v = MPConv(ch, ch, _conv_kernel(cfg, (1, 1)), name="attn_v")(
            x, training=training)

        # fold spatial dims into (batch', seq) per attn_axis
        spatial = x.shape[1:-1]           # (H, W) or (Z, H, W)
        b = x.shape[0]

        def to_seq(t: jnp.ndarray, channels: int):
            if cfg.attn_axis == "full":
                seq = int(np.prod(spatial))
                return t.reshape(b, seq, channels), (b,) + spatial
            if cfg.attn_axis == "freq":
                # sequence = freq axis (H); batch' = B * (Z?) * W
                h_ax = 2 if cfg.use_3d else 1
                perm = list(range(t.ndim))
                perm.remove(h_ax)
                perm.insert(t.ndim - 2, h_ax)
                tp = jnp.transpose(t, perm)  # (..., H, C)
                lead = tp.shape[:-2]
                return tp.reshape(int(np.prod(lead)), t.shape[h_ax], channels), lead
            # "time": sequence = W (axis -2 of spatial)
            return t.reshape(-1, t.shape[-2], channels), t.shape[:-2]

        qk_s, lead = to_seq(qk, ch * 2)
        v_s, _ = to_seq(v, ch)
        bs, seq = qk_s.shape[0], qk_s.shape[1]
        hd = ch // num_heads
        qk_h = qk_s.reshape(bs, seq, num_heads, 2, hd)
        q = normalize(qk_h[..., 0, :], axis=-1)
        k = normalize(qk_h[..., 1, :], axis=-1)
        vh = normalize(v_s.reshape(bs, seq, num_heads, hd), axis=-1)

        from .attention import scaled_dot_product_attention
        y = scaled_dot_product_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(vh, 1, 2), scale=1.0 / np.sqrt(hd),
            training=training)
        y = jnp.swapaxes(y, 1, 2).astype(x.dtype).reshape(bs, seq, ch)

        # undo the fold
        if cfg.attn_axis == "full":
            y = y.reshape((b,) + spatial + (ch,))
        elif cfg.attn_axis == "freq":
            h_ax = 2 if cfg.use_3d else 1
            y = y.reshape(lead + (seq, ch))
            perm = list(range(y.ndim))
            perm.remove(y.ndim - 2)
            perm.insert(h_ax, y.ndim - 2)
            y = jnp.transpose(y, perm)
        else:
            y = y.reshape(x.shape[:-1] + (ch,))

        y = mp_silu(y * modulate("v"))
        y = MPConv(ch, ch, _conv_kernel(cfg, (1, 1)), name="attn_proj")(
            y, training=training)
        return mp_sum(x, y, t=cfg.attn_balance)


class UNetCore(nn.Module):
    """EDM2-preconditioned MP-UNet trunk.

    __call__(x, sigma, embeddings, x_ref, training) -> D_x
      x: (B, H, W, C) or (B, Z, H, W, C) fp32
      sigma: (B,) fp32
      embeddings: (B, cemb) or None (from UNet.get_embeddings)
      x_ref: (B, psd_bins, W, C) linear PSD conditioning (DDEC) or None
    """
    cfg: UNetConfig

    @property
    def num_levels(self) -> int:
        return len(self.cfg.channel_mult)

    def _cemb(self) -> int:
        cfg = self.cfg
        cblock = [cfg.model_channels * m for m in cfg.channel_mult]
        cemb = cfg.model_channels * cfg.channel_mult_emb if cfg.channel_mult_emb else max(cblock)
        return cemb * cfg.mlp_multiplier

    def _cnoise(self) -> int:
        cfg = self.cfg
        cblock = [cfg.model_channels * m for m in cfg.channel_mult]
        return cfg.model_channels * cfg.channel_mult_noise if cfg.channel_mult_noise else max(cblock)

    def _build_schedule(self):
        """The linear op schedule executed by the forward pass: a list of
        (attr_name, kind, level, cin, cout) where kind is one of
        enc_in / enc_down / enc_layer / dec_mid / dec_up / dec_layer /
        conv_out. Pipeline parallelism (parallel/pipeline.py) runs
        contiguous sub-ranges of the same schedule on different devices."""
        cfg = self.cfg
        cblock = [cfg.model_channels * m for m in cfg.channel_mult]
        cemb = self._cemb()
        in_ch = cfg.in_channels
        if cfg.in_psd_freqs > 0:
            in_ch += (cfg.in_psd_freqs // cfg.in_num_freqs) * cfg.in_channels
        in_ch += int(cfg.add_constant_channel) + int(cfg.add_ln_freqs_channel)
        ops = []
        cout = in_ch
        skip_ch = []
        for level, channels in enumerate(cblock):
            if level == 0:
                ops.append(("enc_conv_in", "enc_in", 0, cout, channels))
                cout = channels
            else:
                # the down block keeps the PREVIOUS level's width; the
                # first layer block does the channel transition
                ops.append((f"enc_b{level}_down", "enc_down", level,
                            cout, cout))
            skip_ch.append(cout)
            for idx in range(cfg.num_layers_per_block):
                ops.append((f"enc_b{level}_l{idx}", "enc_layer", level,
                            cout, channels))
                cout = channels
                skip_ch.append(cout)
        for level, channels in reversed(list(enumerate(cblock))):
            if level == len(cblock) - 1:
                ops.append((f"dec_b{level}_in0", "dec_mid", level, cout, cout))
                if cfg.double_midblock:
                    ops.append((f"dec_b{level}_in1", "dec_mid", level,
                                cout, cout))
            else:
                ops.append((f"dec_b{level}_up", "dec_up", level, cout, cout))
            for idx in range(cfg.num_layers_per_block + 1):
                sc = skip_ch.pop()
                ops.append((f"dec_b{level}_l{idx}", "dec_layer", level,
                            cout + sc, channels))
                cout = channels
        ops.append(("conv_out", "conv_out", 0, cout, cfg.out_channels))
        return ops, cemb

    def setup(self):
        cfg = self.cfg
        ops, cemb = self._build_schedule()
        self.schedule = ops
        cblock = [cfg.model_channels * m for m in cfg.channel_mult]
        top = len(cblock) - 1
        # rematerialization wraps the Block class itself; it only affects
        # reverse-mode (training) — inference forwards are untouched
        Block = (nn.remat(UNetBlock, static_argnums=(3, 4))
                 if cfg.remat_blocks else UNetBlock)

        self.emb_fourier = MPFourier(self._cnoise())
        self.emb_noise = MPConv(self._cnoise(), cemb, ())
        for name, kind, level, cin, cout in ops:
            if kind == "enc_in":
                mod = MPConv(cin, cout,
                             _conv_kernel(cfg, cfg.input_kernel,
                                          kz=cfg.io_kernel_z),
                             use_bias=cfg.io_bias,
                             w_pad_mode=cfg.conv_w_pad)
            elif kind == "conv_out":
                mod = MPConv(cin, cout,
                             _conv_kernel(cfg, (3, 3), kz=cfg.io_kernel_z),
                             w_pad_mode=cfg.conv_w_pad)
            else:
                flavor = "enc" if kind.startswith("enc") else "dec"
                resample = {"enc_down": "down", "dec_up": "up"}.get(kind, "keep")
                attn = (cfg.midblock_attn if kind == "dec_mid"
                        else level in cfg.attn_levels)
                mod = Block(cfg, cin, cout, cemb, flavor=flavor,
                            resample_mode=resample, use_attention=attn)
            setattr(self, name, mod)
        self.out_gain = self.param("out_gain", nn.initializers.zeros, ())

    def _pack_factor(self, level: int, channels: int, w: int) -> int:
        """W-packing factor for one level (layout optimization only —
        exact semantics; see UNetConfig.w_pack_channels)."""
        cfg = self.cfg
        if (cfg.w_pack_channels <= 0 or cfg.use_3d
                or cfg.mlp_groups > 1 or level in cfg.attn_levels
                or (level == len(cfg.channel_mult) - 1 and cfg.midblock_attn)):
            return 1
        p = max(cfg.w_pack_channels // channels, 1)
        while p > 1 and w % p != 0:
            p //= 2
        return p

    def run_ops(self, x: jnp.ndarray, emb: jnp.ndarray, skips,
                lo: int = 0, hi: Optional[int] = None,
                training: bool = False):
        """Execute schedule ops [lo, hi) — the whole trunk when defaults.

        Contract at op boundaries: ``x`` is UNPACKED (B, [Z,] H, W, C) and
        ``skips`` hold unpacked tensors (W-packing happens inside each op;
        pack/unpack are free reshapes). Returns (x, skips). Used both by
        __call__ (full range) and by pipeline-parallel stages
        (parallel/pipeline.py runs contiguous ranges on different devices).
        """
        cfg = self.cfg
        ops = self.schedule
        hi = len(ops) if hi is None else hi
        skips = list(skips)
        w_axis = -2
        for name, kind, level, cin, cout in ops[lo:hi]:
            mod = getattr(self, name)
            channels = cfg.model_channels * cfg.channel_mult[level] \
                if kind != "conv_out" else cin
            if kind == "enc_in":
                p = self._pack_factor(0, cout, x.shape[w_axis])
                x = _unpack_w(mod(_pack_w(x, p), training=training, w_pack=p),
                              p)
                skips.append(x)
            elif kind == "enc_down":
                # the down block runs at the PREVIOUS level's channel count
                # (cin == cout, the transition is in the first layer block).
                # Packing by that smaller count (maximal lane density) was
                # measured SLOWER on v5e than packing by the new level's
                # count: the deeper pack factor forces an extra relayout at
                # the block boundary that outweighs the lane fill (DDEC
                # 256x5504 probe, scripts/ddec_probe.py). Policy switchable
                # for measurement via DD_WPACK_DOWNUP=cin.
                pch = cin if _DOWNUP_PACK_POLICY == "cin" else channels
                p = self._pack_factor(level, pch, x.shape[w_axis] // 2)
                x = _unpack_w(mod(x, emb, training, p), p)
                skips.append(x)
            elif kind == "enc_layer":
                p = self._pack_factor(level, channels, x.shape[w_axis])
                x = _unpack_w(mod(_pack_w(x, p), emb, training, p), p)
                skips.append(x)
            elif kind == "dec_mid":
                p = self._pack_factor(level, channels, x.shape[w_axis])
                x = _unpack_w(mod(_pack_w(x, p), emb, training, p), p)
            elif kind == "dec_up":
                # ditto: the up block runs at the DEEPER level's channel
                # count (cin == cout)
                pch = cin if _DOWNUP_PACK_POLICY == "cin" else channels
                p = self._pack_factor(level, pch, x.shape[w_axis] * 2)
                x = _unpack_w(mod(x, emb, training, p), p)
            elif kind == "dec_layer":
                skip_x = skips.pop()
                p = self._pack_factor(level, channels, x.shape[w_axis])
                xc = _mp_cat_packed(_pack_w(x, p), _pack_w(skip_x, p), p,
                                    cfg.concat_balance)
                x = _unpack_w(mod(xc, emb, training, p), p)
            else:  # conv_out
                p = self._pack_factor(
                    0, cfg.model_channels * cfg.channel_mult[0],
                    x.shape[w_axis])
                x = _unpack_w(mod(_pack_w(x, p), gain=self.out_gain,
                                  training=training, w_pack=p), p)
        return x, skips

    def precondition(self, x_in: jnp.ndarray, sigma: jnp.ndarray,
                     embeddings: Optional[jnp.ndarray],
                     x_ref: Optional[jnp.ndarray], training: bool = False,
                     ln_freqs: Optional[jnp.ndarray] = None,
                     x_perturbed: Optional[jnp.ndarray] = None):
        """EDM2 preconditioning + x_ref fold + aux channels + noise/label
        embedding. Returns (x, emb, c_skip, c_out). ``ln_freqs``: (H,)
        log-frequencies for the positional channel (standardized in-model,
        so the log base is irrelevant); defaults to mel-scale centers.
        ``x_perturbed``: training-time input perturbation — the network
        input is ``c_in * x_perturbed`` while the c_skip residual path still
        uses the unperturbed ``x_in`` (reference:
        unet_edm2_b4.py:255-267 consumed by unet_trainer.py:254-261)."""
        cfg = self.cfg
        dtype = jnp.bfloat16
        sigma = sigma.reshape((-1,) + (1,) * (x_in.ndim - 1)).astype(jnp.float32)
        sd = cfg.sigma_data
        c_skip = sd ** 2 / (sigma ** 2 + sd ** 2)
        c_out = sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
        c_in = 1.0 / jnp.sqrt(sd ** 2 + sigma ** 2)
        c_noise = jnp.log(sigma.reshape(-1)) / 4.0

        net_in = x_in if x_perturbed is None else x_perturbed
        x = (c_in * net_in.astype(jnp.float32)).astype(dtype)

        if x_ref is not None and cfg.in_psd_freqs > 0:
            # (B, psd_bins, W, C) -> fold psd rows into channels aligned to
            # the model's freq rows (reference: unet_edm2_q4_ddec.py:269-271)
            b, pbins, w, c = x_ref.shape
            per = cfg.in_psd_freqs // cfg.in_num_freqs
            # rows derive from the actual ref shape (pbins // per), not the
            # config constant, so proportionally reduced inputs still fold
            r = x_ref.reshape(b, pbins // per, per, w, c)
            r = jnp.transpose(r, (0, 1, 3, 2, 4)).reshape(b, pbins // per, w, per * c)
            x = mp_cat(x, r.astype(dtype), axis=-1, t=cfg.label_balance)
        elif x_ref is not None:
            # inpainting / img2img reference channels concatenated as extra
            # input channels (reference: dual_diffusion_pipeline.py:440-447 +
            # convert_unet_to_inpainting zero-init extension)
            x = jnp.concatenate([x, x_ref.astype(dtype)], axis=-1)

        if cfg.add_constant_channel or cfg.add_ln_freqs_channel:
            # d1-style input conditioning: constant ones channel + the
            # standardized ln-freq positional channel (unet_edm2_d1.py:351)
            parts = [x]
            if cfg.add_constant_channel:
                parts.append(jnp.ones(x.shape[:-1] + (1,), x.dtype))
            if cfg.add_ln_freqs_channel:
                h_ax = 2 if cfg.use_3d else 1
                if ln_freqs is None:
                    from ..ops.mel import hz_to_mel, mel_to_hz
                    m = np.linspace(hz_to_mel(20.0), hz_to_mel(16000.0),
                                    x.shape[h_ax] + 2)[1:-1]
                    ln_freqs = jnp.asarray(np.log(mel_to_hz(m)), jnp.float32)
                lf = ln_freqs.astype(jnp.float32)
                lf = (lf - lf.mean()) / lf.std()
                shape = [1] * x.ndim
                shape[h_ax] = x.shape[h_ax]
                pos = jnp.broadcast_to(lf.reshape(shape),
                                       x.shape[:-1] + (1,)).astype(x.dtype)
                parts.append(pos)
            x = jnp.concatenate(parts, axis=-1)

        emb = self.emb_fourier(c_noise)
        emb = self.emb_noise(emb, training=training)
        if cfg.in_channels_emb > 0 and embeddings is not None:
            emb = mp_silu(mp_sum(emb, embeddings.astype(emb.dtype), t=cfg.label_balance))
        emb = emb.astype(dtype)
        return x, emb, c_skip, c_out

    def __call__(self, x_in: jnp.ndarray, sigma: jnp.ndarray,
                 embeddings: Optional[jnp.ndarray] = None,
                 x_ref: Optional[jnp.ndarray] = None,
                 training: bool = False,
                 ln_freqs: Optional[jnp.ndarray] = None,
                 x_perturbed: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        div = 1 << (len(cfg.channel_mult) - 1)
        h, w = x_in.shape[-3], x_in.shape[-2]
        if h % div or w % div:
            # fail with a readable message here instead of a reshape /
            # mp_cat shape mismatch deep inside a W-packed skip connection
            raise ValueError(
                f"UNet input H,W=({h},{w}) must be divisible by {div} "
                f"(2^(levels-1), {len(cfg.channel_mult)} levels) so skip "
                f"widths match across down/up resampling")
        x, emb, c_skip, c_out = self.precondition(x_in, sigma, embeddings,
                                                  x_ref, training, ln_freqs,
                                                  x_perturbed)
        x, _ = self.run_ops(x, emb, [], training=training)
        return c_skip * x_in.astype(jnp.float32) + c_out * x.astype(jnp.float32)


class UNet(nn.Module):
    """MP-UNet with its auxiliary heads (one param tree, multiple methods —
    reference API surface: src/modules/unets/unet.py:44-66)."""
    cfg: UNetConfig

    def setup(self):
        cfg = self.cfg
        self.core = UNetCore(cfg)
        cblock = [cfg.model_channels * m for m in cfg.channel_mult]
        cemb = cfg.model_channels * cfg.channel_mult_emb if cfg.channel_mult_emb else max(cblock)
        self._cemb_dim = cemb * cfg.mlp_multiplier
        if cfg.in_channels_emb > 0:
            self.emb_label = MPConv(cfg.in_channels_emb, self._cemb_dim, ())
            self.emb_label_unconditional = MPConv(1, self._cemb_dim, ())
        self.logvar_fourier = MPFourier(cfg.logvar_channels)
        self.logvar_linear = MPConv(cfg.logvar_channels, 1, (),
                                    disable_weight_norm=True, zero_init=True)

    @property
    def num_levels(self) -> int:
        return len(self.cfg.channel_mult)

    def __call__(self, x_in: jnp.ndarray, sigma: jnp.ndarray,
                 embeddings: Optional[jnp.ndarray] = None,
                 x_ref: Optional[jnp.ndarray] = None,
                 training: bool = False,
                 ln_freqs: Optional[jnp.ndarray] = None,
                 x_perturbed: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return self.core(x_in, sigma, embeddings, x_ref, training, ln_freqs,
                         x_perturbed)

    def init_all(self, x_in: jnp.ndarray, sigma: jnp.ndarray,
                 emb_in: Optional[jnp.ndarray] = None,
                 x_ref: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Initialization entry point touching every head (flax only creates
        params for modules traced at init). Use
        ``model.init(key, x, sigma, emb_in, x_ref, method=UNet.init_all)``.
        """
        emb = None
        if self.cfg.in_channels_emb > 0 and emb_in is not None:
            emb = self.get_embeddings(emb_in, jnp.ones((x_in.shape[0],), x_in.dtype))
        self.get_sigma_loss_logvar(sigma)
        return self.core(x_in, sigma, emb, x_ref, False)

    def get_embeddings(self, emb_in: jnp.ndarray, conditioning_mask: jnp.ndarray,
                       training: bool = False) -> Optional[jnp.ndarray]:
        """CFG label embedding: mp_sum(unconditional, conditional, t=mask)
        (reference: unet_edm2_d1.py get_embeddings / q4_ddec.py:238-244)."""
        if self.cfg.in_channels_emb <= 0:
            return None
        u = self.emb_label_unconditional(jnp.ones((1, 1), emb_in.dtype),
                                         training=training)
        c = self.emb_label(normalize(emb_in, axis=-1), training=training)
        return mp_sum(u, c, t=conditioning_mask[:, None])

    def get_sigma_loss_logvar(self, sigma: jnp.ndarray,
                              training: bool = False) -> jnp.ndarray:
        """Learned per-sigma uncertainty (B,) -> (B, 1, 1, 1)."""
        f = self.logvar_fourier(jnp.log(sigma.reshape(-1)) / 4.0)
        lv = self.logvar_linear(f, training=training)
        return lv.reshape(-1, 1, 1, 1).astype(jnp.float32)

    def get_latent_shape(self, latent_shape: Sequence[int]) -> Tuple[int, ...]:
        ds = 2 ** (self.num_levels - 1)
        if len(latent_shape) == 4:  # (B, H, W, C)
            return (latent_shape[0], latent_shape[1] // ds * ds,
                    latent_shape[2] // ds * ds, latent_shape[3])
        return (latent_shape[0], latent_shape[1], latent_shape[2] // ds * ds,
                latent_shape[3] // ds * ds, latent_shape[4])
