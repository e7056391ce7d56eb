"""Magnitude-preserving NN layers (flax.linen), channel-last.

Layer parity with the reference's module-level mp tools
(reference: src/modules/mp_tools.py:316-495 — MPFourier, MPConv, MPConv3D,
AdaptiveGroupBalance, FilteredDownsample2D — and src/utils/resample.py:28-270
— kaiser-windowed-sinc filtered resamplers and filtered MP-SiLU).

Conventions:
  * activations are channel-LAST: (B, ..., C); 2D convs take (B, H, W, C),
    3D stereo-folded convs take (B, Z, H, W, C).
  * MP conv weights are stored reference-style as (out, in/groups, *kernel)
    under the param name ``w_mp`` (or ``w_raw`` when weight norm is
    disabled). The trainer's forced weight re-normalization
    (reference: mp_tools.py:375-378 + trainer.py:1107-1108) is an optax
    transform that renormalizes every ``w_mp`` leaf after each optimizer
    step; during training forward passes the weight is also normalized
    in-graph (reference: mp_tools.py:361-364).
  * under jit the training-time normalize is fused into the conv by XLA.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from functools import lru_cache

from .mp import mp_silu, mp_sum_groups, normalize


@lru_cache(maxsize=64)
def _pack_sel(kw: int, cross: int, p: int) -> np.ndarray:
    """Tap-routing tensor for the W-packed conv expansion:
    sel[dx, dw, j_in, j_out] = 1 iff unpacked input position
    j_in + p*(dw - cross//2) equals output position j_out + (dx - kw//2)."""
    sel = np.zeros((kw, cross, p, p), np.float32)
    for dx in range(kw):
        off = dx - kw // 2
        for dw in range(cross):
            for ji in range(p):
                for jo in range(p):
                    if ji + p * (dw - cross // 2) == jo + off:
                        sel[dx, dw, ji, jo] = 1.0
    return sel

MP_WEIGHT_NAME = "w_mp"
RAW_WEIGHT_NAME = "w_raw"

# --- explicit folded-params marker -----------------------------------------
# fold_inference_params() pre-applies MPConv's weight prep; apply calls that
# use a folded tree must run under `with folded_params(...)`. Inferring
# "already folded" from a non-f32 weight dtype (the pre-r5 behavior) made
# any legitimately bf16-cast param tree (half-precision checkpoint, memory-
# constrained serving) silently skip the sqrt(fan_in) scale and weight norm
# (ADVICE r4 medium). Thread-local: bench compiles stages on worker threads.
import contextlib as _contextlib
import threading as _threading

_FOLDED_TLS = _threading.local()


@_contextlib.contextmanager
def folded_params(mode: str = "all"):
    """Mark enclosed ``apply`` calls as running on a tree produced by
    :func:`fold_inference_params`. ``mode`` must match the fold:
    "all" (every MP weight pre-folded) or "linear" (only the kernel-less
    2-D weights; convs still carry raw weights). Trace-time scoped: wrap
    the apply call inside the jitted function. Folded trees are
    inference-only (no in-graph weight norm is possible)."""
    if mode not in ("all", "linear"):
        raise ValueError(f"folded_params mode must be all|linear, got {mode}")
    prev = getattr(_FOLDED_TLS, "mode", None)
    _FOLDED_TLS.mode = mode
    try:
        yield
    finally:
        _FOLDED_TLS.mode = prev


def folded_mode() -> Optional[str]:
    return getattr(_FOLDED_TLS, "mode", None)


def fold_ctx(mode: Optional[str]):
    """``folded_params(mode)`` when mode is truthy, else a nullcontext —
    for call sites whose folding is flag-driven (DD_FOLD_PARAMS)."""
    return folded_params(mode) if mode else _contextlib.nullcontext()


def fold_env_mode() -> Optional[str]:
    """The fold mode selected by DD_FOLD_PARAMS: 1 -> "all" (every MP
    weight), 2 -> "linear" (kernel-less 2-D weights only), else None."""
    import os
    return {"1": "all", "2": "linear"}.get(
        os.environ.get("DD_FOLD_PARAMS", "0"))


def normalize_weight(w: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Per-output-channel unit-RMS weight norm (axis 0 = out channels)."""
    return normalize(w, axis=tuple(range(1, w.ndim)), eps=eps)


def fold_inference_params(variables, dtype=jnp.bfloat16,
                          linear_only: bool = False):
    """Pre-fold MP weight leaves for inference: divide by sqrt(fan_in)
    once and store in ``dtype`` (bf16). Apply calls on the returned tree
    MUST run under ``with folded_params("linear" if linear_only else
    "all")`` — the explicit marker replaces the old non-f32-dtype
    inference (ADVICE r4 medium) — so MPConv skips its per-call weight
    prep and inside a sampling ``lax.scan`` the weights become
    loop-invariant bf16 buffers — the
    ref-scale sampler profile measured per-step f32 weight slice /
    convert / copy DMA chains dominating the step span (slice-start 54%
    of device-op time) because XLA does not hoist them out of the while
    body. Call INSIDE the jitted stage fn, outside the scan (the fold
    itself then runs once per call, ~1 ms), or once at model load.

    Inference only: folded leaves carry no unit-RMS re-normalization
    (stored weights are already force-normalized by the trainer, like
    the reference's forced weight norm, mp_tools.py:375-378).

    ``linear_only`` folds just the 2-D (kernel-less linear) weights —
    the per-block emb-modulation matrices, whose per-step streaming is
    pure DMA against a (B, emb) matmul — and leaves conv weights f32:
    folding convs regressed the Pallas sampler path (the wt transpose
    loses its convert fusion; BASELINE r4).
    """
    weight_names = (MP_WEIGHT_NAME, RAW_WEIGHT_NAME)

    def fold(path, leaf):
        name = getattr(path[-1], "key", None) if path else None
        if (name in weight_names and hasattr(leaf, "ndim")
                and leaf.ndim >= 1 and leaf.dtype == jnp.float32
                and (not linear_only or leaf.ndim == 2)):
            fan_in = float(np.prod(leaf.shape[1:]))
            return (leaf / np.sqrt(fan_in)).astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(fold, variables)


def collect_wker(apply_fn, variables, *args, **kwargs):
    """Run ONE apply with ``mutable=["wker"]`` to pre-arrange every
    Pallas-routed conv weight into the kernel layout (bf16), then return
    ``variables`` with the collected "wker" collection merged in. Call
    OUTSIDE the sampling scan (the arrays become loop-invariant buffers);
    subsequent applies with the returned tree skip all in-loop weight
    rearrange/convert chains (VERDICT r4 #2). The prep pass must use the
    REAL input shapes — the per-level routing predicate depends on them."""
    _, mut = apply_fn(variables, *args, mutable=["wker"], **kwargs)
    out = dict(variables)
    out.update(mut)
    return out


class MPConv(nn.Module):
    """Weight-normalized magnitude-preserving conv / linear.

    kernel () -> linear; (kh, kw) -> 2D conv; (kz, kh, kw) -> 3D conv over
    (B, Z, H, W, C). kz == 2 wraps the stereo dim circularly
    (reference: mp_tools.py:440-445); kz in (1, 3) uses same-padding.
    """
    in_channels: int
    out_channels: int
    kernel: Tuple[int, ...] = ()
    groups: int = 1
    stride: int = 1
    disable_weight_norm: bool = False
    use_bias: bool = False
    zero_init: bool = False
    #: "zeros" (torch conv default) or "reflect" for the W axis of 3D
    #: convs — the discriminator's MPConv3D_E reflect-pads W
    #: (reference: disc_j3.py:66-76)
    w_pad_mode: str = "zeros"

    @nn.compact
    def __call__(self, x: jnp.ndarray, gain: Union[float, jnp.ndarray] = 1.0,
                 training: bool = False, grouped_in: bool = False,
                 grouped_out: bool = False, w_pack: int = 1,
                 pallas_in: bool = False, pallas_out: bool = False,
                 pallas_w: int = 0) -> jnp.ndarray:
        """``pallas_in``/``pallas_out``: accept/produce the Pallas grouped
        conv's native (G, B, H, c, W) layout instead of merged NHWC, so
        back-to-back convs pay the NHWC relayout once per chain
        (VERDICT r4 #2). ``pallas_w`` is the true W when pallas_in.
        The caller must have verified the Pallas route applies
        (ops.pallas.grouped_conv.supported)."""
        kshape = (self.out_channels, self.in_channels // self.groups) + tuple(self.kernel)
        init = nn.initializers.zeros if self.zero_init else nn.initializers.normal(1.0)
        name = RAW_WEIGHT_NAME if self.disable_weight_norm else MP_WEIGHT_NAME
        w = self.param(name, init, kshape, jnp.float32)

        # fold_inference_params() pre-divides by sqrt(fan_in) and stores
        # the leaf in bf16; the caller marks such trees EXPLICITLY with
        # `with folded_params(mode)` (never inferred from dtype — a
        # legitimately bf16-cast tree must still get the full prep,
        # ADVICE r4 medium). Inside a sampling scan folding keeps the
        # weights loop-invariant (no per-step divide/convert/copy chains —
        # the ref-scale sampler profile showed f32 weight slice+convert
        # DMA dominating the step span).
        fmode = folded_mode()
        folded = fmode == "all" or (fmode == "linear"
                                    and len(self.kernel) == 0)
        if folded and training:
            raise ValueError(
                "folded_params trees are inference-only (no in-graph "
                "weight norm); apply with training=False or use the "
                "unfolded variables")
        if not folded:
            if training and not self.disable_weight_norm:
                w = normalize_weight(w)
            fan_in = int(np.prod(kshape[1:]))
            w = w / np.sqrt(fan_in)

        scalar_gain = not (isinstance(gain, jnp.ndarray) and gain.ndim > 0)
        # learned ndim-0 gains on a FOLDED linear are applied to the
        # (small) output instead of the weight matrix
        gain_on_out = folded and scalar_gain and len(self.kernel) == 0 \
            and isinstance(gain, jnp.ndarray)
        if scalar_gain and not gain_on_out:
            if not (isinstance(gain, (int, float)) and gain == 1.0):
                w = w * jnp.asarray(gain, w.dtype)

        if len(self.kernel) == 0:
            if self.groups > 1:
                # grouped linear (the reference's grouped 1x1 emb_linear,
                # e.g. emb_linear_groups=8): group-major channel blocks
                g = self.groups
                xg = x.reshape(x.shape[:-1] + (g, self.in_channels // g))
                wg = w.astype(x.dtype).reshape(
                    g, self.out_channels // g, self.in_channels // g)
                out = jnp.einsum("...gi,goi->...go", xg, wg)
                out = out.reshape(x.shape[:-1] + (self.out_channels,))
            else:
                out = jnp.matmul(x, w.T.astype(x.dtype))
        elif w_pack > 1:
            out = self._packed_conv(x, w, w_pack)
        elif pallas_in or pallas_out:
            out = self._pallas_conv(x, w, pallas_in, pallas_out, pallas_w)
        else:
            out = self._conv(x, w, grouped_in=grouped_in,
                             grouped_out=grouped_out, training=training)

        if gain_on_out:
            out = out * gain.astype(out.dtype)
        if not scalar_gain:
            assert not (grouped_out or pallas_out), \
                "array gain requires merged NHWC output"
            if gain.ndim == 2:  # (B, C_out) -> (B, 1, ..., 1, C_out)
                g = gain.reshape((gain.shape[0],) + (1,) * (out.ndim - 2) + (gain.shape[1],))
            else:               # (B,) -> (B, 1, ..., 1)
                g = gain.reshape(gain.shape + (1,) * (out.ndim - gain.ndim))
            out = out * g.astype(out.dtype)

        if self.use_bias:
            assert not (grouped_out or pallas_out), \
                "bias requires merged NHWC output"
            group_dim = self.out_channels // self.groups
            sign = np.where(np.arange(self.out_channels) % 2 == 0, 1.0, -1.0)
            bias = self.param("bias", lambda key, s: jnp.asarray(
                sign / np.sqrt(group_dim), jnp.float32), (self.out_channels,))
            if w_pack > 1:  # packed channel order is (j, c) -> tile
                bias = jnp.tile(bias, w_pack)
            out = out + bias.astype(out.dtype)
        return out

    def _wker(self, w: jnp.ndarray, dtype) -> jnp.ndarray:
        """Pre-arranged Pallas kernel-layout weights (G, 9*cig, cog).

        When the "wker" collection holds this module's entry (collected by
        a prior apply with ``mutable=["wker"]`` OUTSIDE the sampling scan
        — see collect_wker), it is returned as-is: a loop-invariant bf16
        buffer with no per-step rearrange/convert (VERDICT r4 #2). The
        entry bakes in everything already applied to ``w`` here (fan-in
        scale, scalar gain) — both passes trace the same prep, so the
        values agree. Outside that protocol the layout prep happens
        in-graph per call (today's behavior)."""
        name = (RAW_WEIGHT_NAME if self.disable_weight_norm
                else MP_WEIGHT_NAME) + "_ker"
        if not self.is_initializing() and self.has_variable("wker", name):
            return self.get_variable("wker", name)
        from ..ops.pallas.grouped_conv import prepare_kernel_weights
        wt = prepare_kernel_weights(w, self.groups, dtype=dtype)
        # record ONLY on an explicit collect pass (mutable=["wker"]) —
        # never at init, where every collection is mutable and the entry
        # would leak into the param tree (and the optimizer state)
        if not self.is_initializing() and self.is_mutable_collection("wker"):
            self.put_variable("wker", name, wt)
        return wt

    def _pallas_conv(self, x: jnp.ndarray, w: jnp.ndarray, p_in: bool,
                     p_out: bool, w_out: int) -> jnp.ndarray:
        """Pallas grouped conv with kernel-layout I/O threading (the
        caller verified ops.pallas.grouped_conv.supported)."""
        from ..ops.pallas.grouped_conv import grouped_conv2d_3x3_pre_jit
        wt = self._wker(w, x.dtype)
        return grouped_conv2d_3x3_pre_jit(
            x, wt, self.groups, "gk" if p_in else "nhwc",
            "gk" if p_out else "nhwc", w_out if p_in else 0)

    def _grouped_packed_conv(self, x: jnp.ndarray,
                             w: jnp.ndarray) -> jnp.ndarray:
        """Grouped 2D conv as a python loop of per-group W-PACKED dense
        convs (DD_GROUPED_PACKED_CONV=1).

        The per-tap grouped-matmul path materializes kh*kw shifted copies
        of the activation per conv (round-4 ref-scale sampler profile:
        4.6 s of async slice DMA vs 1 s of conv compute in a 4.6 s call);
        XLA's native grouped lowering is 2x slower still (9.33 s vs
        4.56 s, BASELINE.md r4). Each group's cig<128 channels instead get
        W-folded to a dense 128-lane layout and run through XLA's conv
        emitter — the lowering that measured 24-38% MFU on the DDEC's
        low-channel grids. Semantics identical to
        conv_general_dilated(feature_group_count=g) (group-major channel
        blocks); per-group outputs concat back to merged NHWC."""
        g = self.groups
        cig = self.in_channels // g
        cog = self.out_channels // g
        kh, kw = self.kernel
        wdim = x.shape[-2]
        p = max(128 // max(cig, 1), 1)
        while p > 1 and (wdim % p or kw > 2 * p + 1):
            p //= 2
        import os
        if (p > 1 and os.environ.get("DD_GROUPED_PACKED_CONV") == "2"):
            return self._grouped_packed_fused(x, w, p)
        outs = []
        for gi in range(g):
            xg = x[..., gi * cig:(gi + 1) * cig]
            wg = w[gi * cog:(gi + 1) * cog]           # (cog, cig, kh, kw)
            if p == 1:  # >=128 lanes already: plain dense conv per group
                rhs = jnp.transpose(wg, (2, 3, 1, 0)).astype(x.dtype)
                dn = jax.lax.conv_dimension_numbers(
                    xg.shape, rhs.shape, ("NHWC", "HWIO", "NHWC"))
                og = jax.lax.conv_general_dilated(
                    xg, rhs, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
                    dimension_numbers=dn)
            else:
                xp = xg.reshape(xg.shape[:-2] + (wdim // p, p * cig))
                og = self._packed_conv(xp, wg, p, in_c=cig, out_c=cog)
                og = og.reshape(x.shape[:-1] + (cog,))
            outs.append(og)
        return jnp.concatenate(outs, axis=-1)

    def _grouped_packed_fused(self, x: jnp.ndarray, w: jnp.ndarray,
                              p: int) -> jnp.ndarray:
        """All groups in ONE W-packed native grouped conv
        (DD_GROUPED_PACKED_CONV=2).

        The native feature_group_count lowering measured 2x slower than
        per-tap matmuls at cig=32 per group (the emitter pads each group
        to the 128-lane tile: 4x waste). W-packing each group to exactly
        p*cig == 128 dense lanes removes that padding, so one grouped
        conv runs all groups with zero lane waste and a single activation
        relayout instead of kh*kw materialized tap shifts. Channel order:
        input (g, j, c), output (g, j, c) — inverse-transposed back to
        merged group-major NHWC."""
        g = self.groups
        cig = self.in_channels // g
        cog = self.out_channels // g
        kh, kw = self.kernel
        b, h, wdim, _ = x.shape
        cross = 3 if kw > 1 else 1
        sel = jnp.asarray(_pack_sel(kw, cross, p), x.dtype)
        xg = x.reshape(b, h, wdim // p, p, g, cig)
        xg = jnp.transpose(xg, (0, 1, 2, 4, 3, 5)).reshape(
            b, h, wdim // p, g * p * cig)
        wt = w.reshape(g, cog, cig, kh, kw)
        whwio = jnp.transpose(wt, (3, 4, 0, 2, 1)).astype(x.dtype)
        # per-group packed kernels (g, kh, cross, p*cig, p*cog), stacked
        # group-major on the O dim for feature_group_count semantics
        w_exp = jnp.einsum("yxgio,xwab->gywaibo", whwio, sel).reshape(
            g, kh, cross, p * cig, p * cog)
        rhs = jnp.transpose(w_exp, (1, 2, 3, 0, 4)).reshape(
            kh, cross, p * cig, g * p * cog)
        dn = jax.lax.conv_dimension_numbers(xg.shape, rhs.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            xg, rhs, (1, 1), [(kh // 2, kh // 2), (cross // 2, cross // 2)],
            dimension_numbers=dn, feature_group_count=g)
        out = out.reshape(b, h, wdim // p, g, p, cog)
        out = jnp.transpose(out, (0, 1, 2, 4, 3, 5)).reshape(
            b, h, wdim, g * cog)
        return out

    def _packed_conv(self, x: jnp.ndarray, w: jnp.ndarray,
                     p: int, in_c: Optional[int] = None,
                     out_c: Optional[int] = None) -> jnp.ndarray:
        """W-packed 2D conv: exactly the unpacked conv, on a W-folded
        layout that keeps the TPU's 128-lane dim dense.

        ``x`` is (B, H, W/p, p*C_in) with packed channel order (j, c) —
        i.e. a free reshape of the NHWC array (linear memory order is
        unchanged). The kernel is expanded to (kh, cross, p*C_in, p*C_out)
        where tap (dx) contributions map to within-pack and +/-1-pack
        offsets; the expansion is exact (the reference conv computes the
        identical sums) and the expanded conv runs at full MXU lane
        utilization for C_in < 128 — low-channel UNet levels (the DDEC's
        256x5504 grid at 32 ch) were measured at 4x lane padding waste and
        ~150 layout copies per forward without it.

        ``in_c``/``out_c`` override the module channel counts for the
        per-group calls from _grouped_packed_conv.
        """
        if in_c is None:
            assert self.groups == 1
        in_c = in_c if in_c is not None else self.in_channels
        out_c = out_c if out_c is not None else self.out_channels
        assert self.stride == 1 and len(self.kernel) == 2
        kh, kw = self.kernel
        whwio = jnp.transpose(w, (2, 3, 1, 0)).astype(x.dtype)  # (kh,kw,Ci,Co)
        cross = 3 if kw > 1 else 1
        assert kw <= 2 * p + 1, "kernel reach exceeds one pack"
        sel = jnp.asarray(_pack_sel(kw, cross, p), x.dtype)
        w_exp = jnp.einsum("yxio,xwab->ywaibo", whwio, sel).reshape(
            kh, cross, p * in_c, p * out_c)
        import os
        if os.environ.get("DD_PACKED_CONV_MATMUL", "0") != "0":
            # per-tap matmuls instead of conv_general_dilated — KEPT AS AN
            # OPT-IN ONLY (DD_PACKED_CONV_MATMUL=1). The round-3 profile
            # that motivated it was per-call-sync timing over the tunneled
            # runtime; the round-4 A/B with one-sync amortized timing
            # measured the XLA conv lowering at 4.38 s / 38.2% MFU for the
            # 20-step DDEC stage vs 11.44 s for the per-tap matmuls
            # (/tmp/tpum_bench*.log, BENCH_r04) — the conv lowering wins
            # decisively on the packed layout
            b, h, wp, k = x.shape
            xp = jnp.pad(x, [(0, 0), (kh // 2, kh // 2),
                             (cross // 2, cross // 2), (0, 0)])
            out = None
            for dy in range(kh):
                for dx in range(cross):
                    xs = xp[:, dy:dy + h, dx:dx + wp, :]
                    # fp32 tap accumulation: matches the fused-conv
                    # lowering's MXU accumulator (bf16 tap sums cost ~1%
                    # relative error over deep stacks)
                    part = jnp.einsum("bhwi,io->bhwo", xs, w_exp[dy, dx],
                                      preferred_element_type=jnp.float32)
                    out = part if out is None else out + part
            return out.astype(x.dtype)
        pads = [(kh // 2, kh // 2), (cross // 2, cross // 2)]
        dn = jax.lax.conv_dimension_numbers(x.shape, w_exp.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(x, w_exp, (1, 1), pads,
                                            dimension_numbers=dn)

    def _conv(self, x: jnp.ndarray, w: jnp.ndarray, grouped_in: bool = False,
              grouped_out: bool = False,
              training: bool = False) -> jnp.ndarray:
        w = w.astype(x.dtype)
        nd = len(self.kernel)
        if self.groups > 1:
            # XLA lowers feature_group_count convs DENSELY on TPU
            # (zero-padded block-diagonal weights): measured 857 GFLOP of
            # grouped conv running no faster than the 5.7 TFLOP dense
            # equivalent at mlp_groups=8. Each kernel tap becomes a
            # dot_general batched over groups instead.
            # DD_GROUPED_CONV_NATIVE=1 opts back into XLA's native grouped
            # lowering for 2D merged-layout calls (A/B probe: the round-3
            # dense-lowering measurement used per-call-sync timing).
            import os
            # training routing is a separate opt-in (the custom VJP is
            # native — dgrad reuses the kernel, wgrad is the 9-tap einsum
            # — but the training A/B decides the default independently)
            if (os.environ.get("DD_GROUPED_PALLAS_CONV", "0") == "1"
                    and (not training or os.environ.get(
                        "DD_GROUPED_PALLAS_CONV_TRAIN", "0") == "1")
                    and nd == 2 and self.stride == 1 and not grouped_in
                    and not grouped_out and self.w_pad_mode != "reflect"):
                from ..ops.pallas.grouped_conv import (
                    grouped_conv2d_3x3_jit, grouped_conv2d_3x3_pre_jit,
                    supported)
                if supported(x.shape, self.kernel, self.stride, self.groups,
                             itemsize=x.dtype.itemsize,
                             c_out=self.out_channels):
                    if training:
                        # differentiable entry (custom VJP wrt x AND w)
                        return grouped_conv2d_3x3_jit(x, w, self.groups)
                    return grouped_conv2d_3x3_pre_jit(
                        x, self._wker(w, x.dtype), self.groups,
                        "nhwc", "nhwc", 0)
            if (os.environ.get("DD_GROUPED_PACKED_CONV", "0") in ("1", "2")
                    and nd == 2 and self.stride == 1 and not grouped_in
                    and not grouped_out and self.w_pad_mode != "reflect"
                    and min(self.kernel) > 1):
                return self._grouped_packed_conv(x, w)
            if not (os.environ.get("DD_GROUPED_CONV_NATIVE", "0") == "1"
                    and not grouped_in and not grouped_out and nd == 2
                    and self.w_pad_mode != "reflect"):
                return self._grouped_conv(x, w, grouped_in=grouped_in,
                                          grouped_out=grouped_out)
        assert not (grouped_in or grouped_out), "requires groups > 1"
        import os as _os
        if (self.groups == 1 and nd == 2 and not training
                and _os.environ.get("DD_PALLAS_DENSE", "0") == "1"
                and _os.environ.get("DD_GROUPED_PALLAS_CONV", "0") == "1"
                and self.stride == 1 and self.w_pad_mode != "reflect"
                and tuple(self.kernel) == (3, 3)):
            # dense 3x3 convs through the same implicit-GEMM kernel
            # (G=1): opt-in for A/B on the DDEC's unpacked levels
            from ..ops.pallas.grouped_conv import (grouped_conv2d_3x3_pre_jit,
                                                   supported)
            if supported(x.shape, self.kernel, self.stride, 1,
                         itemsize=x.dtype.itemsize,
                         c_out=self.out_channels):
                return grouped_conv2d_3x3_pre_jit(
                    x, self._wker(w, x.dtype), 1, "nhwc", "nhwc", 0)
        if (self.stride == 1 and all(k == 1 for k in self.kernel)
                and self.groups == 1 and self.w_pad_mode != "reflect"):
            # 1x1[x1] conv == matmul over the channel dim (skip projections,
            # latent in/out convs): keeps XLA out of the conv lowering's
            # layout copies entirely
            wk = w.reshape(w.shape[0], w.shape[1])  # (Co, Ci)
            return jnp.einsum("...i,oi->...o", x, wk)
        if nd == 2:
            kh, kw = self.kernel
            # torch pads (k//2, k//2) on both sides
            pads = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
            rhs = jnp.transpose(w, (2, 3, 1, 0))  # HWIO
            dn = jax.lax.conv_dimension_numbers(x.shape, rhs.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                x, rhs, window_strides=(self.stride, self.stride),
                padding=pads, dimension_numbers=dn,
                feature_group_count=self.groups)
        if nd == 3:
            kz, kh, kw = self.kernel
            if kz == 2:  # circular stereo wrap: append z=0 plane
                x = jnp.concatenate([x, x[:, 0:1]], axis=1)
                pad_z = (0, 0)
            elif kz == 3:
                pad_z = (1, 1)
            else:
                pad_z = (0, 0)
            pad_w = (kw // 2, kw // 2)
            if self.w_pad_mode == "reflect" and kw > 1:
                x = jnp.pad(x, [(0, 0)] * 3 + [pad_w, (0, 0)],
                            mode="reflect")
                pad_w = (0, 0)
            pads = [pad_z, (kh // 2, kh // 2), pad_w]
            rhs = jnp.transpose(w, (2, 3, 4, 1, 0))  # DHWIO
            dn = jax.lax.conv_dimension_numbers(x.shape, rhs.shape,
                                                ("NDHWC", "DHWIO", "NDHWC"))
            return jax.lax.conv_general_dilated(
                x, rhs, window_strides=(1, self.stride, self.stride),
                padding=pads, dimension_numbers=dn,
                feature_group_count=self.groups)
        raise ValueError(f"unsupported kernel rank {nd}")

    def _grouped_conv(self, x: jnp.ndarray, w: jnp.ndarray,
                      grouped_in: bool = False,
                      grouped_out: bool = False) -> jnp.ndarray:
        """Grouped conv as per-tap group-batched matmuls (MXU-native).

        2D x: (B, H, W, C); 3D x: (B, Z, H, W, C). Weights
        (C_out, C_in/g, *kernel) with group-major channel order — identical
        semantics to conv_general_dilated(feature_group_count=g).

        ``grouped_in``/``grouped_out`` accept/produce the dot_general
        batch-major layout (G, B, Z, H, W, C/g) instead of channel-merged
        NHWC. XLA relayouts activations into exactly this form around
        every group-batched dot (measured 24% of the ref-scale forward as
        pure "data formatting"), so back-to-back grouped convs should
        pass it through and pay the reformat once per chain.
        """
        g = self.groups
        nd = len(self.kernel)
        if nd == 2:
            kz, (kh, kw) = 1, self.kernel
        else:
            kz, kh, kw = self.kernel

        if grouped_in:
            x6 = x                               # (G, B, Z, H, W, cig)
            if nd == 2 and x6.ndim == 5:
                x6 = x6[:, :, None]
        else:
            x5 = x[:, None] if nd == 2 else x    # (B, Z, H, W, C)
            if kz == 2:                          # circular stereo wrap
                x5 = jnp.concatenate([x5, x5[:, 0:1]], axis=1)
            x6 = x5.reshape(x5.shape[:-1] + (g, x5.shape[-1] // g))
            x6 = jnp.moveaxis(x6, -2, 0)         # (G, B, Z, H, W, cig)
        if grouped_in and kz == 2:
            x6 = jnp.concatenate([x6, x6[:, :, 0:1]], axis=2)

        _, b, z_in, h, w_in, cig = x6.shape
        cog = w.shape[0] // g
        # kz==1: passthrough; kz==2: valid conv on the wrapped axis;
        # kz==3: same-padded below
        z_out = z_in - 1 if kz == 2 else z_in
        s = self.stride
        h_out = (h - 1) // s + 1
        w_out = (w_in - 1) // s + 1

        pad_w = (kw // 2, kw // 2)
        if self.w_pad_mode == "reflect" and nd == 3 and kw > 1:
            x6 = jnp.pad(x6, [(0, 0)] * 4 + [pad_w, (0, 0)], mode="reflect")
            pad_w = (0, 0)
        pads = [(0, 0), (0, 0), (1, 1) if kz == 3 else (0, 0),
                (kh // 2, kh // 2), pad_w, (0, 0)]
        xg = jnp.pad(x6, pads)
        # (g*cog, cig, [kz,]kh,kw) -> taps of (g, cig, cog)
        wt = w.reshape((g, cog, cig) + ((kz,) if nd == 3 else (1,)) + (kh, kw))
        wt = jnp.transpose(wt, (3, 4, 5, 0, 2, 1))  # (kz,kh,kw,g,cig,cog)

        h_span = (h_out - 1) * s + 1
        w_span = (w_out - 1) * s + 1
        out = None
        for dz in range(kz):
            for dy in range(kh):
                for dx in range(kw):
                    xs = xg[:, :, dz:dz + z_out,
                            dy:dy + h_span:s, dx:dx + w_span:s]
                    part = jnp.einsum("gbzhwi,gio->gbzhwo", xs,
                                      wt[dz, dy, dx],
                                      preferred_element_type=x.dtype)
                    out = part if out is None else out + part
        if grouped_out:
            return out[:, :, 0] if nd == 2 else out
        out = jnp.moveaxis(out, 0, -2)           # (B, Z, H, W, G, cog)
        out = out.reshape(b, z_out, h_out, w_out, g * cog)
        return out[:, 0] if nd == 2 else out


class MPFourier(nn.Module):
    """MP Fourier features with erfinv-spaced freqs + alternating pi/2
    phases (reference: mp_tools.py:316-330; EDM2 eq. 75)."""
    num_channels: int
    bandwidth: float = 1.0
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from scipy.special import erfinv
        freqs = np.pi * erfinv(np.linspace(0, 1 - self.eps, self.num_channels)) * self.bandwidth
        phases = np.pi / 2 * (np.arange(self.num_channels) % 2 == 0)
        xf = x.astype(jnp.float32)
        fa = jnp.asarray(freqs, jnp.float32)
        pa = jnp.asarray(phases, jnp.float32)
        if x.ndim == 1:  # (B,) -> (B, C)
            y = xf[:, None] * fa[None, :] + pa
        else:  # channel-last map (B, ..., 1) -> (B, ..., C)
            assert x.shape[-1] == 1, "map input must have a single channel"
            y = xf * fa + pa
        return (jnp.cos(y) * np.sqrt(2.0)).astype(x.dtype)


class AdaptiveGroupBalance(nn.Module):
    """Learned per-group mp_sum balance conditioned on emb, sigmoid-clipped
    (reference: mp_tools.py:380-411)."""
    emb_channels: int
    groups: int = 1
    balance_logits_offset: float = 0.0
    min_balance: float = 0.1
    max_balance: float = 0.9

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, emb: Optional[jnp.ndarray],
                 training: bool = False) -> jnp.ndarray:
        if self.emb_channels > 0:
            balance = MPConv(self.emb_channels, self.groups, kernel=(),
                             disable_weight_norm=True, zero_init=True,
                             name="emb_balance")(emb, training=training)
        else:
            balance = self.param("balance", nn.initializers.zeros, (self.groups,))
            balance = jnp.broadcast_to(balance, (x.shape[0], self.groups))
        balance = jax.nn.sigmoid(balance + self.balance_logits_offset)
        balance = jnp.clip(balance, self.min_balance, self.max_balance)
        return mp_sum_groups(x, y, balance, self.groups)


# ---------------------------------------------------------------------------
# filtered (anti-aliased) resamplers — StyleGAN3-style
# ---------------------------------------------------------------------------

def _kaiser_sinc_1d(size: int, cutoff: float, beta: float) -> np.ndarray:
    from ..ops.windows import kaiser
    x = (np.arange(size) - (size - 1) / 2) * np.pi * cutoff
    sinc = np.where(x == 0, 1.0, np.sin(x) / np.where(x == 0, 1.0, x))
    k = sinc * kaiser(size, beta=beta, periodic=False)
    return (k / k.sum()).astype(np.float64)


def _sep_conv_axis(x: jnp.ndarray, kernel: np.ndarray, axis: int, stride: int,
                   pad_mode: str = "reflect") -> jnp.ndarray:
    """Depthwise 1D filter along ``axis`` of a channel-last tensor, with
    reference-matching asymmetric reflect padding (resample.py:49-53)."""
    ks = kernel.shape[0]
    even = ks % 2 == 0
    hk = ks // 2
    if stride == 1:
        pad = (hk, hk - even)
    else:
        pad = (hk - even, hk)
    padw = [(0, 0)] * x.ndim
    padw[axis] = pad
    x = jnp.pad(x, padw, mode=pad_mode)
    # move axis next to last, conv as NWC depthwise
    x_m = jnp.moveaxis(x, axis, -2)
    lead = x_m.shape[:-2]
    t, c = x_m.shape[-2], x_m.shape[-1]
    x2 = x_m.reshape((-1, t, c))
    rhs = jnp.asarray(kernel, x.dtype)[:, None, None] * jnp.ones((1, 1, c), x.dtype)
    dn = jax.lax.conv_dimension_numbers(x2.shape, rhs.shape, ("NWC", "WIO", "NWC"))
    y = jax.lax.conv_general_dilated(x2, rhs, window_strides=(stride,),
                                     padding="VALID", dimension_numbers=dn,
                                     feature_group_count=c)
    return jnp.moveaxis(y.reshape(lead + y.shape[1:]), -2, axis)


def filtered_downsample_1d(x: jnp.ndarray, k_size: int = 7, beta: float = 1.5,
                           factor: int = 2) -> jnp.ndarray:
    k = _kaiser_sinc_1d(k_size, 1.0 / factor, beta)
    return _sep_conv_axis(x, k, axis=-2, stride=factor)


def filtered_upsample_1d(x: jnp.ndarray, k_size: int = 15, beta: float = 1.5,
                         factor: int = 2) -> jnp.ndarray:
    k = _kaiser_sinc_1d(k_size, 1.0 / factor, beta) * factor
    t = x.shape[-2]
    z = jnp.zeros(x.shape[:-2] + (t * factor, x.shape[-1]), x.dtype)
    z = z.at[..., ::factor, :].set(x)
    return _sep_conv_axis(z, k, axis=-2, stride=1)


def filtered_downsample_2d(x: jnp.ndarray, k_size: int = 7, beta: float = 1.5,
                           factor: int = 2) -> jnp.ndarray:
    """(..., H, W, C) separable anti-aliased downsample."""
    k = _kaiser_sinc_1d(k_size, 1.0 / factor, beta)
    x = _sep_conv_axis(x, k, axis=-2, stride=factor)   # W
    x = _sep_conv_axis(x, k, axis=-3, stride=factor)   # H
    return x


def filtered_upsample_2d(x: jnp.ndarray, k_size: int = 15, beta: float = 1.5,
                         factor: int = 2) -> jnp.ndarray:
    k = _kaiser_sinc_1d(k_size, 1.0 / factor, beta) * factor
    h, w = x.shape[-3], x.shape[-2]
    z = jnp.zeros(x.shape[:-3] + (h * factor, w * factor, x.shape[-1]), x.dtype)
    z = z.at[..., ::factor, ::factor, :].set(x)
    z = _sep_conv_axis(z, k, axis=-2, stride=1)
    z = _sep_conv_axis(z, k, axis=-3, stride=1)
    return z


def filtered_mp_silu_2d(x: jnp.ndarray, k_size: int = 7, beta: float = 1.5) -> jnp.ndarray:
    """Alias-suppressed MP-SiLU: upsample 2x -> silu -> downsample 2x
    (reference: resample.py:155-165)."""
    up = filtered_upsample_2d(x, k_size=k_size * 2 + k_size % 2, beta=beta, factor=2)
    return filtered_downsample_2d(mp_silu(up), k_size=k_size, beta=beta, factor=2)


class FilteredDownsample2D(nn.Module):
    """sin^2-separable FIR anti-aliased strided downsample used by the
    supersampled-latent DAE encoders (reference: mp_tools.py:455-495).

    Accepts (..., H, W, C) with any leading dims — the stereo-folded 3D
    shape (B, Z, H, W, C) covers the reference's ``use_3d_shape`` variant
    (mp_tools.py:482-492), which filters H/W per z-plane."""
    kernel: int = 16
    stride: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = np.sin(np.arange(self.kernel) / self.kernel * np.pi)
        k2 = k[:, None] * k[None, :]
        k2 = (k2 / k2.sum()).astype(np.float64)
        p1 = self.kernel // 2
        p2 = self.kernel // 2 - (self.kernel + 1) % 2
        padw = [(0, 0)] * (x.ndim - 3) + [(p1, p2), (p1, p2), (0, 0)]
        xp = jnp.pad(x, padw, mode="reflect")
        lead = xp.shape[:-3]
        xp = xp.reshape((-1,) + xp.shape[-3:])
        c = x.shape[-1]
        rhs = jnp.asarray(k2, x.dtype)[:, :, None, None] * jnp.ones((1, 1, 1, c), x.dtype)
        dn = jax.lax.conv_dimension_numbers(xp.shape, rhs.shape, ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            xp, rhs, window_strides=(self.stride, self.stride), padding="VALID",
            dimension_numbers=dn, feature_group_count=c)
        return out.reshape(lead + out.shape[1:])


def filtered_downsample_3d(x: jnp.ndarray, k_size: int = 7, beta: float = 1.5,
                           factor: int = 2) -> jnp.ndarray:
    """Stereo-folded 3D anti-aliased downsample: filters H and W per
    z-plane, z untouched; per-axis kernel gain sqrt(factor) (total gain =
    factor — the 3D variants are energy-preserving, unlike the 2D ones:
    reference resample.py:196-199 vs :131-134). x: (..., Z, H, W, C)."""
    k = _kaiser_sinc_1d(k_size, 1.0 / factor, beta) * np.sqrt(factor)
    x = _sep_conv_axis(x, k, axis=-2, stride=factor)   # W
    x = _sep_conv_axis(x, k, axis=-3, stride=factor)   # H
    return x


def filtered_upsample_3d(x: jnp.ndarray, k_size: int = 15, beta: float = 1.5,
                         factor: int = 2) -> jnp.ndarray:
    """Zero-stuff H/W then kaiser-sinc interpolate, per-axis gain
    sqrt(factor) (reference: resample.py:201-215). x: (..., Z, H, W, C)."""
    k = _kaiser_sinc_1d(k_size, 1.0 / factor, beta) * np.sqrt(factor)
    h, w = x.shape[-3], x.shape[-2]
    z = jnp.zeros(x.shape[:-3] + (h * factor, w * factor, x.shape[-1]), x.dtype)
    z = z.at[..., ::factor, ::factor, :].set(x)
    z = _sep_conv_axis(z, k, axis=-2, stride=1)
    z = _sep_conv_axis(z, k, axis=-3, stride=1)
    return z


def filtered_mp_silu_3d(x: jnp.ndarray, k_size: int = 7,
                        beta: float = 1.5) -> jnp.ndarray:
    """Alias-suppressed MP-SiLU for stereo-folded 3D tensors: upsample 2x
    -> silu -> downsample 2x (reference: resample.py:216-225)."""
    up = filtered_upsample_3d(x, k_size=k_size * 2 + k_size % 2, beta=beta,
                              factor=2)
    return filtered_downsample_3d(mp_silu(up), k_size=k_size, beta=beta,
                                  factor=2)


def filtered_downsample_1d3(x: jnp.ndarray, k_size: int = 7,
                            beta: float = 1.5, factor: int = 2) -> jnp.ndarray:
    """W-axis-only filtered downsample of a stereo-folded 3D tensor
    (reference: resample.py:262-265). Channel-last: identical math to the
    1D variant applied at axis=-2."""
    k = _kaiser_sinc_1d(k_size, 1.0 / factor, beta)
    return _sep_conv_axis(x, k, axis=-2, stride=factor)


def filtered_upsample_1d3(x: jnp.ndarray, k_size: int = 15,
                          beta: float = 1.5, factor: int = 2) -> jnp.ndarray:
    """W-axis-only filtered upsample (gain = factor; reference:
    resample.py:267-280)."""
    k = _kaiser_sinc_1d(k_size, 1.0 / factor, beta) * factor
    w = x.shape[-2]
    z = jnp.zeros(x.shape[:-2] + (w * factor, x.shape[-1]), x.dtype)
    z = z.at[..., ::factor, :].set(x)
    return _sep_conv_axis(z, k, axis=-2, stride=1)
