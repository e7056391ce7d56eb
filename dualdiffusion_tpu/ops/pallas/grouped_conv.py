"""Implicit-GEMM 3x3 grouped conv Pallas kernel (stride 1, same-pad).

Motivation (round-4 ref-scale sampler profile, BASELINE.md): every XLA
lowering of the EDM2 MLP grouped convs plateaus at ~29 ms per CFG forward —
the per-tap dot path materializes kh*kw shifted activation copies in HBM
and runs K=cig(<=160) dots; the native feature_group_count emitter pads
each group to the 128-lane tile; per-group W-packed dense convs trade the
tap shifts for pack/unpack relayouts. This kernel builds the kh*kw tap
patches IN VMEM (sublane-stacked into one K = 9*cig contraction) so the
activation is read from HBM ~once and the MXU sees one dense
(cog x K) @ (K x W) matmul per output row.

Data layout (chosen so the 128-lane dim is the wide W axis and the group
slice is a major-dim index, not a lane slice):

  x  (B, H, W, G*cig) NHWC  ->  xt (G, B, H+2, cig, W+2)   [pre, XLA ops]
  w  (G*cog, cig, 3, 3)     ->  wt (G, 9*cig, cog)  K order (dy, dx, cig)
  kernel out (G, B, H, cog, W)  ->  NHWC (B, H, W, G*cog)  [post]

Grid: (G, B, H/TH). Each program DMAs a (TH+2, cig, W+2) slab HBM->VMEM,
then per output row h stacks the 9 lane-shifted tap slices into a
(9*cig, W) patch scratch and runs one MXU dot with the group's kernel
matrix. groups == 1 (dense low-channel convs, e.g. the DDEC grid) is the
same kernel with G = 1.

Training support: `grouped_conv2d_3x3` wraps the kernel in a custom_vjp
with a NATIVE backward — dgrad reuses this same kernel with io-swapped
180-degree-rotated weights (the transpose of a stride-1 same-pad conv is
itself such a conv) and wgrad is the exact 9-tap einsum reduction; both
fp32-accumulated like lax.conv_general_dilated's VJP.

Reference semantics: torch grouped Conv2d as used by the EDM2 MLP blocks
(reference: src/modules/mp_tools.py:332-378 MPConv with groups, e.g.
unet_edm2_*.py mlp_groups=8).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(h: int) -> int:
    for th in (8, 4, 2):
        if h % th == 0:
            return th
    return 1


def _kernel(xt_hbm, wt_ref, out_ref, slab_ref, patch_ref, sem,
            *, th: int, cig: int, w_out: int):
    g = pl.program_id(0)
    b = pl.program_id(1)
    ht = pl.program_id(2)

    # xt_hbm is (G*B, H+2, cig, W+2): one leading index + one dynamic
    # slice (multi-index .at chains on HBM refs trip the Mosaic lowering)
    dma = pltpu.make_async_copy(
        xt_hbm.at[g * pl.num_programs(1) + b].at[pl.ds(ht * th, th + 2)],
        slab_ref, sem)
    dma.start()
    dma.wait()

    w2 = wt_ref[0]                                   # (9*cig, cog)
    for h in range(th):
        for dy in range(3):
            for dx in range(3):
                k0 = (dy * 3 + dx) * cig
                patch_ref[pl.ds(k0, cig), :] = \
                    slab_ref[h + dy, :, pl.ds(dx, w_out)]
        acc = jax.lax.dot_general(
            w2, patch_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (cog, W)
        out_ref[0, 0, h] = acc.astype(out_ref.dtype)


def _pallas_grouped_conv(xt: jnp.ndarray, wt: jnp.ndarray, th: int,
                         w_out: int, out_dtype) -> jnp.ndarray:
    """xt (G, B, H+2, cig, Wlanes), wt (G, 9*cig, cog) -> (G, B, H, cog, W).

    ``Wlanes`` is the 128-aligned padded W (1 halo column each side +
    tail zeros); ``w_out`` is the true output width."""
    gg, b, hp2, cig, wp2 = xt.shape
    h = hp2 - 2
    cog = wt.shape[-1]
    kern = functools.partial(_kernel, th=th, cig=cig, w_out=w_out)
    interpret = jax.default_backend() != "tpu"
    xt_flat = xt.reshape(gg * b, hp2, cig, wp2)
    return pl.pallas_call(
        kern,
        grid=(gg, b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # xt stays in HBM
            pl.BlockSpec((1, 9 * cig, cog), lambda g, b_, t: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, th, cog, w_out),
                               lambda g, b_, t: (g, b_, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((gg, b, h, cog, w_out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, cig, wp2), xt.dtype),   # slab
            pltpu.VMEM((9 * cig, w_out), xt.dtype),     # K-stacked patches
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * gg * b * h * w_out * 9 * cig * cog,
            bytes_accessed=(xt.size + gg * b * h * cog * w_out)
            * xt.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xt_flat, wt)


def _kernel_v2(xt_ref, wt_ref, out_ref, *, cig: int, cog: int, w_out: int):
    """Copy-free row kernel: one MXU dot + two shifted adds per output row.

    v1 builds a (9*cig, W) patch per row with 9 VMEM copies (6 of them at
    unaligned lane offsets dx=1,2) — the r5 per-op profile shows the
    sampler's Pallas conv running ~10x over its FLOP roofline, i.e. the
    kernel is VPU-copy/overhead bound, not MXU bound. v2 removes the
    patch entirely: three slab rows h..h+2 viewed as ONE (3*cig, Wl)
    operand (sublane-contiguous, no data movement) feed a single
    (3*cig, 3*cog) x (3*cig, Wl) dot — the 3 dx taps live in the
    WEIGHTS' N dim — and the dx alignment is paid once per row as two
    lane-shifted f32 adds on the (cog, W) partials. The whole (H+2)
    slab arrives as an auto-pipelined BlockSpec block (Pallas
    double-buffers the next (g, b) program's slab during compute), so
    there is no manual DMA and no semaphore."""
    h_tot = out_ref.shape[2]
    wv = wt_ref[0]                                   # (3*cig, 3*cog)
    for h in range(h_tot):
        a = xt_ref[0, h:h + 3].reshape(3 * cig, -1)  # (3*cig, Wl)
        p = jax.lax.dot_general(
            wv, a, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (3*cog, Wl)
        acc = (p[0:cog, 0:w_out] + p[cog:2 * cog, 1:w_out + 1]
               + p[2 * cog:3 * cog, 2:w_out + 2])
        out_ref[0, 0, h] = acc.astype(out_ref.dtype)


def _pallas_grouped_conv_v2(xt: jnp.ndarray, wv: jnp.ndarray,
                            w_out: int, out_dtype) -> jnp.ndarray:
    """xt (G, B, H+2, cig, Wlanes), wv (G, 3*cig, 3*cog) ->
    (G, B, H, cog, W). Whole-slab-per-program variant of
    :func:`_pallas_grouped_conv` (see `_kernel_v2`); requires the
    (H+2, cig, Wlanes) slab + out block to fit VMEM (`v2_supported`)."""
    gg, b, hp2, cig, wp2 = xt.shape
    h = hp2 - 2
    cog = wv.shape[-1] // 3
    kern = functools.partial(_kernel_v2, cig=cig, cog=cog, w_out=w_out)
    interpret = jax.default_backend() != "tpu"
    xt_flat = xt.reshape(gg * b, hp2, cig, wp2)
    return pl.pallas_call(
        kern,
        grid=(gg, b),
        in_specs=[
            pl.BlockSpec((1, hp2, cig, wp2),
                         lambda g, b_, nb=b: (g * nb + b_, 0, 0, 0)),
            pl.BlockSpec((1, 3 * cig, 3 * cog), lambda g, b_: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, h, cog, w_out),
                               lambda g, b_: (g, b_, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((gg, b, h, cog, w_out), out_dtype),
        cost_estimate=pl.CostEstimate(
            # useful flops (true conv work, W unpadded) — the MXU also
            # grinds the Wl-W pad lanes (~1.2x at L0), but MFU accounting
            # counts algorithmic work, matching the v1 kernel's estimate
            flops=2 * gg * b * h * w_out * 9 * cig * cog,
            bytes_accessed=(xt.size + gg * b * h * cog * w_out)
            * xt.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xt_flat, wv)


def _lax_reference(x: jnp.ndarray, w: jnp.ndarray,
                   groups: int) -> jnp.ndarray:
    rhs = jnp.transpose(w, (2, 3, 1, 0)).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, rhs.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, rhs, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        feature_group_count=groups)


def prepare_kernel_weights(w: jnp.ndarray, groups: int,
                           dtype=None,
                           fan_in_scale: bool = False) -> jnp.ndarray:
    """(G*cog, cig, 3, 3) -> the kernel's weight layout (G, 9*cig, cog),
    K order (dy, dx, cig). ``fan_in_scale`` folds MPConv's 1/sqrt(fan_in)
    in. Precompute OUTSIDE a sampling scan (and store bf16) to make the
    weights loop-invariant: XLA does not hoist the transpose out of the
    while body, and on bf16 input it lowers to a per-step sync retile
    copy (+1.9 s/100 steps at ref scale, BASELINE r4)."""
    co, cig = w.shape[0], w.shape[1]
    cog = co // groups
    wt = w.reshape(groups, cog, cig, 3, 3)
    wt = jnp.transpose(wt, (0, 3, 4, 2, 1)).reshape(groups, 9 * cig, cog)
    if fan_in_scale:
        wt = wt / np.sqrt(cig * 9)
    return wt.astype(dtype) if dtype is not None else wt


def _to_kernel_layout(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """NHWC (B, H, W, G*cig) -> padded kernel layout
    (G, B, H+2, cig, Wlanes): the halo pad + the activation relayout the
    kernel consumes. Thread this layout through back-to-back convs
    (layout="gk") to pay the transpose once per chain."""
    b, h, wdim, c = x.shape
    cig = c // groups
    xt = x.reshape(b, h, wdim, groups, cig)
    xt = jnp.transpose(xt, (3, 0, 1, 4, 2))          # (G, B, H, cig, W)
    # W padding: 1 halo column each side, then up to a 128-lane multiple —
    # Mosaic requires DMA slice shapes 128-aligned on the lane dim
    w_lanes = -(-(wdim + 2) // 128) * 128
    return jnp.pad(xt, [(0, 0), (0, 0), (1, 1), (0, 0),
                        (1, w_lanes - wdim - 1)])


def _pad_kernel_layout(y: jnp.ndarray, wdim: int) -> jnp.ndarray:
    """Re-apply the halo pad to an UNPADDED kernel-layout activation
    (G, B, H, c, W) — the output of a previous conv in the chain."""
    w_lanes = -(-(wdim + 2) // 128) * 128
    return jnp.pad(y, [(0, 0), (0, 0), (1, 1), (0, 0),
                       (1, w_lanes - wdim - 1)])


def _wt_v1_to_v2(wt: jnp.ndarray) -> jnp.ndarray:
    """(G, 9*cig, cog) K-order (dy, dx, cig) -> the v2 layout
    (G, 3*cig, 3*cog): K = (dy, cig), N = (dx, cog). Loop-invariant and
    tiny (<=300 KB), so XLA hoists it out of sampling scans."""
    gg, k9, cog = wt.shape
    cig = k9 // 9
    wv = wt.reshape(gg, 3, 3, cig, cog)            # (g, dy, dx, ci, o)
    wv = jnp.transpose(wv, (0, 1, 3, 2, 4))        # (g, dy, ci, dx, o)
    return wv.reshape(gg, 3 * cig, 3 * cog)


def _v2_fits(hp2: int, cig: int, wp2: int, cog: int, w_out: int,
             itemsize: int, budget: int = 13 * 1024 * 1024) -> bool:
    """v2 holds the whole (H+2, cig, Wlanes) slab and (H, cog, W) out
    block in VMEM, both double-buffered by the Pallas pipeline, plus the
    per-row f32 dot result."""
    h = hp2 - 2
    vmem = (2 * hp2 * cig * wp2 * itemsize        # slab blocks
            + 2 * h * cog * w_out * itemsize      # out blocks
            + 9 * cig * cog * itemsize            # weights
            + 3 * cog * wp2 * 4                   # per-row dot result (f32)
            + cog * w_out * 4)                    # shifted-add acc (f32)
    return vmem <= budget


def _fwd_core(xt: jnp.ndarray, wt: jnp.ndarray, wdim: int,
              out_dtype) -> jnp.ndarray:
    """Padded kernel-layout input (G, B, H+2, cig, Wlanes) x prepared
    weights (G, 9*cig, cog) -> (G, B, H, cog, W).

    Routes to the copy-free v2 row kernel when the whole slab fits VMEM
    (`DD_PALLAS_CONV_V2=0` forces the v1 patch kernel)."""
    import os
    gg, b, hp2, cig, wp2 = xt.shape
    h = hp2 - 2
    cog = wt.shape[-1]
    if (os.environ.get("DD_PALLAS_CONV_V2", "1") != "0"
            and _v2_fits(hp2, cig, wp2, cog, wdim, xt.dtype.itemsize)):
        return _pallas_grouped_conv_v2(xt, _wt_v1_to_v2(wt).astype(xt.dtype),
                                       wdim, out_dtype)
    return _pallas_grouped_conv(xt, wt.astype(xt.dtype), _pick_th(h),
                                wdim, out_dtype)


def _from_kernel_layout(out: jnp.ndarray) -> jnp.ndarray:
    """(G, B, H, cog, W) -> NHWC (B, H, W, G*cog)."""
    gg, b, h, cog, wdim = out.shape
    return jnp.transpose(out, (1, 2, 4, 0, 3)).reshape(b, h, wdim, gg * cog)


def _fwd_impl(x: jnp.ndarray, w: jnp.ndarray, groups: int) -> jnp.ndarray:
    b, h, wdim, c = x.shape
    xt = _to_kernel_layout(x, groups)
    # NOTE: pre-folded bf16 weights (fold_inference_params) make this
    # transpose lower to an unfused sync retile copy per scan step
    # (+1.9 s/100 steps at ref scale); an f32 sandwich around it does NOT
    # restore the fusion (measured 5.22 s vs 5.24 s, BASELINE r4) — keep
    # f32 weights here, or precompute with prepare_kernel_weights OUTSIDE
    # the scan (MPConv's "wker" collection) and call the *_pre entry
    wt = prepare_kernel_weights(w, groups, dtype=x.dtype)
    out = _fwd_core(xt, wt, wdim, x.dtype)
    return _from_kernel_layout(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def grouped_conv2d_3x3(x: jnp.ndarray, w: jnp.ndarray,
                       groups: int = 1) -> jnp.ndarray:
    """3x3 stride-1 same-pad (grouped) conv, NHWC x (C_out, C_in/g, 3, 3).

    Forward runs the Pallas implicit-GEMM kernel; the backward is native
    (dgrad via the same kernel on rotated weights, einsum wgrad).
    """
    return _fwd_impl(x, w, groups)


def _vjp_fwd(x, w, groups):
    return _fwd_impl(x, w, groups), (x, w)


def _dgrad_weights(w: jnp.ndarray, groups: int) -> jnp.ndarray:
    """(G*cog, cig, 3, 3) -> (G*cig, cog, 3, 3): io-swapped, 180-degree
    rotated per group — the input-gradient of a stride-1 same-pad conv is
    a conv of the output gradient with these weights."""
    co, cig = w.shape[0], w.shape[1]
    cog = co // groups
    wg = w.reshape(groups, cog, cig, 3, 3)
    wg = jnp.flip(jnp.transpose(wg, (0, 2, 1, 3, 4)), axis=(-2, -1))
    return wg.reshape(groups * cig, cog, 3, 3)


def _wgrad(x: jnp.ndarray, gy: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Exact weight gradient: grad_w[g*cog+o, i, dy, dx] =
    sum_{b,h,w} gy[b,h,w,g*cog+o] * x_pad[b,h+dy-1,w+dx-1,g*cig+i]."""
    b, h, wdim, c = x.shape
    cig, cog = c // groups, gy.shape[-1] // groups
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    xg = xp.reshape(b, h + 2, wdim + 2, groups, cig)
    gyg = gy.reshape(b, h, wdim, groups, cog)
    taps = []
    for dy in range(3):
        for dx in range(3):
            xs = xg[:, dy:dy + h, dx:dx + wdim]
            taps.append(jnp.einsum("bhwgo,bhwgi->goi", gyg, xs,
                                   preferred_element_type=jnp.float32))
    gw = jnp.stack(taps, axis=-1).reshape(groups, cog, cig, 3, 3)
    return gw.reshape(groups * cog, cig, 3, 3).astype(x.dtype)


def _vjp_bwd(groups, res, g):
    """Native backward: dgrad reuses the Pallas forward kernel with
    io-swapped rotated weights; wgrad is the exact 9-tap einsum reduction
    (matches lax.conv_general_dilated's VJP without re-linearizing a
    reference forward)."""
    x, w = res
    gx = _fwd_impl(g.astype(x.dtype), _dgrad_weights(w, groups), groups)
    return gx, _wgrad(x, g.astype(x.dtype), groups)


grouped_conv2d_3x3.defvjp(_vjp_fwd, _vjp_bwd)

# jit wrapper for call sites: inside an outer trace a pjit callee's jaxpr
# is cached by (fun, avals), so the N same-shape conv instances of a UNet
# share ONE traced+lowered kernel instead of paying the Mosaic lowering
# per call site (measured: the ref-scale sampler prepare grew ~+100 s of
# GIL-bound lowering with per-site tracing)
grouped_conv2d_3x3_jit = jax.jit(grouped_conv2d_3x3, static_argnums=2)


def grouped_conv2d_3x3_pre(x: jnp.ndarray, wt: jnp.ndarray, groups: int,
                           layout_in: str = "nhwc",
                           layout_out: str = "nhwc",
                           w_out: int = 0) -> jnp.ndarray:
    """Inference entry with PRE-ARRANGED weights and layout threading.

    ``wt`` is the output of :func:`prepare_kernel_weights` (G, 9*cig, cog)
    — computed OUTSIDE the sampling scan (MPConv's "wker" collection) so
    no per-step weight rearrange/convert runs inside the loop.

    ``layout_in``/``layout_out``: "nhwc" (merged channels-last) or "gk"
    (the kernel's native (G, B, H, c, W), UNPADDED) — back-to-back convs
    thread "gk" to pay the NHWC relayout once per chain (the r4 profile
    attributed ~0.7 s of the 3.82 s ref-scale sampler to these transpose
    copies). ``w_out`` is the true W (required for layout_in="gk").
    """
    if layout_in == "nhwc":
        w_out = x.shape[-2]
        xt = _to_kernel_layout(x, groups)
    else:
        assert w_out > 0, "w_out required for layout_in='gk'"
        xt = _pad_kernel_layout(x, w_out)
    out = _fwd_core(xt, wt, w_out, x.dtype)
    return out if layout_out == "gk" else _from_kernel_layout(out)


grouped_conv2d_3x3_pre_jit = jax.jit(grouped_conv2d_3x3_pre,
                                     static_argnums=(2, 3, 4, 5))


def supported(x_shape: Tuple[int, ...], kernel: Tuple[int, ...],
              stride: int, groups: int, min_w: int = 64,
              itemsize: int = 4, c_out: int = 0,
              vmem_budget: int = 12 * 1024 * 1024) -> bool:
    """Routing predicate for MPConv: 4D NHWC, 3x3, stride 1, wide W —
    and the kernel's VMEM working set (slab + patch scratch + weights +
    out block) must fit. The grouped UNet MLP shapes always fit; the
    dense route (DD_PALLAS_DENSE) can see 5504-wide grids that don't."""
    if len(x_shape) != 4 or tuple(kernel) != (3, 3) or stride != 1:
        return False
    b, h, wdim, c = x_shape
    if wdim < min_w or h < 2:
        return False
    if c % groups:
        return False
    cig = c // groups
    cog = (c_out // groups) if c_out else cig
    th = _pick_th(h)
    w_lanes = -(-(wdim + 2) // 128) * 128
    vmem = ((th + 2) * cig * w_lanes          # slab
            + 9 * cig * wdim                  # patch scratch
            + 9 * cig * cog                   # weights
            + th * cog * wdim) * itemsize     # out block
    return vmem <= vmem_budget
