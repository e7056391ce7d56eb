"""Pallas kernel tests (interpret mode — runs on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dualdiffusion_tpu.ops.pallas.mss2d import mss2d_block_loss, mss2d_loss_fused


def test_mss2d_kernel_matches_direct(rng):
    bc, h, w, bw, stride = 2, 32, 40, 8, 2
    s = jnp.asarray(rng.standard_normal((bc, h, w)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((bc, h, w)).astype(np.float32))
    win = rng.standard_normal((bw, bw)).astype(np.float32)
    weight = np.abs(rng.standard_normal((bw, bw // 2 + 1))).astype(np.float32)

    total = 0.0
    n_rows = (h - bw) // stride + 1
    n_cols = (w - bw) // stride + 1
    sn, tn = np.asarray(s), np.asarray(t)
    for b in range(bc):
        for i in range(n_rows):
            for j in range(n_cols):
                bs = sn[b, i * stride:i * stride + bw,
                        j * stride:j * stride + bw] * win
                bt = tn[b, i * stride:i * stride + bw,
                        j * stride:j * stride + bw] * win
                total += (np.abs(np.abs(np.fft.rfft2(bs))
                                 - np.abs(np.fft.rfft2(bt))) * weight).sum()

    got = float(mss2d_block_loss(s, t, bw, stride, win, weight,
                                 interpret=True).sum())
    assert abs(got - total) / abs(total) < 1e-4


def test_mss2d_fused_multiscale(rng):
    s = jnp.asarray(rng.standard_normal((2, 2, 40, 64)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((2, 2, 40, 64)).astype(np.float32))
    # (8 -> jnp fallback path, 32 -> fused kernel path); per-sample out
    loss = mss2d_loss_fused(s, t, block_widths=(8, 32), interpret=True)
    assert loss.shape == (2,)
    assert np.isfinite(np.asarray(loss)).all() and (np.asarray(loss) > 0).all()
    zero = float(mss2d_loss_fused(s, s, block_widths=(8, 32),
                                  interpret=True).sum())
    assert zero < 1e-6
    # the fused kernel computes the identical math as the jnp unfold path
    ref = mss2d_loss_fused(s, t, block_widths=(8, 32),
                           min_fused_bw=10_000, interpret=True)
    np.testing.assert_allclose(np.asarray(loss), np.asarray(ref), rtol=1e-4)


def test_mss2d_fused_matches_mssloss2d(rng):
    """Per-sample fused loss == MSSLoss2D (no midside) with ortho scaling
    folded into the weights."""
    from dualdiffusion_tpu.training.losses import MSSLoss2D, MSSLoss2DConfig
    s = jnp.asarray(rng.standard_normal((2, 2, 40, 64)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((2, 2, 40, 64)).astype(np.float32))
    fused = mss2d_loss_fused(s, t, block_widths=(8, 16, 32),
                             interpret=True)
    mss = MSSLoss2D(MSSLoss2DConfig(block_widths=(8, 16, 32),
                                    use_midside_transform="none"))
    ref = mss(s, t)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-3)


def test_mss2d_kernel_gradients_match_jnp(rng):
    """The custom VJP (strip-scan exact recompute) must match autodiff of
    the plain jnp math (VERDICT r1: the kernel was forward-only)."""
    bc, h, w, bw, stride = 2, 24, 32, 8, 4
    s = jnp.asarray(rng.standard_normal((bc, h, w)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((bc, h, w)).astype(np.float32))
    win = rng.standard_normal((bw, bw)).astype(np.float32)
    weight = np.abs(rng.standard_normal((bw, bw // 2 + 1))).astype(np.float32)

    def ref_loss(s_, t_):
        n_rows = (h - bw) // stride + 1
        n_cols = (w - bw) // stride + 1
        total = 0.0
        for i in range(n_rows):
            for j in range(n_cols):
                bs = jax.lax.dynamic_slice(s_, (0, i * stride, j * stride),
                                           (bc, bw, bw)) * win
                bt = jax.lax.dynamic_slice(t_, (0, i * stride, j * stride),
                                           (bc, bw, bw)) * win
                total += (jnp.abs(jnp.abs(jnp.fft.rfft2(bs))
                                  - jnp.abs(jnp.fft.rfft2(bt))) * weight).sum()
        return total

    gs_ref, gt_ref = jax.grad(ref_loss, argnums=(0, 1))(s, t)
    gs, gt = jax.grad(
        lambda a, b: mss2d_block_loss(a, b, bw, stride, win, weight,
                                      True).sum(),
        argnums=(0, 1))(s, t)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gs_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_ref),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_mss2d_fused_trains(rng):
    """mss2d_loss_fused is differentiable end-to-end (kernel + fallback)."""
    s = jnp.asarray(rng.standard_normal((1, 2, 40, 64)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((1, 2, 40, 64)).astype(np.float32))
    g = jax.grad(lambda a: mss2d_loss_fused(a, t, block_widths=(8, 32),
                                            interpret=True).mean())(s)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


@pytest.mark.parametrize("v2", ["0", "1"])
def test_grouped_conv_pallas_matches_lax(rng, monkeypatch, v2):
    """Both grouped-conv kernels — v1 (sublane-stacked tap patches, one
    K=9*cig MXU dot per output row) and v2 (copy-free: 3-row slab view,
    dx taps in the weights' N dim, shifted f32 adds) — must equal
    lax.conv_general_dilated(feature_group_count), grouped and dense,
    and the custom VJP must match the lax conv's gradients."""
    monkeypatch.setenv("DD_PALLAS_CONV_V2", v2)
    from dualdiffusion_tpu.ops.pallas.grouped_conv import (
        _lax_reference, grouped_conv2d_3x3, supported)

    cases = [  # (B, H, W, C_in, C_out, groups)
        (2, 8, 128, 256, 512, 8),
        (2, 4, 96, 64, 32, 1),        # dense (DDEC-style low channel)
        (1, 6, 100, 96, 192, 3),      # non-128 W, odd groups
        (1, 2, 96, 32, 64, 2),        # minimal H (TH=2)
    ]
    for b, h, wd, ci, co, g in cases:
        assert supported((b, h, wd, ci), (3, 3), 1, g)
        x = jnp.asarray(rng.standard_normal((b, h, wd, ci)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal(
            (co, ci // g, 3, 3)).astype(np.float32))
        got = jax.jit(grouped_conv2d_3x3, static_argnums=2)(x, w, g)
        want = _lax_reference(x, w, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)

    # gradients route through the lax VJP
    x = jnp.asarray(rng.standard_normal((1, 4, 96, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 8, 3, 3)).astype(np.float32))
    gx, gw = jax.grad(
        lambda a, b_: jnp.sum(grouped_conv2d_3x3(a, b_, 4) ** 2), (0, 1))(x, w)
    rx, rw = jax.grad(
        lambda a, b_: jnp.sum(_lax_reference(a, b_, 4) ** 2), (0, 1))(x, w)
    # native backward (dgrad via the kernel, 9-tap einsum wgrad): f32
    # reduction-order noise only
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-3)

    # routing predicate rejects unsupported geometries
    assert not supported((1, 8, 48, 32), (3, 3), 1, 1)   # narrow W
    assert not supported((1, 8, 128, 32), (3, 3), 2, 1)  # stride
    assert not supported((1, 8, 128, 32), (1, 1), 1, 1)  # kernel


def test_grouped_conv_pallas_mpconv_routing(rng, monkeypatch):
    """DD_GROUPED_PALLAS_CONV=1 routes eligible MPConv grouped calls
    through the kernel with identical results."""
    from dualdiffusion_tpu.models.layers import MPConv

    conv = MPConv(64, 128, (3, 3), groups=8)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 4, 128, 64))
    v = conv.init(key, x)
    monkeypatch.setenv("DD_GROUPED_PALLAS_CONV", "0")
    base = conv.apply(v, x)
    monkeypatch.setenv("DD_GROUPED_PALLAS_CONV", "1")
    fast = conv.apply(v, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               rtol=1e-5, atol=1e-4)


def test_grouped_conv_pallas_unet_forward_matches(rng, monkeypatch):
    """DD_GROUPED_PALLAS_CONV=1 must leave a full grouped-MLP UNet forward
    unchanged (the flag also disables the batch-major grouped layout
    threading so MPConv can route the MLP conv pair through the kernel)."""
    from dualdiffusion_tpu.models.unet import UNet, UNetConfig

    cfg = UNetConfig(in_channels=4, out_channels=4, in_channels_emb=32,
                     model_channels=32, channel_mult=(1, 2),
                     num_layers_per_block=1, channels_per_head=16,
                     mlp_multiplier=2, mlp_groups=4, logvar_channels=16)
    unet = UNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 8, 128, 4))
    emb = jax.random.normal(key, (1, 32))
    v = jax.jit(lambda k: unet.init(k, x, jnp.ones((1,)), emb,
                                    method=UNet.init_all))(key)
    cond = unet.apply(v, emb, jnp.ones((1,)), method=UNet.get_embeddings)
    monkeypatch.setenv("DD_GROUPED_PALLAS_CONV", "0")
    base = unet.apply(v, x, jnp.full((1,), 2.0), cond)
    monkeypatch.setenv("DD_GROUPED_PALLAS_CONV", "1")
    fast = unet.apply(v, x, jnp.full((1,), 2.0), cond)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               rtol=1e-4, atol=1e-4)


def test_grouped_conv_pallas_training_grads(rng, monkeypatch):
    """DD_GROUPED_PALLAS_CONV_TRAIN=1 routes TRAINING forwards through the
    kernel; loss value and weight gradients (through the forward weight
    normalization) must match the per-tap path."""
    from dualdiffusion_tpu.models.layers import MPConv

    conv = MPConv(64, 128, (3, 3), groups=8)
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 4, 128, 64))
    v = conv.init(key, x)

    def loss(vv):
        return jnp.sum(conv.apply(vv, x, training=True) ** 2)

    monkeypatch.setenv("DD_GROUPED_PALLAS_CONV", "0")
    base_l, base_g = jax.value_and_grad(loss)(v)
    monkeypatch.setenv("DD_GROUPED_PALLAS_CONV", "1")
    monkeypatch.setenv("DD_GROUPED_PALLAS_CONV_TRAIN", "1")
    fast_l, fast_g = jax.value_and_grad(loss)(v)
    np.testing.assert_allclose(float(fast_l), float(base_l), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(fast_g),
                    jax.tree_util.tree_leaves(base_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)


def test_grouped_conv_pre_entry_and_layout_threading(rng):
    """grouped_conv2d_3x3_pre (pre-arranged weights, kernel-layout I/O
    threading) must equal the standard entry for every layout combo."""
    from dualdiffusion_tpu.ops.pallas.grouped_conv import (
        _from_kernel_layout, _lax_reference, _to_kernel_layout,
        grouped_conv2d_3x3_pre, prepare_kernel_weights)

    b, h, wd, ci, co, g = 2, 4, 96, 64, 128, 4
    x = jnp.asarray(rng.standard_normal((b, h, wd, ci)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((co, ci // g, 3, 3)).astype(np.float32))
    want = _lax_reference(x, w, g)
    wt = prepare_kernel_weights(w, g)

    got = grouped_conv2d_3x3_pre(x, wt, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)

    # gk output -> NHWC re-merge equals the merged output
    gk = grouped_conv2d_3x3_pre(x, wt, g, layout_out="gk")
    assert gk.shape == (g, b, h, co // g, wd)
    np.testing.assert_allclose(np.asarray(_from_kernel_layout(gk)),
                               np.asarray(want), rtol=1e-5, atol=1e-4)

    # gk input (threaded from a previous conv in the chain)
    w2 = jnp.asarray(rng.standard_normal((ci, co // g, 3, 3)).astype(np.float32))
    wt2 = prepare_kernel_weights(w2, g)
    chained = grouped_conv2d_3x3_pre(gk, wt2, g, layout_in="gk", w_out=wd)
    ref2 = _lax_reference(want, w2, g)
    np.testing.assert_allclose(np.asarray(chained), np.asarray(ref2),
                               rtol=1e-4, atol=1e-3)


def test_wker_collection_skips_inloop_prep(rng, monkeypatch):
    """collect_wker gathers pre-arranged kernel-layout weights in one
    mutable pass; applying with the merged tree gives identical results
    (the in-loop rearrange is replaced by the stored buffer)."""
    from dualdiffusion_tpu.models.layers import MPConv, collect_wker

    monkeypatch.setenv("DD_GROUPED_PALLAS_CONV", "1")
    conv = MPConv(64, 128, (3, 3), groups=8)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 4, 128, 64))
    v = conv.init(key, x)
    base = conv.apply(v, x)
    v_wker = collect_wker(conv.apply, v, x)
    assert "wker" in v_wker and jax.tree_util.tree_leaves(v_wker["wker"])
    fast = conv.apply(v_wker, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               rtol=1e-4, atol=1e-4)


def test_pallas_pair_threading_unet_parity(rng, monkeypatch):
    """DD_PALLAS_PAIR=1 (kernel-layout threading across the MLP conv
    pair) + wker collection must leave the UNet forward unchanged."""
    from dualdiffusion_tpu.models.layers import collect_wker
    from dualdiffusion_tpu.models.unet import UNet, UNetConfig

    cfg = UNetConfig(in_channels=4, out_channels=4, in_channels_emb=32,
                     model_channels=32, channel_mult=(1, 2),
                     num_layers_per_block=1, channels_per_head=16,
                     mlp_multiplier=2, mlp_groups=4, logvar_channels=16)
    unet = UNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 8, 128, 4))
    emb = jax.random.normal(key, (1, 32))
    v = jax.jit(lambda k: unet.init(k, x, jnp.ones((1,)), emb,
                                    method=UNet.init_all))(key)
    cond = unet.apply(v, emb, jnp.ones((1,)), method=UNet.get_embeddings)
    monkeypatch.setenv("DD_GROUPED_PALLAS_CONV", "0")
    base = unet.apply(v, x, jnp.full((1,), 2.0), cond)
    monkeypatch.setenv("DD_GROUPED_PALLAS_CONV", "1")
    monkeypatch.setenv("DD_PALLAS_PAIR", "1")
    v2 = collect_wker(unet.apply, v, x, jnp.full((1,), 2.0), cond)
    fast = unet.apply(v2, x, jnp.full((1,), 2.0), cond)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               rtol=1e-4, atol=1e-4)
