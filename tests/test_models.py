import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dualdiffusion_tpu.models.unet import UNet, UNetConfig
from dualdiffusion_tpu.models.dae import DAE, DAEConfig, tiled_encode


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def tiny_unet_cfg(**kw):
    d = dict(in_channels=4, out_channels=4, model_channels=16,
             channel_mult=(1, 2), num_layers_per_block=1,
             channels_per_head=16, logvar_channels=32)
    d.update(kw)
    return UNetConfig(**d)


@pytest.mark.slow
def test_unet_2d_forward(key):
    cfg = tiny_unet_cfg()
    model = UNet(cfg)
    x = jax.random.normal(key, (2, 16, 16, 4))
    sigma = jnp.array([1.0, 10.0])
    params = model.init(key, x, sigma)
    y = model.apply(params, x, sigma)
    assert y.shape == x.shape
    assert y.dtype == jnp.float32
    assert bool(jnp.isfinite(y).all())


def test_unet_rejects_misaligned_width(key):
    """A W (or H) not divisible by 2^(levels-1) mismatches skip widths
    across down/up resampling; the model must fail with a readable error
    up front, not a reshape error deep inside a W-packed skip-cat."""
    cfg = tiny_unet_cfg()     # 2 levels -> H, W must be even
    model = UNet(cfg)
    x = jax.random.normal(key, (1, 16, 15, 4))
    sigma = jnp.ones((1,))
    with pytest.raises(ValueError, match="divisible"):
        model.init(key, x, sigma)


@pytest.mark.slow
def test_unet_preconditioning_limits(key):
    """At huge sigma, D_x ~ c_out*F (c_skip~0); at tiny sigma D_x ~ x."""
    cfg = tiny_unet_cfg()
    model = UNet(cfg)
    x = jax.random.normal(key, (1, 16, 16, 4))
    params = model.init(key, x, jnp.array([1.0]))
    y_small = model.apply(params, x, jnp.array([1e-4]))
    np.testing.assert_allclose(np.asarray(y_small), np.asarray(x),
                               rtol=1e-2, atol=1e-2)


@pytest.mark.slow
def test_unet_3d_with_attention(key):
    cfg = tiny_unet_cfg(use_3d=True, attn_levels=(1,), attn_axis="freq")
    model = UNet(cfg)
    x = jax.random.normal(key, (1, 2, 16, 8, 4))
    sigma = jnp.array([2.0])
    params = model.init(key, x, sigma)
    y = model.apply(params, x, sigma)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())


@pytest.mark.slow
def test_unet_label_embeddings_cfg(key):
    cfg = tiny_unet_cfg(in_channels_emb=32)
    model = UNet(cfg)
    x = jax.random.normal(key, (2, 16, 16, 4))
    sigma = jnp.array([1.0, 1.0])
    emb_in = jax.random.normal(key, (2, 32))
    params = model.init(key, x, sigma, emb_in, method=UNet.init_all)
    # conditional vs unconditional embeddings differ
    e_cond = model.apply(params, emb_in, jnp.ones(2), method=UNet.get_embeddings)
    e_unc = model.apply(params, emb_in, jnp.zeros(2), method=UNet.get_embeddings)
    assert e_cond.shape[1] == e_unc.shape[1]
    assert float(jnp.abs(e_cond - e_unc).max()) > 1e-3
    y = model.apply(params, x, sigma, e_cond)
    assert y.shape == x.shape


@pytest.mark.slow
def test_unet_ddec_psd_conditioning(key):
    cfg = tiny_unet_cfg(in_num_freqs=16, in_psd_freqs=64)
    model = UNet(cfg)
    x = jax.random.normal(key, (1, 16, 8, 4))
    x_ref = jax.random.normal(key, (1, 64, 8, 4))
    sigma = jnp.array([1.0])
    params = model.init(key, x, sigma, None, x_ref)
    # out_gain is zero-init (D_x = c_skip*x at init); enable the F(x) branch
    params = jax.tree_util.tree_map(lambda v: v, params)
    params["params"]["core"]["out_gain"] = jnp.ones(())
    y = model.apply(params, x, sigma, None, x_ref)
    assert y.shape == x.shape
    # conditioning matters
    y2 = model.apply(params, x, sigma, None, x_ref * 2.0)
    assert float(jnp.abs(y - y2).max()) > 1e-5


def test_unet_logvar_head(key):
    cfg = tiny_unet_cfg()
    model = UNet(cfg)
    x = jax.random.normal(key, (2, 16, 16, 4))
    params = model.init(key, x, jnp.array([1.0, 1.0]), method=UNet.init_all)
    lv = model.apply(params, jnp.array([0.5, 5.0]),
                     method=UNet.get_sigma_loss_logvar)
    assert lv.shape == (2, 1, 1, 1)
    # zero-init head -> zero logvar at init
    np.testing.assert_allclose(np.asarray(lv), 0.0, atol=1e-6)


@pytest.mark.slow
def test_unet_jit_and_grad(key):
    cfg = tiny_unet_cfg()
    model = UNet(cfg)
    x = jax.random.normal(key, (1, 16, 16, 4))
    sigma = jnp.array([1.0])
    params = model.init(key, x, sigma)

    @jax.jit
    def loss_fn(p):
        y = model.apply(p, x, sigma, training=True)
        return jnp.mean((y - x) ** 2)

    g = jax.grad(loss_fn)(params)
    total = jax.tree_util.tree_reduce(lambda a, b: a + float(jnp.abs(b).sum()), g, 0.0)
    assert np.isfinite(total) and total > 0


# ---------------------------------------------------------------------------
# DAE
# ---------------------------------------------------------------------------

def tiny_dae_cfg(**kw):
    d = dict(model_channels=8, channel_mult_enc=(1, 2), channel_mult_dec=(1, 2),
             num_enc_layers_per_block=1, num_dec_layers_per_block=1,
             latent_channels=4)
    d.update(kw)
    return DAEConfig(**d)


@pytest.mark.slow
def test_dae_roundtrip_shapes(key):
    cfg = tiny_dae_cfg()
    model = DAE(cfg)
    x = jax.random.normal(key, (2, 32, 64, 2))
    variables = model.init(key, x)
    (latents, recon, pre), mutated = model.apply(
        variables, x, mutable=["stats"], training=True,
        noise_key=None)
    assert latents.shape == (2, 16, 32, 4)
    assert recon.shape == x.shape
    # stats tracked
    assert float(jnp.abs(mutated["stats"]["latents_mean"]).sum()) >= 0


@pytest.mark.slow
def test_dae_encode_decode_methods(key):
    cfg = tiny_dae_cfg()
    model = DAE(cfg)
    x = jax.random.normal(key, (1, 32, 32, 2))
    variables = model.init(key, x)
    lat = model.apply(variables, x, method=DAE.encode)
    assert lat.shape == model.apply(variables, x.shape, method=DAE.get_latent_shape)
    y = model.apply(variables, lat, method=DAE.decode)
    assert y.shape == (1, 32, 32, 2)


def test_dae_latent_normalization(key):
    cfg = tiny_dae_cfg()
    model = DAE(cfg)
    x = jax.random.normal(key, (1, 32, 32, 2))
    variables = model.init(key, x)
    lat = model.apply(variables, x, method=DAE.encode)
    norm = model.apply(variables, lat, method=DAE.normalize_latents)
    back = model.apply(variables, norm, method=DAE.unnormalize_latents)
    np.testing.assert_allclose(np.asarray(back), np.asarray(lat), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.slow
def test_dae_supersampled_shift_equivariance(key):
    """d3-series: latents of a ds-shifted input == shifted latents."""
    cfg = tiny_dae_cfg(supersampled=True, clip_act=1e6)
    model = DAE(cfg)
    ds = 2  # num_levels=2 -> ratio 2
    x = jax.random.normal(key, (1, 32, 64, 2))
    variables = model.init(key, x)
    lat = model.apply(variables, x, method=DAE.encode)
    x_shift = jnp.roll(x, ds, axis=2)
    lat_shift = model.apply(variables, x_shift, method=DAE.encode)
    # interior should match the rolled latents (edges differ due to padding)
    a = np.asarray(jnp.roll(lat, 1, axis=2))[:, :, 4:-4]
    b = np.asarray(lat_shift)[:, :, 4:-4]
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2)


@pytest.mark.slow
def test_dae_tiled_encode_matches_full(key):
    cfg = tiny_dae_cfg()
    model = DAE(cfg)
    x = jax.random.normal(key, (1, 16, 512, 2))
    variables = model.init(key, x)

    def enc(v, chunk, emb):
        return model.apply(v, chunk, emb, method=DAE.encode)

    full = model.apply(variables, x, method=DAE.encode)
    tiled = tiled_encode(enc, variables, x, None, model.downsample_ratio,
                         cfg.latent_channels, max_chunk=256, overlap=32)
    assert tiled.shape == full.shape
    # interiors agree; chunk seams may differ slightly from conv padding
    err = np.abs(np.asarray(tiled) - np.asarray(full))
    assert np.median(err) < 1e-4


def test_top_pca_components(key):
    from dualdiffusion_tpu.models.dae import top_pca_components
    # latents with a dominant direction: component 0 must capture it
    base = jax.random.normal(key, (2, 8, 16, 1))
    direction = jnp.asarray([3.0, -2.0, 1.0, 0.5])
    x = base * direction + 0.01 * jax.random.normal(key, (2, 8, 16, 4))
    out = top_pca_components(x, n_pca=2)
    assert out.shape == (2, 8, 16, 2)
    # first component variance dominates the second
    v = jnp.var(out, axis=(1, 2))
    assert bool((v[:, 0] > 5 * v[:, 1]).all())
    # projections are centered
    assert abs(float(out.mean())) < 1e-4


@pytest.mark.slow
def test_remat_blocks_same_loss_and_grads():
    """remat_blocks changes memory, not math: identical loss/grads."""
    import jax
    import jax.numpy as jnp
    from dualdiffusion_tpu.models.unet import UNet, UNetConfig

    key = jax.random.PRNGKey(0)
    base = dict(in_channels=4, out_channels=4, in_channels_emb=0,
                model_channels=8, channel_mult=(1, 2),
                num_layers_per_block=1, channels_per_head=8,
                logvar_channels=16, mlp_groups=2, mlp_multiplier=2)
    x = jax.random.normal(key, (2, 8, 16, 4))
    sg = jnp.ones((2,))

    def loss_fn(model):
        m = UNet(model)
        p = m.init(key, x, sg, None, method=UNet.init_all)

        def loss(pp):
            return jnp.mean(m.apply(pp, x, sg, None, training=True,
                                    rngs={"dropout": key}) ** 2)

        return p, jax.value_and_grad(loss)(p)

    _, (l0, g0) = loss_fn(UNetConfig(**base))
    _, (l1, g1) = loss_fn(UNetConfig(**base, remat_blocks=True))
    assert abs(float(l0) - float(l1)) < 1e-6
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_w_packed_unet_matches_unpacked(key):
    """UNetConfig.w_pack_channels is a pure layout optimization: identical
    param tree, outputs equal to the unpacked model (layers.py
    MPConv._packed_conv expanded-kernel equivalence)."""
    import dataclasses
    base = UNetConfig(in_channels=2, out_channels=2, in_channels_emb=0,
                      in_num_freqs=32, in_psd_freqs=256,
                      model_channels=16, channel_mult=(1, 2, 3),
                      num_layers_per_block=2, mlp_multiplier=2,
                      channels_per_head=16, logvar_channels=32)
    packed_cfg = dataclasses.replace(base, w_pack_channels=64)
    m0, m1 = UNet(base), UNet(packed_cfg)
    x = jax.random.normal(key, (1, 32, 64, 2))
    ref = jax.random.normal(jax.random.fold_in(key, 1), (1, 256, 64, 2))
    sigma = jnp.full((1,), 3.0)
    v0 = m0.init(key, x, sigma, None, ref, method=UNet.init_all)
    # identical param tree: the packed model loads the unpacked params
    v1 = m1.init(key, x, sigma, None, ref, method=UNet.init_all)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        assert a.shape == b.shape

    y0 = m0.apply(v0, x, sigma, None, ref)
    y1 = m1.apply(v0, x, sigma, None, ref)  # SAME params through packed path
    err = float(jnp.abs(y0 - y1).max())
    assert err < 2e-2, err  # bf16 internals: reassociation-level tolerance
    # and a tighter relative check on overall energy
    rel = float(jnp.abs(y0 - y1).mean() / (jnp.abs(y0).mean() + 1e-9))
    assert rel < 2e-3, rel


@pytest.mark.slow
def test_w_packed_dae_matches_unpacked(key):
    """DAEConfig.w_pack_channels is a pure layout optimization: identical
    param tree, encode/decode outputs equal to the unpacked model."""
    import dataclasses
    from dualdiffusion_tpu.models.dae import DAE, DAEConfig
    # strict structural parity in fp32 (exact math, no rounding noise)
    base = DAEConfig(model_channels=16, channel_mult_enc=(1, 2, 4),
                     channel_mult_dec=(1, 2, 4), num_enc_layers_per_block=1,
                     num_dec_layers_per_block=1, latent_channels=4,
                     compute_dtype="float32")
    packed_cfg = dataclasses.replace(base, w_pack_channels=64)
    m0, m1 = DAE(base), DAE(packed_cfg)
    x = jax.random.normal(key, (1, 32, 64, 2))
    v0 = m0.init(key, x)
    v1 = m1.init(key, x)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        assert a.shape == b.shape

    lat0 = m0.apply(v0, x, method=DAE.encode)
    lat1 = m1.apply(v0, x, method=DAE.encode)  # SAME params, packed path
    assert float(jnp.abs(lat0 - lat1).max()) < 1e-4
    y0 = m0.apply(v0, lat0, method=DAE.decode)
    y1 = m1.apply(v0, lat0, method=DAE.decode)
    assert float(jnp.abs(y0 - y1).max()) < 1e-4

    # bf16 production dtype: ulp-level divergence amplified by the
    # mid-block RMS normalize — sanity-bound the relative error only
    mb0 = DAE(dataclasses.replace(base, compute_dtype="bfloat16"))
    mb1 = DAE(dataclasses.replace(packed_cfg, compute_dtype="bfloat16"))
    latb0 = mb0.apply(v0, x, method=DAE.encode)
    latb1 = mb1.apply(v0, x, method=DAE.encode)
    rel = float(jnp.abs(latb0 - latb1).mean() / (jnp.abs(latb0).mean() + 1e-9))
    assert rel < 2e-2, rel


@pytest.mark.slow
def test_w_packed_dae_grad_parity(key):
    """Gradients through the packed layout match the unpacked model in
    fp32 (the DAE trainer differentiates through these convs when
    w_pack_channels is configured)."""
    import dataclasses
    from dualdiffusion_tpu.models.dae import DAE, DAEConfig
    base = DAEConfig(model_channels=16, channel_mult_enc=(1, 2),
                     channel_mult_dec=(1, 2), num_enc_layers_per_block=1,
                     num_dec_layers_per_block=1, latent_channels=4,
                     compute_dtype="float32")
    m0 = DAE(base)
    m1 = DAE(dataclasses.replace(base, w_pack_channels=64))
    x = jax.random.normal(key, (1, 16, 32, 2))
    v0 = m0.init(key, x)

    def loss(m):
        def f(params):
            v = {**v0, "params": params}
            lat = m.apply(v, x, method=DAE.encode)
            return jnp.mean(jnp.square(m.apply(v, lat, method=DAE.decode) - x))
        return f

    l0, g0 = jax.value_and_grad(loss(m0))(v0["params"])
    l1, g1 = jax.value_and_grad(loss(m1))(v0["params"])
    assert abs(float(l0 - l1)) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_dae_supersampled_asymmetric_encoder(key):
    """d3-style: single full-resolution encoder level with a multi-level
    decoder (reference dae_edm2_d3.py — flat encoder, pool after
    projection). Round-trip shapes must follow the DECODER's ratio."""
    cfg = tiny_dae_cfg(channel_mult_enc=(1,), channel_mult_dec=(1, 2, 4),
                       num_enc_layers_per_block=3, supersampled=True)
    model = DAE(cfg)
    x = jax.random.normal(key, (1, 32, 64, 2))
    v = model.init(key, x)
    lat = model.apply(v, x, method=DAE.encode)
    assert lat.shape == (1, 8, 16, 4)   # ratio 4 from the 3-level decoder
    y = model.apply(v, lat, method=DAE.decode)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())


def test_fold_inference_params_unet_parity(key):
    """Folded (bf16, fan-in-scaled) params produce the same UNet forward
    as the per-call weight prep, within bf16 weight-quantization noise —
    and fold leaves only w_mp/w_raw leaves touched."""
    from dualdiffusion_tpu.models.layers import (fold_inference_params,
                                                 folded_params)

    cfg = tiny_unet_cfg(in_channels_emb=8)
    model = UNet(cfg)
    x = jax.random.normal(key, (2, 16, 16, 4))
    sigma = jnp.array([1.0, 10.0])
    emb_in = jax.random.normal(key, (2, 8))
    v = model.init(key, x, sigma, emb_in, method=UNet.init_all)
    v["params"]["core"]["out_gain"] = jnp.ones(())
    emb = model.apply(v, emb_in, jnp.ones(2), method=UNet.get_embeddings)

    base = model.apply(v, x, sigma, emb)
    folded = fold_inference_params(v)
    with folded_params():
        fast = model.apply(folded, x, sigma, emb)
    assert fast.dtype == base.dtype
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               rtol=2e-2, atol=2e-2)

    # non-weight leaves (gains, biases) stay untouched f32
    import jax.tree_util as jtu
    for (pa, a), (pb, b) in zip(jtu.tree_leaves_with_path(v),
                                jtu.tree_leaves_with_path(folded)):
        name = getattr(pa[-1], "key", "")
        if name in ("w_mp", "w_raw"):
            assert b.dtype == jnp.bfloat16
            np.testing.assert_allclose(
                np.asarray(b, np.float32),
                np.asarray(a / np.sqrt(np.prod(a.shape[1:]))), rtol=1e-2,
                atol=1e-3)
        else:
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fold_inference_params_dae_parity(key):
    from dualdiffusion_tpu.models.layers import (fold_inference_params,
                                                 folded_params)

    cfg = tiny_dae_cfg()
    dae = DAE(cfg)
    x = jax.random.normal(key, (1, 16, 16, 2))
    v = dae.init(key, x)
    lat = dae.apply(v, x, method=DAE.encode)
    base = dae.apply(v, lat, method=DAE.decode)
    with folded_params():
        fast = dae.apply(fold_inference_params(v), lat, method=DAE.decode)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               rtol=2e-2, atol=2e-2)


def test_fold_inference_params_linear_only(key):
    """linear_only=True folds just the 2-D (kernel-less linear) weights;
    conv weights stay f32, and the forward still matches."""
    from dualdiffusion_tpu.models.layers import (fold_inference_params,
                                                 folded_params)

    cfg = tiny_unet_cfg(in_channels_emb=8)
    model = UNet(cfg)
    x = jax.random.normal(key, (2, 16, 16, 4))
    sigma = jnp.array([1.0, 10.0])
    emb_in = jax.random.normal(key, (2, 8))
    v = model.init(key, x, sigma, emb_in, method=UNet.init_all)
    v["params"]["core"]["out_gain"] = jnp.ones(())
    emb = model.apply(v, emb_in, jnp.ones(2), method=UNet.get_embeddings)

    folded = fold_inference_params(v, linear_only=True)
    import jax.tree_util as jtu
    n2, nhi = 0, 0
    for p, leaf in jtu.tree_leaves_with_path(folded):
        name = getattr(p[-1], "key", "")
        if name in ("w_mp", "w_raw"):
            if leaf.ndim == 2:
                assert leaf.dtype == jnp.bfloat16
                n2 += 1
            else:
                assert leaf.dtype == jnp.float32
                nhi += 1
    assert n2 > 0 and nhi > 0
    base = model.apply(v, x, sigma, emb)
    with folded_params("linear"):
        fast = model.apply(folded, x, sigma, emb)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               rtol=2e-2, atol=2e-2)


def test_bf16_cast_tree_still_gets_weight_prep(key):
    """A param tree cast to bf16 (half-precision checkpoint, memory-
    constrained serving) must still receive the full MPConv weight prep —
    the pre-r5 dtype-based folding inference silently skipped the
    sqrt(fan_in) scale on such trees (ADVICE r4 medium)."""
    cfg = tiny_unet_cfg(in_channels_emb=8)
    model = UNet(cfg)
    x = jax.random.normal(key, (2, 16, 16, 4))
    sigma = jnp.array([1.0, 10.0])
    emb_in = jax.random.normal(key, (2, 8))
    v = model.init(key, x, sigma, emb_in, method=UNet.init_all)
    v["params"]["core"]["out_gain"] = jnp.ones(())
    emb = model.apply(v, emb_in, jnp.ones(2), method=UNet.get_embeddings)
    base = model.apply(v, x, sigma, emb)

    cast = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16)
        if hasattr(t, "dtype") and t.dtype == jnp.float32 else t, v)
    out = model.apply(cast, x, sigma, emb)
    # must match the f32 forward up to bf16 quantization noise — NOT blow
    # up by ~sqrt(fan_in) per layer
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=5e-2, atol=5e-2)


def test_folded_params_training_raises(key):
    from dualdiffusion_tpu.models.layers import (fold_inference_params,
                                                 folded_params)
    cfg = tiny_unet_cfg(in_channels_emb=8)
    model = UNet(cfg)
    x = jax.random.normal(key, (2, 16, 16, 4))
    sigma = jnp.array([1.0, 10.0])
    emb_in = jax.random.normal(key, (2, 8))
    v = model.init(key, x, sigma, emb_in, method=UNet.init_all)
    folded = fold_inference_params(v)
    with pytest.raises(ValueError, match="inference-only"):
        with folded_params():
            model.apply(folded, x, sigma, None, training=True,
                        rngs={"dropout": key})
