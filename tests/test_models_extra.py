import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dualdiffusion_tpu.models.attention import (build_rope_tables,
                                                rope_rotate_partial,
                                                rope_self_test,
                                                sliding_window_attention)
from dualdiffusion_tpu.models.vae import VAE, VAEConfig
from dualdiffusion_tpu.models.discriminator import (Discriminator,
                                                    DiscriminatorConfig)
from dualdiffusion_tpu.models.embeddings import (top_pca_components,
                                                 cosine_similarity_matrix,
                                                 dedupe_embeddings)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def test_rope_self_test():
    assert rope_self_test(n=31, rope_ch=2)
    assert rope_self_test(n=16, t0=7, rope_ch=4)


def test_rope_rotation_is_norm_preserving(key):
    cos, sin = build_rope_tables(8, 4)
    x = jax.random.normal(key, (2, 8, 16))
    y = rope_rotate_partial(x, jnp.asarray(cos), jnp.asarray(sin))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)


def test_sliding_window_attention_masks(key):
    q = jax.random.normal(key, (1, 2, 16, 8))
    out = sliding_window_attention(q, q, q, window_size=2)
    assert out.shape == q.shape
    # causal + window: position 0 attends only to itself
    v = jnp.broadcast_to(jnp.arange(16.0)[None, None, :, None], (1, 1, 16, 8))
    o = sliding_window_attention(jnp.ones((1, 1, 16, 8)),
                                 jnp.ones((1, 1, 16, 8)), v,
                                 window_size=0, causal=True)
    np.testing.assert_allclose(np.asarray(o[0, 0, :, 0]), np.arange(16.0),
                               atol=1e-5)


@pytest.mark.slow
def test_vae_uniform_target_snr(key):
    cfg = VAEConfig(model_channels=8, channel_mult=(1, 2), latent_channels=4,
                    num_layers_per_block=1, label_dim=16, target_snr=32.0)
    model = VAE(cfg)
    x = jax.random.normal(key, (1, 16, 16, 2))
    emb_in = jax.random.normal(key, (1, 16))
    variables = model.init(key, x, None, key)
    dist = model.apply(variables, x, method=VAE.encode)
    # fixed noise logvar = log(1/(snr^2+1))
    np.testing.assert_allclose(float(dist.logvar),
                               np.log(1 / (32.0 ** 2 + 1)), rtol=1e-6)
    lat = dist.sample(key)
    assert lat.shape == (1, 8, 8, 4)
    recon = model.apply(variables, lat, method=VAE.decode)
    assert recon.shape == x.shape
    kl = dist.kl()
    assert kl.shape == (1,) and float(kl[0]) >= 0


def test_vae_latents_out_gain_init(key):
    cfg = VAEConfig(model_channels=8, channel_mult=(1, 2), latent_channels=4,
                    num_layers_per_block=1, target_snr=32.0)
    model = VAE(cfg)
    x = jnp.zeros((1, 16, 16, 2))
    variables = model.init(key, x, None, key)
    gain = float(variables["params"]["latents_out_gain"])
    expected = np.sqrt(1 - 1 / (32.0 ** 2 + 1))
    np.testing.assert_allclose(gain, expected, rtol=1e-6)


@pytest.mark.slow
def test_discriminator(key):
    cfg = DiscriminatorConfig(in_channels=1, in_channels_emb=32,
                              model_channels=8, num_layers=2)
    model = Discriminator(cfg)
    x = jax.random.normal(key, (2, 2, 16, 16, 1))
    emb_in = jax.random.normal(key, (2, 32))
    variables = model.init(key, x, emb_in, method=Discriminator.init_all)
    emb = model.apply(variables, emb_in, method=Discriminator.get_embeddings)
    logits, kld = model.apply(variables, x, emb)
    assert logits.shape == (2, 2, 16, 16, 1)
    assert kld.shape == (2,) and bool(jnp.isfinite(kld).all())


@pytest.mark.slow
def test_inpainting_conversion(tmp_path, key):
    from dualdiffusion_tpu.models.unet import UNet, UNetConfig
    from dualdiffusion_tpu.pipelines import (Pipeline, ModuleHandle,
                                             load_module, save_module)
    from dualdiffusion_tpu.models.convert import convert_unet_to_inpainting
    from dualdiffusion_tpu.utils import save_json

    cfg = UNetConfig(in_channels=4, out_channels=4, model_channels=8,
                     channel_mult=(1, 2), num_layers_per_block=1,
                     channels_per_head=8, logvar_channels=16)
    model = UNet(cfg)
    x = jax.random.normal(key, (1, 8, 16, 4))
    sigma = jnp.array([1.0])
    variables = model.init(key, x, sigma)
    save_module(tmp_path, "unet", "unet", cfg, variables)
    save_json({"modules": {"unet": "unet"}}, tmp_path / "model_index.json")

    convert_unet_to_inpainting(tmp_path)
    mtype, new_cfg, new_vars = load_module(tmp_path, "unet_inpainting")
    assert new_cfg.in_channels == 4 + 4 + 1
    # zero-init extension: with zero ref channels, output matches original
    new_model = UNet(new_cfg)
    ref = jnp.zeros((1, 8, 16, 5))
    y_orig = model.apply(variables, x, sigma)
    y_new = new_model.apply(new_vars, x, sigma, None, ref)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_orig),
                               rtol=1e-4, atol=1e-5)


def test_combine_models(tmp_path, key):
    from dualdiffusion_tpu.models.unet import UNet, UNetConfig
    from dualdiffusion_tpu.pipelines import load_module, save_module
    from dualdiffusion_tpu.models.convert import combine_models

    cfg = UNetConfig(in_channels=2, out_channels=2, model_channels=8,
                     channel_mult=(1,), num_layers_per_block=1,
                     channels_per_head=8, logvar_channels=16)
    model = UNet(cfg)
    x = jnp.zeros((1, 8, 8, 2))
    va = model.init(key, x, jnp.ones((1,)))
    vb = jax.tree_util.tree_map(lambda v: v * 3.0, va)
    save_module(tmp_path / "a", "unet", "unet", cfg, va)
    save_module(tmp_path / "b", "unet", "unet", cfg, vb)
    combine_models(tmp_path / "a", tmp_path / "b", "unet", 0.5, tmp_path / "out")
    _, _, vo = load_module(tmp_path / "out", "unet")
    a0 = jax.tree_util.tree_leaves(va)[0]
    o0 = jax.tree_util.tree_leaves(vo)[0]
    np.testing.assert_allclose(np.asarray(o0), np.asarray(a0) * 2.0, rtol=1e-6)


def test_embedding_helpers(rng):
    e = rng.standard_normal((32, 16)).astype(np.float32)
    pcs = top_pca_components(e, 4)
    assert pcs.shape == (4, 16)
    sim = cosine_similarity_matrix(e)
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-5)
    # duplicates removed
    dup = np.concatenate([e, e[:4] + 1e-6], axis=0)
    keep = dedupe_embeddings(dup, threshold=0.999)
    assert len(keep) == 32


def test_mel_cascade_roundtrip(rng):
    from dualdiffusion_tpu.models.mel_cascade import MelCascade
    # smooth signal (white noise is irrecoverable after downsampling)
    h, w = 256, 50
    grid = np.linspace(0, 10, h)[None, None, :, None]
    t = np.linspace(0, 5, w)[None, None, None, :]
    x = jnp.asarray(np.abs(np.sin(grid * t)).astype(np.float32))
    mc = MelCascade(num_bins=h, num_stages=3)
    y = mc(x)
    assert y.shape == (1, 1, 32, 50)
    recon = mc.inverse_transform(y)
    assert recon.shape == x.shape
    # 256->32 bins is inherently lossy; the reference's own self-test only
    # prints this MSE (mel_cascade.py __main__), it doesn't bound it
    rel = float(jnp.mean((recon - x) ** 2) / jnp.mean(x ** 2))
    assert rel < 0.15, rel
    # single-stage forward/inverse is near exact on its own range
    y0 = mc(x, stage=0)
    x0 = mc.inverse_transform(y0, stage=0)
    assert x0.shape == x.shape


def test_mdct_psd_format(rng):
    from dualdiffusion_tpu.models.formats.mdct_psd import (MDCTPSDFormat,
                                                           MDCTPSDFormatConfig)
    fmt = MDCTPSDFormat(MDCTPSDFormatConfig())
    sr = 32000
    t = np.arange(sr) / sr
    sig = sum(0.2 * np.sin(2 * np.pi * f * t) for f in (110.0, 440.0))
    audio = jnp.asarray(np.stack([sig, sig * 0.7]).astype(np.float32)[None])
    m = fmt.raw_to_mdct(audio)
    psd = fmt.raw_to_mdct_psd(audio)
    assert m.shape == psd.shape and m.shape[1] == 256
    # roundtrip (the 20 Hz high-pass removes nothing from this signal)
    recon = fmt.mdct_to_raw(m)
    n = min(recon.shape[-1], audio.shape[-1])
    # the 20-28.9 Hz FFT-domain high-pass adds small edge ripple
    err = np.abs(np.asarray(recon[..., 256:n-256])
                 - np.asarray(audio[..., 256:n-256]))
    assert err.max() < 5e-2 and err.mean() < 2e-3
    # psd scaling roundtrip
    scaled = fmt.scale_mdct_from_psd(m, psd)
    back = fmt.unscale_mdct_from_psd(scaled, psd)
    np.testing.assert_allclose(np.asarray(back), np.asarray(m), rtol=1e-4,
                               atol=1e-5)


def test_p2m_roundtrip(rng):
    from dualdiffusion_tpu.models.formats.mdct_psd import (MDCTPSDFormat,
                                                           MDCTPSDFormatConfig)
    fmt = MDCTPSDFormat(MDCTPSDFormatConfig(p2m_use_midside_transform=True))
    m = jnp.asarray(rng.standard_normal((1, 256, 64, 2)).astype(np.float32))
    p2m = fmt.mdct_to_p2m(m)
    assert p2m.shape[-1] == 2 * fmt.config.p2m_num_frequencies
    back = fmt.p2m_to_mdct(p2m)
    # lapped 2D transform with sin window reconstructs (interior)
    a = np.asarray(m)[:, 16:-16, 4:-4]
    b = np.asarray(back)[:, 16:240, 4:back.shape[2]-4]
    n_h = min(a.shape[1], b.shape[1]); n_w = min(a.shape[2], b.shape[2])
    np.testing.assert_allclose(b[:, :n_h, :n_w], a[:, :n_h, :n_w], atol=1e-3)
