import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dualdiffusion_tpu.models.dae import DAE, DAEConfig
from dualdiffusion_tpu.models.formats import SpectrogramFormatConfig
from dualdiffusion_tpu.models.unet import UNet, UNetConfig
from dualdiffusion_tpu.pipelines import (Pipeline, ModuleHandle,
                                         get_module_class, save_module,
                                         load_module)
from dualdiffusion_tpu.sampling import SampleParams


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def make_pipeline(key):
    ucfg = UNetConfig(in_channels=4, out_channels=4, in_channels_emb=16,
                      model_channels=8, channel_mult=(1, 2),
                      num_layers_per_block=1, channels_per_head=8,
                      logvar_channels=16)
    unet = UNet(ucfg)
    uvars = unet.init(key, jnp.zeros((1, 8, 16, 4)), jnp.ones((1,)),
                      jnp.zeros((1, 16)), method=UNet.init_all)

    dcfg = DAEConfig(model_channels=8, channel_mult_enc=(1, 2),
                     channel_mult_dec=(1, 2), num_enc_layers_per_block=1,
                     num_dec_layers_per_block=1, latent_channels=4,
                     in_channels=2, out_channels=2)
    dae = DAE(dcfg)
    dvars = dae.init(key, jnp.zeros((1, 16, 32, 2)))

    fcfg = SpectrogramFormatConfig(window_duration_ms=8, padded_duration_ms=8,
                                   num_frequencies=16, num_fgla_iters=4,
                                   step_size_ms=2)
    ffac, _ = get_module_class("format:spectrogram")
    fmt = ffac(fcfg)

    emb_table = {"gameA_audio": np.random.default_rng(0).standard_normal(16).astype(np.float32),
                 "_unconditional_audio": np.zeros(16, np.float32)}
    return Pipeline({
        "unet": ModuleHandle("unet", "unet", ucfg, unet, uvars),
        "dae": ModuleHandle("dae", "dae", dcfg, dae, dvars),
        "format": ModuleHandle("format", "format:spectrogram", fcfg, fmt, None),
    }, dataset_embeddings=emb_table)


@pytest.mark.slow
def test_save_load_roundtrip(tmp_path, key):
    pipe = make_pipeline(key)
    pipe.save_pretrained(tmp_path / "model")
    assert (tmp_path / "model" / "model_index.json").is_file()
    assert (tmp_path / "model" / "unet" / "unet.safetensors").is_file()

    loaded = Pipeline.from_pretrained(tmp_path / "model")
    assert set(loaded.modules) == {"unet", "dae", "format"}
    # weights identical
    a = jax.tree_util.tree_leaves(pipe.modules["unet"].variables)
    b = jax.tree_util.tree_leaves(loaded.modules["unet"].variables)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # format reconstructed with config
    assert loaded.format.config.num_frequencies == 16
    # dataset embeddings round-trip
    assert "gameA_audio" in loaded.dataset_embeddings


def test_ema_inventory_and_load(tmp_path, key):
    pipe = make_pipeline(key)
    pipe.save_pretrained(tmp_path / "m")
    # write an EMA file: scaled copy of weights
    from dualdiffusion_tpu.pipelines.pipeline import _flatten
    from dualdiffusion_tpu.utils import save_safetensors
    flat = _flatten(pipe.modules["unet"].variables)
    save_safetensors({k: v * 0.5 for k, v in flat.items()},
                     tmp_path / "m" / "unet" / "ema_std0.05.safetensors")
    assert Pipeline.get_available_emas(tmp_path / "m", "unet") == ["std0.05"]
    loaded = Pipeline.from_pretrained(tmp_path / "m",
                                      load_emas={"unet": "std0.05"})
    l0 = jax.tree_util.tree_leaves(loaded.modules["unet"].variables)[0]
    p0 = jax.tree_util.tree_leaves(pipe.modules["unet"].variables)[0]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(p0) * 0.5, rtol=1e-6)


def test_checkpoint_discovery(tmp_path, key):
    pipe = make_pipeline(key)
    pipe.save_pretrained(tmp_path / "m")
    for step in (100, 500, 250):
        d = tmp_path / "m" / f"unet_checkpoint-{step}"
        save_module(d, "unet", "unet", pipe.modules["unet"].config,
                    pipe.modules["unet"].variables, step)
    latest = Pipeline.get_latest_checkpoint(tmp_path / "m", "unet")
    assert latest.name == "unet_checkpoint-500"
    loaded = Pipeline.from_pretrained(tmp_path / "m", load_checkpoints=True)
    assert loaded.modules["unet"].variables is not None


def test_per_module_checkpoint_selection(tmp_path, key):
    """from_pretrained(load_checkpoints={module: selection}) loads one
    specific checkpoint per module (the model explorer's picker; reference
    UI: nicegui_app.py:84-221). Selections: step number, directory name,
    'latest', 'root'."""
    import pytest as _pytest
    pipe = make_pipeline(key)
    pipe.save_pretrained(tmp_path / "m")
    root0 = np.asarray(
        jax.tree_util.tree_leaves(pipe.modules["unet"].variables)[0])
    for step, scale in ((100, 2.0), (500, 3.0)):
        d = tmp_path / "m" / f"unet_checkpoint-{step}"
        scaled = jax.tree_util.tree_map(
            lambda v: v * scale, pipe.modules["unet"].variables)
        save_module(d, "unet", "unet", pipe.modules["unet"].config,
                    scaled, step)

    def leaf0(sel):
        loaded = Pipeline.from_pretrained(tmp_path / "m",
                                          load_checkpoints={"unet": sel})
        return np.asarray(
            jax.tree_util.tree_leaves(loaded.modules["unet"].variables)[0])

    np.testing.assert_allclose(leaf0(100), root0 * 2.0, rtol=1e-6)
    np.testing.assert_allclose(leaf0("unet_checkpoint-100"), root0 * 2.0,
                               rtol=1e-6)
    np.testing.assert_allclose(leaf0("latest"), root0 * 3.0, rtol=1e-6)
    np.testing.assert_allclose(leaf0("root"), root0, rtol=0, atol=0)
    # unlisted modules load from the model root
    np.testing.assert_allclose(
        leaf0("latest"), root0 * 3.0, rtol=1e-6)
    with _pytest.raises(FileNotFoundError):
        Pipeline.from_pretrained(tmp_path / "m",
                                 load_checkpoints={"unet": 999})


def test_prompt_embedding(key):
    pipe = make_pipeline(key)
    e = pipe.get_prompt_embedding({"gameA": 1.0})
    assert e.shape == (1, 16)
    # falls back to unconditional for unknown prompt
    e2 = pipe.get_prompt_embedding({})
    assert e2 is not None


@pytest.mark.slow
def test_generate_end_to_end(key):
    pipe = make_pipeline(key)
    params = SampleParams(steps=2, use_heun=False, cfg_scale=1.5,
                          length=4096, batch_size=1, num_fgla_iters=2)
    emb = pipe.get_prompt_embedding({"gameA": 1.0})
    out = pipe.generate(params, key, prompt_embedding=emb)
    assert out["raw"].ndim == 3 and out["raw"].shape[1] == 2
    assert bool(jnp.isfinite(out["raw"]).all())
    assert out["latents"] is not None


def test_unknown_module_type():
    with pytest.raises(KeyError):
        get_module_class("bogus_type")


@pytest.mark.slow
def test_generate_img2img_from_audio(key):
    pipe = make_pipeline(key)
    params = SampleParams(steps=2, use_heun=False, cfg_scale=1.0,
                          length=4096, num_fgla_iters=2,
                          img2img_strength=0.5)
    audio = np.random.default_rng(0).standard_normal((2, 4096)).astype(np.float32)
    out = pipe.generate(params, key, input_audio=audio)
    assert np.isfinite(np.asarray(out["raw"])).all()
    # strength 0.5 over 2 steps -> 1 sampler step recorded
    assert out["debug"]["sample_std"].shape[0] == 1


@pytest.mark.slow
def test_generate_inpainting_substitutes_converted_unet(tmp_path, key):
    """Inpainting builds ref+mask channels and auto-substitutes the
    converted unet_inpainting module (which expects the extra in-channels —
    the plain unet would fail on them)."""
    from dualdiffusion_tpu.models.convert import convert_unet_to_inpainting
    pipe = make_pipeline(key)
    pipe.save_pretrained(tmp_path / "m")
    convert_unet_to_inpainting(tmp_path / "m")
    loaded = Pipeline.from_pretrained(tmp_path / "m")
    assert "unet_inpainting" in loaded.modules

    params = SampleParams(steps=2, use_heun=False, cfg_scale=1.0,
                          length=4096, num_fgla_iters=2)
    audio = np.random.default_rng(1).standard_normal((2, 4096)).astype(np.float32)
    mask = np.ones((1, 1, 1, 1), np.float32)  # broadcast: regenerate all
    out = loaded.generate(params, key, input_audio=audio,
                          inpainting_mask=mask)
    assert np.isfinite(np.asarray(out["raw"])).all()
    # inpainting forces the full schedule regardless of img2img_strength
    assert out["debug"]["sample_std"].shape[0] == params.steps


def test_ddec_width_alignment():
    from dualdiffusion_tpu.models.formats.ms_mdct_dual import (
        MSMDCTDualFormat, MSMDCTDualFormatConfig)
    fmt = MSMDCTDualFormat(MSMDCTDualFormatConfig())
    mel_shape = fmt.get_mel_spec_shape(1, 65536)
    mdct = fmt.get_mdct_shape_for_mel_frames(1, mel_shape[2])
    assert mdct[2] == mel_shape[2]
    # and the raw-length-derived grid agrees frame-for-frame
    assert fmt.get_mdct_shape(1, 65536)[2] == mel_shape[2]


@pytest.mark.slow
def test_per_module_device_placement(key):
    """Pipeline.to commits each module's params to its mapped device and
    generate still runs with a heterogeneous map (virtual 8-CPU mesh)."""
    pipe = make_pipeline(key)
    devs = jax.devices()
    assert len(devs) >= 2, "conftest provides 8 virtual CPU devices"
    pipe.to(device="cpu:0", device_map={"unet": "cpu:1"})
    unet_leaf = jax.tree_util.tree_leaves(pipe.modules["unet"].variables)[0]
    dae_leaf = jax.tree_util.tree_leaves(pipe.modules["dae"].variables)[0]
    assert unet_leaf.devices() == {devs[1]}
    assert dae_leaf.devices() == {devs[0]}
    assert pipe.modules["unet"].device == devs[1]
    params = SampleParams(steps=1, use_heun=False, cfg_scale=1.0,
                          length=4096, batch_size=1, num_fgla_iters=1)
    out = pipe.generate(params, key)
    assert bool(jnp.isfinite(out["raw"]).all())


@pytest.mark.slow
def test_generate_tensor_parallel_matches_single(key):
    """Pipeline.shard(2): the whole generate() path (sampler -> DAE
    decode -> FGLA) with tensor-parallel weights reproduces the
    single-placement run."""
    params = SampleParams(steps=2, use_heun=False, cfg_scale=1.5,
                          length=4096, batch_size=1, num_fgla_iters=2,
                          seed=11)
    outs = {}
    for tp in (1, 2):
        pipe = make_pipeline(key)
        if tp > 1:
            pipe.shard(tp)
            assert pipe.mesh is not None
        emb = pipe.get_prompt_embedding({"gameA": 1.0})
        outs[tp] = np.asarray(
            pipe.generate(params, key, prompt_embedding=emb)["raw"])
    assert np.isfinite(outs[2]).all()
    # f32 reduction-order drift between the sharded and single compilations
    # is amplified by the FGLA phase iterations; 5e-4 bounds it with margin
    # (observed ~2.5e-4 worst-case after the serving-path jit wrappers
    # changed fusion boundaries)
    np.testing.assert_allclose(outs[2], outs[1], rtol=5e-4, atol=5e-4)
