"""End-to-end train.py CLI dryrun: a dp x tp (4x2) mesh built from the
train-config file alone, with a bf16-stored EMA profile and a
host-offloaded (cpu_offload) EMA profile — the production-trainer wiring
of tensor parallelism + the EMA memory options (reference analogs:
accelerate launch src/train.py + src/training/ema.py:196,257-270)."""

import importlib.util
import json
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from test_pipeline import make_pipeline
from dualdiffusion_tpu.utils import save_safetensors


def _make_dataset(root: Path, n: int = 8, emb_dim: int = 16) -> None:
    lat_dir = root / "latents"
    lat_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    recs = []
    for i in range(n):
        lat = rng.standard_normal((2, 4, 8, 32)).astype(np.float16)
        emb = rng.standard_normal((5, emb_dim)).astype(np.float32)
        p = lat_dir / f"x{i}.safetensors"
        save_safetensors({"latents": lat, "clap_audio_embeddings": emb}, p)
        recs.append({"file_name": f"x{i}.wav", "sample_rate": 32000,
                     "sample_length": 999999, "post_norm_lufs": -20.0,
                     "latents_file_name": str(p), "latents_length": 32,
                     "latents_num_variations": 2,
                     "latents_has_audio_embeddings": True,
                     "latents_has_text_embeddings": False})
    (root / "train.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs))


def _run_train_cli(argv):
    spec = importlib.util.spec_from_file_location(
        "train_cli", Path(__file__).parents[1] / "train.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old_argv = sys.argv
    sys.argv = argv
    try:
        mod.main()
    finally:
        sys.argv = old_argv


@pytest.mark.slow
def test_train_cli_host_ema_matches_in_graph(tmp_path):
    """Two classic beta-EMA profiles with the SAME beta — one in-graph,
    one cpu_offload — must track each other bit-for-bit-ish (fp32 numpy vs
    fp32 jnp) through the production trainer, including the first step:
    both are seeded from the pre-training params, so neither skips a lerp
    (reference: ema.py:257-270 non-blocking CPU-offload copies)."""
    model_dir = tmp_path / "model"
    make_pipeline(jax.random.PRNGKey(0)).save_pretrained(model_dir)
    data_dir = tmp_path / "data"
    _make_dataset(data_dir)

    conf = {
        "module_trainer": "unet",
        "module_name": "unet",
        "device_batch_size": 1,   # 8 virtual devices -> global batch 8
        "gradient_accumulation_steps": 1,
        "min_checkpoint_time": 10 ** 9,
        "dataloader": {"load_datatypes": ["latents", "audio_embeddings"],
                       "latents_crop_width": 16},
        # a LOW beta so a skipped first lerp would leave a large offset
        "emas": {"dev": {"beta": 0.5},
                 "host": {"beta": 0.5, "cpu_offload": True}},
    }
    cpath = tmp_path / "unet_train.json"
    cpath.write_text(json.dumps(conf))
    _run_train_cli(["train.py", "--model_path", str(model_dir),
                    "--train_config_path", str(cpath),
                    "--dataset_path", str(data_dir),
                    "--max_steps", "3"])
    ckpt = sorted(model_dir.glob("unet_checkpoint-*"))[-1]
    from dualdiffusion_tpu.utils import load_safetensors
    dev = load_safetensors(ckpt / "unet" / "ema_dev.safetensors")
    host = load_safetensors(ckpt / "unet" / "ema_host.safetensors")
    assert set(dev) == set(host)
    for k in dev:
        np.testing.assert_allclose(np.asarray(host[k], np.float32),
                                   np.asarray(dev[k], np.float32),
                                   atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_train_cli_dp_tp_step(tmp_path):
    model_dir = tmp_path / "model"
    make_pipeline(jax.random.PRNGKey(0)).save_pretrained(model_dir)
    data_dir = tmp_path / "data"
    _make_dataset(data_dir)

    conf = {
        "module_trainer": "unet",
        "module_name": "unet",
        "device_batch_size": 1,
        "gradient_accumulation_steps": 1,
        "min_checkpoint_time": 10 ** 9,
        "parallel": {"model_axis": 2},       # -> (data=4, model=2) mesh
        "dataloader": {"load_datatypes": ["latents", "audio_embeddings"],
                       "latents_crop_width": 16},
        "emas": {"fast": {"std": 0.05, "store_dtype": "bfloat16"},
                 "slow": {"std": 0.1, "cpu_offload": True}},
    }
    cpath = tmp_path / "unet_train.json"
    cpath.write_text(json.dumps(conf))

    _run_train_cli(["train.py", "--model_path", str(model_dir),
                    "--train_config_path", str(cpath),
                    "--dataset_path", str(data_dir),
                    "--max_steps", "2"])

    ckpts = sorted(model_dir.glob("unet_checkpoint-*"))
    assert ckpts, "no checkpoint written"
    ckpt = ckpts[-1]
    # exported module + both EMA profiles (device bf16 + host-offloaded)
    assert (ckpt / "unet" / "unet.safetensors").is_file()
    assert (ckpt / "unet" / "ema_fast.safetensors").is_file()
    assert (ckpt / "unet" / "ema_slow.safetensors").is_file()
    from dualdiffusion_tpu.utils import load_safetensors
    fast = load_safetensors(ckpt / "unet" / "ema_fast.safetensors")
    slow = load_safetensors(ckpt / "unet" / "ema_slow.safetensors")
    for v in fast.values():
        assert np.isfinite(np.asarray(v, np.float32)).all()
    for v in slow.values():
        assert v.dtype == np.float32
        assert np.isfinite(v).all()

    # resume under tensor parallelism: orbax must restore into the
    # TP-sharded train state (train.py shards BEFORE load_checkpoint) and
    # both EMA profiles (device bf16 + host-offloaded) must survive
    _run_train_cli(["train.py", "--model_path", str(model_dir),
                    "--train_config_path", str(cpath),
                    "--dataset_path", str(data_dir),
                    "--resume", "--max_steps", "4"])
    ckpts = sorted(model_dir.glob("unet_checkpoint-*"),
                   key=lambda p: int(p.name.rsplit("-", 1)[1]))
    assert int(ckpts[-1].name.rsplit("-", 1)[1]) >= 4, ckpts
    fast2 = load_safetensors(ckpts[-1] / "unet" / "ema_fast.safetensors")
    slow2 = load_safetensors(ckpts[-1] / "unet" / "ema_slow.safetensors")
    # EMAs kept evolving after resume (not reset to the module weights)
    diff = sum(float(np.abs(np.asarray(fast2[k], np.float32)
                            - np.asarray(fast[k], np.float32)).max())
               for k in fast)
    assert diff > 0, "fast EMA did not advance across resume"
    for v in slow2.values():
        assert np.isfinite(v).all()
