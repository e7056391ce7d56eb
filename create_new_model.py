"""Model factory CLI.

Usage parity with the reference (reference: src/create_new_model.py:64-154):
reads a model config directory ``configs/models/<name>/`` containing
``model_index.json`` ({"modules": {name: type}}) and one ``<name>.json`` per
module, instantiates every module with seeded init, prints per-module
parameter breakdowns, writes the pipeline model directory to
``$MODELS_PATH/<name>`` (or --output_path), and emits per-module train
shell scripts.
"""

import argparse
import logging
import stat
import sys
from pathlib import Path

logging.basicConfig(level=logging.INFO, format="%(message)s")
logger = logging.getLogger("create_new_model")


def init_module(module_type: str, config, key):
    """Instantiate + init a registered module; returns (module, variables)."""
    import jax
    import jax.numpy as jnp
    from dualdiffusion_tpu.pipelines import get_module_class

    factory, _ = get_module_class(module_type)
    module = factory(config)
    if module_type.startswith("format:"):
        return module, None
    if module_type in ("unet", "ddec"):
        from dualdiffusion_tpu.models.unet import UNet
        lead = (1, 2) if config.use_3d else (1,)
        h = max(config.in_num_freqs // 8, 2 ** (len(config.channel_mult) - 1))
        x = jnp.zeros(lead + (h, 2 ** (len(config.channel_mult) - 1) * 4,
                              config.in_channels))
        emb = jnp.zeros((1, config.in_channels_emb)) if config.in_channels_emb else None
        # the PSD ref must shrink by the same factor as the dummy input so
        # the in_psd_freqs // in_num_freqs channel-fold ratio stays intact
        ref = (jnp.zeros((1, config.in_psd_freqs * h // config.in_num_freqs,
                          x.shape[-2], config.in_channels))
               if config.in_psd_freqs else None)
        # jit the whole init: eager flax init dispatches one op at a time,
        # which is pathological on a remote-tunneled TPU at large widths
        variables = jax.jit(lambda k: module.init(
            k, x, jnp.ones((1,)), emb, ref, method=UNet.init_all))(key)
    elif module_type == "dae":
        ds = 2 ** (len(config.channel_mult_dec) - 1)
        x = jnp.zeros((1, max(config.in_num_freqs, ds), ds * 4, config.in_channels))
        variables = jax.jit(module.init)(key, x)
    else:
        raise ValueError(f"don't know how to init module type '{module_type}'")
    from dualdiffusion_tpu.training.optim import normalize_mp_weights
    variables = normalize_mp_weights(variables)
    return module, variables


def print_module_info(name: str, variables) -> int:
    import jax
    import numpy as np
    if variables is None:
        logger.info("  %s: (no parameters)", name)
        return 0
    total = 0
    emb_total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        n = int(np.prod(leaf.shape))
        total += n
        if any("emb" in str(getattr(k, "key", "")) for k in path):
            emb_total += n
    logger.info("  %s: %.2fM params (%.2fM emb)", name, total / 1e6, emb_total / 1e6)
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True, help="model name (config dir)")
    ap.add_argument("--config_path", default="configs/models")
    ap.add_argument("--output_path", default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--device", default="cpu", choices=["cpu", "default"],
                    help="init device; cpu avoids TPU compile for weight init")
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from dualdiffusion_tpu.pipelines import Pipeline, ModuleHandle, get_module_class
    from dualdiffusion_tpu.utils import MODELS_PATH, load_json, config_from_dict

    cfg_dir = Path(args.config_path) / args.name
    index = load_json(cfg_dir / "model_index.json")
    out_dir = Path(args.output_path or MODELS_PATH or "models") / args.name
    if out_dir.exists():
        logger.error("output dir %s already exists; refusing to overwrite", out_dir)
        sys.exit(1)

    key = jax.random.PRNGKey(args.seed)
    modules = {}
    logger.info("creating model '%s':", args.name)
    total = 0
    for mod_name, mod_type in index["modules"].items():
        _, cfg_cls = get_module_class(mod_type)
        config = config_from_dict(cfg_cls, load_json(cfg_dir / f"{mod_name}.json"))
        key, sub = jax.random.split(key)
        module, variables = init_module(mod_type, config, sub)
        total += print_module_info(mod_name, variables)
        modules[mod_name] = ModuleHandle(mod_name, mod_type, config, module,
                                         variables)
    logger.info("total: %.2fM params", total / 1e6)

    Pipeline(modules).save_pretrained(out_dir)
    logger.info("saved to %s", out_dir)

    # emit per-module train scripts (reference :128-154)
    for mod_name, mod_type in index["modules"].items():
        if mod_type.startswith("format:"):
            continue
        train_cfg = cfg_dir / f"{mod_name}_train.json"
        script = out_dir / f"train_{mod_name}.sh"
        script.write_text(
            "#!/bin/sh\n"
            f"python {Path(__file__).resolve().parent / 'train.py'} \\\n"
            f"  --model_path {out_dir} \\\n"
            f"  --train_config_path {train_cfg.resolve()} \"$@\"\n")
        script.chmod(script.stat().st_mode | stat.S_IEXEC)
        logger.info("wrote %s", script)


if __name__ == "__main__":
    main()
