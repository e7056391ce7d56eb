"""Config-driven end-to-end UNet sampling harness.

The reference's `src/tests/unet.py:47-110` workflow: load a model,
generate a batch of clips (optionally prompt-conditioned), print latent
statistics + timings, and write audio + spectrogram + latent-PCA images
under `<model>/output/step_<N>/`. Artifacts carry the sampler params in a
sidecar json for listening comparisons across checkpoints.

Usage: python scripts/unet_test.py --model_path <dir>
       [--config configs/tests/unet_test.json] [--device cpu|default]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--config", default="configs/tests/unet_test.json")
    ap.add_argument("--device", default="cpu", choices=["cpu", "default"])
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from dualdiffusion_tpu.models.dae import top_pca_components
    from dualdiffusion_tpu.pipelines import Pipeline
    from dualdiffusion_tpu.sampling import SampleParams
    from dualdiffusion_tpu.utils import load_json
    from dualdiffusion_tpu.utils.utils import (normalize_lufs, save_audio,
                                               save_img, tensor_to_img)

    cfg = load_json(args.config) if Path(args.config).is_file() else {}
    pipe = Pipeline.from_pretrained(args.model_path,
                                    **cfg.get("model_load_options", {}))
    sr = pipe.format.config.sample_rate
    step = 0
    unet_json = Path(args.model_path) / "unet" / "unet.json"
    if unet_json.is_file():
        step = load_json(unet_json).get("__last_global_step__", 0)
    out_dir = Path(args.model_path) / "output" / f"step_{step}"
    out_dir.mkdir(parents=True, exist_ok=True)

    params = SampleParams(**cfg.get("unet_params", {}))
    seeds = cfg.get("seeds") or [params.seed or 4000]
    prompts = cfg.get("prompts") or [None]
    decode_mode = cfg.get("decode_mode", "auto")
    output_lufs = cfg.get("output_lufs", -20.0)

    lat_means, lat_stds = [], []
    for prompt in prompts:
        emb = pipe.get_prompt_embedding(prompt) if prompt else None
        for seed in seeds:
            t0 = time.time()
            res = pipe.generate(params, jax.random.PRNGKey(int(seed)),
                                prompt_embedding=emb,
                                decode_mode=decode_mode)
            raw = np.asarray(res["raw"])
            dt = time.time() - t0
            lat = res["latents"]
            lat_means.append(float(jnp.mean(lat)))
            lat_stds.append(float(jnp.std(lat)))
            tag = f"s{seed}" + (f"_{'_'.join(prompt)}" if prompt else "")
            tag = "".join(c if c.isalnum() or c in "._-" else "_"
                          for c in tag)[:80]
            audio = np.asarray(normalize_lufs(raw[0], sr, output_lufs))
            save_audio(audio, sr, out_dir / f"{tag}.flac")
            save_img(tensor_to_img(np.asarray(res["sample"][0])),
                     out_dir / f"{tag}_mel.png")
            save_img(tensor_to_img(np.asarray(
                top_pca_components(lat, n_pca=3)[0])),
                out_dir / f"{tag}_latents.png")
            with open(out_dir / f"{tag}.json", "w") as f:
                json.dump({"seed": int(seed), "prompt": prompt,
                           "decode_mode": decode_mode,
                           "seconds": round(dt, 2),
                           "latents_mean": lat_means[-1],
                           "latents_std": lat_stds[-1],
                           "params": {k: v for k, v in params.__dict__.items()
                                      if not k.startswith("_")}}, f,
                          indent=2, default=str)
            print(f"{tag}: {dt:.1f}s latents mean {lat_means[-1]:+.4f} "
                  f"std {lat_stds[-1]:.4f} -> {out_dir / tag}.flac")

    print(f"avg latents mean {np.mean(lat_means):+.4f} "
          f"std {np.mean(lat_stds):.4f}; wrote {out_dir}/")


if __name__ == "__main__":
    main()
