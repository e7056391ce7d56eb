"""Config-driven DAE round-trip quality harness (reference:
src/tests/dae.py — encode/decode dataset samples through a trained DAE,
print metrics, write audio + latent visualizations).

Usage: python scripts/dae_test.py --model_path <dir> [--audio in.wav]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--audio", default=None, help="input wav (default: synth)")
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--output_path", default="dae_test_out")
    ap.add_argument("--device", default="cpu", choices=["cpu", "default"])
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from dualdiffusion_tpu.models.dae import DAE, top_pca_components
    from dualdiffusion_tpu.pipelines import Pipeline
    from dualdiffusion_tpu.utils.utils import (load_audio, save_audio,
                                               save_img, tensor_to_img)

    pipe = Pipeline.from_pretrained(args.model_path)
    fmt = pipe.format
    dae_h = pipe.modules["dae"]
    sr = fmt.config.sample_rate

    if args.audio:
        audio = load_audio(args.audio)[None]
    else:
        t = np.arange(int(args.seconds * sr)) / sr
        sig = sum(0.12 * np.sin(2 * np.pi * f * t)
                  for f in (147.0, 220.0, 440.0, 1760.0))
        audio = np.stack([sig, np.roll(sig, 200)]).astype(np.float32)[None]

    out = Path(args.output_path)
    out.mkdir(parents=True, exist_ok=True)
    x = jnp.asarray(audio)
    mel = fmt.raw_to_mel_spec(x)
    ds = dae_h.module.downsample_ratio
    mel = mel[:, :, : mel.shape[2] // ds * ds]

    @jax.jit
    def roundtrip(v, m):
        lat = dae_h.module.apply(v, m, method=DAE.encode)
        rec = dae_h.module.apply(v, lat, method=DAE.decode)
        return lat, rec

    latents, recon = roundtrip(dae_h.variables, mel)
    mse = float(jnp.mean((recon - mel) ** 2))
    scale = float(jnp.mean(mel ** 2))
    print(f"mel {tuple(mel.shape)} -> latents {tuple(latents.shape)}")
    print(f"relative mel recon MSE: {mse / scale:.5f}")
    print(f"latent stats: mean {float(latents.mean()):+.4f} "
          f"std {float(latents.std()):.4f}")

    wav = np.asarray(fmt.sample_to_raw(recon.astype(jnp.float32))
                     if hasattr(fmt, "sample_to_raw") else recon)
    save_audio(np.asarray(audio[0]), sr, out / "input.wav")
    if wav.ndim == 3:
        save_audio(wav[0, :, :audio.shape[-1]], sr, out / "recon.wav")
    save_img(tensor_to_img(np.asarray(mel[0])), out / "mel.png")
    save_img(tensor_to_img(np.asarray(recon[0])), out / "mel_recon.png")
    pca = top_pca_components(latents, n_pca=3)
    save_img(tensor_to_img(np.asarray(pca[0])), out / "latents_pca.png")
    print(f"wrote {out}/: input.wav recon.wav mel.png mel_recon.png latents_pca.png")


if __name__ == "__main__":
    main()
