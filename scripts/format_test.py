"""Config-driven format invertibility harness (the reference's manual test
style, e.g. its ms_mdct_dual_2 self-test: encode a reference clip, write the
spectrogram image + reconstructed audio for listening; reference:
src/modules/formats/ms_mdct_dual_2.py:308-381, src/tests/*).

Usage: python scripts/format_test.py [--config configs/tests/format_test.json]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/tests/format_test.json")
    ap.add_argument("--device", default="cpu", choices=["cpu", "default"])
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from dualdiffusion_tpu.models.formats import get_format_class
    from dualdiffusion_tpu.utils import load_json
    from dualdiffusion_tpu.utils.utils import (load_audio, save_audio,
                                               tensor_to_img, save_img)

    cfg = load_json(args.config)
    fmt_cls, fmt_cfg_cls = get_format_class(cfg["format"])
    fmt = fmt_cls(fmt_cfg_cls(**cfg.get("format_config", {})))
    sr = fmt.config.sample_rate

    if cfg.get("audio_path"):
        audio = load_audio(cfg["audio_path"])[None]
    else:  # synthesized tone stack + noise burst (deterministic)
        t = np.arange(int(cfg.get("audio_seconds", 4.0) * sr)) / sr
        sig = sum(0.12 * np.sin(2 * np.pi * f * t)
                  for f in (110.0, 220.0, 330.0, 441.0, 880.0))
        sig = sig + 0.02 * np.random.default_rng(0).standard_normal(t.shape)
        audio = np.stack([sig, np.roll(sig, 160)]).astype(np.float32)[None]

    out = Path(cfg.get("output_path", "format_test_out"))
    out.mkdir(parents=True, exist_ok=True)

    x = jnp.asarray(audio)
    sample = fmt.raw_to_sample(x)
    recon = np.asarray(fmt.sample_to_raw(sample))
    print(f"sample shape {tuple(sample.shape)}  recon shape {recon.shape}")

    sample2 = fmt.raw_to_sample(jnp.asarray(recon[..., :audio.shape[-1]]))
    n = min(sample.shape[2], sample2.shape[2])
    mse = float(jnp.mean((sample[:, :, :n] - sample2[:, :, :n]) ** 2))
    scale = float(jnp.mean(sample ** 2))
    print(f"relative mel-domain MSE after roundtrip: {mse / scale:.5f}")

    save_audio(np.asarray(x[0]), sr, out / "input.wav")
    save_audio(recon[0, :, :audio.shape[-1]], sr, out / "recon.wav")
    save_img(tensor_to_img(np.asarray(sample[0])), out / "sample.png")
    print(f"wrote {out}/input.wav recon.wav sample.png")


if __name__ == "__main__":
    main()
