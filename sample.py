"""Sampling entry point.

Usage parity with the reference (reference: src/sample.py:34-67), plus the
batch mode the reference left as TODO:

  python sample.py --model_path <dir> [--interactive] \
      [--prompt game:1.0 ...] [--steps 100] [--seed N] [--output out.flac]

--interactive launches the web UI (model-server process + browser UI);
otherwise one batch of audio is generated and written to --output.
"""

import argparse
import logging
import sys

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(message)s")
logger = logging.getLogger("sample")


def parse_prompt(items):
    prompt = {}
    for it in items or []:
        if ":" in it:
            name, _, w = it.rpartition(":")
            prompt[name] = float(w)
        else:
            prompt[it] = 1.0
    return prompt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--interactive", action="store_true")
    ap.add_argument("--prompt", nargs="*", default=None,
                    help="label:weight entries")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--cfg_scale", type=float, default=1.5)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--length", type=int, default=None)
    # production default: spsi@100 beats flat@200 on mel-inverted
    # magnitudes at the same wall clock (BASELINE.md r4; VERDICT r4 #6)
    ap.add_argument("--num_fgla_iters", type=int, default=100)
    ap.add_argument("--fgla_phase_init", default="spsi",
                    choices=["spsi", "flat"])
    ap.add_argument("--seamless_loop", action="store_true")
    ap.add_argument("--use_heun", action="store_true", default=True)
    ap.add_argument("--decode_mode", default="auto",
                    choices=["auto", "fgla", "ddec"])
    ap.add_argument("--load_ema", default=None,
                    help="EMA name to load for the unet (e.g. std0.05)")
    ap.add_argument("--img2img", default=None, metavar="AUDIO",
                    help="input audio file for img2img generation")
    ap.add_argument("--img2img_strength", type=float, default=0.5,
                    help="0 = return input, 1 = full generation")
    ap.add_argument("--inpaint", default=None, metavar="START:END",
                    help="regenerate only this time range (seconds) of the "
                         "--img2img input, e.g. --inpaint 10:20")
    ap.add_argument("--output", default="output.wav")
    ap.add_argument("--tp", type=int, default=1, metavar="N",
                    help="tensor-parallel width: shard module weights over "
                         "an N-wide mesh axis (multi-chip serving)")
    args = ap.parse_args()

    if args.interactive:
        from dualdiffusion_tpu.serving.webui import run_app
        run_app(args.model_path)
        return

    import jax
    import numpy as np

    from dualdiffusion_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    from dualdiffusion_tpu.pipelines import Pipeline
    from dualdiffusion_tpu.sampling import SampleParams
    from dualdiffusion_tpu.utils import save_audio

    load_emas = {"unet": args.load_ema} if args.load_ema else None
    pipeline = Pipeline.from_pretrained(args.model_path, load_emas=load_emas)
    if args.tp > 1:
        pipeline.shard(args.tp)
    seed = args.seed if args.seed is not None else int(np.random.randint(100000, 999999))
    params = SampleParams(steps=args.steps, cfg_scale=args.cfg_scale,
                          seed=seed, batch_size=args.batch_size,
                          length=args.length, use_heun=args.use_heun,
                          seamless_loop=args.seamless_loop,
                          num_fgla_iters=args.num_fgla_iters,
                          fgla_phase_init=args.fgla_phase_init,
                          img2img_strength=args.img2img_strength,
                          prompt=parse_prompt(args.prompt))
    emb = pipeline.get_prompt_embedding(params.prompt)

    input_audio = None
    inpainting_mask = None
    if args.img2img:
        from dualdiffusion_tpu.utils import load_audio
        sr, input_audio = load_audio(args.img2img, return_sample_rate=True)
        assert sr == pipeline.format.config.sample_rate, (
            f"input sample rate {sr} != model rate "
            f"{pipeline.format.config.sample_rate}")
        if args.inpaint:
            # build a latent-space time mask: 1 = regenerate, 0 = keep
            start_s, _, end_s = args.inpaint.partition(":")
            fmt = pipeline.format
            mel_shape = fmt.get_sample_shape(1, params.length)
            ds = (pipeline.modules["dae"].module.downsample_ratio
                  if "dae" in pipeline.modules else 1)
            lat_w = mel_shape[2] // ds * ds // ds if ds > 1 else mel_shape[2]
            hop_s = getattr(fmt.config, "ms_hop_length",
                            getattr(fmt.config, "hop_length", 256)) * ds
            mask = np.zeros((1, 1, lat_w, 1), np.float32)
            c0 = int(float(start_s) * sr / hop_s)
            c1 = int(float(end_s) * sr / hop_s)
            mask[:, :, max(c0, 0):min(c1, lat_w)] = 1.0
            inpainting_mask = mask

    logger.info("sampling %d steps (seed %d, cfg %.2f, prompt %s)",
                params.steps, seed, params.cfg_scale, params.prompt)
    out = pipeline.generate(params, jax.random.PRNGKey(seed),
                            prompt_embedding=emb, decode_mode=args.decode_mode,
                            input_audio=input_audio,
                            inpainting_mask=inpainting_mask)
    raw = np.asarray(out["raw"])
    sr = pipeline.format.config.sample_rate
    for i in range(raw.shape[0]):
        path = args.output if raw.shape[0] == 1 else \
            args.output.replace(".", f"_{i}.", 1)
        save_audio(raw[i], sr, path, target_lufs=-20.0)
        logger.info("wrote %s (%.1fs audio)", path, raw.shape[-1] / sr)


if __name__ == "__main__":
    main()
