"""Benchmark: the north-star workload (BASELINE.json) — generate a 45 s
32 kHz stereo clip end-to-end on one chip:

  100-step EDM latent sampling (CFG 1.5 + Heun => ~400 UNet forwards)
  -> DAE decode to the 256-bin mel spectrogram
  -> pseudoinverse mel unscale + 200-iteration FGLA phase reconstruction
  -> waveform.

Prints ONE json line:
  {"metric": "e2e_45s_clip_seconds", "value": <s>, "unit": "s",
   "vs_baseline": <10.0/value>}
vs_baseline >= 1.0 means the <10 s on-chip north-star target is met
(the reference publishes no numbers; 10 s is BASELINE.json's target).

Usage: python bench.py [--small] [--steps N] [--fgla N]
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="reduced size (CI/CPU)")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--fgla", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    # fastest MXU precision for the matmul-DFT stages (FGLA quality is
    # unaffected: spectral convergence err 0.0353 vs 0.0377 at highest)
    from dualdiffusion_tpu.ops import fft as _ddfft
    _ddfft.set_matmul_precision("default")

    from dualdiffusion_tpu.models.dae import DAE, DAEConfig
    from dualdiffusion_tpu.models.formats import (SpectrogramFormat,
                                                  SpectrogramFormatConfig)
    from dualdiffusion_tpu.models.unet import UNet, UNetConfig
    from dualdiffusion_tpu.sampling import SampleParams, edm_sample

    key = jax.random.PRNGKey(0)

    if args.small:
        mel_h, mel_w, ds = 64, 512, 4
        dae_cfg = DAEConfig(model_channels=16, channel_mult_enc=(1, 2, 4),
                            channel_mult_dec=(1, 2, 4),
                            num_enc_layers_per_block=1,
                            num_dec_layers_per_block=1, latent_channels=8)
        unet_cfg = UNetConfig(in_channels=8, out_channels=8, in_channels_emb=1024,
                              model_channels=16, channel_mult=(1, 2),
                              num_layers_per_block=1, channels_per_head=16,
                              logvar_channels=32)
        fmt_cfg = SpectrogramFormatConfig(window_duration_ms=40,
                                          padded_duration_ms=40,
                                          num_frequencies=mel_h,
                                          num_fgla_iters=args.fgla)
    else:
        # flagship: 45 s @ 32 kHz stereo, 256 mel x 8 ms hop (SURVEY §6)
        mel_h, mel_w, ds = 256, 5504, 8
        dae_cfg = DAEConfig(model_channels=64, channel_mult_enc=(1, 2, 4, 8),
                            channel_mult_dec=(1, 2, 4, 8),
                            num_enc_layers_per_block=2,
                            num_dec_layers_per_block=2, latent_channels=8)
        unet_cfg = UNetConfig(in_channels=8, out_channels=8, in_channels_emb=1024,
                              model_channels=64, channel_mult=(1, 2, 3, 4),
                              num_layers_per_block=2, attn_levels=(2, 3),
                              attn_axis="freq", logvar_channels=128)
        fmt_cfg = SpectrogramFormatConfig(num_fgla_iters=args.fgla,
                                          fgla_work_dtype="bfloat16")

    lat_h, lat_w = mel_h // ds, mel_w // ds
    fmt = SpectrogramFormat(fmt_cfg)

    log("initializing models...")
    dae = DAE(dae_cfg)
    dvars = dae.init(key, jnp.zeros((1, mel_h, mel_w // 8, 2)))
    unet = UNet(unet_cfg)
    emb_in = jax.random.normal(key, (1, 1024))
    uvars = unet.init(key, jnp.zeros((1, lat_h, lat_w, 8)), jnp.ones((1,)),
                      emb_in, method=UNet.init_all)
    uvars["params"]["core"]["out_gain"] = jnp.ones(())
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(uvars))
    log(f"unet params: {n_params/1e6:.1f}M; latents {lat_h}x{lat_w}; "
        f"mel {mel_h}x{mel_w}")

    emb_c = unet.apply(uvars, emb_in, jnp.ones((1,)), method=UNet.get_embeddings)
    emb_u = unet.apply(uvars, emb_in, jnp.zeros((1,)), method=UNet.get_embeddings)
    emb2 = jnp.concatenate([emb_c, emb_u], axis=0)

    sp = SampleParams(steps=args.steps, cfg_scale=1.5, use_heun=True)

    def denoise(x, sigma):
        return unet.apply(uvars, x, sigma, emb2)

    def generate(key):
        latents, _ = edm_sample(denoise, (1, lat_h, lat_w, 8), sp,
                                200.0, 0.03, 1.0, key, return_debug=False)
        mel = dae.apply(dvars, latents, method=DAE.decode)
        raw = fmt.sample_to_raw(mel.astype(jnp.float32))
        return raw

    jgen = jax.jit(generate)
    log("compiling end-to-end graph...")
    t0 = time.time()
    out = jax.block_until_ready(jgen(jax.random.PRNGKey(1)))
    compile_and_run = time.time() - t0
    log(f"first call (compile+run): {compile_and_run:.1f}s; out {out.shape}")

    t0 = time.time()
    out = jax.block_until_ready(jgen(jax.random.PRNGKey(2)))
    elapsed = time.time() - t0
    assert bool(jnp.isfinite(out).all()), "non-finite output"
    audio_seconds = out.shape[-1] / fmt_cfg.sample_rate
    log(f"steady-state e2e: {elapsed:.2f}s for {audio_seconds:.1f}s of audio "
        f"({audio_seconds/elapsed:.2f}x realtime)")

    print(json.dumps({
        "metric": "e2e_45s_clip_seconds",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(10.0 / elapsed, 3),
    }))


if __name__ == "__main__":
    main()
