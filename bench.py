"""Benchmark: the north-star workload (BASELINE.json) — generate a 45 s
32 kHz stereo clip end-to-end on one chip:

  100-step EDM latent sampling (CFG 1.5 + Heun => ~400 UNet forwards)
  -> DAE decode to the 256-bin mel spectrogram
  -> pseudoinverse mel unscale + 200-iteration FGLA phase reconstruction
     (or, with --ddec, the DDEC diffusion decoder on the MDCT grid)
  -> waveform.

Two model scales:
  * flagship (default): 24.9M-param UNet, 8 latent channels.
  * ref-scale (--ref-scale, also measured by the default run): the
    reference's own default model
    (/root/reference/config/models/default/unet.json — 256 ch,
    mult [1..5], mlp x2 groups 8; 356M params, 4 latent channels).

Prints ONE json line:
  {"metric": "e2e_45s_clip_seconds", "value": <flagship s>, "unit": "s",
   "vs_baseline": <10.0/value>, "ref_scale_seconds": <s>, ...}
vs_baseline >= 1.0 means the <10 s on-chip north-star target is met
(the reference publishes no numbers; 10 s is BASELINE.json's target).

Usage: python bench.py [--small|--ref-scale|--flagship-only] [--ddec]
                       [--steps N] [--fgla N]
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_configs(name: str, args):
    from dualdiffusion_tpu.models.dae import DAEConfig
    from dualdiffusion_tpu.models.formats import SpectrogramFormatConfig
    from dualdiffusion_tpu.models.unet import UNetConfig

    if name == "small":
        mel_h, mel_w, ds = 64, 512, 4
        dae_cfg = DAEConfig(model_channels=16, channel_mult_enc=(1, 2, 4),
                            channel_mult_dec=(1, 2, 4),
                            num_enc_layers_per_block=1,
                            num_dec_layers_per_block=1, latent_channels=8)
        unet_cfg = UNetConfig(in_channels=8, out_channels=8,
                              in_channels_emb=1024,
                              model_channels=16, channel_mult=(1, 2),
                              num_layers_per_block=1, channels_per_head=16,
                              logvar_channels=32)
        fmt_cfg = SpectrogramFormatConfig(window_duration_ms=40,
                                          padded_duration_ms=40,
                                          num_frequencies=mel_h,
                                          num_fgla_iters=args.fgla)
    elif name == "ref_scale":
        # the reference's own default model scale
        # (/root/reference/config/models/default/unet.json: 256 ch,
        # mult [1,2,3,4,5], cph 64, 2 layers/block, attn (3,4),
        # mlp_multiplier 2 / mlp_groups 8, 4 latent channels)
        mel_h, mel_w, ds = 256, 5504, 8
        dae_cfg = DAEConfig(model_channels=64, channel_mult_enc=(1, 2, 4, 8),
                            channel_mult_dec=(1, 2, 4, 8),
                            num_enc_layers_per_block=2,
                            num_dec_layers_per_block=2, latent_channels=4)
        unet_cfg = UNetConfig(in_channels=4, out_channels=4,
                              in_channels_emb=1024,
                              model_channels=256, channel_mult=(1, 2, 3, 4, 5),
                              channel_mult_noise=1, channel_mult_emb=3,
                              channels_per_head=64, num_layers_per_block=2,
                              attn_levels=(3, 4), attn_axis="freq",
                              mlp_multiplier=2, mlp_groups=8,
                              logvar_channels=128)
        fmt_cfg = SpectrogramFormatConfig(num_fgla_iters=args.fgla,
                                          fgla_work_dtype="bfloat16")
    else:  # flagship: 45 s @ 32 kHz stereo, 256 mel x 8 ms hop (SURVEY §6)
        mel_h, mel_w, ds = 256, 5504, 8
        dae_cfg = DAEConfig(model_channels=64, channel_mult_enc=(1, 2, 4, 8),
                            channel_mult_dec=(1, 2, 4, 8),
                            num_enc_layers_per_block=2,
                            num_dec_layers_per_block=2, latent_channels=8)
        unet_cfg = UNetConfig(in_channels=8, out_channels=8,
                              in_channels_emb=1024,
                              model_channels=64, channel_mult=(1, 2, 3, 4),
                              num_layers_per_block=2, attn_levels=(2, 3),
                              attn_axis="freq", logvar_channels=128)
        fmt_cfg = SpectrogramFormatConfig(num_fgla_iters=args.fgla,
                                          fgla_work_dtype="bfloat16")
    return mel_h, mel_w, ds, dae_cfg, unet_cfg, fmt_cfg


def run_config(name: str, args):
    """Build the pipeline at one scale and time the jitted e2e generate.
    Returns (steady_seconds, audio_seconds)."""
    import jax
    import jax.numpy as jnp
    from dualdiffusion_tpu.models.dae import DAE
    from dualdiffusion_tpu.models.formats import SpectrogramFormat
    from dualdiffusion_tpu.models.unet import UNet, UNetConfig
    from dualdiffusion_tpu.sampling import SampleParams, edm_sample

    key = jax.random.PRNGKey(0)
    mel_h, mel_w, ds, dae_cfg, unet_cfg, fmt_cfg = build_configs(name, args)
    lat_h, lat_w = mel_h // ds, mel_w // ds
    lat_c = dae_cfg.latent_channels
    fmt = SpectrogramFormat(fmt_cfg)

    log(f"[{name}] initializing models...")
    dae = DAE(dae_cfg)
    unet = UNet(unet_cfg)
    emb_in = jax.random.normal(key, (1, 1024))
    # jitted init: eager flax init dispatches per-op (pathological on the
    # tunneled TPU at ref scale)
    dvars = jax.jit(dae.init)(key, jnp.zeros((1, mel_h, mel_w // 8, 2)))
    uvars = jax.jit(lambda k: unet.init(
        k, jnp.zeros((1, lat_h, lat_w, lat_c)), jnp.ones((1,)), emb_in,
        method=UNet.init_all))(key)
    uvars["params"]["core"]["out_gain"] = jnp.ones(())
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(uvars))
    log(f"[{name}] unet params: {n_params/1e6:.1f}M; latents {lat_h}x{lat_w}"
        f"x{lat_c}; mel {mel_h}x{mel_w}")

    emb_c = unet.apply(uvars, emb_in, jnp.ones((1,)),
                       method=UNet.get_embeddings)
    emb_u = unet.apply(uvars, emb_in, jnp.zeros((1,)),
                       method=UNet.get_embeddings)
    emb2 = jnp.concatenate([emb_c, emb_u], axis=0)

    sp = SampleParams(steps=args.steps, cfg_scale=1.5, use_heun=True)

    # params are jit ARGUMENTS, never closures: closed-over param trees
    # become HLO constants, and XLA constant-folds giant weight transposes
    # at compile time (measured: ref-scale fwd lowering 815 s as closures)
    def make_denoise(uv):
        def denoise(x, sigma):
            return unet.apply(uv, x, sigma, emb2)
        return denoise

    if args.ddec:
        from dualdiffusion_tpu.models.formats.ms_mdct_dual import (
            MSMDCTDualFormat, MSMDCTDualFormatConfig)
        mfmt = MSMDCTDualFormat(MSMDCTDualFormatConfig())
        # reference DDEC scale (config/models/edm2_ddec_mclt_b1a/ddec.json:
        # 32 ch, mult [1,2,3,4], 3 layers/block, mlp x2, PSD-conditioned,
        # no attention) with the reference test harness's ddec_params
        # (20 steps + Heun, linear schedule, sigma_max 11)
        ddec_cfg = UNetConfig(in_channels=2, out_channels=2,
                              in_channels_emb=0, in_num_freqs=256,
                              in_psd_freqs=2048, sigma_max=11.0,
                              sigma_min=0.0002,
                              model_channels=32, channel_mult=(1, 2, 3, 4),
                              channel_mult_noise=4, channel_mult_emb=4,
                              channels_per_head=64, num_layers_per_block=3,
                              mlp_multiplier=2, logvar_channels=128)
        ddec = UNet(ddec_cfg)
        mdct_shape = mfmt.get_mdct_shape_for_mel_frames(1, mel_w)
        ddvars = jax.jit(lambda k: ddec.init(
            k, jnp.zeros((1, ddec_cfg.in_num_freqs, 64, 2)), jnp.ones((1,)),
            None, jnp.zeros((1, ddec_cfg.in_psd_freqs, 64, 2)),
            method=UNet.init_all))(key)
        ddvars["params"]["core"]["out_gain"] = jnp.ones(())
        dd_sp = SampleParams(steps=args.ddec_steps, cfg_scale=1.0,
                             use_heun=True, schedule="linear",
                             input_perturbation=0.0)

        def generate(key, uv, dv, ddv):
            k1, k2 = jax.random.split(key)
            latents, _ = edm_sample(make_denoise(uv),
                                    (1, lat_h, lat_w, lat_c), sp,
                                    200.0, 0.03, 1.0, k1, return_debug=False)
            mel = dae.apply(dv, latents, method=DAE.decode)
            lin = mfmt.mel_spec_to_linear(mel.astype(jnp.float32))

            def dd_denoise(x, sigma):
                return ddec.apply(ddv, x, sigma, None, lin)

            coeffs, _ = edm_sample(dd_denoise, mdct_shape, dd_sp,
                                   11.0, 0.0002, 1.0, k2,
                                   return_debug=False, use_cfg=False)
            return mfmt.mdct_to_raw(coeffs)

        jgen = jax.jit(generate)
        call = lambda k: jgen(k, uvars, dvars, ddvars)
    else:
        def generate(key, uv, dv):
            latents, _ = edm_sample(make_denoise(uv),
                                    (1, lat_h, lat_w, lat_c), sp,
                                    200.0, 0.03, 1.0, key, return_debug=False)
            mel = dae.apply(dv, latents, method=DAE.decode)
            return fmt.sample_to_raw(mel.astype(jnp.float32))

        jgen = jax.jit(generate)
        call = lambda k: jgen(k, uvars, dvars)

    log(f"[{name}] compiling end-to-end graph...")
    t0 = time.time()
    out = np.asarray(call(jax.random.PRNGKey(1)))
    compile_and_run = time.time() - t0
    log(f"[{name}] first call (compile+run): {compile_and_run:.1f}s; "
        f"out {out.shape}")

    t0 = time.time()
    out = np.asarray(call(jax.random.PRNGKey(2)))
    elapsed = time.time() - t0
    assert np.isfinite(out).all(), "non-finite output"
    audio_seconds = out.shape[-1] / fmt_cfg.sample_rate
    log(f"[{name}] steady-state e2e: {elapsed:.2f}s for {audio_seconds:.1f}s "
        f"of audio ({audio_seconds/elapsed:.2f}x realtime)")
    return elapsed, audio_seconds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="reduced size (CI/CPU)")
    ap.add_argument("--ref-scale", action="store_true",
                    help="ONLY the reference-default scale (356M params)")
    ap.add_argument("--flagship-only", action="store_true",
                    help="skip the ref-scale measurement")
    ap.add_argument("--ddec", action="store_true",
                    help="decode via the DDEC diffusion decoder "
                         "(20 steps + Heun on the MDCT grid) instead of FGLA")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--ddec_steps", type=int, default=20)
    ap.add_argument("--fgla", type=int, default=200)
    args = ap.parse_args()

    import jax
    from dualdiffusion_tpu.utils.jax_cache import enable_compilation_cache
    cache_dir = enable_compilation_cache()
    log(f"backend={jax.default_backend()} devices={jax.devices()} "
        f"compile_cache={cache_dir}")

    # fastest MXU precision for the matmul-DFT stages (FGLA quality is
    # unaffected: spectral convergence err 0.0353 vs 0.0377 at highest)
    from dualdiffusion_tpu.ops import fft as _ddfft
    _ddfft.set_matmul_precision("default")

    if args.small:
        names = ["small"]
    elif args.ref_scale:
        names = ["ref_scale"]
    elif args.flagship_only:
        names = ["flagship"]
    else:
        names = ["flagship", "ref_scale"]

    results = {}
    for name in names:
        results[name] = run_config(name, args)

    head = names[0]
    elapsed = results[head][0]
    line = {
        "metric": "e2e_45s_clip_seconds",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(10.0 / elapsed, 3),
    }
    if "ref_scale" in results and head != "ref_scale":
        line["ref_scale_seconds"] = round(results["ref_scale"][0], 3)
    if args.ddec:
        line["decode"] = f"ddec_{args.ddec_steps}steps"
    print(json.dumps(line))


if __name__ == "__main__":
    main()
