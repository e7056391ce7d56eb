"""Per-stage timing breakdown of the flagship pipeline (diagnostic;
bench.py stays the single-line-JSON entry point).

Usage: python bench_breakdown.py [--steps 100] [--fgla 200]
"""

import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, n: int = 1):
    # forced device->host sync: block_until_ready does NOT reliably block
    # through the tunneled-TPU runtime (measured 10x under-reports)
    import numpy as np
    out = np.asarray(fn(*args))  # compile + sync
    t0 = time.time()
    for _ in range(n):
        out = np.asarray(fn(*args))
    return out, (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--fgla", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dualdiffusion_tpu.models.dae import DAE, DAEConfig
    from dualdiffusion_tpu.models.formats import (SpectrogramFormat,
                                                  SpectrogramFormatConfig)
    from dualdiffusion_tpu.models.unet import UNet, UNetConfig
    from dualdiffusion_tpu.sampling import SampleParams, edm_sample

    key = jax.random.PRNGKey(0)
    mel_h, mel_w, ds = 256, 5504, 8
    lat_h, lat_w = mel_h // ds, mel_w // ds
    dae_cfg = DAEConfig(model_channels=64, channel_mult_enc=(1, 2, 4, 8),
                        channel_mult_dec=(1, 2, 4, 8),
                        num_enc_layers_per_block=2,
                        num_dec_layers_per_block=2, latent_channels=8)
    unet_cfg = UNetConfig(in_channels=8, out_channels=8, in_channels_emb=1024,
                          model_channels=64, channel_mult=(1, 2, 3, 4),
                          num_layers_per_block=2, attn_levels=(2, 3),
                          attn_axis="freq", logvar_channels=128)
    fmt = SpectrogramFormat(SpectrogramFormatConfig(num_fgla_iters=args.fgla))

    dae = DAE(dae_cfg)
    dvars = dae.init(key, jnp.zeros((1, mel_h, mel_w // 8, 2)))
    unet = UNet(unet_cfg)
    emb_in = jax.random.normal(key, (1, 1024))
    uvars = unet.init(key, jnp.zeros((1, lat_h, lat_w, 8)), jnp.ones((1,)),
                      emb_in, method=UNet.init_all)
    uvars["params"]["core"]["out_gain"] = jnp.ones(())
    emb_c = unet.apply(uvars, emb_in, jnp.ones((1,)), method=UNet.get_embeddings)
    emb_u = unet.apply(uvars, emb_in, jnp.zeros((1,)), method=UNet.get_embeddings)
    emb2 = jnp.concatenate([emb_c, emb_u], axis=0)

    # 1. single denoise fwd (CFG batch 2)
    fwd = jax.jit(lambda x, s: unet.apply(uvars, x, s, emb2))
    x2 = jax.random.normal(key, (2, lat_h, lat_w, 8))
    _, t_fwd = timed(fwd, x2, jnp.full((2,), 10.0), n=10)
    log(f"unet fwd (batch 2): {t_fwd*1000:.1f} ms "
        f"-> sampler est {t_fwd*2*args.steps:.2f} s for {args.steps} heun steps")

    # 2. full sampler
    sp = SampleParams(steps=args.steps, cfg_scale=1.5, use_heun=True)
    sampler = jax.jit(lambda k: edm_sample(
        lambda x, s: unet.apply(uvars, x, s, emb2), (1, lat_h, lat_w, 8),
        sp, 200.0, 0.03, 1.0, k, return_debug=False)[0])
    lat, t_sampler = timed(sampler, key)
    log(f"sampler ({args.steps} steps heun+cfg): {t_sampler:.2f} s")

    # 3. DAE decode
    dec = jax.jit(lambda l: dae.apply(dvars, l, method=DAE.decode))
    mel, t_dec = timed(dec, lat)
    log(f"dae decode -> {mel.shape}: {t_dec:.2f} s")

    # 4. mel unscale + FGLA
    fg = jax.jit(lambda m, k: fmt.sample_to_raw(m.astype(jnp.float32), key=k))
    raw, t_fgla = timed(fg, mel, key)
    log(f"mel unscale + FGLA ({args.fgla} iters) -> {raw.shape}: {t_fgla:.2f} s")

    total = t_sampler + t_dec + t_fgla
    log(f"TOTAL: {total:.2f} s  "
        f"(sampler {t_sampler/total*100:.0f}% | dae {t_dec/total*100:.0f}% | "
        f"fgla {t_fgla/total*100:.0f}%)")


if __name__ == "__main__":
    main()
