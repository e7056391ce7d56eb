"""DAE decode layout probe: scan-amortized per-decode timing across
W-packing factors at the production mel grid (256 x 5504, latents 32 x 688).

Same methodology as scripts/ddec_probe.py --scan: N chained decodes inside
one lax.scan, a single host sync at the end — per-call np.asarray syncs
cost 100s of ms over the tunneled runtime and swamp the ~100 ms kernel.

Context: BENCH_r03 dae_decode ran at 6.35%/3.78% MFU (flagship/ref-scale)
with w_pack_channels=128; VERDICT r4 item 7 wants >= 15%.

Usage: python scripts/dae_probe.py [--packs 0,128] [--reps 3] [--scan 8]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packs", default="0,128")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--latent-channels", type=int, default=8)
    args = ap.parse_args()

    from dualdiffusion_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dualdiffusion_tpu.models.dae import DAE, DAEConfig

    key = jax.random.PRNGKey(0)
    mel_h, mel_w = 256, 5504
    lat = jax.random.normal(key, (1, mel_h // 8, mel_w // 8,
                                  args.latent_channels), jnp.float32)

    results = {}
    for pack in (int(p) for p in args.packs.split(",")):
        cfg = DAEConfig(model_channels=64, channel_mult_enc=(1, 2, 4, 8),
                        channel_mult_dec=(1, 2, 4, 8),
                        num_enc_layers_per_block=2,
                        num_dec_layers_per_block=2,
                        latent_channels=args.latent_channels,
                        w_pack_channels=pack)
        dae = DAE(cfg)
        dvars = jax.jit(dae.init)(key, jnp.zeros((1, mel_h, mel_w // 8, 2)))

        def dec_scan(dv, l0):
            def body(carry, _):
                out = dae.apply(dv, carry, method=DAE.decode)
                # scalar dependency on the output forces sequential steps
                nxt = carry * (1.0 + 1e-9 * out.mean().astype(carry.dtype))
                return nxt, ()
            y, _ = jax.lax.scan(body, l0, None, length=args.scan)
            return y
        fn = jax.jit(dec_scan)
        t0 = time.time()
        out = np.asarray(fn(dvars, lat))
        log(f"pack={pack}: compile+first {time.time() - t0:.1f}s")
        assert np.isfinite(out).all()
        t0 = time.time()
        for _ in range(args.reps):
            out = np.asarray(fn(dvars, lat))
        dt = (time.time() - t0) / (args.reps * args.scan)
        results[pack] = dt
        flops = 7.18e12  # BENCH_r03 xla cost model for one decode
        log(f"pack={pack}: {dt * 1e3:.1f} ms/decode "
            f"(~{flops / dt / 1e12:.1f} TF/s, "
            f"{100 * flops / dt / 197e12:.1f}% MFU)")

    best = min(results, key=results.get)
    log(f"best: pack={best} at {results[best] * 1e3:.1f} ms")
    print(json.dumps({str(k): round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
