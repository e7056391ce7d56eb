"""DDEC UNet forward-layout probe: times one forward at the production
MDCT grid (256 x 5504) for several W-packing factors.

Context: the DDEC diffusion decode (bench.py --ddec) runs at ~0.6% MFU /
~3% HBM utilization. The scheduled HLO of one sampler step shows ~45 GB of
top-level traffic, dominated by the packed-conv re-layout chains
(pad/copy/select of 180-360 MB per conv at the 32/64-channel levels), not
by the convolutions themselves. This probe measures which pack factor (or
none) minimizes wall clock so UNetConfig.w_pack_channels can be set from
data rather than theory. Reference workload: 20-step Heun DDEC decode,
/root/reference/config/tests/unet_test.json ddec_params +
/root/reference/src/pipelines/dual_diffusion_pipeline.py:589-752.

Usage: python scripts/ddec_probe.py [--packs 0,64,128,256] [--profile DIR]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packs", default="0,64,128,256")
    ap.add_argument("--width", type=int, default=5504)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--scan", type=int, default=10,
                    help="chained forwards per timed scan (sync-amortized)")
    ap.add_argument("--profile", default=None,
                    help="directory for a jax.profiler trace of the best run")
    args = ap.parse_args()

    from dualdiffusion_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dualdiffusion_tpu.models.unet import UNet, UNetConfig

    key = jax.random.PRNGKey(0)
    w = args.width
    x = jax.random.normal(key, (1, 256, w, 2), jnp.float32)
    ref = jax.random.normal(key, (1, 2048, w, 2), jnp.float32)
    sigma = jnp.full((1,), 3.0)

    results = {}
    fwds = {}
    for pack in (int(p) for p in args.packs.split(",")):
        cfg = UNetConfig(in_channels=2, out_channels=2, in_channels_emb=0,
                         in_num_freqs=256, in_psd_freqs=2048,
                         sigma_max=11.0, sigma_min=0.0002,
                         model_channels=32, channel_mult=(1, 2, 3, 4),
                         channel_mult_noise=4, channel_mult_emb=4,
                         channels_per_head=64, num_layers_per_block=3,
                         mlp_multiplier=2, logvar_channels=128,
                         w_pack_channels=pack)
        unet = UNet(cfg)
        uvars = jax.jit(lambda k: unet.init(
            k, jnp.zeros((1, 256, 64, 2)), jnp.ones((1,)), None,
            jnp.zeros((1, 2048, 64, 2)), method=UNet.init_all))(key)

        # N chained forwards inside ONE scan, one host sync at the end:
        # per-call np.asarray syncs cost 100s of ms over the tunneled
        # runtime and swamp a ~100 ms kernel (measured: the same config
        # read 285 ms/fwd scan-amortized vs 650 ms/fwd per-call synced)
        n_scan = args.scan
        def fwd_scan(uv, xx, s, r):
            def body(carry, _):
                out = unet.apply(uv, carry, s, None, r)
                return out.astype(carry.dtype), ()
            y, _ = jax.lax.scan(body, xx, None, length=n_scan)
            return y
        fwd = jax.jit(fwd_scan)
        t0 = time.time()
        out = np.asarray(fwd(uvars, x, sigma, ref))
        log(f"pack={pack}: compile+first {time.time() - t0:.1f}s")
        assert np.isfinite(out).all()
        t0 = time.time()
        n = args.reps
        for _ in range(n):
            out = np.asarray(fwd(uvars, x, sigma, ref))
        dt = (time.time() - t0) / (n * n_scan)
        results[pack] = dt
        fwds[pack] = (fwd, uvars)
        log(f"pack={pack}: {dt * 1e3:.1f} ms/fwd "
            f"(20-step Heun decode ~ {dt * 40:.2f}s)")

    best = min(results, key=results.get)
    log(f"best: pack={best} at {results[best] * 1e3:.1f} ms/fwd")
    if args.profile:
        import jax.profiler as prof
        fwd, uvars = fwds[best]
        log(f"profiling pack={best} into {args.profile}")
        prof.start_trace(args.profile)
        out = np.asarray(fwd(uvars, x, sigma, ref))
        prof.stop_trace()

    import json
    print(json.dumps({str(k): round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
