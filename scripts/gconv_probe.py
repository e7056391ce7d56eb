"""Isolated grouped-conv microbench: ONE conv shape, scan-amortized, all
lowerings — the full-forward A/B over the tunneled TPU carries +/-10%
run-to-run noise (scripts/sampler_probe.py sandwich runs), so lowering
decisions are made here on a clean 50x-amortized single-op signal.

Usage: python scripts/gconv_probe.py [--shape l0] [--scan 50] [--reps 3]
Shapes: l0 (2,32,688,256)->512 g8 | l1 (2,16,344,512)->1024 g8 |
        l2 (2,8,172,768)->1536 g8 | ddec0 (1,256,5504,32)->64 g1
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


SHAPES = {
    "l0": ((2, 32, 688, 256), 512, 8),
    "l1": ((2, 16, 344, 512), 1024, 8),
    "l2": ((2, 8, 172, 768), 1536, 8),
    "l0b": ((2, 32, 688, 512), 256, 8),
    "ddec0": ((1, 256, 5504, 32), 64, 1),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="l0", choices=sorted(SHAPES))
    ap.add_argument("--scan", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from dualdiffusion_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dualdiffusion_tpu.models.layers import MPConv
    from dualdiffusion_tpu.ops.pallas.grouped_conv import (
        _lax_reference, grouped_conv2d_3x3)

    xshape, co, g = SHAPES[args.shape]
    ci = xshape[-1]
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    key = jax.random.PRNGKey(0)
    x0 = (jax.random.normal(key, xshape) * 0.5).astype(dt)
    w = (jax.random.normal(key, (co, ci // g, 3, 3)) * 0.05).astype(dt)
    # output feeds back through a 1x1 projection so the scan carry keeps
    # the input shape (chained identical convs, one sync)
    proj = (jax.random.normal(key, (co, ci)) * 0.02).astype(dt)
    conv = MPConv(ci, co, (3, 3), groups=g)

    def chain(fn):
        def run(x, w_, p_):
            def body(c, _):
                y = fn(c, w_)
                c2 = jnp.einsum("bhwo,oc->bhwc", y, p_).astype(c.dtype)
                return c2, ()
            y, _ = jax.lax.scan(body, x, None, length=args.scan)
            # sync on a scalar that depends on the whole chain: fetching
            # the full (B,H,W,C) output costs ~2 s of D2H over the
            # tunneled runtime (~20 MB/s), swamping the per-conv signal
            return jnp.float32(jnp.mean(y))
        return jax.jit(run)

    flops = 2 * 9 * (ci // g) * co * np.prod(xshape[:3])
    variants = {
        "pertap": lambda x_, w_: conv._grouped_conv(x_, w_),
        "native": lambda x_, w_: _lax_reference(x_, w_, g),
        "gpacked": lambda x_, w_: conv._grouped_packed_conv(x_, w_),
        "pallas": lambda x_, w_: grouped_conv2d_3x3(x_, w_, g),
    }
    results = {}
    for name, fn in variants.items():
        try:
            run = chain(fn)
            t0 = time.time()
            out = np.asarray(run(x0, w, proj))
            log(f"{name}: compile+first {time.time() - t0:.1f}s "
                f"finite={np.isfinite(out).all()}")
            t0 = time.time()
            for _ in range(args.reps):
                out = np.asarray(run(x0, w, proj))
            dt_s = (time.time() - t0) / (args.reps * args.scan)
            results[name] = {"us": round(dt_s * 1e6, 1),
                             "tflops_s": round(flops / dt_s / 1e12, 1),
                             "mfu_pct": round(100 * flops / dt_s / 197e12, 1)}
            log(f"{name}: {dt_s * 1e6:.0f} us/conv "
                f"{results[name]['tflops_s']} TF/s "
                f"({results[name]['mfu_pct']}% MFU)")
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            log(f"{name}: FAILED {e}")
    print(json.dumps({"shape": args.shape, "x": xshape, "co": co, "g": g,
                      **results}))


if __name__ == "__main__":
    main()
