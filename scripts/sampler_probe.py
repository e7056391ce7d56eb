"""Ref-scale sampler-body probe: times N chained CFG UNet forwards inside
one lax.scan (the sampler's real structure) under layout/precision
variants, one host sync per timed run.

Context (round-4 sampler profile, BASELINE.md): the 100-step ref-scale
sampler spends ~4.6 s of async slice DMA + ~1.8 s of async copy DMA
against ~1 s of conv compute — the per-tap grouped-conv path materializes
shifted activation copies and re-prepares weights (gain-mul, bf16 cast,
per-tap arrange) every scan iteration. This probe quantifies which part
is which:

  * base        — uvars as stored (fp32 leaves)
  * bf16        — uvars pre-cast to bf16 outside the scan (kills the
                  per-step cast+copy if XLA wasn't hoisting it)
  * gpacked     — DD_GROUPED_PACKED_CONV=1: grouped convs as per-group
                  W-packed dense convs (models/layers.py)
  * gpacked16   — gpacked + bf16 params

Usage: python scripts/sampler_probe.py [--scan 8] [--reps 3]
                                       [--variants base,bf16,gpacked,gpacked16]
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
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="base,bf16")
    ap.add_argument("--scale", default="ref_scale",
                    choices=["ref_scale", "flagship"])
    args = ap.parse_args()

    from dualdiffusion_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    class _A:  # minimal args shim for bench.build_configs
        steps = 100
        fgla = 200
        fgla_init = "flat"

    mel_h, mel_w, ds, dae_cfg, unet_cfg, fmt_cfg = bench.build_configs(
        args.scale, _A)
    from dualdiffusion_tpu.models.unet import UNet

    key = jax.random.PRNGKey(0)
    lat_h, lat_w = mel_h // ds, mel_w // ds
    lat_c = unet_cfg.in_channels
    unet = UNet(unet_cfg)
    emb_in = jax.random.normal(key, (1, 1024))
    uvars = jax.jit(lambda k: unet.init(
        k, jnp.zeros((1, lat_h, lat_w, lat_c)), jnp.ones((1,)), emb_in,
        method=UNet.init_all))(key)
    uvars["params"]["core"]["out_gain"] = jnp.ones(())
    emb_c = unet.apply(uvars, emb_in, jnp.ones((1,)),
                       method=UNet.get_embeddings)
    emb_u = unet.apply(uvars, emb_in, jnp.zeros((1,)),
                       method=UNet.get_embeddings)
    emb2 = jnp.concatenate([emb_c, emb_u], axis=0)

    x0 = jax.random.normal(key, (2, lat_h, lat_w, lat_c))  # CFG batch 2
    sigma = jnp.full((2,), 3.0)
    n_scan = args.scan

    def make_fn(folded: bool = False):
        from dualdiffusion_tpu.models.layers import fold_ctx

        def scan_fwd(uv, x, s):
            def body(carry, _):
                with fold_ctx("all" if folded else None):
                    out = unet.apply(uv, carry, s, emb2)
                return out.astype(carry.dtype), ()
            y, _ = jax.lax.scan(body, x, None, length=n_scan)
            return y
        return jax.jit(scan_fwd)

    def fold_tree(tree):
        # true pre-folded bf16 weights (fan-in scale applied once) — a raw
        # bf16 cast would diverge (~sqrt(fan_in) growth per layer) now
        # that MPConv no longer infers "folded" from dtype (ADVICE r4)
        from dualdiffusion_tpu.models.layers import fold_inference_params
        return fold_inference_params(tree)

    import os
    variants = {}
    for raw_name in args.variants.split(","):
        # '#N' suffix = repeat alias (sandwich runs expose tunnel drift:
        # base,gpallas16,base#2)
        name = raw_name.split("#")[0]
        if name == "base":
            variants[raw_name] = (uvars, {}, False)
        elif name == "bf16":
            variants[raw_name] = (fold_tree(uvars), {}, True)
        elif name == "gpacked":
            variants[raw_name] = (uvars, {"DD_GROUPED_PACKED_CONV": "1"},
                                  False)
        elif name == "gpacked16":
            variants[raw_name] = (fold_tree(uvars),
                                  {"DD_GROUPED_PACKED_CONV": "1"}, True)
        elif name == "gfused":
            variants[raw_name] = (uvars, {"DD_GROUPED_PACKED_CONV": "2"},
                                  False)
        elif name == "gfused16":
            variants[raw_name] = (fold_tree(uvars),
                                  {"DD_GROUPED_PACKED_CONV": "2"}, True)
        elif name == "gpallas":
            variants[raw_name] = (uvars, {"DD_GROUPED_PALLAS_CONV": "1"},
                                  False)
        elif name == "gpallas16":
            variants[raw_name] = (fold_tree(uvars),
                                  {"DD_GROUPED_PALLAS_CONV": "1"}, True)
        else:
            raise SystemExit(f"unknown variant {name}")

    results = {}
    for name, (uv, env, folded) in variants.items():
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            fn = make_fn(folded)
            t0 = time.time()
            out = np.asarray(fn(uv, x0, sigma))  # traces with env applied
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        log(f"{name}: compile+first {time.time() - t0:.1f}s "
            f"finite={np.isfinite(out).all()}")
        t0 = time.time()
        for _ in range(args.reps):
            out = np.asarray(fn(uv, x0, sigma))
        dt = (time.time() - t0) / (args.reps * n_scan)
        results[name] = round(dt * 1e3, 2)
        log(f"{name}: {dt * 1e3:.1f} ms/fwd (100-step Heun sampler ~ "
            f"{dt * 2 * 100:.2f}s)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
