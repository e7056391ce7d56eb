"""Per-op TPU profile of one bench stage (sampler / ddec / dae / fgla).

Captures a jax.profiler device trace of the steady-state stage and parses
the xplane with xprof into an HLO-op self-time table — the ground truth
that the XLA cost-model numbers in bench.py are cross-checked against
(VERDICT r3 weak #3: cost-model hbm_util > 100% must never be trusted or
printed; this is the verification trace).

Prints: total device time, top-K ops by self time with their category,
and the device-busy fraction of wall clock.

Usage:
  python scripts/stage_profile.py --stage sampler --scale ref_scale
  python scripts/stage_profile.py --stage ddec --topk 30
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def parse_xplane(trace_dir: str):
    """xplane.pb -> list of (op_name, category, self_time_ps, flops, bytes).

    Uses xprof's hlo_op_stats (framework_op_stats) converter when
    available; falls back to raw XPlane event aggregation.
    """
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    from xprof.convert import _xspace_to_tool_data as conv
    tool = getattr(conv, "xspace_to_tool_data", None)
    if tool is None:
        from xprof.convert import raw_to_tool_data as conv2
        tool = conv2.xspace_to_tool_data
    for tool_name in ("hlo_op_stats", "framework_op_stats", "op_stats"):
        try:
            data, _ = tool([path], tool_name, {})
            return tool_name, data
        except Exception as e:  # noqa: BLE001 - tool zoo varies by version
            log(f"[xprof] {tool_name} failed: {type(e).__name__}: {e}")
    return None, None


def _import_xplane_pb2():
    """The xplane proto module moves between packages by version."""
    import importlib
    for mod in ("xprof.proto.xplane_pb2",
                "xprof.protobuf.xplane_pb2",
                "tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "tensorboard_plugin_profile.protobuf.xplane_pb2"):
        try:
            return importlib.import_module(mod)
        except ImportError:
            continue
    raise ImportError("no xplane_pb2 module found (xprof/tf/tb-profile)")


import re

_IDX_RE = re.compile(r"\.\d+$")
_KIND_RE = re.compile(r"=\s*\S+\s+([\w-]+)\(")


def _group_name(name: str) -> str:
    """'%slice-start.860 = (...) async-slice(...)' -> 'async-slice %slice-start'."""
    inst = name.lstrip("%").split(" ", 1)[0]
    inst = _IDX_RE.sub("", inst)
    m = _KIND_RE.search(name)
    kind = m.group(1) if m else ""
    return f"{kind} {inst}".strip()


def aggregate_xplane_events(trace_dir: str, topk: int):
    """Parse the XPlane proto and aggregate TPU op SELF times.

    Events on one XLA-Ops line nest by time containment (a while/fusion
    wrapper spans its children); naive duration sums double-count every
    nesting level (measured 16.6 s of 'op time' in a 4.5 s trace). Self
    time = duration minus directly-contained children, stack-computed per
    line; instances are grouped by op kind + base name."""
    xplane_pb2 = _import_xplane_pb2()
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(open(path, "rb").read())
    rows, full, dev_span = _self_times(xspace)
    total = sum(rows.values())
    out = sorted(rows.items(), key=lambda kv: -kv[1])[:topk]
    return total, out, dev_span, full


def _self_times(xspace):
    """Stack-based self-time aggregation over every TPU XLA-Ops line.

    Also returns per-INSTRUCTION self times keyed by the full metadata
    name (the HLO instruction text, shapes included) so `--dump-kind`
    can attribute an op-kind bucket to concrete tensors."""
    rows = {}
    full = {}
    dev_span = [None, None]
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if "Ops" not in (line.name or ""):
                continue
            evs = sorted(((ev.offset_ps, ev.duration_ps,
                           plane.event_metadata[ev.metadata_id].name)
                          for ev in line.events), key=lambda e: (e[0], -e[1]))
            stack = []  # [end_ps, name, start_ps, child_dur]
            out_events = []  # (name, self_dur)
            for t0, dur, name in evs:
                if dev_span[0] is None or t0 < dev_span[0]:
                    dev_span[0] = t0
                if dev_span[1] is None or t0 + dur > dev_span[1]:
                    dev_span[1] = t0 + dur
                while stack and stack[-1][0] <= t0:
                    end, nm, t0p, child = stack.pop()
                    self_d = max((end - t0p) - child, 0)
                    out_events.append((nm, self_d))
                    if stack:
                        stack[-1][3] += end - t0p
                if stack and t0 + dur > stack[-1][0]:
                    # overlapping, not nested (async ops): treat as sibling
                    end, nm, t0p, child = stack.pop()
                    self_d = max((end - t0p) - child, 0)
                    out_events.append((nm, self_d))
                    if stack:
                        stack[-1][3] += end - t0p
                stack.append([t0 + dur, name, t0, 0])
            while stack:
                end, nm, t0p, child = stack.pop()
                self_d = max((end - t0p) - child, 0)
                out_events.append((nm, self_d))
                if stack:
                    stack[-1][3] += end - t0p
            for nm, self_d in out_events:
                g = _group_name(nm)
                rows[g] = rows.get(g, 0) + self_d
                full[nm] = full.get(nm, 0) + self_d
    return rows, full, dev_span


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="sampler",
                    choices=["sampler", "ddec", "dae", "fgla"])
    ap.add_argument("--scale", default="flagship",
                    choices=["flagship", "ref_scale", "small"])
    ap.add_argument("--topk", type=int, default=25)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--ddec_steps", type=int, default=20)
    ap.add_argument("--fgla", type=int, default=200)
    ap.add_argument("--fgla-init", dest="fgla_init", default="flat")
    ap.add_argument("--trace-dir", default="/tmp/dd_stage_trace")
    ap.add_argument("--dump-kind", default=None,
                    help="also print the top individual HLO instructions "
                    "(full text, shapes included) whose grouped kind "
                    "starts with this prefix, e.g. 'async-slice' or "
                    "'copy'")
    ap.add_argument("--dump-n", type=int, default=12)
    args = ap.parse_args()

    from dualdiffusion_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    key = jax.random.PRNGKey(0)
    mel_h, mel_w, ds, dae_cfg, unet_cfg, fmt_cfg = bench.build_configs(
        args.scale, args)

    from dualdiffusion_tpu.models.dae import DAE
    from dualdiffusion_tpu.models.formats import SpectrogramFormat
    from dualdiffusion_tpu.models.unet import UNet
    from dualdiffusion_tpu.sampling import SampleParams, edm_sample

    fmt = SpectrogramFormat(fmt_cfg)
    lat_h, lat_w = mel_h // ds, mel_w // ds
    lat_c = dae_cfg.latent_channels
    dae = DAE(dae_cfg)
    unet = UNet(unet_cfg)
    emb_in = jax.random.normal(key, (1, 1024))
    dvars = jax.jit(dae.init)(key, jnp.zeros((1, mel_h, mel_w // 8, 2)))
    uvars = jax.jit(lambda k: unet.init(
        k, jnp.zeros((1, lat_h, lat_w, lat_c)), jnp.ones((1,)), emb_in,
        method=UNet.init_all))(key)
    uvars["params"]["core"]["out_gain"] = jnp.ones(())
    emb_c = unet.apply(uvars, emb_in, jnp.ones((1,)),
                       method=UNet.get_embeddings)
    emb_u = unet.apply(uvars, emb_in, jnp.zeros((1,)),
                       method=UNet.get_embeddings)
    emb2 = jnp.concatenate([emb_c, emb_u], axis=0)
    sp = SampleParams(steps=args.steps, cfg_scale=1.5, use_heun=True)

    # matches bench's DD_FOLD_PARAMS opt-in (1=all, 2=linear-only; off by
    # default: full fold measured slower with the Pallas conv routing,
    # BASELINE r4)
    from dualdiffusion_tpu.models.layers import (fold_ctx, fold_env_mode,
                                                 fold_inference_params)
    fmode = fold_env_mode()

    if args.stage == "sampler":
        def run(k, uv):
            if fmode:
                uv = fold_inference_params(uv, linear_only=fmode == "linear")
            def denoise(x, sigma):
                with fold_ctx(fmode):
                    return unet.apply(uv, x, sigma, emb2)
            latents, _ = edm_sample(denoise, (1, lat_h, lat_w, lat_c), sp,
                                    200.0, 0.03, 1.0, k, return_debug=False)
            return latents
        fn = jax.jit(run)
        fargs = (key, uvars)
    elif args.stage == "dae":
        lat = jax.random.normal(key, (1, lat_h, lat_w, lat_c))

        def run(latents, dv):
            if fmode:
                dv = fold_inference_params(dv, linear_only=fmode == "linear")
            with fold_ctx(fmode):
                return dae.apply(dv, latents, method=DAE.decode)
        fn = jax.jit(run)
        fargs = (lat, dvars)
    elif args.stage == "fgla":
        mel = jax.random.uniform(key, (1, mel_h, mel_w, 2)) * 0.1

        def run(m, k):
            return fmt.sample_to_raw(m.astype(jnp.float32), key=k)
        fn = jax.jit(run)
        fargs = (mel, key)
    else:  # ddec
        args.use_ddec = True
        stagei = bench.make_ddec_stage(args, mel_h, mel_w, key)
        mel = jax.random.uniform(key, (1, mel_h, mel_w, 2)) * 0.1
        fn = stagei["jit"]
        fargs = (mel, key, stagei["vars"])

    t0 = time.time()
    out = np.asarray(fn(*fargs))
    log(f"compile+first: {time.time() - t0:.1f}s")
    t0 = time.time()
    out = np.asarray(fn(*fargs))
    wall = time.time() - t0
    log(f"steady-state wall: {wall:.3f}s")

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        out = np.asarray(fn(*fargs))
    del out

    total_ps, rows, span, full = aggregate_xplane_events(args.trace_dir,
                                                         args.topk)
    dev_s = total_ps / 1e12
    span_s = ((span[1] - span[0]) / 1e12) if span[0] is not None else None
    print(json.dumps({
        "stage": args.stage, "scale": args.scale,
        "wall_seconds": round(wall, 4),
        "device_op_seconds": round(dev_s, 4),
        "device_span_seconds": round(span_s, 4) if span_s else None,
        "busy_frac_of_wall": round(dev_s / wall, 3) if wall else None,
    }))
    width = max(len(n) for n, _ in rows) if rows else 10
    for name, ps in rows:
        print(f"{name[:90]:<{min(width, 90)}} {ps / 1e9:>10.3f} ms "
              f"{100.0 * ps / total_ps:>5.1f}%")
    if args.dump_kind:
        sel = [(nm, ps) for nm, ps in full.items()
               if _group_name(nm).startswith(args.dump_kind)]
        sel.sort(key=lambda kv: -kv[1])
        print(f"\n-- top {args.dump_n} '{args.dump_kind}' instructions --")
        for nm, ps in sel[:args.dump_n]:
            print(f"{ps / 1e9:>10.3f} ms  {nm[:400]}")


if __name__ == "__main__":
    main()
