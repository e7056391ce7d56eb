"""Supplementary benchmark: flagship UNet training-step throughput on one
chip (the driver's headline bench.py measures inference; this measures the
training path: stratified sigma, CFG dropout, EDM2 NLL, grad accum 1,
AdamW + forced MP weight renorm + 2-profile EMA bank).

Prints one JSON line {"metric": "unet_train_samples_per_sec", ...}.
"""
import argparse, json, sys, time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--ref-scale", action="store_true",
                    help="reference-default 356M UNet (4 latent channels)")
    ap.add_argument("--offload-ema", action="store_true",
                    help="add one cpu_offload EMA profile driven by the "
                         "AsyncHostEMA worker (measures the offload "
                         "overhead vs the in-graph-only bank)")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler device trace of one "
                         "steady-state step into DIR and print the per-op "
                         "self-time table (the ground truth behind the "
                         "cost-model MFU/roofline claims)")
    args = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp
    from dualdiffusion_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    # measured ref-scale A/B (r5, one-sync, 10 iters): the Pallas
    # implicit-GEMM conv with its native custom VJP runs the train step at
    # 255.2 ms vs 359.1 ms for the per-tap lowering (batch 4, remat;
    # 14.3% vs 10.3% MFU) -> default ON for the training bench on TPU
    # (interpret-mode fallback is pathological elsewhere, ADVICE r4).
    # With the Pallas backward, dropping block remat fits batch 4 on a
    # 16 GB chip and removes the recompute FLOPs: 197-225 ms/step across
    # runs vs 255 ms rematerialized; donating the state trims another ~5%
    # (213.7 ms = 18.7 samples/s; best observed 196.8 ms = 20.3) ->
    # no-remat + donate are the bench defaults. Batch 8 no-remat OOMs
    # undonated and measures SLOWER donated (404.9 ms = 19.8 samples/s,
    # XLA spills); batch 8 WITH remat is 16.1 samples/s.
    if jax.default_backend() == "tpu":
        os.environ.setdefault("DD_GROUPED_PALLAS_CONV", "1")
        os.environ.setdefault("DD_GROUPED_PALLAS_CONV_TRAIN", "1")
    from dualdiffusion_tpu.models.unet import UNet, UNetConfig
    from dualdiffusion_tpu.training import (EMABank, EMAConfig,
                                            SigmaSamplerConfig, UNetTrainConfig,
                                            build_optimizer, init_train_state,
                                            lr_schedule, make_unet_train_step)

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    if args.ref_scale:
        # /root/reference/config/models/default/unet.json
        cfg = UNetConfig(in_channels=4, out_channels=4, in_channels_emb=1024,
                         model_channels=256, channel_mult=(1, 2, 3, 4, 5),
                         channel_mult_noise=1, channel_mult_emb=3,
                         channels_per_head=64, num_layers_per_block=2,
                         attn_levels=(3, 4), attn_axis="freq",
                         mlp_multiplier=2, mlp_groups=8, logvar_channels=128,
                         remat_blocks=os.environ.get(
                             "DD_TRAIN_REMAT", "0") != "0")
    else:
        cfg = UNetConfig(in_channels=8, out_channels=8, in_channels_emb=1024,
                         model_channels=64, channel_mult=(1, 2, 3, 4),
                         num_layers_per_block=2, attn_levels=(2, 3),
                         attn_axis="freq", logvar_channels=128)
    lat_c = cfg.in_channels
    model = UNet(cfg)
    key = jax.random.PRNGKey(0)
    b = args.batch or (4 if args.ref_scale else 8)
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 32, 688, lat_c)), jnp.ones((1,)),
        jnp.zeros((1, 1024)), method=UNet.init_all))(key)

    def apply_fn(p, x, sigma, emb, ref, k):
        return model.apply(p, x, sigma, emb, training=True, rngs={"dropout": k})

    def get_emb(p, e, m):
        return model.apply(p, e, m, method=UNet.get_embeddings)

    def get_logvar(p, s):
        return model.apply(p, s, method=UNet.get_sigma_loss_logvar)

    tconf = UNetTrainConfig(grad_accum_steps=1, sigma=SigmaSamplerConfig(),
                            conditioning_dropout=0.1)
    opt = build_optimizer("adamw", lr_schedule("edm2", 1e-3, 100, 1000))
    if args.ref_scale:
        # TWO live EMA profiles via bf16 storage (EMAConfig.store_dtype):
        # same HBM as one fp32 profile, so the reference-default dual-EMA
        # bank fits a 16 GB chip at 356M (VERDICT r2 #3). A cpu_offload
        # profile is the zero-HBM alternative (Trainer drives it).
        bank = EMABank([EMAConfig(name="std0.05", std=0.05,
                                  store_dtype="bfloat16"),
                        EMAConfig(name="std0.1", std=0.1,
                                  store_dtype="bfloat16")])
    else:
        bank = EMABank([EMAConfig(name="std0.05", std=0.05),
                        EMAConfig(name="std0.1", std=0.1)])
    if args.offload_ema:
        bank = EMABank(list(bank.configs.values())
                       + [EMAConfig(name="host0.1", std=0.1,
                                    cpu_offload=True)])
    donate = () if os.environ.get("DD_DONATE_STATE", "1") == "0" else (0,)
    if args.offload_ema:
        # the async host-EMA worker reads the previous step's params while
        # the next step runs; donating the state would invalidate them
        donate = ()
    jstep = jax.jit(make_unet_train_step(apply_fn, get_emb, get_logvar, opt,
                                         bank, tconf, total_batch_size=b),
                    donate_argnums=donate)
    state = init_train_state(params, opt, bank, tconf.sigma, key)
    del params                 # the copy inside state is the live one
    rng = np.random.default_rng(0)
    batch = {"samples": jnp.asarray(rng.standard_normal(
                 (b, 32, 688, lat_c)).astype(np.float32)),
             "embeddings": jnp.asarray(rng.standard_normal(
                 (b, 1024)).astype(np.float32))}

    from dualdiffusion_tpu.utils.perf import (compiled_cost, device_peaks,
                                              stage_stats)
    # AOT lower/compile keeps jit's donation semantics and exposes XLA's
    # cost model for the MFU accounting
    compiled = jstep.lower(state, batch).compile()
    cost = compiled_cost(compiled)
    step = compiled

    host_ema = None
    if args.offload_ema:
        from dualdiffusion_tpu.training.ema import AsyncHostEMA
        host_ema = AsyncHostEMA(bank, batch_size=b)
        host_ema.seed(jax.device_get(state.params))

    state, logs = step(state, batch)   # warm
    if host_ema is not None:
        host_ema.update(state.params, state.total_samples_processed,
                        state.global_step)
    _ = float(logs["loss"])            # forced device->host sync
    t0 = time.time()
    for _ in range(args.iters):
        state, logs = step(state, batch)
        if host_ema is not None:
            host_ema.update(state.params, state.total_samples_processed,
                            state.global_step)
    if host_ema is not None:
        host_ema.sync()                # the offloaded lerp is part of the step
    loss = float(logs["loss"])         # sync: loss depends on the last step
    dt = (time.time() - t0) / args.iters
    assert np.isfinite(loss)
    if args.trace:
        os.makedirs(args.trace, exist_ok=True)
        with jax.profiler.trace(args.trace):
            state, tlogs = step(state, batch)
            _ = float(tlogs["loss"])      # device->host sync in-window
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from stage_profile import aggregate_xplane_events
        total_ps, rows, _span = aggregate_xplane_events(args.trace, 20)
        print(f"[trace] device op self-time total "
              f"{total_ps / 1e12:.3f}s for one {dt*1000:.1f}ms step:",
              file=sys.stderr, flush=True)
        for nm, ps in rows:
            print(f"[trace] {nm[:80]:<80} {ps/1e9:>9.3f} ms "
                  f"{100.0*ps/total_ps:>5.1f}%", file=sys.stderr, flush=True)
    perf = stage_stats(dt, peaks=device_peaks(), **cost)
    if (os.environ.get("DD_GROUPED_PALLAS_CONV", "0") == "1"
            and os.environ.get("DD_GROUPED_PALLAS_CONV_TRAIN", "0") == "1"):
        lowering = "pallas_custom_vjp"
    elif os.environ.get("DD_GROUPED_CONV_NATIVE", "0") == "1":
        lowering = "xla_native_grouped"
    else:
        lowering = "per_tap_matmul"
    print(f"step={dt*1000:.1f}ms loss={loss:.4f} perf={perf} "
          f"conv_lowering={lowering}", file=sys.stderr, flush=True)
    print(json.dumps({"metric": "unet_train_samples_per_sec",
                      "value": round(b / dt, 2), "unit": "samples/s",
                      "batch": b, "step_ms": round(dt * 1000, 1),
                      "num_live_emas": len(bank.configs),
                      "conv_lowering": lowering,
                      "offload_ema": bool(host_ema is not None), **perf}))


if __name__ == "__main__":
    main()
