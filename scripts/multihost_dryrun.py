"""Multi-host training-path dryrun: a 2-process CPU cluster simulation.

Validates the SURVEY.md §5.8 multi-host surface without TPU pods:
``jax.distributed.initialize`` over a local gRPC coordinator, a global mesh
spanning both processes, per-process batch feeding through
``jax.make_array_from_process_local_data`` (parallel.mesh.shard_batch), and
state replication via ``parallel.mesh.replicate_state``. The DP loss must
equal the single-process loss over the same 8 virtual devices and the same
global batch (reference Accelerate surface: src/training/trainer.py:242-293).

Usage:
  python scripts/multihost_dryrun.py single
  python scripts/multihost_dryrun.py worker --pid 0 --nproc 2 --port 12345
"""

import argparse
import sys

import jax

TOTAL_BATCH = 16
DEVICES_PER_PROC = 4


def build_setup(key):
    import jax.numpy as jnp
    from dualdiffusion_tpu.models.unet import UNet, UNetConfig
    from dualdiffusion_tpu.training import (EMABank, EMAConfig,
                                            SigmaSamplerConfig,
                                            UNetTrainConfig, build_optimizer,
                                            init_train_state, lr_schedule,
                                            make_unet_train_step)

    cfg = UNetConfig(in_channels=4, out_channels=4, in_channels_emb=32,
                     model_channels=16, channel_mult=(1, 2),
                     num_layers_per_block=1, attn_levels=(1,),
                     attn_axis="freq", channels_per_head=16,
                     logvar_channels=32)
    model = UNet(cfg)
    x0 = jnp.zeros((1, 16, 32, 4))
    params = model.init(key, x0, jnp.ones((1,)), jnp.zeros((1, 32)),
                        method=UNet.init_all)

    def unet_apply(p, x, sigma, emb, ref, k):
        return model.apply(p, x, sigma, emb, training=True,
                           rngs={"dropout": k})

    def get_emb(p, emb_in, mask):
        return model.apply(p, emb_in, mask, method=UNet.get_embeddings)

    def get_logvar(p, sigma):
        return model.apply(p, sigma, method=UNet.get_sigma_loss_logvar)

    tconf = UNetTrainConfig(grad_accum_steps=2,
                            sigma=SigmaSamplerConfig(distribution="ln_sech"),
                            conditioning_dropout=0.1)
    opt = build_optimizer("adamw", lr_schedule("edm2", 1e-3, 100, 1000))
    bank = EMABank([EMAConfig(name="std0.05", std=0.05)])
    step = make_unet_train_step(unet_apply, get_emb, get_logvar, opt, bank,
                                tconf, total_batch_size=TOTAL_BATCH)
    state = init_train_state(params, opt, bank, tconf.sigma, key)
    return step, state


def global_batch(key):
    import numpy as np
    rng = np.random.default_rng(0)
    return {"samples": rng.standard_normal((TOTAL_BATCH, 16, 32, 4)).astype("float32"),
            "embeddings": rng.standard_normal((TOTAL_BATCH, 32)).astype("float32")}


def run(local_batch_slice=None):
    import numpy as np
    from dualdiffusion_tpu.parallel import (MeshConfig, make_mesh,
                                            replicate_state, shard_batch)
    key = jax.random.PRNGKey(0)
    step, state = build_setup(key)
    n_slices = jax.process_count() if jax.process_count() > 1 else 1
    mesh = make_mesh(MeshConfig(num_dcn_slices=n_slices))
    state = replicate_state(mesh, state)
    batch = global_batch(key)
    if local_batch_slice is not None:
        batch = {k: v[local_batch_slice] for k, v in batch.items()}
    batch = shard_batch(mesh, batch)
    new_state, logs = jax.jit(step)(state, batch)
    jax.block_until_ready(new_state.params)
    return float(logs["loss"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["single", "worker"])
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--port", type=int, default=12355)
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    if args.mode == "single":
        jax.config.update("jax_num_cpu_devices",
                          DEVICES_PER_PROC * args.nproc)
        loss = run()
        print(f"LOSS {loss:.10f}", flush=True)
        return

    jax.config.update("jax_num_cpu_devices", DEVICES_PER_PROC)
    jax.distributed.initialize(f"127.0.0.1:{args.port}", args.nproc, args.pid)
    assert jax.device_count() == DEVICES_PER_PROC * args.nproc
    # this process feeds only its contiguous rows of the global batch
    # (jax.devices() orders all of process 0's devices first)
    rows = TOTAL_BATCH // args.nproc
    sl = slice(args.pid * rows, (args.pid + 1) * rows)
    loss = run(local_batch_slice=sl)
    if jax.process_index() == 0:
        print(f"LOSS {loss:.10f}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
