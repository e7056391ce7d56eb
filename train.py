"""Training entry point.

Usage parity with the reference CLI (reference: src/train.py:31-57):

  python train.py --model_path <dir> --train_config_path <json> \
      [--dataset_path <dir>] [--resume] [--max_steps N]

The train config is a TrainerConfig JSON (see configs/); the model dir is a
pipeline model directory created by create_new_model.py.
"""

import argparse
import logging
import os
import sys

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger("train")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--train_config_path", required=True)
    ap.add_argument("--dataset_path", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--num_dcn_slices", type=int, default=None,
                    help="multi-slice: number of DCN-connected slices "
                         "(data-parallel outer blocks ride DCN); overrides "
                         "the config's parallel.num_dcn_slices")
    ap.add_argument("--model_axis", type=int, default=None,
                    help="tensor-parallel width (overrides the config's "
                         "parallel.model_axis)")
    args = ap.parse_args()

    # multi-host: initialize the distributed runtime BEFORE any jax use
    # (reference Accelerate-init analog, trainer.py:242-293; SURVEY.md §5.8)
    from dualdiffusion_tpu.parallel.distributed import (
        is_main_process, maybe_initialize_distributed)
    maybe_initialize_distributed()

    import jax
    import numpy as np

    from dualdiffusion_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    from dualdiffusion_tpu.dataset.dataloader import (DatasetConfig,
                                                      DualDiffusionDataset)
    from dualdiffusion_tpu.parallel import MeshConfig, make_mesh, shard_batch
    from dualdiffusion_tpu.pipelines import Pipeline
    import dualdiffusion_tpu.training.builders  # noqa: F401 (registers trainers)
    from dualdiffusion_tpu.training.trainer import (Trainer, TrainerConfig,
                                                    get_module_trainer)
    from dualdiffusion_tpu.utils import DATASET_PATH, load_config

    tconf = load_config(TrainerConfig, args.train_config_path)
    tconf.model_path = args.model_path

    logger.info("process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    pconf = tconf.parallel
    if args.model_axis is not None:
        pconf.model_axis = args.model_axis
    if args.num_dcn_slices is not None:
        pconf.num_dcn_slices = args.num_dcn_slices
    mesh = make_mesh(MeshConfig(model_axis=pconf.model_axis,
                                num_dcn_slices=pconf.num_dcn_slices))
    logger.info("mesh: %s (model_axis=%d, fsdp=%s)",
                dict(mesh.shape), pconf.model_axis, pconf.fsdp)

    pipeline = Pipeline.from_pretrained(args.model_path, load_checkpoints=False)
    key = jax.random.PRNGKey(tconf.seed)

    builder = get_module_trainer(tconf.module_trainer)
    step, state, export_fn, ema_bank, batch_adapter = builder(pipeline, tconf, key)
    if pconf.model_axis > 1 or pconf.fsdp:
        # tensor-parallel / FSDP: weights + moments + EMA profiles sharded
        # over the chosen mesh axis; GSPMD inserts the per-layer
        # all-gathers and grad reduce-scatters (parallel/mesh.py)
        from dualdiffusion_tpu.parallel import shard_train_state
        axis = "model" if pconf.model_axis > 1 else "data"
        state = shard_train_state(mesh, state, axis_name=axis)
    elif jax.process_count() > 1:
        from dualdiffusion_tpu.parallel import replicate_state
        state = replicate_state(mesh, state)
    # donate the train state: without donation the input and output state
    # pytrees double-buffer (2x params+opt+EMAs — significant at the 356M
    # reference scale). DD_DONATE_STATE=0 opts out (some tunneled dev
    # runtimes reject donated buffers with InvalidArgument).
    if os.environ.get("DD_DONATE_STATE", "1") != "0":
        jstep = jax.jit(step, donate_argnums=(0,))
    else:
        jstep = jax.jit(step)

    data_dir = args.dataset_path or DATASET_PATH
    assert data_dir, "set --dataset_path or DATASET_PATH"
    dtypes = tuple(tconf.dataloader.load_datatypes)
    ds = DualDiffusionDataset(
        DatasetConfig(data_dir=data_dir, load_datatypes=dtypes,
                      raw_crop_width=tconf.dataloader.raw_crop_width,
                      latents_crop_width=tconf.dataloader.latents_crop_width,
                      filter_unnormalized_samples=tconf.dataloader.filter_unnormalized_samples),
        process_index=jax.process_index(), process_count=jax.process_count())
    logger.info("dataset: %d samples (%s filtered)", len(ds),
                ds.num_filtered_samples)

    # each host loads its process-local share of the global batch:
    # global = device_batch * grad_accum * jax.device_count()
    local_batch = (tconf.device_batch_size
                   * tconf.gradient_accumulation_steps
                   * jax.local_device_count())

    def dataloader(epoch: int, skip_batches: int):
        # per-epoch shuffle seed + mid-epoch fast-forward (the Trainer
        # passes its restored epoch/batch position on resume; reference:
        # trainer.py:908-916,933 skip_first_batches)
        for batch in ds.iter_batches(
                "train", local_batch,
                seed=tconf.seed + epoch, skip_batches=skip_batches):
            paths = batch.pop("paths", None)
            adapted = batch_adapter(batch)
            adapted = shard_batch(mesh, adapted)
            if paths is not None:
                adapted["paths"] = paths
            yield adapted

    class EpochLoader:
        def epoch_iter(self, epoch: int, skip_batches: int = 0):
            return dataloader(epoch, skip_batches)

        def __iter__(self):  # plain-iterable fallback (epoch 0)
            return dataloader(0, 0)

    trainer = Trainer(tconf, jstep, state, EpochLoader(), ema_bank=ema_bank,
                      export_module_fn=export_fn, mesh=mesh)
    if args.resume:
        trainer.load_checkpoint()
    trainer.train(max_steps=args.max_steps)
    logger.info("training done at step %d", int(trainer.state.global_step))


if __name__ == "__main__":
    main()
