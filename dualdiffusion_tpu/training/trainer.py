"""The training orchestrator: epoch loop, checkpoint/resume, observability.

Capability parity with the reference's DualDiffusionTrainer
(reference: src/training/trainer.py, 1247 LoC), rebuilt host-side around the
pure jitted train steps:

  * config dataclasses: LRScheduleConfig / OptimizerConfig /
    DataLoaderConfig / LoggingConfig / TrainerConfig (reference :107-211)
    with the module-trainer selected from an explicit registry.
  * device mesh instead of Accelerate (parallel/mesh.py; SURVEY.md §5.8).
  * checkpointing (reference :746-916): time-based and `_save_checkpoint`
    trigger-file saves into ``<module>_checkpoint-<step>/`` containing the
    module safetensors+config, every EMA profile, the full TrainState
    (opt/EMA/counters/rng) via orbax, a source-code snapshot, and
    ``trainer_state.json``; rotation by ``checkpoints_total_limit``;
    resume restores everything and writes a src diff vs the snapshot
    (compare_dirs discipline, reference: src/utils/compare_dirs.py).
  * metrics: tensorboard (tensorboardX), per-channel means via TrainLogger
    semantics (reference :57-96), sigma-bucketed losses, per-sample loss
    json for outlier hunting (reference :944-951).
  * validation loop over the EMA bank profiles.
"""

from __future__ import annotations

import dataclasses
import datetime
import difflib
import json
import logging
import os
import shutil
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import load_json, save_json, save_safetensors
from .ema import EMABank, EMAConfig, save_ema_archive
from .optim import build_optimizer, lr_schedule
from .train_state import TrainState, init_train_state

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# configs (reference: trainer.py:107-211)
# ---------------------------------------------------------------------------

@dataclass
class LRScheduleConfig:
    lr_schedule: str = "edm2"
    learning_rate: float = 3e-3
    lr_warmup_steps: int = 5000
    lr_reference_steps: int = 70000
    lr_decay_exponent: float = 1.0
    min_learning_rate: float = 0.0


@dataclass
class OptimizerConfig:
    optimizer: str = "adamw"
    adam_beta1: float = 0.9
    adam_beta2: float = 0.99
    adam_epsilon: float = 1e-8
    weight_decay: float = 0.0
    max_grad_norm: float = 10.0
    dynamic_max_grad_norm_z: Optional[float] = 4.0
    muon_patterns: tuple = ("*w_mp*",)


@dataclass
class DataLoaderConfig:
    use_pre_encoded_latents: bool = True
    load_datatypes: tuple = ("latents", "audio_embeddings")
    dataloader_num_workers: int = 0
    prefetch_batches: int = 2
    raw_crop_width: int = 1408768
    latents_crop_width: int = 688
    filter_unnormalized_samples: bool = False


@dataclass
class LoggingConfig:
    logging_dir: Optional[str] = None
    tensorboard_http_port: Optional[int] = None
    per_sample_loss_logging: bool = True


@dataclass
class ParallelConfig:
    """Mesh layout for the production trainer (SURVEY.md §2.10).

    model_axis > 1 builds a (data, model) mesh and shards weights,
    optimizer moments and EMA profiles over 'model' (tensor parallel);
    fsdp=True shards them over 'data' instead (ZeRO-3 style — XLA
    all-gathers weights per layer and reduce-scatters grads). The
    reference has no analog (single-node DDP only, trainer.py:242-293)."""
    model_axis: int = 1
    fsdp: bool = False
    num_dcn_slices: int = 1


@dataclass
class TrainerConfig:
    model_path: str = ""
    model_name: str = "model"
    module_name: str = "unet"            # which pipeline module we train
    module_trainer: str = "unet"         # registry key
    module_trainer_config: dict = field(default_factory=dict)

    seed: int = 42
    device_batch_size: int = 8
    gradient_accumulation_steps: int = 8
    validation_device_batch_size: int = 8
    num_train_epochs: int = 500000
    max_train_steps: int = 1000000

    num_validation_epochs: int = 10      # validate every N epochs
    strict_checkpoint_time: bool = False
    min_checkpoint_time: int = 3600
    checkpoints_total_limit: int = 1
    enable_debug_mode: bool = False
    # §5.2: the jax-native analog of torch anomaly detection
    # (reference: trainer.py:330-332) — recompiles with NaN checks
    enable_anomaly_detection: bool = False
    # §5.1: capture a jax.profiler trace for steps [start, stop)
    # (replaces the reference's nvidia-smi polling, trainer.py:1093-1102)
    profile_steps: Optional[tuple] = None
    profile_dir: Optional[str] = None

    lr_schedule: LRScheduleConfig = field(default_factory=LRScheduleConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    dataloader: DataLoaderConfig = field(default_factory=DataLoaderConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    emas: Dict[str, dict] = field(default_factory=dict)


# module-trainer registry: name -> builder(trainer) -> (train_step, variables)
_MODULE_TRAINER_REGISTRY: Dict[str, Callable] = {}


def register_module_trainer(name: str):
    def deco(fn):
        _MODULE_TRAINER_REGISTRY[name] = fn
        return fn
    return deco


def get_module_trainer(name: str) -> Callable:
    if name not in _MODULE_TRAINER_REGISTRY:
        raise KeyError(f"unknown module trainer '{name}'; "
                       f"known: {sorted(_MODULE_TRAINER_REGISTRY)}")
    return _MODULE_TRAINER_REGISTRY[name]


class TrainLogger:
    """Accumulates channel -> running mean between flushes
    (reference: trainer.py:57-96)."""

    def __init__(self) -> None:
        self.channels: Dict[str, List[float]] = {}

    def add_logs(self, logs: Dict[str, Any]) -> None:
        for k, v in logs.items():
            v = np.asarray(v)
            if v.ndim == 0:
                self.channels.setdefault(k, []).append(float(v))

    def get_logs(self) -> Dict[str, float]:
        return {k: float(np.mean(v)) for k, v in self.channels.items() if v}

    def clear(self) -> None:
        self.channels.clear()


class Trainer:
    """Host-side loop around a jitted train step."""

    def __init__(self, config: TrainerConfig, train_step: Callable,
                 init_state: TrainState,
                 dataloader: Iterable,
                 ema_bank: Optional[EMABank] = None,
                 validation_dataloader: Optional[Iterable] = None,
                 export_module_fn: Optional[Callable] = None,
                 eval_step: Optional[Callable] = None,
                 mesh=None):
        """
        train_step(state, batch) -> (state, logs) — jitted pure step.
        export_module_fn(path, variables) — writes the module in pipeline
          (model-dir) format into a checkpoint dir.
        eval_step(params, batch, key) -> scalar loss — enables the
          validation loop over train weights + every EMA profile
          (reference: trainer.py validation epochs + ema
          include_in_validation).
        """
        self.eval_step = eval_step
        self.config = config
        self.train_step = train_step
        self.state = init_state
        self.dataloader = dataloader
        self.validation_dataloader = validation_dataloader
        self.ema_bank = ema_bank
        self.export_module_fn = export_module_fn
        self.mesh = mesh
        self.train_logger = TrainLogger()
        self.writer = self._make_writer()
        self.last_checkpoint_time = time.time()
        self.total_train_hours = 0.0
        self.epoch = 0
        # mid-epoch resume (reference: trainer.py:908-916,933): batches
        # fully consumed in the current epoch; persisted in
        # trainer_state.json and used to fast-forward the dataloader
        self.epoch_batch_idx = 0
        self._resume_skip_batches = 0
        self._pending_sample_losses: Dict[str, float] = {}
        # host-resident EMA profiles (EMAConfig.cpu_offload — the
        # reference's ema.py:257-270 analog). Driven by an AsyncHostEMA
        # worker so the per-step device->host params fetch overlaps the
        # next step instead of blocking it; the host_ema property syncs
        # before every read.
        self._async_host_ema = None
        lrc = config.lr_schedule
        self._lr_fn = lr_schedule(lrc.lr_schedule, lrc.learning_rate,
                                  lrc.lr_warmup_steps, lrc.lr_reference_steps,
                                  lrc.lr_decay_exponent, lrc.min_learning_rate)
        self.total_batch_size = (config.device_batch_size
                                 * config.gradient_accumulation_steps
                                 * max(jax.device_count(), 1))
        self._profiling = False
        if config.enable_anomaly_detection:
            jax.config.update("jax_debug_nans", True)
            logger.info("anomaly detection enabled (jax_debug_nans)")

    def _maybe_profile(self, step: int) -> None:
        """jax.profiler trace capture over a configured step window."""
        cfg = self.config
        if cfg.profile_steps is None:
            return
        start, stop = cfg.profile_steps
        if step == start and not self._profiling:
            d = cfg.profile_dir or os.path.join(cfg.model_path or ".",
                                                "profiles")
            os.makedirs(d, exist_ok=True)
            jax.profiler.start_trace(d)
            self._profiling = True
            logger.info("profiler trace started -> %s", d)
        elif step >= stop and self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
            logger.info("profiler trace stopped")

    # ---- observability ----------------------------------------------------
    def _make_writer(self):
        from ..parallel.distributed import is_main_process
        if not is_main_process():
            return None  # rank-0 io gating (Accelerate is_main_process)
        logdir = self.config.logging.logging_dir
        if logdir is None and self.config.model_path:
            logdir = os.path.join(self.config.model_path, "logs",
                                  f"{self.config.module_name}")
        if logdir is None:
            return None
        try:
            from tensorboardX import SummaryWriter
            os.makedirs(logdir, exist_ok=True)
            return SummaryWriter(logdir)
        except Exception:  # pragma: no cover
            logger.warning("tensorboard unavailable; metrics to log only")
            return None

    def _log_scalars(self, logs: Dict[str, float], step: int) -> None:
        if self.writer is not None:
            for k, v in logs.items():
                self.writer.add_scalar(k, v, step)

    # ---- checkpointing ------------------------------------------------------
    def _checkpoint_dir(self, step: int) -> Path:
        return Path(self.config.model_path) / \
            f"{self.config.module_name}_checkpoint-{step}"

    def save_checkpoint(self) -> Path:
        from ..parallel.distributed import is_main_process
        step = int(self.state.global_step)
        ckpt = self._checkpoint_dir(step)
        main = is_main_process()
        if main:
            ckpt.mkdir(parents=True, exist_ok=True)

            # 1. module in pipeline format (reference :547-562)
            if self.export_module_fn is not None:
                self.export_module_fn(ckpt, self.state.params)

            # 2. EMA profiles (device + host-offloaded)
            if self.ema_bank is not None:
                from ..pipelines.pipeline import _flatten
                for name in self.ema_bank.configs:
                    ep = self._ema_params(name)
                    if ep is None:
                        continue  # offloaded profile not initialized yet
                    save_safetensors(
                        _flatten(ep),
                        ckpt / self.config.module_name / f"ema_{name}.safetensors",
                        metadata={"std": str(self.ema_bank.configs[name].std),
                                  "global_step": str(step)})

        # 3. full train state via orbax (opt state, rng, counters).
        # NOT rank-gated: in multi-host runs every process participates in
        # the coordinated orbax save (shared filesystem required).
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save((ckpt / "train_state").absolute(), self.state, force=True)

        if main:
            # 4. trainer_state.json (reference :213-219)
            save_json({
                "global_step": step,
                "epoch": self.epoch,
                "epoch_batch_idx": self.epoch_batch_idx,
                "total_samples_processed": int(self.state.total_samples_processed),
                "total_train_hours": self.total_train_hours,
            }, ckpt / "trainer_state.json")

            # 5. source snapshot (reference :613-627)
            self._snapshot_source(ckpt / "src_snapshot")
            self._rotate_checkpoints()
        self.last_checkpoint_time = time.time()
        logger.info("saved checkpoint %s", ckpt)
        return ckpt

    def _snapshot_source(self, dst: Path) -> None:
        src_root = Path(__file__).resolve().parents[1]
        for py in src_root.rglob("*.py"):
            rel = py.relative_to(src_root)
            out = dst / rel
            out.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(py, out)

    def _rotate_checkpoints(self) -> None:
        limit = self.config.checkpoints_total_limit
        if limit <= 0:
            return
        from ..pipelines.pipeline import Pipeline
        ckpts = Pipeline.get_checkpoints(self.config.model_path,
                                         self.config.module_name)
        for old in ckpts[:-limit]:
            shutil.rmtree(old, ignore_errors=True)
            logger.info("rotated out checkpoint %s", old)

    def load_checkpoint(self) -> bool:
        from ..pipelines.pipeline import Pipeline
        ckpt = Pipeline.get_latest_checkpoint(self.config.model_path,
                                              self.config.module_name)
        if ckpt is None:
            return False
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore((ckpt / "train_state").absolute(),
                                     item=self.state)
        self.state = restored
        # host-offloaded EMA profiles are not in the orbax train_state;
        # restore them from the checkpoint's ema safetensors
        if self.ema_bank is not None and self.ema_bank.offloaded:
            from ..pipelines.pipeline import _unflatten
            from ..utils import load_safetensors
            restored_host = {}
            for name in self.ema_bank.offloaded:
                p = ckpt / self.config.module_name / f"ema_{name}.safetensors"
                if p.is_file():
                    # copy: safetensors arrays are read-only mmaps, and the
                    # host EMA lerp updates them in place
                    restored_host[name] = jax.tree_util.tree_map(
                        lambda v: np.array(v, np.float32, copy=True),
                        _unflatten(load_safetensors(p)))
            self.host_ema = restored_host or None
        ts = load_json(ckpt / "trainer_state.json")
        self.epoch = ts.get("epoch", 0)
        self.total_train_hours = ts.get("total_train_hours", 0.0)
        # mid-epoch fast-forward: skip the batches already consumed this
        # epoch so the remaining sequence equals an uninterrupted run's.
        # Optimizer hyperparams need no reconciliation pass (reference
        # :827-879): the optax chain is rebuilt from the CURRENT config at
        # startup and orbax restores only its state (moments/counts), so
        # post-checkpoint lr/beta/wd edits apply from the first resumed
        # step (tested: test_training.py mid-epoch resume cases).
        self.epoch_batch_idx = ts.get("epoch_batch_idx", 0)
        self._resume_skip_batches = self.epoch_batch_idx
        self._write_src_diff(ckpt)
        logger.info("resumed from %s at step %d (epoch %d, fast-forward "
                    "%d batches)", ckpt, int(self.state.global_step),
                    self.epoch, self._resume_skip_batches)
        return True

    def _write_src_diff(self, ckpt: Path) -> None:
        """Unified diff between the checkpoint's source snapshot and the
        working tree (reference: trainer.py:881-906 / compare_dirs.py)."""
        snap = ckpt / "src_snapshot"
        if not snap.is_dir():
            return
        src_root = Path(__file__).resolve().parents[1]
        diffs = []
        for old in snap.rglob("*.py"):
            rel = old.relative_to(snap)
            new = src_root / rel
            old_lines = old.read_text().splitlines(keepends=True)
            new_lines = new.read_text().splitlines(keepends=True) if new.is_file() else []
            d = list(difflib.unified_diff(old_lines, new_lines,
                                          fromfile=f"snapshot/{rel}",
                                          tofile=f"worktree/{rel}"))
            if d:
                diffs.extend(d)
        if diffs:
            stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
            out = Path(self.config.model_path) / f"src_diff_{stamp}.txt"
            out.write_text("".join(diffs))
            logger.info("source changed since checkpoint; diff at %s", out)

    # ---- main loop -----------------------------------------------------------
    def train(self, max_steps: Optional[int] = None) -> TrainState:
        cfg = self.config
        max_steps = max_steps or cfg.max_train_steps
        step_times: List[float] = []
        trigger = Path(cfg.model_path) / "_save_checkpoint" if cfg.model_path else None
        if (self.ema_bank is not None and self.ema_bank.offloaded
                and self.host_ema is None):
            # seed host profiles from the PRE-training params so the first
            # step's lerp runs like the in-graph EMABank.update (which is
            # initialized from the init params, not post-step-1 params)
            self.host_ema = self.ema_bank.host_init(
                jax.device_get(self.state.params))

        while self.epoch < cfg.num_train_epochs:
            for batch in self._epoch_iter():
                t0 = time.time()
                paths = batch.pop("paths", None)
                self._maybe_profile(int(self.state.global_step))
                self.state, logs = self.train_step(self.state, batch)
                self.epoch_batch_idx += 1
                self._update_host_emas()
                step = int(self.state.global_step)
                loss = float(logs["loss"])
                if not np.isfinite(loss):
                    # JAX-native analog of the reference NaN halt (:1053-1060):
                    # dynamic clip already zeroed the grads; surface it loudly
                    logger.error("non-finite loss at step %d", step)
                step_times.append(time.time() - t0)
                self.total_train_hours += step_times[-1] / 3600.0

                scalars = {f"loss/{cfg.module_name}": loss,
                           f"grad_norm/{cfg.module_name}": float(logs.get("grad_norm", 0.0)),
                           "perf/steps_per_sec": 1.0 / max(step_times[-1], 1e-9),
                           "perf/total_train_hours": self.total_train_hours}
                # forward every scalar component the module trainer reports
                # (loss_recon, loss_kl, loss_equivariance, loss_dae, ...)
                for k, v in logs.items():
                    if k in ("loss", "grad_norm", "bucket_sums",
                             "bucket_counts", "sample_losses",
                             "loss_weighted"):
                        continue
                    v = np.asarray(v)
                    if v.ndim == 0:
                        scalars[f"{k}/{cfg.module_name}"] = float(v)
                # learn rate / per-profile EMA betas / device memory
                # (reference logs learn_rate/*, ema_betas/*, gpu_stats/*;
                # trainer.py:1082-1102)
                scalars[f"learn_rate/{cfg.module_name}"] = float(
                    self._lr_fn(step))
                if self.ema_bank is not None:
                    from .ema import power_function_beta
                    t = max(int(self.state.total_samples_processed), 1)
                    bs = self.total_batch_size
                    for name, ecfg in self.ema_bank.configs.items():
                        if ecfg.std is not None:
                            scalars[f"ema_betas/{name}"] = float(
                                power_function_beta(ecfg.std, t + bs, bs))
                if step % 25 == 0:
                    ms = jax.local_devices()[0].memory_stats() or {}
                    if "bytes_in_use" in ms:
                        scalars["device_stats/mem_used_mb"] = \
                            ms["bytes_in_use"] / 1e6
                bs = logs.get("bucket_sums")
                bc = logs.get("bucket_counts")
                if bs is not None and bc is not None:
                    bs, bc = np.asarray(bs), np.asarray(bc)
                    for i in range(len(bs)):
                        if bc[i] > 0:
                            scalars[f"loss_buckets/{cfg.module_name}_{i}"] = \
                                float(bs[i] / bc[i])
                self.train_logger.add_logs(scalars)
                self._log_scalars(scalars, step)

                if paths is not None and cfg.logging.per_sample_loss_logging:
                    self._record_sample_losses(paths, logs)

                self._maybe_archive_emas(step)

                now = time.time()
                should_ckpt = (now - self.last_checkpoint_time > cfg.min_checkpoint_time
                               and cfg.strict_checkpoint_time)
                if trigger is not None and trigger.exists():
                    trigger.unlink()
                    should_ckpt = True
                if should_ckpt and cfg.model_path:
                    self.save_checkpoint()

                if step >= max_steps:
                    self._flush_sample_losses()
                    if cfg.model_path:
                        self.save_checkpoint()
                    return self.state

            self.epoch += 1
            self.epoch_batch_idx = 0
            self._flush_sample_losses()
            if (self.eval_step is not None
                    and self.validation_dataloader is not None
                    and self.epoch % max(self.config.num_validation_epochs, 1) == 0):
                self.validate()
            if self.ema_bank is not None:
                new_params, switched = self.ema_bank.maybe_switch(
                    self.state.ema_state, self.state.params, self.epoch,
                    int(self.state.global_step))
                if switched:
                    from .optim import normalize_mp_weights
                    self.state = dataclasses.replace(
                        self.state, params=normalize_mp_weights(new_params))
                    logger.info("switch EMA '%s' loaded into train weights", switched)
            if cfg.model_path and not cfg.strict_checkpoint_time and \
                    time.time() - self.last_checkpoint_time > cfg.min_checkpoint_time:
                self.save_checkpoint()
        return self.state

    def _epoch_iter(self):
        """One epoch's batch iterator. A dataloader exposing
        ``epoch_iter(epoch, skip_batches)`` (train.py's EpochLoader) gets
        the epoch number (per-epoch shuffle seed) and the mid-epoch
        fast-forward count; plain iterables just iterate (resume then
        restarts the epoch, logged as a warning)."""
        dl = self.dataloader
        skip = self._resume_skip_batches
        self._resume_skip_batches = 0
        if hasattr(dl, "epoch_iter"):
            return dl.epoch_iter(self.epoch, skip)
        if skip:
            logger.warning(
                "dataloader has no epoch_iter(); cannot fast-forward %d "
                "batches — this epoch restarts from its first batch", skip)
            self.epoch_batch_idx = 0
        return iter(dl)

    # ---- host-offloaded EMA (async, reference ema.py:257-270) ------------
    @property
    def host_ema(self) -> Optional[Dict[str, Any]]:
        """Host-resident cpu_offload EMA profiles; syncs the async worker
        so the returned tree reflects every completed train step."""
        if self._async_host_ema is None:
            return None
        self._async_host_ema.sync()
        return self._async_host_ema.profiles

    @host_ema.setter
    def host_ema(self, value: Optional[Dict[str, Any]]) -> None:
        if value is None and self._async_host_ema is None:
            return
        self._ensure_async_host_ema().restore(value)

    def _ensure_async_host_ema(self):
        if self._async_host_ema is None:
            from .ema import AsyncHostEMA
            self._async_host_ema = AsyncHostEMA(self.ema_bank,
                                                self.total_batch_size)
        return self._async_host_ema

    def _update_host_emas(self) -> None:
        """Per-step update of cpu_offload EMA profiles. The device->host
        params fetch + numpy lerp run on the AsyncHostEMA worker thread,
        overlapped with the next step's dispatch (reference: ema.py:257-270
        non-blocking CPU copies). The beta uses the PRE-step counters,
        matching the in-graph EMABank.update semantics exactly."""
        bank = self.ema_bank
        if bank is None or not bank.offloaded:
            return
        self._ensure_async_host_ema().update(
            self.state.params, self.state.total_samples_processed,
            self.state.global_step)

    def _ema_params(self, name: str):
        """The current weights of one EMA profile (device or host)."""
        if self.ema_bank is not None and name in self.ema_bank.offloaded:
            host = self.host_ema
            return None if host is None else host.get(name)
        return self.state.ema_state[name]

    def _maybe_archive_emas(self, step: int) -> None:
        """bf16 EMA archive snapshots every num_archive_steps for post-hoc
        reconstruction (reference: ema.py:316-321)."""
        if self.ema_bank is None or not self.config.model_path or step == 0:
            return
        for name, cfg in self.ema_bank.configs.items():
            n = cfg.num_archive_steps
            if n and step % n == 0:
                ep = self._ema_params(name)
                if ep is None:
                    continue
                path = Path(self.config.model_path) / \
                    f"{self.config.module_name}_ema_archive" / \
                    f"{step}_ema_{name}.safetensors"
                path.parent.mkdir(parents=True, exist_ok=True)
                save_ema_archive(ep, str(path), step,
                                 int(self.state.total_samples_processed),
                                 cfg.std or 0.0)
                logger.info("archived ema '%s' at step %d", name, step)

    def validate(self) -> Dict[str, float]:
        """Validation loss for the train weights and every EMA profile
        marked include_in_validation (reference: ema.py get_validation_emas
        + the trainer's validation epochs)."""
        import jax as _jax
        candidates = {"train": self.state.params}
        if self.ema_bank is not None:
            for name in self.ema_bank.validation_emas():
                ep = self._ema_params(name)
                if ep is None:
                    continue
                candidates[f"ema_{name}"] = jax.tree_util.tree_map(
                    lambda e: jnp.asarray(e, jnp.float32), ep)
        results: Dict[str, float] = {}
        key = _jax.random.PRNGKey(0)  # fixed key: comparable across epochs
        for name, params in candidates.items():
            losses = []
            for i, batch in enumerate(self.validation_dataloader):
                batch = dict(batch)
                batch.pop("paths", None)
                losses.append(float(self.eval_step(params, batch,
                                                   _jax.random.fold_in(key, i))))
            if losses:
                results[name] = float(np.mean(losses))
        step = int(self.state.global_step)
        scalars = {f"loss_validation/{k}": v for k, v in results.items()}
        self._log_scalars(scalars, step)
        logger.info("validation @ step %d: %s", step,
                    {k: round(v, 4) for k, v in results.items()})
        return results

    def _record_sample_losses(self, paths, logs) -> None:
        """Accumulate per-sample losses host-side; flushed to json once per
        epoch / checkpoint (the reference batches this per epoch,
        trainer.py:944-951 — per-step rewrites are O(n^2) io)."""
        per_sample = logs.get("sample_losses")
        if per_sample is None or not self.config.model_path:
            return
        # multi-host: sample_losses is the GLOBAL batch, sharded across
        # processes; np.asarray on a non-addressable array raises, and the
        # global row order would not line up with host-local `paths`.
        # Extract only this process's shard (data-sharded axis 0) so rows
        # pair 1:1 with the local batch.
        if hasattr(per_sample, "is_fully_addressable") \
                and not per_sample.is_fully_addressable:
            shards = sorted(per_sample.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            per_sample = np.concatenate(
                [np.asarray(s.data).reshape(-1) for s in shards])
        for p, l in zip(paths, np.asarray(per_sample).reshape(-1).tolist()):
            self._pending_sample_losses[str(p)] = float(l)

    def _flush_sample_losses(self) -> None:
        from ..parallel.distributed import is_main_process
        if (not self._pending_sample_losses or not self.config.model_path
                or not is_main_process()):
            return
        out = Path(self.config.model_path) / "per_sample_losses.json"
        data = load_json(out) if out.is_file() else {}
        data.update(self._pending_sample_losses)
        self._pending_sample_losses.clear()
        save_json(dict(sorted(data.items(), key=lambda kv: -kv[1])), out)
