"""Multi-host (multi-process) distribution.

TPU-native replacement for the reference's multi-GPU Accelerate surface
(reference: src/training/trainer.py:242-293 — Accelerator init, num_processes
LR scaling, is_main_process io gating, save/load_state coordination), per
SURVEY.md §5.8:

  * ``maybe_initialize_distributed()`` — ``jax.distributed.initialize`` when
    a multi-process environment is configured (TPU pods auto-detect; explicit
    coordinator env vars cover CPU/GPU clusters and tests).
  * ``is_main_process()`` — ``jax.process_index() == 0`` gating for
    checkpoint/log/tensorboard io (the Accelerate ``is_main_process``
    equivalent).
  * per-process batch feeding happens in ``parallel.mesh.shard_batch`` via
    ``jax.make_array_from_process_local_data`` — each host loads only its own
    shard of the global batch (the reference's per-rank DataLoader split).

Environment variables (all optional — TPU pods need none):
  DD_COORDINATOR_ADDRESS  host:port of process 0
  DD_NUM_PROCESSES        total process count
  DD_PROCESS_ID           this process's rank
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)

_initialized = False


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None,
                                 local_device_ids=None) -> bool:
    """Initialize the JAX distributed runtime when configured.

    Explicit args win; otherwise DD_* env vars; otherwise no-op (single
    process). On TPU pod slices where the runtime auto-detects peers, set
    DD_NUM_PROCESSES alone to force argless auto-initialization.
    Returns True when the distributed runtime is (now) initialized.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "DD_COORDINATOR_ADDRESS")
    env_np = os.environ.get("DD_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None)
    env_pid = os.environ.get("DD_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None)

    if num_processes is None or num_processes <= 1:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
        if local_device_ids is not None:
            kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _initialized = True
    logger.info("jax.distributed initialized: process %d/%d, %d local / %d "
                "global devices", jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return True


def is_main_process() -> bool:
    """Rank-0 gate for filesystem / logging side effects
    (the Accelerate ``is_main_process`` equivalent)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()
