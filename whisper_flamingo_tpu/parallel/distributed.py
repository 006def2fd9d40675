"""Multi-host initialization and collective helpers.

TPU-native replacement for the reference's SLURM + Lightning DDP + NCCL
stack (`/root/reference/slurm/train_video_4gpu.sh`, SURVEY.md §5.8):
``jax.distributed`` handles process bootstrap; data parallelism shards
whole batches per host (see data/samplers.DistributedBatchSampler); all
gradient/metric reductions are GSPMD collectives inside the compiled
step — there is no user-visible allreduce.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX.

    On Cloud TPU pods this is argument-free (metadata-discovered); for
    SLURM-style launches the coordinator/process args map to the
    reference's MASTER_ADDR / world-size / rank environment.
    """
    kwargs = {}
    if coordinator_address or os.environ.get("COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["COORDINATOR_ADDRESS"]
        )
    if num_processes or os.environ.get("NUM_PROCESSES"):
        kwargs["num_processes"] = int(num_processes or os.environ["NUM_PROCESSES"])
    if process_id is not None or os.environ.get("PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None else os.environ["PROCESS_ID"]
        )
    jax.distributed.initialize(**kwargs)


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
