"""Multi-host initialization + per-host input wiring.

The reference's multi-process entry is `run_recboles` + NCCL TCP rendezvous
(`quick_start.py:115-128`, `configurator.py:497-515`: ip/port/world_size/
nproc/offset config keys). The TPU-native equivalent is
`jax.distributed.initialize` (one process per host; on Cloud TPU the
coordinator/process count auto-resolve from the TPU metadata), after which
`jax.devices()` spans the slice and the SAME Mesh/pjit code runs unchanged —
no backend code to write (SURVEY §5.8).

What remains host-side is INPUT sharding: each process must read a disjoint
slice of the training data (the reference's DistributedSampler,
`abstract_dataloader.py:60-64`). `host_shard_loader` wires
`ShardLoader(shard_index=process_index, num_shard_readers=process_count)`
from the live runtime.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

logger = logging.getLogger("recbox_tpu")

__all__ = ["initialize_distributed", "host_shard_loader", "process_info",
           "merge_host_metrics"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` with the reference's explicit-rendezvous
    shape (ip:port / world_size / rank) or full auto-detection on Cloud TPU
    (all args None). Safe to call once per process, before device use."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    logger.info("distributed: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def process_info() -> dict:
    return {"process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": jax.local_device_count(),
            "global_devices": jax.device_count()}


def merge_host_metrics(metrics: dict, weight: float) -> dict:
    """Sample-weighted cross-process metric merge.

    The reference all-gathers (metric, num_samples) pairs from every rank
    and weight-averages (`trainer/trainer.py:630-652` `_map_reduce`); here
    each process evaluates ITS shard of the eval data (`host_shard_loader`)
    and calls this with the local metric dict + its local sample count.
    Single-process runs return the input unchanged.
    """
    if jax.process_count() == 1:
        return dict(metrics)
    import numpy as np
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    # a host with an EMPTY eval shard reports weight 0 (its metric values
    # may be NaN — mean of nothing); contribute exact zeros so one empty
    # shard cannot poison the fleet-wide merge
    if weight <= 0:
        local = np.zeros(len(keys) + 1, np.float64)
    else:
        local = np.asarray([metrics[k] * weight for k in keys] + [weight],
                           np.float64)
    gathered = multihost_utils.process_allgather(local)  # (P, M+1)
    totals = gathered.sum(axis=0)
    total_w = max(float(totals[-1]), 1e-12)
    return {k: float(totals[i]) / total_w for i, k in enumerate(keys)}


def host_shard_loader(path: str, **loader_kwargs):
    """A `ShardLoader` reading THIS process's disjoint shard partition —
    the DistributedSampler analog for multi-host input pipelines."""
    from recbox_tpu.data.shards import ShardLoader
    return ShardLoader(path, shard_index=jax.process_index(),
                       num_shard_readers=jax.process_count(),
                       **loader_kwargs)
