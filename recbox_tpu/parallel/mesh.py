"""Device mesh + sharding utilities: the distribution story of the framework.

The reference's distribution layer is NCCL DDP (replicated model, sharded
batch, implicit grad all-reduce — `configurator.py:497-506`,
`trainer.py:60-93`). Here the same and more falls out of the XLA compilation
model (SURVEY §2.9):

* Mesh(('data','model')) over the slice; batches are sharded over 'data'
  (data parallelism == DistributedSampler + DDP all-reduce, emitted by XLA);
* embedding tables carry flax partitioning metadata (('data','model'), None) from
  `nn.with_partitioning` (see `recbox_tpu/nn/embedding.py`), so `shard_params`
  row-shards every vocabulary across the 'model' axis — the reference has no
  analog (its tables are replicated `nn.Embedding`);
* gradient/metric collectives (reference `trainer.py:630-652` all_gather) are
  psum/all_gather emitted by XLA from the sharding layout, riding ICI within
  a slice and DCN across slices.

Single-device (or no-mesh) use degrades to a no-op: the same train step runs
unsharded, which is the fast path on one chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from flax import linen as nn
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_params", "shard_batch", "param_partition_specs",
           "replicate_specs", "DATA_AXIS", "MODEL_AXIS"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_model_shards: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh(('data','model')): all devices split into data × model axes."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % num_model_shards == 0, (
        f"{n} devices not divisible by model shards {num_model_shards}")
    grid = mesh_utils.create_device_mesh(
        (n // num_model_shards, num_model_shards), devices=devices)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def param_partition_specs(params):
    """PartitionSpec tree from flax `with_partitioning` metadata.

    Boxed leaves (nn.Partitioned) yield their declared spec, e.g.
    (('data','model'), None) for embedding tables; plain leaves yield P()
    (replicated).
    """
    return nn.get_partition_spec(params)


def replicate_specs(tree):
    return jax.tree_util.tree_map(lambda _: P(), tree)


def shard_params(params, mesh: Mesh, specs=None):
    """device_put every param with its NamedSharding; jit then preserves the
    layout (committed-input semantics), so the train step runs sharded without
    explicit in_shardings."""
    specs = specs if specs is not None else param_partition_specs(params)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(
        put, params, specs,
        is_leaf=lambda x: isinstance(x, (jax.Array, np.ndarray)))


def shard_batch(batch, mesh: Mesh):
    """Shard every batch array over the 'data' axis (dim 0).

    Multi-process: each process passes its LOCAL shard (host_shard_loader
    rows) and the global batch is assembled process-locally
    (`jax.make_array_from_process_local_data`) — global batch = P·B rows.
    A plain device_put would treat every host's local batch as the same
    GLOBAL value, silently dropping (P−1)/P of each host's loaded rows
    and shrinking the true batch P-fold.
    """
    multi = jax.process_count() > 1

    def put(x):
        arr = np.asarray(x)
        spec = P(DATA_AXIS) if arr.ndim >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        if multi and arr.ndim >= 1:
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.device_put(arr, sharding)

    return {k: put(v) for k, v in batch.items()}
