from recbox_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, make_mesh, param_partition_specs, replicate_specs,
    shard_batch, shard_params,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "make_mesh", "param_partition_specs",
    "replicate_specs", "shard_batch", "shard_params",
]
