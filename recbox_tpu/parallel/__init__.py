from recbox_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, make_mesh, param_partition_specs, replicate_specs,
    shard_batch, shard_params,
)
from recbox_tpu.parallel.placement import (
    TablePlacement, apply_placement, plan_table_placement,
)
from recbox_tpu.parallel.distributed import (
    host_shard_loader, initialize_distributed, process_info,
)

__all__ = [
    "TablePlacement", "apply_placement", "plan_table_placement",
    "DATA_AXIS", "MODEL_AXIS", "make_mesh", "param_partition_specs",
    "replicate_specs", "shard_batch", "shard_params",
    "initialize_distributed", "host_shard_loader", "process_info",
]
