"""Embedding-table placement planning: replicate vs row-shard per table.

The reference replicates every table on every worker (DDP — its only
distribution mode, `third_party/recbole/config/configurator.py:497-506`).
On a TPU mesh the choice is per table and is a measured trade
(RecShard/DreamShard study exactly this for industry DLRM — see PAPERS.md):

* ROW-SHARD (the framework default, `P(('data','model'), None)` over the
  combined grid): per-step comm is the batch-scaled id/row exchange
  (`tools/inspect_sharded_hlo.py` proves bytes scale with batch, not
  vocab), and each device holds rows/n_devices. Right for LARGE tables —
  HBM capacity is the binding constraint.
* REPLICATE (`shard_table=False` on the spec): every device holds the
  full table; the gather is local (no exchange latency), and the dense
  grad all-reduces vocab·dim·4 bytes per step. Right for SMALL, HOT
  tables — a 100-row category table's 25 KB all-reduce is cheaper than
  putting its lookups on the exchange path, and the capacity cost is
  negligible.

`plan_table_placement` makes the call from a pure-numpy cost model
calibrated with this repo's measured constants (v5e, `tools/prof_*`):
row ops cost ~LAT_ROW per touched row (latency-bound, dtype-independent)
and collectives move bytes at ~ICI_BYTES_PER_S. The planner maximizes
projected step-time savings under a per-device HBM budget for the
replicated set. This is deliberately a STATIC planner (RecShard-style
statistics in, placement out) — it writes `FeatureSpec.shard_table`, so
the decision lands in the module's partitioning metadata and flows
through init/pjit like any other spec.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional, Sequence

import numpy as np

__all__ = ["TablePlacement", "plan_table_placement", "apply_placement"]

# measured v5e constants (tools/prof_row_width.py, docs/ARCHITECTURE.md)
LAT_ROW = 31e-9          # gather+scatter latency per touched row (s)
ICI_BYTES_PER_S = 45e9   # per-link ICI bandwidth (v5e, one direction)
BYTES_PER_VAL = 4.0      # f32 rows (packed layout pads to 128 lanes anyway)


@dataclasses.dataclass
class TablePlacement:
    name: str
    rows: int
    dim: int
    touches_per_step: float      # expected touched rows per step
    replicate: bool
    hbm_cost_bytes: int          # per-device bytes this choice costs
    step_saving_s: float         # projected step-time saving vs sharding


def _replicate_saving(rows: int, dim: int, touches: float,
                      n_devices: int) -> float:
    """Projected per-step saving of replicating one table vs sharding it.

    Sharded: the table's lookups ride the id/row exchange — their rows
    move across ICI and pay the exchange latency. Replicated: the gather
    is local, but the DENSE grad (rows·dim·4 bytes) all-reduces.
    """
    row_bytes = dim * BYTES_PER_VAL
    # sharded cost: exchanged row payload + per-row latency (each touched
    # row crosses a link once in, once back)
    sharded = touches * (2 * row_bytes / ICI_BYTES_PER_S + LAT_ROW)
    # replicated cost: ring all-reduce of the dense grad,
    # 2·(n-1)/n · table_bytes over ICI
    table_bytes = rows * row_bytes
    repl = 2.0 * (n_devices - 1) / max(n_devices, 1) \
        * table_bytes / ICI_BYTES_PER_S
    return sharded - repl


def plan_table_placement(
    table_shapes: Mapping[str, tuple],
    touches_per_step: Optional[Mapping[str, float]] = None,
    n_devices: int = 8,
    hbm_budget_bytes: float = 2 * 2 ** 30,
    batch_size: int = 8192,
) -> Dict[str, TablePlacement]:
    """Decide replicate-vs-shard for every table.

    Args:
      table_shapes: {table_name: (rows, dim)}.
      touches_per_step: expected touched rows per step per table (defaults
        to ``batch_size`` — one lookup per example per feature; pass real
        access counts for multi-valued/sequence features or skewed reuse).
      n_devices: mesh size the plan targets.
      hbm_budget_bytes: per-device byte budget the REPLICATED set may
        consume (keep it a small slice of HBM — sharded tables and
        activations own the rest).

    Greedy knapsack: sort candidate tables by saving per replicated byte,
    replicate while the projected saving is positive and the budget holds.
    """
    touches = dict(touches_per_step or {})
    plans: Dict[str, TablePlacement] = {}
    candidates = []
    for name, (rows, dim) in table_shapes.items():
        t = float(touches.get(name, batch_size))
        saving = _replicate_saving(int(rows), int(dim), t, n_devices)
        bytes_full = int(rows * dim * BYTES_PER_VAL)
        plans[name] = TablePlacement(
            name=name, rows=int(rows), dim=int(dim), touches_per_step=t,
            replicate=False,
            hbm_cost_bytes=bytes_full // max(n_devices, 1),
            step_saving_s=0.0)
        if saving > 0:
            candidates.append((saving / max(bytes_full, 1), saving,
                               bytes_full, name))
    budget = float(hbm_budget_bytes)
    for _, saving, bytes_full, name in sorted(candidates, reverse=True):
        extra = bytes_full - plans[name].hbm_cost_bytes  # vs sharded share
        if extra > budget:
            continue
        budget -= extra
        p = plans[name]
        plans[name] = dataclasses.replace(
            p, replicate=True, hbm_cost_bytes=bytes_full,
            step_saving_s=saving)
    return plans


def apply_placement(feature_map, plans: Mapping[str, TablePlacement]):
    """Write the plan into the schema: returns a NEW FeatureMap whose specs
    carry ``shard_table=False`` for replicated tables (FeatureEmbedding
    reads it when boxing the param's partitioning metadata)."""
    new_specs = []
    for spec in feature_map.features:
        plan = plans.get(spec.table_name)
        if plan is not None:
            new_specs.append(dataclasses.replace(
                spec, shard_table=not plan.replicate))
        else:
            new_specs.append(spec)
    return dataclasses.replace(feature_map, features=tuple(new_specs))
