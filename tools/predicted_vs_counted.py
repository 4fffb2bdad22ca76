"""Predicted-vs-counted comm table: cost model × mesh shape vs HLO bytes.

For M = 2/4/8 model shards (8 virtual CPU devices, data = 8/M) and three
placements (all-sharded / mixed / all-replicated), compile the REAL dense
Trainer train step, count its collective result bytes from the optimized
HLO (`parallel.inspect.collective_stats`), and compare against
`parallel.placement.predict_step_comm_bytes` — the component model the
planner reasons with. Prints the markdown table ARCHITECTURE.md carries.

The prediction is DERIVED from the GSPMD exchange pattern (ids all-gather
+ batch-shaped forward assembly + backward row all-gather; vocab-shaped
fused grad all-reduce for replicated tables), not fitted: exact agreement
is expected everywhere except small-SHARDED tables, where XLA switches to
a vocab-shaped assembly when rows < batch (noted in the output) — a region
the planner replicates anyway.

Run: cd /root/repo && env PYTHONPATH= JAX_PLATFORMS=cpu \
     python tools/predicted_vs_counted.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.ctr import DeepFM
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.parallel import make_mesh
from recbox_tpu.parallel.inspect import collective_stats
from recbox_tpu.parallel.placement import predict_step_comm_bytes
from recbox_tpu.training import Trainer, TrainerConfig

VOCAB_BIG, VOCAB_SMALL, BATCH, DIM = 4096, 64, 256, 16


def build(mesh, placement):
    shard_big = placement in ("sharded", "mixed")
    shard_small = placement == "sharded"
    fm = FeatureMap("pvc", (
        FeatureSpec("big", "categorical", vocab_size=VOCAB_BIG,
                    embedding_dim=DIM, shard_table=shard_big),
        FeatureSpec("small", "categorical", vocab_size=VOCAB_SMALL,
                    embedding_dim=DIM, shard_table=shard_small),
    ), labels=("click",))
    rng = np.random.default_rng(0)
    b = {"big": rng.integers(0, VOCAB_BIG, BATCH).astype(np.int32),
         "small": rng.integers(0, VOCAB_SMALL, BATCH).astype(np.int32),
         "click": (rng.random(BATCH) > 0.5).astype(np.float32)}
    model = DeepFM(feature_map=fm, embedding_dim=DIM, hidden_units=(32,))
    t = Trainer(model, lambda o, bb: binary_crossentropy(o, bb["click"]),
                TrainerConfig(learning_rate=1e-2, monitor="AUC"), mesh=mesh)
    t.init(b)
    return t, b, (shard_big, shard_small)


def count_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def predicted(shard_big, shard_small, n_data, n_model, dense_params):
    # a DeepFM categorical feature owns an embedding table (V, D) AND a
    # first-order linear table (V, 1) with the same placement
    tables = [
        (VOCAB_BIG, DIM, shard_big), (VOCAB_BIG, 1, shard_big),
        (VOCAB_SMALL, DIM, shard_small), (VOCAB_SMALL, 1, shard_small),
    ]
    return predict_step_comm_bytes(tables, BATCH, n_data, n_model,
                                   dense_params)["total"]


def main():
    rows = []
    for M in (2, 4, 8):
        mesh = make_mesh(num_model_shards=M)
        n_data = 8 // M
        for placement in ("sharded", "mixed", "replicated"):
            t, b, (sb, ss) = build(mesh, placement)
            step = t._build_train_step()
            ops = collective_stats(step, t.params, t.model_state,
                                   t.opt_state, t._device_batch(b),
                                   jax.random.PRNGKey(0))
            counted = sum(op.bytes for op in ops)
            table_params = sum(
                count_params(v) for coll in ("embedding", "linear")
                if coll in t.params for v in t.params[coll].values())
            dense_params = count_params(t.params) - table_params
            pred = predicted(sb, ss, n_data, M, dense_params)
            ratio = counted / pred if pred else (0.0 if counted == 0 else
                                                float("inf"))
            rows.append((M, n_data, placement, pred, counted, ratio))
            print(f"M={M} data={n_data} {placement:10s} "
                  f"predicted={pred:>10,.0f}  counted={counted:>10,}  "
                  f"ratio={ratio:5.2f}" if pred else
                  f"M={M} data={n_data} {placement:10s} predicted=0  "
                  f"counted={counted}")
    print("\nmarkdown:\n")
    print("| mesh (data x model) | placement | predicted B/step | "
          "counted B/step | counted/predicted |")
    print("|---|---|---|---|---|")
    for M, n_data, placement, pred, counted, ratio in rows:
        print(f"| {n_data} x {M} | {placement} | {pred:,.0f} | {counted:,} "
              f"| {ratio:.2f} |" if pred or counted else
              f"| {n_data} x {M} | {placement} | 0 | 0 | — |")


if __name__ == "__main__":
    main()
