"""LightGCN train throughput on one TPU chip (the graph-matching bench).

Gowalla-regime shapes: 30k users x 41k items, 1M interactions (edges),
d=64, 3 propagation layers, BPR with 1 negative, batch 2048. The
propagation is the padded-edge-list segment-sum design (SURVEY hard-part
6 — scipy-free). Honest timing: K-step scan + float() sync.

Run: cd /root/repo && python tools/prof_lightgcn_train.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

USERS, ITEMS, EDGES, D, B, K = 30_000, 41_000, 1_000_000, 64, 2048, 20


def main():
    from recbox_tpu.models.matching.graph import build_norm_edges
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.matching.graph import LightGCN
    from recbox_tpu.ops import get_matching_loss
    from recbox_tpu.training import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    users = rng.integers(0, USERS, EDGES).astype(np.int64)
    items = rng.integers(0, ITEMS, EDGES).astype(np.int64)
    eu, ei, coefs = build_norm_edges(users, items, USERS, ITEMS)
    fm = FeatureMap(
        "lgcnbench", (FeatureSpec("user_id", "categorical", source="user",
                                  vocab_size=USERS, embedding_dim=D),
                      FeatureSpec("item_id", "categorical", source="item",
                                  vocab_size=ITEMS, embedding_dim=D)),
        query_index="user_id", corpus_index="item_id", num_items=ITEMS)
    model = LightGCN(feature_map=fm, embedding_dim=D, n_layers=3,
                     num_users=USERS, num_items=ITEMS,
                     edge_users=tuple(eu), edge_items=tuple(ei),
                     edge_coefs=tuple(coefs))
    loss = get_matching_loss("PairwiseLogisticLoss")
    t = Trainer(model, lambda o, b: loss(o),
                TrainerConfig(learning_rate=1e-3, monitor="Recall(k=20)"))
    ids = rng.integers(0, ITEMS, (B, 2)).astype(np.int32)
    batch = {"user_id": rng.integers(0, USERS, B).astype(np.int32),
             "__item_ids__": ids, "item::item_id": ids}
    losses = t.train_steps_repeat(batch, K)
    _ = float(losses[-1])
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        losses = t.train_steps_repeat(batch, K)
        _ = float(losses[-1])
        best = min(best, time.perf_counter() - t0)
    per_step = best / K
    print(f"LightGCN (U={USERS}, I={ITEMS}, E={EDGES}, d={D}, L=3, B={B}, "
          f"BPR): {per_step*1e3:.2f} ms/step = "
          f"{B/per_step/1e3:.1f}k pairs/s "
          f"({EDGES*2*3/per_step/1e9:.1f}G edge-msgs/s)")


if __name__ == "__main__":
    main()
