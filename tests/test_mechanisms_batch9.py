"""Mechanism-sensitive learns-signal tests, batch 9.

HGN / HRM / NPE are pooled-history (bag) models — their core mechanism is
building a user vector from the SET of consumed items (gated, hierarchical
or relu-bag pooled). Planted structure: items live in disjoint clusters,
histories stay inside one cluster, and the target is an UNSEEN item from
the same cluster — position/recency are useless (history order shuffled),
so scoring above chance requires the pooled set representation to encode
cluster identity (references `hgn.py`, `hrm.py`, `npe.py`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_learns_signal import _recall_at, _seq_fm, _train_full_scores


@pytest.mark.parametrize("model_name", ["HGN", "HRM", "NPE"])
def test_bag_models_complete_cooccurrence_cluster(model_name):
    from recbox_tpu.models.sequential.extended import HGN, HRM, NPE
    n_clusters, per_cluster, L, n, n_users = 6, 8, 4, 4000, 32
    V = 1 + n_clusters * per_cluster
    rng = np.random.default_rng(0)
    clusters = [1 + np.arange(per_cluster) + c * per_cluster
                for c in range(n_clusters)]
    seqs = np.zeros((n, L), np.int32)
    targets = np.zeros(n, np.int32)
    uids = rng.integers(0, n_users, size=n).astype(np.int32)
    for i in range(n):
        pool = clusters[rng.integers(0, n_clusters)]
        pick = rng.choice(pool, size=L + 1, replace=False)
        seqs[i] = pick[:L]
        targets[i] = pick[L]                    # unseen, same cluster
    arrays = {"item_seq": seqs, "seq_len": np.full(n, L, np.int32),
              "item_id": targets, "user_id": uids}
    cls = {"HGN": HGN, "HRM": HRM, "NPE": NPE}[model_name]
    model = cls(feature_map=_seq_fm(V), embedding_dim=16, max_seq_len=L,
                dropout=0.0, num_users=n_users)
    params = _train_full_scores(model, arrays, steps=250, lr=1e-2)
    sub = {k: v[:512] for k, v in arrays.items()}
    scores = np.asarray(model.apply(
        {"params": params}, {k: jnp.asarray(v) for k, v in sub.items()},
        train=False, method=model.full_scores))
    # recall@4 over the 4 unseen same-cluster items: the pooled set must
    # identify the cluster (chance: 4/(V-1) ~= 0.08 per slot)
    top4 = np.argsort(-scores, axis=1)[:, :4]
    hit = float((top4 == sub["item_id"][:, None]).any(1).mean())
    assert hit > 0.5, (model_name, hit)
