"""Graph models: normalized edges, propagation math, LightGCN learning."""

import jax.numpy as jnp
import numpy as np
import pytest

from recbox_tpu.data import MatchingLoader
from recbox_tpu.evaluation import RetrievalEvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.matching.graph import LightGCN, NGCF, build_norm_edges
from recbox_tpu.ops import get_matching_loss
from recbox_tpu.training import Trainer, TrainerConfig


def test_build_norm_edges_dedup_and_coef():
    u = np.array([0, 0, 1, 0])
    i = np.array([0, 1, 0, 0])  # (0,0) duplicated
    eu, ei, c = build_norm_edges(u, i, num_users=2, num_items=2)
    assert len(eu) == 3  # dedup
    # deg(u0)=2, deg(i0)=2 → coef(0,0)=1/2
    idx = [k for k in range(3) if eu[k] == 0 and ei[k] == 0][0]
    assert c[idx] == pytest.approx(0.5)
    # deg(u1)=1, deg(i0)=2 → 1/√2
    idx = [k for k in range(3) if eu[k] == 1][0]
    assert c[idx] == pytest.approx(1 / np.sqrt(2))


def _graph_fixture(rng, num_users=48, num_items=96, num_groups=4, n=1200):
    group = rng.integers(0, num_groups, num_users)
    block = num_items // num_groups
    users = rng.integers(0, num_users, n)
    items = group[users] * block + rng.integers(0, block, n)
    fm = FeatureMap(
        "g", (FeatureSpec("user_id", "categorical", "user",
                          vocab_size=num_users, embedding_dim=32),
              FeatureSpec("item_id", "categorical", "item",
                          vocab_size=num_items, embedding_dim=32)),
        query_index="user_id", corpus_index="item_id", num_items=num_items)
    return fm, users.astype(np.int32), items.astype(np.int32), group, block


def test_lightgcn_propagation_mean_layers():
    # 1 user, 1 item, 1 edge: propagated user emb = mean(u0, i0) for 1 layer
    fm = FeatureMap(
        "t", (FeatureSpec("user_id", "categorical", "user", vocab_size=1,
                          embedding_dim=4),
              FeatureSpec("item_id", "categorical", "item", vocab_size=1,
                          embedding_dim=4)),
        query_index="user_id", corpus_index="item_id", num_items=1)
    model = LightGCN(feature_map=fm, embedding_dim=4, num_users=1, num_items=1,
                     n_layers=1, edge_users=(0,), edge_items=(0,),
                     edge_coefs=(1.0,))
    import jax
    batch = {"user_id": jnp.array([0]), "item_id": jnp.array([0]),
             "__item_ids__": jnp.array([[0]]),
             "item::item_id": jnp.array([[0]])}
    variables = model.init(jax.random.PRNGKey(0), batch)
    from flax import linen as nn
    params = nn.meta.unbox(variables["params"])
    ue, ie = model.apply({"params": params}, method=model.propagated)
    u0 = params["emb_user"]
    i0 = params["emb_item"]
    np.testing.assert_allclose(ue, (u0 + i0) / 2, rtol=1e-5)
    np.testing.assert_allclose(ie, (u0 + i0) / 2, rtol=1e-5)


def test_lightgcn_learns_blocks(rng):
    fm, users, items, group, block = _graph_fixture(rng)
    seen = {}
    for u, it in zip(users, items):
        seen.setdefault(int(u), set()).add(int(it))
    # held-out: unseen block item per user
    valid_u2i = {}
    for u in range(48):
        cand = [x for x in range(group[u] * block, (group[u] + 1) * block)
                if x not in seen.get(u, ())]
        if cand:
            valid_u2i[u] = cand[:2]
    train_u2i = {u: sorted(s) for u, s in seen.items()}

    eu, ei, c = build_norm_edges(users, items, 48, 96)
    model = LightGCN(feature_map=fm, embedding_dim=32, num_users=48,
                     num_items=96, n_layers=2,
                     edge_users=tuple(eu), edge_items=tuple(ei),
                     edge_coefs=tuple(c))
    train_arrays = {"user_id": users, "item_id": items}
    corpus_arrays = {"item_id": np.arange(96, dtype=np.int32)}
    loader = MatchingLoader(fm, train_arrays, corpus_arrays, batch_size=256,
                            num_negs=8, seed=0)
    uu = np.array(sorted(valid_u2i), dtype=np.int32)
    ev = RetrievalEvaluator({"user_id": uu}, corpus_arrays, uu, train_u2i,
                            valid_u2i, metrics=["Recall(k=20)"])
    loss = get_matching_loss("PairwiseLogisticLoss")
    cfg = TrainerConfig(learning_rate=0.05, epochs=8, patience=8,
                        monitor="Recall(k=20)", lr_decay_factor=1.0,
                        reload_best_on_plateau=False)
    trainer = Trainer(model, lambda o, b: loss(o), cfg, eval_fn=ev)
    metrics = trainer.fit(loader)
    assert metrics["Recall(k=20)"] > 0.5, metrics


def test_ngcf_smoke(rng):
    fm, users, items, group, block = _graph_fixture(rng, n=400)
    eu, ei, c = build_norm_edges(users, items, 48, 96)
    model = NGCF(feature_map=fm, embedding_dim=16, num_users=48, num_items=96,
                 n_layers=2, edge_users=tuple(eu), edge_items=tuple(ei),
                 edge_coefs=tuple(c))
    train_arrays = {"user_id": users, "item_id": items}
    corpus_arrays = {"item_id": np.arange(96, dtype=np.int32)}
    loader = MatchingLoader(fm, train_arrays, corpus_arrays, batch_size=128,
                            num_negs=4, seed=0)
    loss = get_matching_loss("PairwiseLogisticLoss")
    cfg = TrainerConfig(learning_rate=1e-2, epochs=1, monitor="x")
    trainer = Trainer(model, lambda o, b: loss(o), cfg)
    for batch in loader:
        batch.pop("__mask__", None)
        out = trainer.train_step(batch)
    assert np.isfinite(float(out))
