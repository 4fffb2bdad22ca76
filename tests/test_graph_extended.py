"""Extended graph CF family: SGL/NCL ssl terms, DGCF routing, SpectralCF,
GCMC, LINE — learning and smoke coverage on the block-community fixture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from recbox_tpu.data import MatchingLoader
from recbox_tpu.evaluation import RetrievalEvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.matching.graph import build_norm_edges
from recbox_tpu.models.matching.graph_extended import (
    DGCF, GCMC, LINE, NCL, SGL, SpectralCF, infonce, kmeans_prototypes,
)
from recbox_tpu.ops import get_matching_loss
from recbox_tpu.training import Trainer, TrainerConfig
from tests.test_graph import _graph_fixture

N_USERS, N_ITEMS = 48, 96


def _edges(rng, n=1200):
    fm, users, items, group, block = _graph_fixture(rng, n=n)
    eu, ei, c = build_norm_edges(users, items, N_USERS, N_ITEMS)
    return fm, users, items, group, block, tuple(eu), tuple(ei), tuple(c)


def _learn(model, fm, users, items, group, block, epochs=8, lr=0.05):
    seen = {}
    for u, it in zip(users, items):
        seen.setdefault(int(u), set()).add(int(it))
    valid_u2i = {}
    for u in range(N_USERS):
        cand = [x for x in range(group[u] * block, (group[u] + 1) * block)
                if x not in seen.get(u, ())]
        if cand:
            valid_u2i[u] = cand[:2]
    train_u2i = {u: sorted(s) for u, s in seen.items()}
    train_arrays = {"user_id": users, "item_id": items}
    corpus_arrays = {"item_id": np.arange(N_ITEMS, dtype=np.int32)}
    loader = MatchingLoader(fm, train_arrays, corpus_arrays, batch_size=256,
                            num_negs=8, seed=0)
    uu = np.array(sorted(valid_u2i), dtype=np.int32)
    ev = RetrievalEvaluator({"user_id": uu}, corpus_arrays, uu, train_u2i,
                            valid_u2i, metrics=["Recall(k=20)"])
    loss = get_matching_loss("PairwiseLogisticLoss")
    cfg = TrainerConfig(learning_rate=lr, epochs=epochs, patience=8,
                        monitor="Recall(k=20)", lr_decay_factor=1.0,
                        reload_best_on_plateau=False)
    trainer = Trainer(model, lambda o, b: loss(o), cfg, eval_fn=ev)
    return trainer.fit(loader)


@pytest.mark.parametrize("cls,kw,bar", [
    (SGL, {}, 0.5),                 # backbone = LightGCN
    # SpectralCF/GCMC both measure 1.0 here; 0.6 sits far above the
    # ~0.25 chance recall of random scoring over the eligible items
    (SpectralCF, {"n_layers": 2}, 0.6),
    (GCMC, {"hidden_dim": 32}, 0.6),
    (DGCF, {"n_intents": 4, "n_routing": 2, "n_layers": 1}, 0.4),
], ids=["SGL", "SpectralCF", "GCMC", "DGCF"])
def test_graph_models_learn_blocks(rng, cls, kw, bar):
    fm, users, items, group, block, eu, ei, c = _edges(rng)
    model = cls(feature_map=fm, embedding_dim=32, num_users=N_USERS,
                num_items=N_ITEMS, edge_users=eu, edge_items=ei,
                edge_coefs=c, **kw)
    metrics = _learn(model, fm, users, items, group, block)
    assert metrics["Recall(k=20)"] > bar, metrics


def test_line_learns_blocks(rng):
    fm, users, items, group, block, eu, ei, c = _edges(rng)
    model = LINE(feature_map=fm, embedding_dim=32, num_users=N_USERS,
                 num_items=N_ITEMS, order=1)
    metrics = _learn(model, fm, users, items, group, block, lr=0.05)
    assert metrics["Recall(k=20)"] > 0.4, metrics


def test_line_order2_has_context_table(rng):
    fm, users, items, group, block, eu, ei, c = _edges(rng, n=300)
    model = LINE(feature_map=fm, embedding_dim=16, num_users=N_USERS,
                 num_items=N_ITEMS, order=2)
    batch = {"user_id": jnp.asarray(users[:4]),
             "item_id": jnp.asarray(items[:4]),
             "__item_ids__": jnp.asarray(items[:4])[:, None],
             "item::item_id": jnp.asarray(items[:4])[:, None]}
    variables = model.init(jax.random.PRNGKey(0), batch)
    params = nn.meta.unbox(variables["params"])
    assert "emb_item_ctx" in params
    out = model.apply({"params": params}, batch)
    assert out.shape == (4, 1)


def test_sgl_ssl_loss_positive_and_finite(rng):
    fm, users, items, group, block, eu, ei, c = _edges(rng, n=400)
    model = SGL(feature_map=fm, embedding_dim=16, num_users=N_USERS,
                num_items=N_ITEMS, edge_users=eu, edge_items=ei,
                edge_coefs=c, drop_ratio=0.2)
    batch = {"user_id": jnp.asarray(users[:16]),
             "__item_ids__": jnp.asarray(items[:16])[:, None]}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, batch,
                           method=model.ssl_loss)
    params = nn.meta.unbox(variables["params"])
    loss = model.apply({"params": params}, batch, method=model.ssl_loss,
                       rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_ncl_losses(rng):
    fm, users, items, group, block, eu, ei, c = _edges(rng, n=400)
    model = NCL(feature_map=fm, embedding_dim=16, num_users=N_USERS,
                num_items=N_ITEMS, edge_users=eu, edge_items=ei,
                edge_coefs=c, hyper_layers=1, n_layers=2)
    batch = {"user_id": jnp.asarray(users[:16]),
             "__item_ids__": jnp.asarray(items[:16])[:, None]}
    variables = model.init(jax.random.PRNGKey(0), batch,
                           method=model.structural_loss)
    params = nn.meta.unbox(variables["params"])
    s = model.apply({"params": params}, batch, method=model.structural_loss)
    assert np.isfinite(float(s))
    # prototype loss with host-side kmeans over current embeddings
    ue = np.asarray(params["emb_user"])
    ie = np.asarray(params["emb_item"])
    up, ua = kmeans_prototypes(ue, 4, n_iters=5)
    ip, ia = kmeans_prototypes(ie, 4, n_iters=5)
    p = model.apply({"params": params}, batch, up, ip, ua, ia,
                    method=model.prototype_loss)
    assert np.isfinite(float(p)) and float(p) > 0


def test_infonce_prefers_aligned_views():
    a = jnp.eye(8, 16)
    aligned = infonce(a, a)
    rng = jax.random.PRNGKey(0)
    shuffled = infonce(a, a[jnp.array([3, 2, 1, 0, 7, 6, 5, 4])])
    assert float(aligned) < float(shuffled)


def test_kmeans_prototypes_separates_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(50, 4)) + np.array([5, 0, 0, 0])
    b = rng.normal(size=(50, 4)) - np.array([5, 0, 0, 0])
    emb = np.concatenate([a, b])
    centers, assign = kmeans_prototypes(emb, 2, n_iters=10)
    assert len(set(assign[:50])) == 1 and len(set(assign[50:])) == 1
    assert assign[0] != assign[50]


def test_kmeans_prototypes_degenerate_constant_table():
    """ADVICE round 4: a constant embedding table (or k > distinct rows)
    makes every point coincide with the first center, so the ∝-d² seeding
    distribution is all-zero; must fall back to uniform, not raise."""
    emb = np.ones((20, 4), dtype=np.float32)
    centers, assign = kmeans_prototypes(emb, 3, n_iters=2)
    assert centers.shape == (3, 4)
    assert assign.shape == (20,)
    np.testing.assert_allclose(centers[assign], emb, atol=1e-6)
