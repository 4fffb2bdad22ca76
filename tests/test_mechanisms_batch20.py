"""Mechanism tests batch 20 — the neural-CF readout family: which score
functions can extract a signal from FROZEN planted representations, plus
NNCF's neighborhood inputs, DSSM's feature towers, and ENMF's whole-corpus
gradient.

* FROZEN BALANCED CODES: every user/item embedding table is frozen to a
  planted ±1 code of dim 4 drawn so that all 16 sign patterns appear
  EXACTLY n/16 times (pattern-balanced). The label of a pair is the
  CROSS-coordinate product sign u₀·v₁. Under the balanced design, the
  class-conditional means of every feature in the span
  {u, v, u⊙v, 1} are EXACTLY equal (verified symbolically over all 256
  pattern pairs while designing this file: max |Δmean| = 0.0), so any
  diagonal-bilinear + linear readout — a dot product (trace of the outer
  product), a weighted GMF channel, or a linear head over [u ⊙ v, u, v] —
  carries no first-moment signal. Measured: dot-product AUC 0.511,
  train-fitted linear+diagonal readout 0.464, NeuMF with an EMPTY MLP
  (head over [gmf, u, v] — exactly that span) 0.500. Balance matters:
  with iid ±1 codes, finite-entity imbalance leaks through the linear
  span (measured 0.63) — the pattern-balanced design closes that hole.
  - ConvNCF (`recbole .../convncf.py`): the CNN over the D×D OUTER
    PRODUCT sees the off-diagonal cell (0,1)=u₀·v₁ inside its first 2×2
    patch → frozen-table AUC 1.0. The mechanism is exactly "reads
    off-diagonal outer-product structure a dot product reduces away".
  - NeuMF (`neumf.py`): the MLP tower over CONCATENATED codes is the
    only nonlinear cross-coordinate path; hidden (32,16) → frozen-table
    AUC 1.0 vs its own empty-MLP variant at 0.500.

* NNCF neighborhood inputs (recbole `nncf.py`): 8 probe users appear
  ONLY in the neighbor tables (6 community items each), never in a
  training batch — their id embeddings provably keep init noise (zero
  gradient; see batch 19 for the argument). NNCF's convolved
  item-neighborhood channel routes trained item embeddings into the
  probe's representation → block AUC 0.996. NeuMF, identical data/
  training but no neighborhood inputs, measured 0.500 (blocks balanced
  12+2 users each so item popularity carries no block information —
  with unbalanced blocks a popularity prior leaked 0.66).

* DSSM feature towers (`dssm.py`): 16 COLD items (4 per category) never
  appear in training — excluded from negative sampling via
  `sampling_probs`, so their id rows keep init noise exactly. The item
  tower's category feature still places them → Recall(k=4) over the
  16-cold-item ranking (warm items masked): DSSM 0.96 vs id-only MF
  0.33 (chance 0.25).

* ENMF whole-corpus loss (`enmf.py` calculate_loss): the (Σuuᵀ)(Σvvᵀ)
  negative term touches EVERY item row each step — gradient norm > 0 for
  items absent from all histories, while the positive-only part
  (neg_weight=0) leaves those rows at exactly zero. This is the "no
  negative sampling anywhere" mechanism that lets batch-wise training
  rank the full corpus (learning asserted in
  test_general_recommenders.py; Gram-trick exactness vs the naive
  O(B·N) loss in test_eval_fixes.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from recbox_tpu.data import MatchingLoader
from recbox_tpu.evaluation import RetrievalEvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.knowledge import StaticArray
from recbox_tpu.models.matching.neural_cf import (
    ConvNCF, ENMF, NNCF, NeuMF, enmf_loss,
)
from recbox_tpu.models.matching.two_tower import DSSM, MF
from recbox_tpu.ops import get_matching_loss, pairwise_logistic_loss
from recbox_tpu.training import Trainer, TrainerConfig


def _auc(scores, labels):
    order = np.argsort(scores)
    rank = np.empty(len(scores))
    rank[order] = np.arange(len(scores))
    p = labels == 1
    np_, nn_ = p.sum(), (~p).sum()
    return (rank[p].sum() - np_ * (np_ - 1) / 2) / (np_ * nn_)


# ---------------------------------------------------------------- frozen codes

N_ENT, D = 192, 4


def _balanced_codes(n_ent, seed):
    """All 16 sign patterns of {±1}^4, each exactly n_ent/16 times."""
    pats = np.array([[1 if (k >> d) & 1 else -1 for d in range(4)]
                     for k in range(16)], np.float32)
    codes = np.repeat(pats, n_ent // 16, axis=0)
    return codes[np.random.default_rng(seed).permutation(n_ent)]


@pytest.fixture(scope="module")
def codes():
    ucode = _balanced_codes(N_ENT, 10)
    vcode = _balanced_codes(N_ENT, 11)

    def draw(n, seed):
        r = np.random.default_rng(seed)
        u = r.integers(0, N_ENT, n).astype(np.int32)
        v = r.integers(0, N_ENT, n).astype(np.int32)
        y = (ucode[u, 0] * vcode[v, 1] > 0).astype(np.float32)
        return u, v, y

    return ucode, vcode, draw(6000, 1), draw(2000, 2)


def _train_frozen(model, table_keys, codes, steps=500, lr=5e-3):
    """BCE training with the embedding tables pinned to the planted codes
    (their gradients zeroed every step)."""
    ucode, vcode, (tu, tv, ty), (eu, ev, ey) = codes
    ids0 = jnp.asarray(tv[:8])[:, None]
    b0 = {"user_id": jnp.asarray(tu[:8]), "__item_ids__": ids0,
          "item::item_id": ids0}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, b0)
    params = nn.meta.unbox(variables["params"])
    for k in table_keys:
        params[k] = jnp.asarray(ucode if "user" in k else vcode)
    tx = optax.adam(lr)
    st = tx.init(params)

    @jax.jit
    def step(params, st, b, y):
        def loss_fn(p):
            out = model.apply({"params": p}, b, True,
                              rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.mean(optax.sigmoid_binary_cross_entropy(out[:, 0], y))

        _, g = jax.value_and_grad(loss_fn)(params)
        for k in table_keys:
            g[k] = jnp.zeros_like(g[k])
        up, st = tx.update(g, st)
        return optax.apply_updates(params, up), st

    r = np.random.default_rng(0)
    for _ in range(steps):
        idx = r.integers(0, len(ty), 256)
        ids = jnp.asarray(tv[idx])[:, None]
        b = {"user_id": jnp.asarray(tu[idx]), "__item_ids__": ids,
             "item::item_id": ids}
        params, st = step(params, st, b, jnp.asarray(ty[idx]))
    ids = jnp.asarray(ev)[:, None]
    be = {"user_id": jnp.asarray(eu), "__item_ids__": ids,
          "item::item_id": ids}
    s = np.asarray(model.apply({"params": params}, be))[:, 0]
    return _auc(s, ey)


def test_dot_product_is_blind_to_cross_coordinate_signal(codes):
    # the trace readout of the outer product — measured 0.511; the
    # pattern-balanced design makes its class means exactly equal
    ucode, vcode, _, (eu, ev, ey) = codes
    dots = np.einsum("nd,nd->n", ucode[eu], vcode[ev])
    assert 0.42 < _auc(dots, ey) < 0.58


def test_fitted_linear_plus_diagonal_readout_is_blind(codes):
    # least-squares over [u, v, u⊙v, 1] fit on TRAIN pairs — 0.464
    ucode, vcode, (tu, tv, ty), (eu, ev, ey) = codes
    ft = np.c_[ucode[tu], vcode[tv], ucode[tu] * vcode[tv], np.ones(len(ty))]
    fe = np.c_[ucode[eu], vcode[ev], ucode[eu] * vcode[ev], np.ones(len(ey))]
    w, *_ = np.linalg.lstsq(ft, ty * 2 - 1, rcond=None)
    assert 0.40 < _auc(fe @ w, ey) < 0.60


def _code_fm():
    return FeatureMap(
        "codes", (FeatureSpec("user_id", "categorical", "user",
                              vocab_size=N_ENT, embedding_dim=D),
                  FeatureSpec("item_id", "categorical", "item",
                              vocab_size=N_ENT, embedding_dim=D)),
        query_index="user_id", corpus_index="item_id", num_items=N_ENT)


def test_convncf_cnn_reads_offdiagonal_outer_product(codes):
    model = ConvNCF(feature_map=_code_fm(), embedding_dim=D,
                    num_users=N_ENT, num_items=N_ENT, channels=(8, 8))
    auc = _train_frozen(model, ["emb_user", "emb_item"], codes)
    assert auc > 0.95, auc


def test_neumf_mlp_tower_is_the_cross_coordinate_path(codes):
    keys = ["emb_gmf_user", "emb_gmf_item", "emb_mlp_user", "emb_mlp_item"]
    full = NeuMF(feature_map=_code_fm(), embedding_dim=D, num_users=N_ENT,
                 num_items=N_ENT, mlp_hidden_units=(32, 16))
    auc_full = _train_frozen(full, keys, codes)
    # empty MLP ⇒ head over [gmf, u, v]: exactly the blind span (0.500)
    lin = NeuMF(feature_map=_code_fm(), embedding_dim=D, num_users=N_ENT,
                num_items=N_ENT, mlp_hidden_units=())
    auc_lin = _train_frozen(lin, keys, codes)
    assert auc_full > 0.95, auc_full
    assert 0.42 < auc_lin < 0.58, auc_lin


# ------------------------------------------------------------ NNCF neighbors

N_USERS_B, N_ITEMS_B, G_B = 56, 48, 4
N_REG_B = 48


@pytest.fixture(scope="module")
def nncf_fixture():
    """Balanced block data (12 regular + 2 probe users per block); probe
    users exist only in the neighbor tables."""
    rng = np.random.default_rng(4)
    ub = np.concatenate([np.repeat(np.arange(G_B), N_REG_B // G_B),
                         np.repeat(np.arange(G_B),
                                   (N_USERS_B - N_REG_B) // G_B)])
    ib = np.arange(N_ITEMS_B) % G_B
    users, items = [], []
    for u in range(N_REG_B):
        bi = np.flatnonzero(ib == ub[u])
        users += [u] * 6
        items += list(rng.choice(bi, size=6, replace=False))
    users, items = np.array(users), np.array(items)
    u_neigh = np.zeros((N_USERS_B, 6), np.int32)
    for u in range(N_USERS_B):
        if u < N_REG_B:
            u_neigh[u] = items[users == u][:6]
        else:
            bi = np.flatnonzero(ib == ub[u])
            u_neigh[u] = rng.choice(bi, 6, replace=False)
    i_neigh = np.zeros((N_ITEMS_B, 6), np.int32)
    for i in range(N_ITEMS_B):
        mine = users[items == i][:6]
        i_neigh[i, :len(mine)] = mine
    return users, items, ub, ib, u_neigh, i_neigh


def _block_fm():
    return FeatureMap(
        "b", (FeatureSpec("user_id", "categorical", "user",
                          vocab_size=N_USERS_B, embedding_dim=16),
              FeatureSpec("item_id", "categorical", "item",
                          vocab_size=N_ITEMS_B, embedding_dim=16)),
        query_index="user_id", corpus_index="item_id", num_items=N_ITEMS_B)


def _train_bpr(model, users, items, steps=300, lr=1e-2):
    ids0 = jnp.asarray(items[:8])[:, None].repeat(2, 1)
    b0 = {"user_id": jnp.asarray(users[:8]), "__item_ids__": ids0,
          "item::item_id": ids0}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, b0)
    params = nn.meta.unbox(variables["params"])
    tx = optax.adam(lr)
    st = tx.init(params)

    @jax.jit
    def step(params, st, b):
        def loss_fn(p):
            out = model.apply({"params": p}, b, True,
                              rngs={"dropout": jax.random.PRNGKey(2)})
            return pairwise_logistic_loss(out)

        _, g = jax.value_and_grad(loss_fn)(params)
        up, st = tx.update(g, st)
        return optax.apply_updates(params, up), st

    r = np.random.default_rng(0)
    for _ in range(steps):
        idx = r.integers(0, len(users), 256)
        neg = r.integers(0, N_ITEMS_B, 256)
        ids = jnp.asarray(np.stack([items[idx], neg], 1))
        b = {"user_id": jnp.asarray(users[idx]), "__item_ids__": ids,
             "item::item_id": ids}
        params, st = step(params, st, b)
    return params


def _probe_block_auc(model, params, ub, ib):
    s = np.asarray(model.apply(
        {"params": params}, {"user_id": jnp.arange(N_REG_B, N_USERS_B)},
        method=model.full_scores))
    aucs = []
    for k, u in enumerate(range(N_REG_B, N_USERS_B)):
        pos, neg = s[k, ib == ub[u]], s[k, ib != ub[u]]
        aucs.append((pos[:, None] > neg[None, :]).mean())
    return float(np.mean(aucs))


def test_nncf_neighborhood_channel_reaches_unsampled_users(nncf_fixture):
    users, items, ub, ib, u_neigh, i_neigh = nncf_fixture
    model = NNCF(feature_map=_block_fm(), embedding_dim=16,
                 num_users=N_USERS_B, num_items=N_ITEMS_B,
                 user_neighbors=StaticArray(u_neigh),
                 item_neighbors=StaticArray(i_neigh),
                 mlp_hidden_units=(32,))
    params = _train_bpr(model, users, items)
    auc = _probe_block_auc(model, params, ub, ib)
    assert auc > 0.85, auc


def test_neumf_without_neighborhood_inputs_is_blind_on_probes(nncf_fixture):
    users, items, ub, ib, _, _ = nncf_fixture
    model = NeuMF(feature_map=_block_fm(), embedding_dim=16,
                  num_users=N_USERS_B, num_items=N_ITEMS_B,
                  mlp_hidden_units=(32, 16))
    params = _train_bpr(model, users, items)
    auc = _probe_block_auc(model, params, ub, ib)
    assert 0.35 < auc < 0.65, auc


# ------------------------------------------------------------ DSSM cold items

def _dssm_fixture():
    n_users, n_items, g = 48, 48, 4
    blk = n_items // g
    rng = np.random.default_rng(7)
    ub = np.repeat(np.arange(g), n_users // g)
    cat = (np.arange(n_items) // blk).astype(np.int32)
    cold = np.zeros(n_items, bool)
    for b in range(g):
        cold[b * blk + blk - 4: b * blk + blk] = True
    users, items = [], []
    for u in range(n_users):
        warm = np.flatnonzero((cat == ub[u]) & ~cold)
        users += [u] * 6
        items += list(rng.choice(warm, size=6, replace=True))
    users = np.array(users, np.int32)
    items = np.array(items, np.int32)
    warm_ids = [int(x) for x in np.flatnonzero(~cold)]
    train_u2i = {u: warm_ids for u in range(n_users)}
    valid_u2i = {u: [int(x) for x in np.flatnonzero((cat == ub[u]) & cold)]
                 for u in range(n_users)}
    return users, items, cat, cold, train_u2i, valid_u2i, n_users, n_items, g


def _dssm_run(fm, model, users, items, cat, cold, train_u2i, valid_u2i,
              n_users, n_items, with_cat):
    corpus = {"item_id": np.arange(n_items, dtype=np.int32)}
    train = {"user_id": users, "item_id": items}
    if with_cat:
        corpus["item_cat"] = cat
        train["item_cat"] = cat[items]
    # cold ids are excluded from negative sampling: their rows receive
    # exactly zero gradient (never positive, never negative)
    probs = (~cold).astype(np.float64) / (~cold).sum()
    loader = MatchingLoader(fm, train, corpus, batch_size=256, num_negs=8,
                            seed=0, sampling_probs=probs)
    uu = np.arange(n_users, dtype=np.int32)
    ev = RetrievalEvaluator({"user_id": uu}, corpus, uu, train_u2i,
                            valid_u2i, metrics=["Recall(k=4)"])
    loss = get_matching_loss("PairwiseLogisticLoss")
    cfg = TrainerConfig(learning_rate=0.02, epochs=12, patience=50,
                        monitor="Recall(k=4)", lr_decay_factor=1.0,
                        reload_best_on_plateau=False)
    tr = Trainer(model, lambda o, b: loss(o), cfg, eval_fn=ev)
    return tr.fit(loader)["Recall(k=4)"]


def test_dssm_feature_tower_places_cold_items():
    users, items, cat, cold, tu, vu, n_users, n_items, g = _dssm_fixture()
    fm = FeatureMap(
        "d", (FeatureSpec("user_id", "categorical", "user",
                          vocab_size=n_users, embedding_dim=16),
              FeatureSpec("item_id", "categorical", "item",
                          vocab_size=n_items, embedding_dim=16),
              FeatureSpec("item_cat", "categorical", "item",
                          vocab_size=g, embedding_dim=16)),
        query_index="user_id", corpus_index="item_id", num_items=n_items)
    model = DSSM(feature_map=fm, embedding_dim=16,
                 user_hidden_units=(32, 16), item_hidden_units=(32, 16))
    rec = _dssm_run(fm, model, users, items, cat, cold, tu, vu,
                    n_users, n_items, with_cat=True)
    assert rec > 0.75, rec


def test_id_only_mf_cannot_place_cold_items():
    # measured 0.33 (chance 0.25): cold rows never gathered → init noise
    users, items, cat, cold, tu, vu, n_users, n_items, _ = _dssm_fixture()
    fm = FeatureMap(
        "m", (FeatureSpec("user_id", "categorical", "user",
                          vocab_size=n_users, embedding_dim=16),
              FeatureSpec("item_id", "categorical", "item",
                          vocab_size=n_items, embedding_dim=16)),
        query_index="user_id", corpus_index="item_id", num_items=n_items)
    rec = _dssm_run(fm, MF(feature_map=fm, embedding_dim=16), users, items,
                    cat, cold, tu, vu, n_users, n_items, with_cat=False)
    assert rec < 0.55, rec


# --------------------------------------------------------- ENMF whole corpus

def test_enmf_corpus_term_reaches_items_outside_all_histories():
    n_users, n_items = 32, 49  # +1 PAD row; items 41..48 never appear
    rng = np.random.default_rng(3)
    hist = rng.integers(1, 41, (n_users, 8)).astype(np.int64)
    never = list(range(41, 49))
    fm = FeatureMap(
        "e", (FeatureSpec("user_id", "categorical", "user",
                          vocab_size=n_users, embedding_dim=16),
              FeatureSpec("item_id", "categorical", "item",
                          vocab_size=n_items, embedding_dim=16)),
        query_index="user_id", corpus_index="item_id", num_items=n_items)
    model = ENMF(feature_map=fm, embedding_dim=16, num_users=n_users,
                 num_items=n_items, dropout=0.0)
    b0 = {"hist": jnp.asarray(hist)}
    variables = model.init({"params": jax.random.PRNGKey(0)}, b0,
                           method=model.all_scores_and_parts)
    params = nn.meta.unbox(variables["params"])

    def loss_w(p, nw):
        pos, u, table, h = model.apply({"params": p}, b0,
                                       method=model.all_scores_and_parts)
        return enmf_loss(pos, u, table, h, b0["hist"] != 0, neg_weight=nw)

    g_full = np.asarray(jax.grad(lambda p: loss_w(p, 0.5))(params)["emb_item"])
    g_pos = np.asarray(jax.grad(lambda p: loss_w(p, 0.0))(params)["emb_item"])
    assert np.linalg.norm(g_full[never], axis=1).min() > 0
    np.testing.assert_array_equal(g_pos[never], 0.0)
