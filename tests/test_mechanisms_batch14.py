"""Mechanism tests batch 14 — sequential recurrence, attentive item
similarity, and KG→rec cold-start transfer:

* GRU4Rec vs FPMC on a SECOND-ORDER Markov signal: the next item is a
  function of the last TWO items jointly (target = (s[-1]+s[-2]) mod V).
  FPMC's Markov factor sees only the last item — for a fixed last item
  the target is uniform over the vocabulary, so FPMC is INFORMATION-
  THEORETICALLY stuck at chance recall 1/23 ≈ 0.043 (measured in-test as
  the first-order ceiling); GRU4Rec's recurrent state carries both.
  References: `third_party/recbole/.../gru4rec.py`, `fpmc.py` (the
  complementary first-order test where FPMC succeeds lives in
  test_sequential_extended.py::test_fpmc_markov).
* NAIS causal evidence selection under heavy dilution: one informative
  item + 15 uniform-noise items per history; the trained model must (a)
  resolve the partner map (chance 0.1), (b) be INVARIANT to resampling
  the 15 noise items, and (c) COLLAPSE to chance when only the signal
  item is replaced — the causal proof that the target-conditioned
  attention isolates the one informative history item. (A budget-based
  NAIS-vs-FISM contrast was tried and rejected: FISM also reaches
  acc 1.0 at this budget — dilution slows SNR, it does not remove
  representability.) Reference: `nais.py` attention.
* CFKG and MKR cold-item transfer: 15 of 40 items appear in NO training
  interaction; their group identity exists ONLY in KG triples
  (item --has_cat--> category entity). Scoring users against the cold
  items must recover the user's category preference (AUC > 0.75,
  chance 0.5): for CFKG the signal flows through the SHARED translation
  space (user + r ≈ item entity), for MKR through the cross&compress
  units mixing the KG-trained entity into the item representation. A
  model without the KG path provably sits at 0.5 on cold items (their
  interaction-side embeddings receive no gradient).
  References: `cfkg.py`, `mkr.py` CrossCompressUnit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.ops import pairwise_logistic_loss

from tests.test_learns_signal import _recall_at, _seq_fm, _train_full_scores


# ---------------------------------------------------------------------------
# GRU4Rec vs FPMC: second-order Markov
# ---------------------------------------------------------------------------

def _second_order_data(rng, V=24, L=6, n=4000):
    # usable ids 1..V-1 (0 = PAD); target is a joint function of the last
    # TWO items — marginal on either one alone is uniform
    seqs = rng.integers(1, V, size=(n, L)).astype(np.int32)
    a, b = seqs[:, -2] - 1, seqs[:, -1] - 1
    targets = (((a + b) % (V - 1)) + 1).astype(np.int32)
    uids = rng.integers(0, 16, size=n).astype(np.int32)
    return {"item_seq": seqs, "seq_len": np.full(n, L, np.int32),
            "item_id": targets, "user_id": uids}


def test_gru4rec_state_carries_second_order_markov():
    from recbox_tpu.models.sequential.models import GRU4Rec
    rng = np.random.default_rng(20)
    arrays = _second_order_data(rng)
    model = GRU4Rec(feature_map=_seq_fm(24), embedding_dim=16,
                    hidden_size=64, max_seq_len=6, dropout=0.0)
    params = _train_full_scores(model, arrays, steps=500, lr=1e-2)
    rec = _recall_at(model, params, {k: v[:512] for k, v in arrays.items()},
                     k=1)
    # chance = first-order ceiling = 1/23 ≈ 0.043 (measured below);
    # typical measured: ~0.95
    assert rec > 0.5, rec


def test_fpmc_first_order_factor_cannot_see_second_order():
    from recbox_tpu.models.sequential.extended import FPMC
    rng = np.random.default_rng(20)
    arrays = _second_order_data(rng)
    model = FPMC(feature_map=_seq_fm(24), embedding_dim=16, max_seq_len=6,
                 dropout=0.0, num_users=16)
    params = _train_full_scores(model, arrays, steps=500, lr=1e-2)
    rec = _recall_at(model, params, {k: v[:512] for k, v in arrays.items()},
                     k=1)
    # P(target | last) is uniform by construction, so the Markov factor's
    # optimum is chance 1/23 ≈ 0.043; this measured ceiling is what the
    # GRU4Rec test beats
    assert rec < 0.15, rec


# ---------------------------------------------------------------------------
# NAIS vs FISM: attention under dilution
# ---------------------------------------------------------------------------

def _dilution_world(rng, n=4000, L=16):
    """items: 1..10 signal (partner map into 11..20), 21..40 noise.
    History = 1 signal item + L-1 noise; positive target = partner."""
    V = 41
    partner = dict(zip(range(1, 11), rng.permutation(np.arange(11, 21))))
    sig = rng.integers(1, 11, n)
    hist = rng.integers(21, V, size=(n, L)).astype(np.int32)
    pos_slot = rng.integers(0, L, n)
    hist[np.arange(n), pos_slot] = sig
    pos = np.array([partner[int(s)] for s in sig], np.int64)
    return V, hist, sig, pos


def _train_history_model(model, hist, pos, V, steps, lr=1e-2, seed=0):
    rng_np = np.random.default_rng(seed)
    n = len(pos)
    init_ids = jnp.asarray(pos[:8])[:, None].repeat(2, 1)
    init_b = {"user_id": jnp.zeros(8, jnp.int32), "hist": jnp.asarray(hist[:8]),
              "__item_ids__": init_ids, "item::item_id": init_ids}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, init_b)
    params = nn.meta.unbox(variables["params"])
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, b):
        def loss_fn(p):
            return pairwise_logistic_loss(
                model.apply({"params": p}, b, True,
                            rngs={"dropout": jax.random.PRNGKey(2)}))
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(steps):
        idx = rng_np.integers(0, n, 256)
        neg = rng_np.integers(11, V, 256)      # negatives: partners + noise
        ids = jnp.asarray(np.stack([pos[idx], neg], axis=1))
        b = {"user_id": jnp.zeros(256, jnp.int32),
             "hist": jnp.asarray(hist[idx]),
             "__item_ids__": ids, "item::item_id": ids}
        params, opt, _ = step(params, opt, b)
    return params


def _partner_accuracy(model, params, hist, pos):
    """argmax over the 10 candidate partners (chance 0.1)."""
    cand = jnp.arange(11, 21)[None, :].repeat(512, 0)
    b = {"user_id": jnp.zeros(512, jnp.int32), "hist": jnp.asarray(hist[:512]),
         "__item_ids__": cand, "item::item_id": cand}
    scores = np.asarray(model.apply({"params": params}, b, False))
    pick = 11 + scores.argmax(1)
    return float((pick == pos[:512]).mean())


def _hist_fm(V):
    return FeatureMap(
        "dil14",
        (FeatureSpec("user_id", "categorical", source="user", vocab_size=1,
                     embedding_dim=8),
         FeatureSpec("item_id", "categorical", source="item", vocab_size=V,
                     embedding_dim=16)),
        query_index="user_id", corpus_index="item_id", num_items=V)


def test_nais_attention_is_causally_tied_to_the_signal_item():
    from recbox_tpu.models.matching.neural_cf import NAIS
    rng = np.random.default_rng(21)
    V, hist, sig, pos = _dilution_world(rng)
    model = NAIS(feature_map=_hist_fm(V), embedding_dim=16, num_items=V,
                 attention_dim=16)
    params = _train_history_model(model, hist, pos, V, steps=300)

    # (a) resolves the partner map through 16x dilution (chance 0.1)
    acc = _partner_accuracy(model, params, hist, pos)
    assert acc > 0.75, acc

    # (b) invariant to resampling ALL 15 noise items (the attention must
    # not be reading them)
    rng2 = np.random.default_rng(99)
    hist_resampled = rng2.integers(21, V, size=hist.shape).astype(np.int32)
    slot = np.argmax(np.isin(hist, np.arange(1, 11)), axis=1)
    hist_resampled[np.arange(len(hist)), slot] = \
        hist[np.arange(len(hist)), slot]
    acc_resampled = _partner_accuracy(model, params, hist_resampled, pos)
    assert acc_resampled > 0.7, acc_resampled

    # (c) collapses to chance when ONLY the signal item is replaced by
    # one more noise item (1/16 of the history changed)
    hist_ablated = hist.copy()
    hist_ablated[np.arange(len(hist)), slot] = \
        rng2.integers(21, V, size=len(hist))
    acc_ablated = _partner_accuracy(model, params, hist_ablated, pos)
    assert acc_ablated < 0.25, acc_ablated


# ---------------------------------------------------------------------------
# CFKG / MKR: cold-item transfer through the KG
# ---------------------------------------------------------------------------

N_USERS, N_ITEMS, N_GROUPS = 32, 40, 5
N_ENTITIES = N_ITEMS + N_GROUPS
HAS_CAT = 1


@pytest.fixture(scope="module")
def cold_world():
    rng = np.random.default_rng(22)
    ib = np.arange(N_ITEMS) % N_GROUPS               # item group
    ub = np.arange(N_USERS) % N_GROUPS               # user group
    cold = np.zeros(N_ITEMS, bool)
    for g in range(N_GROUPS):                        # 3 cold items per group
        cold[np.where(ib == g)[0][:3]] = True
    warm_pool = [np.where((ib == g) & ~cold)[0] for g in range(N_GROUPS)]
    n = 4000
    users = rng.integers(0, N_USERS, n)
    items = np.array([rng.choice(warm_pool[ub[u]]) for u in users])
    kg = {"heads": np.arange(N_ITEMS),
          "relations": np.full(N_ITEMS, HAS_CAT),
          "tails": N_ITEMS + ib}
    return users, items, ub, ib, cold, kg


def _fm():
    return FeatureMap(
        "cold14",
        (FeatureSpec("user_id", "categorical", source="user",
                     vocab_size=N_USERS, embedding_dim=16),
         FeatureSpec("item_id", "categorical", source="item",
                     vocab_size=N_ITEMS, embedding_dim=16)),
        query_index="user_id", corpus_index="item_id", num_items=N_ITEMS)


def _train_joint(model, users, items, kg, steps=400, lr=1e-2, seed=0):
    """pairwise CF on WARM interactions + TransE/tail KG loss, jointly."""
    rng_np = np.random.default_rng(seed)
    n = len(users)
    init_ids = jnp.asarray(items[:8])[:, None].repeat(2, 1)
    init_b = {"user_id": jnp.asarray(users[:8]),
              "__item_ids__": init_ids, "item::item_id": init_ids}
    params = nn.meta.unbox(model.init({"params": jax.random.PRNGKey(0),
                                       "dropout": jax.random.PRNGKey(1)},
                                      init_b)["params"])
    kb0 = {"kg_head": jnp.asarray(kg["heads"][:8]),
           "kg_relation": jnp.asarray(kg["relations"][:8]),
           "kg_tail": jnp.asarray(kg["tails"][:8]),
           "kg_neg_tail": jnp.zeros(8, jnp.int32)}
    kg_params = nn.meta.unbox(model.init(jax.random.PRNGKey(2), kb0,
                                         method=model.kg_loss)["params"])
    params = {**kg_params, **params}
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, b, kb):
        def loss_fn(p):
            cf = pairwise_logistic_loss(
                model.apply({"params": p}, b, True,
                            rngs={"dropout": jax.random.PRNGKey(3)}))
            kgl = model.apply({"params": p}, kb, method=model.kg_loss)
            return cf + kgl
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    n_kg = len(kg["heads"])
    for _ in range(steps):
        idx = rng_np.integers(0, n, 256)
        neg = rng_np.integers(0, N_ITEMS, 256)
        ids = jnp.asarray(np.stack([items[idx], neg], axis=1))
        b = {"user_id": jnp.asarray(users[idx]),
             "__item_ids__": ids, "item::item_id": ids}
        kidx = rng_np.integers(0, n_kg, 128)
        kb = {"kg_head": jnp.asarray(kg["heads"][kidx]),
              "kg_relation": jnp.asarray(kg["relations"][kidx]),
              "kg_tail": jnp.asarray(kg["tails"][kidx]),
              "kg_neg_tail": jnp.asarray(
                  rng_np.integers(0, N_ENTITIES, 128))}
        params, opt, _ = step(params, opt, b, kb)
    return params


def _cold_auc(scores, ub, ib, cold):
    """AUC of in-group vs out-group over COLD items only (chance 0.5)."""
    s = scores[:, cold]
    gi = ib[cold]
    hits, tot = 0, 0
    for u in range(scores.shape[0]):
        pos = s[u, gi == ub[u]]
        neg = s[u, gi != ub[u]]
        hits += (pos[:, None] > neg[None, :]).sum() \
            + 0.5 * (pos[:, None] == neg[None, :]).sum()
        tot += pos.size * neg.size
    return hits / tot


def test_cfkg_translation_space_transfers_to_cold_items(cold_world):
    from recbox_tpu.models.knowledge import CFKG
    users, items, ub, ib, cold, kg = cold_world
    model = CFKG(feature_map=_fm(), embedding_dim=16, num_users=N_USERS,
                 n_entities=N_ENTITIES, n_relations=2)
    params = _train_joint(model, users, items, kg)
    u = model.apply({"params": params}, {"user_id": jnp.arange(N_USERS)},
                    method=model.user_tower)
    table = model.apply({"params": params}, method=model.full_scores_table)
    scores = np.asarray(u) @ np.asarray(table).T
    auc = _cold_auc(scores[:, :N_ITEMS], ub, ib, cold)
    # cold items received ZERO interaction gradient; only the shared
    # translation space (TransE pulls same-category items toward the same
    # attribute tail) can rank them. Chance 0.5.
    assert auc > 0.75, auc


def test_mkr_cross_compress_transfers_to_cold_items(cold_world):
    from recbox_tpu.models.knowledge import MKR
    users, items, ub, ib, cold, kg = cold_world
    model = MKR(feature_map=_fm(), embedding_dim=16, num_users=N_USERS,
                num_items=N_ITEMS, n_entities=N_ENTITIES, n_relations=2,
                n_layers_cc=1, user_hidden=(32,))
    params = _train_joint(model, users, items, kg)
    u = model.apply({"params": params}, {"user_id": jnp.arange(N_USERS)},
                    method=model.user_tower)
    it = model.apply({"params": params}, {"item_id": jnp.arange(N_ITEMS)},
                     method=model.item_tower)
    scores = np.asarray(u) @ np.asarray(it).T
    auc = _cold_auc(scores, ub, ib, cold)
    # the KG tail-prediction task trains cold items' ENTITY embeddings
    # (same-category heads share a tail), and the cross&compress unit is
    # the only path mixing that entity signal into the item tower.
    assert auc > 0.75, auc
