"""Regression tests for the round-2 evaluation/data review findings:

pad-item masking in full-sort and candidate sampling, duplicate-positive
dedup, standard-definition MRR/MAP variants alongside the
reference-parity ones, the trainer's padded-tail guard, grouped-metric
key/typo strictness, the RippleNet empty-hop copy fallback, and the
de-biased rerank NDCG overflow cap.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from recbox_tpu.evaluation.retrieval import (
    evaluate_retrieval, retrieval_metrics_from_topk,
)


# ---------------------------------------------------------------------------
# MRR/MAP: reference-parity vs standard definitions
# ---------------------------------------------------------------------------

def test_mrr_map_parity_and_standard_variants():
    # one user; hits at ranks 1, 2, 3 of 5; |relevant| = 5
    topk = np.array([[10, 11, 12, 13, 14]])
    true = np.array([[10, 11, 12, 20, 21]])
    out = retrieval_metrics_from_topk(
        topk, true, ["MRR(k=5)", "StdMRR(k=5)", "MAP(k=5)", "StdMAP(k=5)"])
    # reference core/metrics.py MRR: sum over ALL hits = 1 + 1/2 + 1/3
    assert out["MRR(k=5)"] == pytest.approx(1 + 0.5 + 1 / 3, abs=1e-5)
    # standard/recbole MRR: first hit only
    assert out["StdMRR(k=5)"] == pytest.approx(1.0, abs=1e-6)
    # reference MAP: (1/1 + 2/2 + 3/3) / hits_retrieved(3)
    assert out["MAP(k=5)"] == pytest.approx(1.0, abs=1e-5)
    # recbole MAP@k: normalized by min(|relevant|, k) = 5
    assert out["StdMAP(k=5)"] == pytest.approx(3.0 / 5.0, abs=1e-5)

    # single hit at rank 5, one relevant item: StdMRR = 1/5
    topk2 = np.array([[1, 2, 3, 4, 9]])
    true2 = np.array([[9, -1, -1, -1, -1]])
    out2 = retrieval_metrics_from_topk(topk2, true2,
                                       ["MRR(k=5)", "StdMRR(k=5)"])
    assert out2["StdMRR(k=5)"] == pytest.approx(0.2, abs=1e-6)
    assert out2["MRR(k=5)"] == pytest.approx(0.2, abs=1e-6)


# ---------------------------------------------------------------------------
# full-sort: exclude_items masks the pad row; duplicate positives collapse
# ---------------------------------------------------------------------------

def _embs():
    """Corpus where row 0 (the 'pad' item) is the BEST match for the user
    embedding, so an unmasked pad row always wins rank 1."""
    rng = np.random.default_rng(0)
    item_embs = rng.normal(size=(8, 4)).astype(np.float32)
    user = rng.normal(size=4).astype(np.float32)
    item_embs[0] = 10.0 * user          # pad row dominates every real item
    return user[None, :], item_embs


def test_full_sort_exclude_items_masks_pad_row():
    user_embs, item_embs = _embs()
    t2i, v2i = {0: []}, {0: [int(np.argsort(
        -(item_embs @ user_embs[0]))[1])]}   # best REAL item is the positive
    without = evaluate_retrieval(user_embs, item_embs, t2i, v2i, [0],
                                 metrics=["Recall(k=1)"])
    masked = evaluate_retrieval(user_embs, item_embs, t2i, v2i, [0],
                                metrics=["Recall(k=1)"], exclude_items=(0,))
    assert without["Recall(k=1)"] == 0.0      # pad row stole rank 1
    assert masked["Recall(k=1)"] == 1.0       # pad row −inf-masked


def test_full_sort_duplicate_positives_deduped():
    user_embs, item_embs = _embs()
    best = int(np.argsort(-(item_embs @ user_embs[0]))[0])
    t2i = {0: []}
    # the same positive listed twice must not halve Recall
    out = evaluate_retrieval(user_embs, item_embs, t2i, {0: [best, best]},
                             [0], metrics=["Recall(k=1)"])
    assert out["Recall(k=1)"] == 1.0


def test_candidate_sampling_respects_exclude_and_dedups():
    from recbox_tpu.evaluation.candidate import sample_eval_candidates
    n_items = 20
    cand_ids, cand_valid, true_padded = sample_eval_candidates(
        [0, 1], {0: [3], 1: [4]}, {0: [5, 5], 1: [6]}, n_items,
        num_negs=8, seed=0, exclude_items=(0,))
    # positives deduped: user 0's padded list holds 5 once
    assert (true_padded[0] == 5).sum() == 1
    # the excluded pad id never appears as a VALID negative candidate
    P = true_padded.shape[1]
    negs = cand_ids[:, P:]
    valid_negs = negs[cand_valid[:, P:]]
    assert not np.any(valid_negs == 0)


# ---------------------------------------------------------------------------
# trainer: padding training loader rejected
# ---------------------------------------------------------------------------

def test_trainer_rejects_padding_train_loader():
    from recbox_tpu.data import ArrayLoader
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import LR
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import Trainer, TrainerConfig

    fm = FeatureMap("padl", (
        FeatureSpec("a", "categorical", vocab_size=10, embedding_dim=4),),
        labels=("y",))
    model = LR(feature_map=fm)
    arrays = {"a": np.arange(10, dtype=np.int32) % 10,
              "y": np.ones(10, np.float32)}
    t = Trainer(model, lambda o, b: binary_crossentropy(o, b["y"]),
                TrainerConfig(epochs=1, monitor="AUC"))
    # 10 rows at batch 4 → tail of 2 padded rows: must refuse
    with pytest.raises(ValueError, match="drop_last"):
        t.fit(ArrayLoader(arrays, batch_size=4, drop_last=False, seed=0))
    # aligned or dropping loaders are fine
    t.fit(ArrayLoader(arrays, batch_size=4, drop_last=True, seed=0))
    t2 = Trainer(model, lambda o, b: binary_crossentropy(o, b["y"]),
                 TrainerConfig(epochs=1, monitor="AUC"))
    t2.fit(ArrayLoader(arrays, batch_size=5, drop_last=False, seed=0))


# ---------------------------------------------------------------------------
# grouped metrics: typo strictness + string NDCG keys
# ---------------------------------------------------------------------------

def test_grouped_metrics_raise_on_unknown_and_use_string_keys():
    from recbox_tpu.evaluation.grouped import grouped_metrics_device
    y = np.array([1, 0, 1, 0], np.float32)
    p = np.array([0.9, 0.1, 0.8, 0.3], np.float32)
    g = np.array([0, 0, 1, 1], np.int32)
    out = grouped_metrics_device(y, p, g, ["gAUC"], ndcg_ks=(5,))
    assert "NDCG@5" in out and isinstance(out["NDCG@5"], float)
    with pytest.raises(ValueError, match="unknown grouped metric"):
        grouped_metrics_device(y, p, g, ["gauc"])
    with pytest.raises(ValueError, match="unknown grouped metric"):
        grouped_metrics_device(y, p, g, ["NDCG@10"])


# ---------------------------------------------------------------------------
# ripple sets: empty hop>0 copies the previous hop (reference parity)
# ---------------------------------------------------------------------------

def test_ripple_sets_empty_hop_copies_previous():
    from recbox_tpu.data.knowledge import KnowledgeGraph, build_ripple_sets
    # 0 -r1-> 1; entity 1 has NO outgoing triples → hop 1 is empty
    kg = KnowledgeGraph(heads=np.array([0]), relations=np.array([1]),
                        tails=np.array([1]), n_entities=3, n_relations=2,
                        n_items=3)
    rs = build_ripple_sets(kg, {7: [0]}, n_hops=2, n_memory=4, seed=0)
    # hop 0: the real triple (0, 1, 1)
    assert set(rs["heads"][0, 0].tolist()) == {0}
    assert set(rs["relations"][0, 0].tolist()) == {1}
    # hop 1: COPY of hop 0 — not relation-0 self-loops
    np.testing.assert_array_equal(rs["heads"][0, 1], rs["heads"][0, 0])
    np.testing.assert_array_equal(rs["relations"][0, 1],
                                  rs["relations"][0, 0])
    np.testing.assert_array_equal(rs["tails"][0, 1], rs["tails"][0, 0])


# ---------------------------------------------------------------------------
# rerank NDCG: de-biased labels must not overflow to NaN
# ---------------------------------------------------------------------------

def test_rerank_ndcg_debiased_labels_no_nan():
    from recbox_tpu.evaluation.rerank import evaluate_rerank
    # label/propensity = 1/5e-4 = 2000 → 2^2000 would overflow f64
    labels = np.array([[2000.0, 0.0, 1.0, 0.0]])
    scores = np.array([[4.0, 3.0, 2.0, 1.0]])
    mask = np.ones((1, 4), bool)
    out = evaluate_rerank(scores, labels, mask, ks=[4])
    assert np.isfinite(out["NDCG@4"])
    assert out["NDCG@4"] == pytest.approx(1.0, abs=1e-6)  # ideal order


# ---------------------------------------------------------------------------
# ENMF: Gram-trick whole-corpus loss == naive O(B*N) computation
# ---------------------------------------------------------------------------

def test_enmf_efficient_loss_matches_naive():
    """The (sum uu^T)(sum vv^T) reduction must equal the literal
    c0*sum_u sum_ALL-ITEMS yhat^2 term it replaces — a shared-formula bug
    in the trick would silently mistrain ENMF at every scale."""
    from recbox_tpu.models.matching.neural_cf import enmf_loss
    rng = np.random.default_rng(0)
    B, N, D, c0 = 6, 9, 4, 0.37
    user_repr = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    item_table = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
    pos_items = rng.integers(0, N, size=B)
    mask = np.array([1, 1, 0, 1, 1, 1], np.float32)   # one padded row
    hv = np.asarray(item_table) * np.asarray(h)[None, :]
    scores_all = np.asarray(user_repr) @ hv.T          # (B, N)
    pos_scores = scores_all[np.arange(B), pos_items]
    eff = float(enmf_loss(jnp.asarray(pos_scores), user_repr, item_table,
                          h, jnp.asarray(mask) > 0, neg_weight=c0))
    naive = (np.sum(((1 - c0) * pos_scores ** 2 - 2 * pos_scores) * mask)
             + c0 * np.sum(scores_all ** 2)) / B
    assert eff == pytest.approx(naive, rel=1e-5)
