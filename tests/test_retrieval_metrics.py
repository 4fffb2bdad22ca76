"""Retrieval metric engine vs. a straight python re-implementation of the
reference formulas (`recbox/core/metrics.py:71-190`)."""

import numpy as np
import pytest

from recbox_tpu.evaluation import evaluate_retrieval, parse_metric


# -- reference formulas in plain python (oracle) ----------------------------
def ref_recall(topk, true, k):
    topk = list(topk[:k])
    hit = set(true) & set(topk)
    return len(hit) / (len(true) + 1e-12)


def ref_ndcg(topk, true, k):
    def dcg(items):
        s = set(true)
        return sum(1 / np.log(2 + i) for i, it in enumerate(items[:k]) if it in s)
    idcg = dcg(list(true)[:k])
    return dcg(list(topk)) / (idcg + 1e-12)


def ref_mrr(topk, true, k):
    s = set(true)
    return sum(1 / (i + 1.0) for i, it in enumerate(topk[:k]) if it in s)


def ref_map(topk, true, k):
    s = set(true)
    pos, prec = 0, 0.0
    for i, it in enumerate(topk[:k]):
        if it in s:
            pos += 1
            prec += pos / (i + 1.0)
    return prec / (pos + 1e-12)


def brute_force_oracle(user_embs, item_embs, train_u2i, valid_u2i, queries, metrics):
    scores = user_embs @ item_embs.T
    results = {m: [] for m in metrics}
    for row, q in enumerate(queries):
        s = scores[row].copy()
        s[list(train_u2i.get(q, []))] = -1e9
        order = np.argsort(-s, kind="stable")
        true = list(valid_u2i.get(q, []))
        for m in metrics:
            name, k = parse_metric(m)
            fn = {"Recall": ref_recall, "NDCG": ref_ndcg,
                  "MRR": ref_mrr, "MAP": ref_map}[name]
            results[m].append(fn(order, true, k))
    return {m: float(np.mean(v)) for m, v in results.items()}


@pytest.fixture
def setup(rng):
    num_users, num_items, dim = 37, 61, 8
    user_embs = rng.normal(size=(num_users, dim)).astype(np.float32)
    item_embs = rng.normal(size=(num_items, dim)).astype(np.float32)
    train_u2i = {u: list(rng.choice(num_items, size=rng.integers(0, 8),
                                    replace=False)) for u in range(num_users)}
    valid_u2i = {u: list(rng.choice(num_items, size=rng.integers(1, 6),
                                    replace=False)) for u in range(num_users)}
    queries = np.arange(num_users)
    return user_embs, item_embs, train_u2i, valid_u2i, queries


def test_matches_oracle(setup):
    user_embs, item_embs, train_u2i, valid_u2i, queries = setup
    metrics = ["Recall(k=5)", "Recall(k=20)", "NDCG(k=10)", "MRR(k=10)", "MAP(k=10)"]
    ours = evaluate_retrieval(user_embs, item_embs, train_u2i, valid_u2i,
                              queries, metrics, chunk_size=16)
    oracle = brute_force_oracle(user_embs, item_embs, train_u2i, valid_u2i,
                                queries, metrics)
    for m in metrics:
        np.testing.assert_allclose(ours[m], oracle[m], rtol=1e-5, err_msg=m)


def test_hitrate_precision_f1(setup):
    user_embs, item_embs, train_u2i, valid_u2i, queries = setup
    metrics = ["HitRate(k=5)", "Precision(k=5)", "F1(k=5)", "DCG(k=5)", "nRecall(k=5)"]
    out = evaluate_retrieval(user_embs, item_embs, train_u2i, valid_u2i,
                             queries, metrics)
    assert 0 <= out["HitRate(k=5)"] <= 1
    assert 0 <= out["Precision(k=5)"] <= 1
    p, r = out["Precision(k=5)"], out["F1(k=5)"]
    assert out["DCG(k=5)"] >= 0
    assert 0 <= out["nRecall(k=5)"] <= 1 + 1e-6


def test_train_items_masked():
    # user 0: best item (id 0) is in train → must not be retrieved
    user_embs = np.array([[1.0, 0.0]], dtype=np.float32)
    item_embs = np.array([[10.0, 0], [1.0, 0], [0.5, 0]], dtype=np.float32)
    out = evaluate_retrieval(user_embs, item_embs, {0: [0]}, {0: [1]},
                             [0], ["Recall(k=1)"])
    assert out["Recall(k=1)"] == pytest.approx(1.0)


def test_bad_metric_string():
    with pytest.raises(NotImplementedError):
        parse_metric("Recall@20")
