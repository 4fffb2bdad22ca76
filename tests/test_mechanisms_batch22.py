"""Mechanism tests batch 22 — the tree-ranker family: LambdaMART's lambda
gradients and tree nonlinearity, plus the gated xgboost/lightgbm
passthroughs.

* XOR FEATURE INTERACTION: relevance = XOR(f₀>0, f₁>0) over iid normal
  features (f₂, f₃ pure noise). Any LINEAR scorer is provably stuck at
  pairwise accuracy 0.5 in population — each feature's class-conditional
  distribution is symmetric (E[fᵢ | rel] identical across classes), so a
  linear score has equal class means; a train-fitted least-squares
  ranker measures 0.45-0.54 on fresh queries. LambdaMART's depth-3
  regression trees represent the interaction: pairwise accuracy 0.99 on
  FRESH queries (generalization, not memorization). Reference:
  `librerank/ranker.py:126-368`.

* LAMBDA GRADIENTS (`ranker.py` compute_lambda): exact conservation
  Σᵢ λᵢ = 0 (the pairwise matrix is antisymmetric, so total "rank
  momentum" is preserved), and an INVERTED pair receives ~2.7× the
  gradient magnitude of the same pair correctly ordered at the same
  ranks (0.270 vs 0.099) — λ concentrates effort on misorderings, the
  property that distinguishes lambda ranking from pointwise regression
  on relevance labels.

* xgboost/lightgbm passthroughs (`recbole .../exlib_recommender/`): the
  same XOR construction, auto-skipped when the optional packages are
  absent (this image ships neither — the ImportError gating itself is
  asserted in test_gap_models.py::test_exlib_gated_import).
"""

import numpy as np
import pytest

from recbox_tpu.models.exlib import LightGBMRecommender, XGBoostRecommender
from recbox_tpu.models.reranking.lambdamart import (
    LambdaMART, _lambdas_for_query,
)

NQ, ND = 60, 16


@pytest.fixture(scope="module")
def xor_queries():
    rng = np.random.default_rng(0)

    def draw(nq):
        X = rng.normal(size=(nq * ND, 4))
        rel = ((X[:, 0] > 0) ^ (X[:, 1] > 0)).astype(np.float64)
        qid = np.repeat(np.arange(nq), ND)
        return X, rel, qid

    return draw(NQ), draw(20)


def _pair_acc(scores, rel, qid):
    accs = []
    for q in np.unique(qid):
        g = np.flatnonzero(qid == q)
        p, n = scores[g][rel[g] == 1], scores[g][rel[g] == 0]
        if len(p) and len(n):
            accs.append((p[:, None] > n[None, :]).mean())
    return float(np.mean(accs))


def test_linear_ranker_is_blind_to_xor(xor_queries):
    (X, rel, qid), (Xe, rele, qide) = xor_queries
    w, *_ = np.linalg.lstsq(np.c_[X, np.ones(len(X))], rel * 2 - 1,
                            rcond=None)
    acc = _pair_acc(np.c_[Xe, np.ones(len(Xe))] @ w, rele, qide)
    assert 0.35 < acc < 0.65, acc  # measured 0.448


def test_lambdamart_trees_crack_xor_on_fresh_queries(xor_queries):
    (X, rel, qid), (Xe, rele, qide) = xor_queries
    lm = LambdaMART(n_trees=30, learning_rate=0.2, max_depth=3)
    lm.fit(X, rel, qid)
    acc = _pair_acc(lm.predict(Xe), rele, qide)
    assert acc > 0.9, acc  # measured 0.991


def test_lambda_gradients_conserve_and_focus_on_inversions():
    lam = _lambdas_for_query(np.array([3., 2., 1., 0.]),
                             np.array([1., 0., 1., 0.]))
    assert abs(lam.sum()) < 1e-12
    inv = _lambdas_for_query(np.array([1.0, 0.0]), np.array([0.0, 1.0]))
    ok = _lambdas_for_query(np.array([1.0, 0.0]), np.array([1.0, 0.0]))
    # antisymmetric within the pair, and the inversion dominates
    np.testing.assert_allclose(inv[0], -inv[1], rtol=1e-12)
    np.testing.assert_allclose(ok[0], -ok[1], rtol=1e-12)
    assert inv[1] > 0 > inv[0]          # push the relevant doc up
    assert abs(inv[0]) > 2 * abs(ok[0])  # 0.270 vs 0.099


def _xor_ctr(n, seed):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 4))
    y = ((X[:, 0] > 0) ^ (X[:, 1] > 0)).astype(np.float64)
    return X, y


@pytest.mark.parametrize("cls", [XGBoostRecommender, LightGBMRecommender],
                         ids=["xgboost", "lightgbm"])
def test_exlib_boosters_crack_xor_when_installed(cls):
    try:
        model = cls()
    except ImportError:
        pytest.skip(f"{cls.__name__} backend not installed (gated)")
    X, y = _xor_ctr(4000, 0)
    Xe, ye = _xor_ctr(1000, 1)
    model.fit(X, y, num_rounds=50)
    s = model.predict(Xe)
    order = np.argsort(s)
    rank = np.empty(len(s))
    rank[order] = np.arange(len(s))
    p = ye == 1
    auc = (rank[p].sum() - p.sum() * (p.sum() - 1) / 2) / (
        p.sum() * (len(s) - p.sum()))
    assert auc > 0.95, auc
