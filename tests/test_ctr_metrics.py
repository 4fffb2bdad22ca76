"""CTR metric engine tests vs. hand-computed / closed-form values."""

import numpy as np
import jax.numpy as jnp
import pytest

from recbox_tpu.evaluation import auc_jax, auc_score, evaluate_ctr, grouped_auc, log_loss


def test_auc_perfect_and_random():
    y = np.array([0, 0, 1, 1])
    assert auc_score(y, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert auc_score(y, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0
    # one discordant pair of 4 → 0.75
    assert auc_score(y, np.array([0.1, 0.8, 0.3, 0.9])) == 0.75


def test_auc_ties_average_rank():
    y = np.array([0, 1, 0, 1])
    p = np.array([0.5, 0.5, 0.2, 0.9])
    # pairs: (n1,p1)=tie 0.5, (n1,p2)=concordant, (n2,p1)=conc, (n2,p2)=conc
    assert auc_score(y, p) == pytest.approx((0.5 + 3) / 4)


def test_auc_single_class_raises():
    with pytest.raises(ValueError):
        auc_score(np.ones(3), np.random.rand(3))


def test_logloss():
    y = np.array([1.0, 0.0])
    p = np.array([0.8, 0.1])
    expected = -(np.log(0.8) + np.log(0.9)) / 2
    assert log_loss(y, p) == pytest.approx(expected)


def test_gauc_weighting():
    # group a: 2 samples AUC=1; group b: 4 samples AUC=0.5 (tie);
    # group c: single-class → skipped
    y = np.array([0, 1, 0, 1, 0, 1, 1, 1])
    p = np.array([0.1, 0.9, 0.5, 0.5, 0.5, 0.5, 0.3, 0.4])
    g = np.array([0, 0, 1, 1, 1, 1, 2, 2])
    gauc = grouped_auc(y, p, g, weighted=True)
    assert gauc == pytest.approx((1.0 * 2 + 0.5 * 4) / 6)
    avg = grouped_auc(y, p, g, weighted=False)
    assert avg == pytest.approx((1.0 + 0.5) / 2)


def test_evaluate_ctr_dispatch(rng):
    n = 500
    y = (rng.random(n) > 0.7).astype(np.float64)
    p = np.clip(y * 0.6 + rng.random(n) * 0.4, 1e-6, 1 - 1e-6)
    g = rng.integers(0, 20, size=n)
    out = evaluate_ctr(y, p, ["AUC", "logloss", "gAUC", "avgAUC", "MRR", "NDCG(k=5)"],
                       group_id=g)
    assert 0.5 < out["AUC"] <= 1.0
    assert out["logloss"] > 0
    for k in ("gAUC", "avgAUC", "MRR", "NDCG(k=5)"):
        assert 0 <= out[k] <= 1.0 + 1e-9


def test_auc_jax_close_to_exact(rng):
    n = 4000
    y = (rng.random(n) > 0.6).astype(np.float32)
    p = np.clip(0.3 * y + 0.6 * rng.random(n), 0, 1).astype(np.float32)
    exact = auc_score(y, p)
    approx = float(auc_jax(jnp.asarray(p), jnp.asarray(y)))
    assert abs(exact - approx) < 5e-3


def test_group_metric_requires_group_id():
    with pytest.raises(AssertionError):
        evaluate_ctr(np.array([0, 1]), np.array([0.2, 0.8]), ["gAUC"])
