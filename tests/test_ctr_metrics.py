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


class TestGroupedDeviceEngine:
    """Segment-sorted device grouped metrics == host loop oracle."""

    def _rand(self, n, n_groups, seed, ties=False):
        rng = np.random.default_rng(seed)
        y = (rng.random(n) > 0.6).astype(np.float32)
        p = rng.random(n).astype(np.float32)
        if ties:
            p = np.round(p * 10) / 10.0   # heavy ties
        g = rng.integers(0, n_groups, n).astype(np.int32)
        return y, p, g

    def test_matches_host_loop(self):
        from recbox_tpu.evaluation.ctr import (
            _grouped_rank_metric, _mrr, _ndcg, grouped_auc,
        )
        from recbox_tpu.evaluation.grouped import grouped_metrics_device
        for seed, ties in [(0, False), (1, True), (2, False)]:
            y, p, g = self._rand(500, 37, seed, ties)
            dev = grouped_metrics_device(y, p, g,
                                         ["gAUC", "avgAUC", "MRR"],
                                         ndcg_ks=(5,))
            assert dev["gAUC"] == pytest.approx(
                grouped_auc(y, p, g, weighted=True), abs=1e-5)
            assert dev["avgAUC"] == pytest.approx(
                grouped_auc(y, p, g, weighted=False), abs=1e-5)
            assert dev["MRR"] == pytest.approx(
                _grouped_rank_metric(y, p, g, _mrr), abs=1e-5)
            assert dev["NDCG@5"] == pytest.approx(
                _grouped_rank_metric(y, p, g,
                                     lambda t, q: _ndcg(t, q, 5)), abs=1e-5)

    def test_single_class_groups_skipped(self):
        from recbox_tpu.evaluation.grouped import grouped_metrics_device
        y = np.array([1, 1, 0, 1], np.float32)      # group 0 all-pos
        p = np.array([0.5, 0.2, 0.1, 0.9], np.float32)
        g = np.array([0, 0, 1, 1], np.int32)
        out = grouped_metrics_device(y, p, g, ["gAUC", "avgAUC"])
        assert out["gAUC"] == pytest.approx(1.0)     # only group 1 counts
        assert out["avgAUC"] == pytest.approx(1.0)

    def test_all_single_class_returns_zero(self):
        from recbox_tpu.evaluation.grouped import grouped_metrics_device
        y = np.ones(4, np.float32)
        p = np.random.default_rng(0).random(4).astype(np.float32)
        g = np.array([0, 0, 1, 1], np.int32)
        out = grouped_metrics_device(y, p, g, ["gAUC", "avgAUC"])
        assert out["gAUC"] == 0.0 and out["avgAUC"] == 0.0


def test_grouped_mrr_ndcg_hand_computed():
    """Anchor the host helpers (and through the parity test, the device
    engine) to hand-computed values — device-vs-host agreement alone could
    not catch a formula bug shared by both implementations."""
    from recbox_tpu.evaluation.ctr import _grouped_rank_metric, _mrr, _ndcg
    # group 0: labels by descending score = [0, 1, 0]  -> first hit rank 2
    # group 1: labels by descending score = [1, 0]     -> first hit rank 1
    y = np.array([0, 1, 0, 1, 0], np.float32)
    p = np.array([0.9, 0.8, 0.1, 0.7, 0.3], np.float32)
    g = np.array([0, 0, 0, 1, 1], np.int32)
    mrr = _grouped_rank_metric(y, p, g, _mrr)
    assert mrr == pytest.approx((1 / 2 + 1 / 1) / 2, abs=1e-6)
    # NDCG@2: group 0 dcg = 1/log2(3), idcg = 1/log2(2) -> 0.6309;
    # group 1 dcg = idcg = 1/log2(2) -> 1.0
    ndcg = _grouped_rank_metric(y, p, g, lambda t, q: _ndcg(t, q, 2))
    g0 = (1 / np.log2(3.0)) / (1 / np.log2(2.0))
    assert ndcg == pytest.approx((g0 + 1.0) / 2, abs=1e-6)
