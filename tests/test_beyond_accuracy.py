"""Beyond-accuracy metrics, MetaBalance gradient balancing, and the
case-study full_sort_topk helper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recbox_tpu.evaluation import full_sort_topk
from recbox_tpu.evaluation.beyond_accuracy import (
    average_popularity, evaluate_beyond_accuracy, gini_index, item_coverage,
    shannon_entropy, tail_percentage,
)
from recbox_tpu.training.metabalance import (
    metabalance_combine, metabalance_init,
)


class TestBeyondAccuracy:
    def test_item_coverage(self):
        topk = np.array([[0, 1], [1, 2]])
        assert item_coverage(topk, num_items=6) == pytest.approx(0.5)

    def test_average_popularity(self):
        counts = np.array([10.0, 0.0, 2.0])
        topk = np.array([[0, 2], [0, 0]])
        assert average_popularity(topk, counts) == pytest.approx(
            (10 + 2 + 10 + 10) / 4)

    def test_entropy_uniform_beats_skewed(self):
        uniform = np.arange(16).reshape(4, 4)
        skewed = np.zeros((4, 4), int)
        assert shannon_entropy(uniform) > shannon_entropy(skewed)
        assert shannon_entropy(skewed) == pytest.approx(0.0)

    def test_gini_bounds(self):
        even = np.arange(8).reshape(2, 4)     # each of 8 items once
        assert gini_index(even, num_items=8) == pytest.approx(0.0, abs=1e-9)
        concentrated = np.zeros((4, 4), int)  # all exposure on item 0
        g = gini_index(concentrated, num_items=8)
        assert g > 0.8

    def test_tail_percentage(self):
        counts = np.array([100, 90, 80, 1, 2, 3, 70, 60, 50, 40], float)
        topk = np.array([[3, 0], [4, 1]])   # half the recs are tail items
        assert tail_percentage(topk, counts, tail_ratio=0.3) == pytest.approx(0.5)

    def test_dispatch_and_unknown(self):
        topk = np.array([[0, 1]])
        out = evaluate_beyond_accuracy(topk, 4,
                                       metrics=["ItemCoverage", "GiniIndex"])
        assert set(out) == {"ItemCoverage", "GiniIndex"}
        with pytest.raises(NotImplementedError):
            evaluate_beyond_accuracy(topk, 4, metrics=["Nope"])
        with pytest.raises(ValueError):
            evaluate_beyond_accuracy(topk, 4, metrics=["TailPercentage"])


class TestMetaBalance:
    def test_auxiliary_grad_rescaled_to_anchor(self):
        params = {"w": jnp.zeros(4)}
        g_main = {"w": jnp.ones(4)}            # norm 2
        g_aux = {"w": jnp.ones(4) * 100.0}     # norm 200 — would dominate
        state = metabalance_init(2, params)
        combined, state = metabalance_combine(
            [g_main, g_aux], state, relax_factor=1.0, beta=0.0)
        # fully matched: aux rescaled to anchor norm ⇒ combined = 2×main
        np.testing.assert_allclose(np.asarray(combined["w"]),
                                   2 * np.ones(4), rtol=1e-5)

    def test_relax_zero_keeps_raw_grads(self):
        params = {"w": jnp.zeros(2)}
        g0 = {"w": jnp.array([1.0, 0.0])}
        g1 = {"w": jnp.array([0.0, 5.0])}
        state = metabalance_init(2, params)
        combined, _ = metabalance_combine([g0, g1], state,
                                          relax_factor=0.0, beta=0.0)
        np.testing.assert_allclose(np.asarray(combined["w"]), [1.0, 5.0])

    def test_moving_average_state(self):
        params = {"w": jnp.zeros(2)}
        gs = [{"w": jnp.array([3.0, 4.0])}, {"w": jnp.array([0.6, 0.8])}]
        state = metabalance_init(2, params)
        _, state = metabalance_combine(gs, state, beta=0.5)
        # avg norm after one step = 0.5*0 + 0.5*norm
        assert float(state.norms[0]["w"]) == pytest.approx(2.5)
        assert float(state.norms[1]["w"]) == pytest.approx(0.5)


class TestFullSortTopk:
    def test_mask_and_order(self):
        users = jnp.eye(3, 4)
        items = jnp.eye(5, 4)  # item i scores 1 for user i, 0 otherwise
        train = np.array([[0], [5], [5]])  # user0's best item is train-masked
        scores, ids = full_sort_topk(users, items, k=2, train_items=train)
        assert ids[1, 0] == 1 and ids[2, 0] == 2
        assert 0 not in ids[0]             # masked
        assert scores[1, 0] == pytest.approx(1.0)
        assert (scores[:, 0] >= scores[:, 1]).all()

    def test_no_mask(self):
        rng = np.random.default_rng(0)
        users = rng.normal(size=(4, 8)).astype(np.float32)
        items = rng.normal(size=(20, 8)).astype(np.float32)
        scores, ids = full_sort_topk(users, items, k=5)
        ref = users @ items.T
        np.testing.assert_array_equal(
            ids, np.argsort(-ref, axis=1, kind="stable")[:, :5])


def test_retrieval_evaluator_reports_beyond_accuracy():
    """RetrievalEvaluator appends coverage/diversity metrics to its output
    when beyond_accuracy_metrics is set (recbole evaluator parity in the
    one-call pipelines)."""
    import numpy as np
    from recbox_tpu.evaluation import RetrievalEvaluator
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.matching.two_tower import MF
    from recbox_tpu.ops import get_matching_loss
    from recbox_tpu.training import Trainer, TrainerConfig
    from recbox_tpu.data import MatchingLoader

    rng = np.random.default_rng(0)
    n_users, n_items = 40, 25
    fm = FeatureMap(
        "ba", (FeatureSpec("user_id", "categorical", source="user",
                           vocab_size=n_users, embedding_dim=8),
               FeatureSpec("item_id", "categorical", source="item",
                           vocab_size=n_items, embedding_dim=8)),
        query_index="user_id", corpus_index="item_id", num_items=n_items)
    users = rng.integers(0, n_users, 400).astype(np.int32)
    items = ((users * 3) % n_items).astype(np.int32)
    train_u2i, valid_u2i = {}, {}
    for u, i in zip(users[:300], items[:300]):
        train_u2i.setdefault(int(u), []).append(int(i))
    for u, i in zip(users[300:], items[300:]):
        valid_u2i.setdefault(int(u), []).append(int(i))
    uu = np.unique(users[300:])
    ev = RetrievalEvaluator(
        {"user_id": uu.astype(np.int32)},
        {"item_id": np.arange(n_items, dtype=np.int32)}, uu,
        train_u2i, valid_u2i, metrics=["Recall(k=10)"],
        beyond_accuracy_metrics=["ItemCoverage", "AveragePopularity",
                                 "ShannonEntropy", "GiniIndex",
                                 "TailPercentage"],
        beyond_topk=10, batch_size=64)
    tr = Trainer(MF(feature_map=fm, embedding_dim=8),
                 lambda o, b: get_matching_loss("PairwiseLogisticLoss")(o),
                 TrainerConfig(learning_rate=0.05, monitor="Recall(k=10)"))
    loader = MatchingLoader(fm, {"user_id": users[:300],
                                 "item_id": items[:300]},
                            {"item_id": np.arange(n_items, dtype=np.int32)},
                            batch_size=64, num_negs=4, seed=0)
    tr.init(next(iter(loader)))
    out = ev(tr)
    assert "Recall(k=10)" in out
    assert 0 < out["ItemCoverage"] <= 1.0
    assert out["ShannonEntropy"] > 0
    assert 0 <= out["GiniIndex"] <= 1
    assert 0 <= out["TailPercentage"] <= 1
    assert out["AveragePopularity"] >= 0


class TestDiversityAndValueMetrics:
    def test_diversity_hand_computed(self):
        from recbox_tpu.evaluation.beyond_accuracy import diversity
        # items: 0,1 share category A; item 2 is category B
        cats = np.array([[1, 0], [1, 0], [0, 1]], float)
        # user0 recommends [0,1] (same cat, distance 0)
        # user1 recommends [0,2] (different, distance sqrt(2))
        topk = np.array([[0, 1], [0, 2]])
        expected = (0.0 + np.sqrt(2.0)) / 2
        assert diversity(topk, cats) == pytest.approx(expected)

    def test_diversity_matches_reference_loop(self):
        from recbox_tpu.evaluation.beyond_accuracy import diversity
        rng = np.random.default_rng(0)
        cats = (rng.random((20, 5)) > 0.6).astype(float)
        topk = rng.integers(0, 20, size=(7, 4))
        # daisy reference loops (metrics.py:125-148)
        res = []
        for u in range(len(topk)):
            ild = []
            for i in range(topk.shape[1]):
                for j in range(i + 1, topk.shape[1]):
                    ild.append(np.linalg.norm(cats[topk[u, i]]
                                              - cats[topk[u, j]]))
            res.append(np.mean(ild))
        assert diversity(topk, cats) == pytest.approx(np.mean(res))

    def test_diversity_dispatch(self):
        from recbox_tpu.evaluation.beyond_accuracy import (
            evaluate_beyond_accuracy,
        )
        cats = np.eye(4)
        out = evaluate_beyond_accuracy(
            np.array([[0, 1]]), 4, metrics=["Diversity"],
            item_categories=cats)
        assert out["Diversity"] == pytest.approx(np.sqrt(2.0))
        with pytest.raises(ValueError):
            evaluate_beyond_accuracy(np.array([[0, 1]]), 4,
                                     metrics=["Diversity"])

    def test_mae_rmse(self):
        from recbox_tpu.evaluation.ctr import evaluate_ctr
        y = np.array([1.0, 0.0, 3.0])
        p = np.array([2.0, 0.0, 1.0])
        out = evaluate_ctr(y, p, ["MAE", "RMSE"])
        assert out["MAE"] == pytest.approx(1.0)
        assert out["RMSE"] == pytest.approx(np.sqrt(5 / 3))
