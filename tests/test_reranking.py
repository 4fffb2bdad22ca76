"""Reranking models + listwise metrics: PRM must beat the initial order on
lists whose click signal depends on a feature the initial ranker ignored."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from recbox_tpu.evaluation.rerank import evaluate_rerank
from recbox_tpu.models.reranking.models import (
    DLCM, GSF, MiDNN, PRM, SetRank, listwise_bce, listwise_softmax_ce,
)


def test_evaluate_rerank_perfect_vs_reversed():
    labels = np.array([[1.0, 1.0, 0.0, 0.0]])
    good = np.array([[4.0, 3.0, 2.0, 1.0]])
    bad = np.array([[1.0, 2.0, 3.0, 4.0]])
    g = evaluate_rerank(good, labels, ks=[2])
    b = evaluate_rerank(bad, labels, ks=[2])
    assert g["NDCG@2"] == pytest.approx(1.0)
    assert g["clicks@2"] == pytest.approx(2.0)
    assert b["clicks@2"] == pytest.approx(0.0)
    assert b["NDCG@2"] < g["NDCG@2"]


def test_evaluate_rerank_map_ndcg_hand_computed():
    """Anchor MAP/NDCG to hand values (a mixed ordering, not just the
    perfect/reversed extremes): relevant at ranks 1 and 3 of 4."""
    labels = np.array([[1.0, 0.0, 1.0, 0.0]])
    scores = np.array([[4.0, 3.0, 2.0, 1.0]])    # keeps the given order
    out = evaluate_rerank(scores, labels, ks=[4])
    # AP = (1/1 + 2/3) / 2 hits
    assert out["MAP@4"] == pytest.approx((1.0 + 2.0 / 3.0) / 2.0, abs=1e-9)
    # exponential-gain NDCG (binary labels => gains 1):
    # dcg = 1/log2(2) + 1/log2(4); idcg = 1/log2(2) + 1/log2(3)
    dcg = 1.0 + 1.0 / 2.0
    idcg = 1.0 + 1.0 / np.log2(3.0)
    assert out["NDCG@4"] == pytest.approx(dcg / idcg, abs=1e-9)
    assert out["clicks@4"] == pytest.approx(2.0)


def test_evaluate_rerank_mask_ignores_padding():
    labels = np.array([[1.0, 0.0, 1.0]])
    scores = np.array([[0.1, 0.5, 9.0]])
    mask = np.array([[True, True, False]])  # position 2 is padding
    out = evaluate_rerank(scores, labels, mask=mask, ks=[2])
    # only positions 0,1 count: clicks@2 = 1 (position 0 ranked second)
    assert out["clicks@2"] == pytest.approx(1.0)


def test_listwise_losses_mask():
    scores = jnp.array([[2.0, -2.0, 5.0]])
    labels = jnp.array([[1.0, 0.0, 1.0]])
    mask = jnp.array([[True, True, False]])
    # masked BCE counts only first two positions
    l = listwise_bce(scores, labels, mask)
    expected = (np.log1p(np.exp(-2.0)) + np.log1p(np.exp(-2.0))) / 2
    np.testing.assert_allclose(l, expected, rtol=1e-5)
    ce = listwise_softmax_ce(scores, labels, mask)
    assert np.isfinite(float(ce))


def _rerank_data(rng, B=512, N=8, D=6):
    """Click prob depends on feature 0; initial order is by feature 1."""
    feats = rng.normal(size=(B, N, D)).astype(np.float32)
    order = np.argsort(-feats[:, :, 1], axis=1)
    feats = np.take_along_axis(feats, order[:, :, None], axis=1)
    p = 1 / (1 + np.exp(-2.0 * feats[:, :, 0]))
    labels = (rng.random((B, N)) < p).astype(np.float32)
    mask = np.ones((B, N), dtype=bool)
    return feats, labels, mask


@pytest.mark.parametrize("model_cls,kwargs", [
    (PRM, {"d_model": 16, "n_layers": 1, "n_heads": 2, "max_list_len": 8}),
    (DLCM, {"hidden_size": 16}),
    (SetRank, {"d_model": 16, "n_layers": 1, "n_heads": 2}),
    (MiDNN, {"hidden_units": (16,)}),
    (GSF, {"group_size": 3, "hidden_units": (16,)}),
])
def test_reranker_learns(model_cls, kwargs, rng):
    feats, labels, mask = _rerank_data(rng)
    model = model_cls(**kwargs)
    f, l, m = jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(mask)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, f, m, train=True)
    params = nn.meta.unbox(variables["params"])

    import optax
    tx = optax.adam(5e-3)
    st = tx.init(params)

    @jax.jit
    def step(params, st):
        def loss_fn(p):
            scores = model.apply({"params": p}, f, m, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(2)})
            return listwise_bce(scores, l, m)
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, st2 = tx.update(g, st, params)
        return optax.apply_updates(params, up), st2, loss

    before = evaluate_rerank(np.zeros_like(labels) + np.arange(8)[::-1],
                             labels, mask, ks=[5])  # initial order
    for _ in range(150):
        params, st, loss = step(params, st)
    scores = model.apply({"params": params}, f, m, train=False)
    after = evaluate_rerank(np.asarray(scores), labels, mask, ks=[5])
    assert after["NDCG@5"] > before["NDCG@5"] + 0.05, (before, after)


def test_evaluate_rerank_k_exceeds_list_length():
    import numpy as np
    from recbox_tpu.evaluation.rerank import evaluate_rerank
    scores = np.array([[3.0, 2.0, 1.0]])
    labels = np.array([[1.0, 0.0, 1.0]])
    out = evaluate_rerank(scores, labels, ks=(10,))
    assert out["clicks@10"] == 2.0   # clipped to the 3 real positions


def test_build_rerank_lists_groups_orders_pads():
    import numpy as np
    from recbox_tpu.evaluation.rerank import build_rerank_lists
    qid = np.array([2, 1, 2, 1, 2])
    feats = np.arange(10, dtype=np.float32).reshape(5, 2)
    labels = np.array([1, 0, 0, 1, 1], np.float32)
    scores = np.array([0.1, 0.9, 0.8, 0.2, 0.5])
    out = build_rerank_lists(qid, feats, labels, list_size=4, scores=scores)
    assert out["query_ids"].tolist() == [1, 2]
    # query 1: rows 1 (score .9) then 3 (.2)
    np.testing.assert_array_equal(out["item_feats"][0, 0], feats[1])
    np.testing.assert_array_equal(out["item_feats"][0, 1], feats[3])
    assert out["mask"][0].tolist() == [True, True, False, False]
    # query 2: rows 2 (.8), 4 (.5), 0 (.1)
    np.testing.assert_array_equal(out["item_feats"][1, 0], feats[2])
    assert out["labels"][1].tolist() == [0.0, 1.0, 1.0, 0.0]


def test_build_rerank_lists_truncates():
    import numpy as np
    from recbox_tpu.evaluation.rerank import build_rerank_lists
    qid = np.zeros(6, int)
    feats = np.ones((6, 3), np.float32)
    labels = np.ones(6, np.float32)
    out = build_rerank_lists(qid, feats, labels, list_size=4)
    assert out["mask"].sum() == 4
