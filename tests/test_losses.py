"""Matching/ranking loss tests vs. hand-computed torch-free references."""

import numpy as np
import jax.numpy as jnp
import pytest

from recbox_tpu.ops import (
    binary_crossentropy, bpr_loss, cosine_contrastive_loss, get_matching_loss,
    mse_matching_loss, pairwise_logistic_loss, pairwise_margin_loss,
    sigmoid_crossentropy_loss, softmax_crossentropy_loss,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


@pytest.fixture
def y_pred():
    # (B=2, 1+2 negs), col 0 positive
    return jnp.array([[2.0, 0.5, -1.0], [1.0, 1.5, 0.0]])


def test_pairwise_logistic(y_pred):
    yp = np.asarray(y_pred)
    diff = yp[:, :1] - yp[:, 1:]
    expected = -np.log(_sigmoid(diff)).mean()
    np.testing.assert_allclose(pairwise_logistic_loss(y_pred), expected, rtol=3e-4)


def test_pairwise_margin(y_pred):
    yp = np.asarray(y_pred)
    expected = np.maximum(1.0 + yp[:, 1:] - yp[:, :1], 0).mean()
    np.testing.assert_allclose(pairwise_margin_loss(y_pred), expected, rtol=3e-4)


def test_mse(y_pred):
    yp = np.asarray(y_pred)
    expected = ((yp[:, 0] - 1) ** 2 / 2 + (yp[:, 1:] ** 2).sum(-1) / 2).mean()
    np.testing.assert_allclose(mse_matching_loss(y_pred), expected, rtol=3e-4)


def test_softmax_ce(y_pred):
    yp = np.asarray(y_pred)
    probs = np.exp(yp) / np.exp(yp).sum(1, keepdims=True)
    expected = -np.log(probs[:, 0]).mean()
    np.testing.assert_allclose(softmax_crossentropy_loss(y_pred), expected, rtol=3e-4)


def test_sigmoid_ce(y_pred):
    yp = np.asarray(y_pred)
    labels = np.zeros_like(yp)
    labels[:, 0] = 1
    p = _sigmoid(yp)
    expected = -(labels * np.log(p) + (1 - labels) * np.log(1 - p)).sum()
    np.testing.assert_allclose(sigmoid_crossentropy_loss(y_pred), expected, rtol=3e-4)


def test_cosine_contrastive(y_pred):
    yp = np.asarray(y_pred)
    pos = np.maximum(1 - yp[:, 0], 0)
    neg = np.maximum(yp[:, 1:] - 0.5, 0)
    expected = (pos + neg.sum(-1)).mean()
    np.testing.assert_allclose(
        cosine_contrastive_loss(y_pred, margin=0.5), expected, rtol=3e-4)
    # negative_weight variant uses the mean over negs
    expected_w = (pos + neg.mean(-1) * 2.0).mean()
    np.testing.assert_allclose(
        cosine_contrastive_loss(y_pred, margin=0.5, negative_weight=2.0),
        expected_w, rtol=3e-4)


def test_bpr_matches_pairwise_logistic_limit():
    pos = jnp.array([2.0, 1.0])
    neg = jnp.array([0.5, 1.5])
    expected = -np.log(1e-10 + _sigmoid(np.array([1.5, -0.5]))).mean()
    np.testing.assert_allclose(bpr_loss(pos, neg), expected, rtol=3e-4)


def test_bce_logits_matches_probs():
    logits = jnp.array([0.3, -1.2, 2.0])
    labels = jnp.array([1.0, 0.0, 1.0])
    p = _sigmoid(np.asarray(logits))
    expected = -(np.asarray(labels) * np.log(p)
                 + (1 - np.asarray(labels)) * np.log(1 - p)).mean()
    np.testing.assert_allclose(binary_crossentropy(logits, labels), expected, rtol=3e-4)


def test_registry_matches_reference_names(y_pred):
    for name in ["CosineContrastiveLoss", "MSELoss", "PairwiseLogisticLoss",
                 "PairwiseMarginLoss", "SigmoidCrossEntropyLoss",
                 "SoftmaxCrossEntropyLoss"]:
        fn = get_matching_loss(name)
        assert np.isfinite(float(fn(y_pred)))
    with pytest.raises(NotImplementedError):
        get_matching_loss("NoSuchLoss")
