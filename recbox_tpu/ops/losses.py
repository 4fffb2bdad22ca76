"""Loss functions (pure jnp, batch-mean reductions).

Matching losses operate on a score matrix ``y_pred (B, 1+num_negs)`` with the
positive item in column 0 — exact re-implementations of the six reference
losses (`recbox/core/pytorch/losses/*.py`) plus recbole's BPR/Emb losses
(`third_party/recbole/model/loss.py:21-110`) and the standard CTR losses.
All are pure functions usable inside a jitted/pjit'd train step.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "cosine_contrastive_loss", "mse_matching_loss", "pairwise_logistic_loss",
    "pairwise_margin_loss", "sigmoid_crossentropy_loss",
    "softmax_crossentropy_loss", "bpr_loss", "binary_crossentropy",
    "embedding_reg_loss", "full_softmax_loss", "get_matching_loss",
    "get_ranking_loss",
]

_EPS = 1e-12


def cosine_contrastive_loss(y_pred: jnp.ndarray, margin: float = 0.0,
                            negative_weight: Optional[float] = None) -> jnp.ndarray:
    """relu(1−pos) + Σ relu(neg−margin) (mean-weighted when negative_weight).

    Reference: `cosine_contrastive_loss.py:5-29`.
    """
    pos = jax.nn.relu(1.0 - y_pred[:, 0])
    neg = jax.nn.relu(y_pred[:, 1:] - margin)
    if negative_weight is not None:
        loss = pos + jnp.mean(neg, axis=-1) * negative_weight
    else:
        loss = pos + jnp.sum(neg, axis=-1)
    return jnp.mean(loss)


def mse_matching_loss(y_pred: jnp.ndarray) -> jnp.ndarray:
    """(pos−1)²/2 + Σ neg²/2 — reference `mse_loss.py:5-18`."""
    pos = jnp.square(y_pred[:, 0] - 1.0) / 2.0
    neg = jnp.sum(jnp.square(y_pred[:, 1:]), axis=-1) / 2.0
    return jnp.mean(pos + neg)


def pairwise_logistic_loss(y_pred: jnp.ndarray) -> jnp.ndarray:
    """BPR over sampled negatives: −log σ(pos−neg), mean over all pairs.

    Reference: `pairwise_logistic_loss.py:7-19`. Uses the numerically stable
    softplus form: −log σ(x) = softplus(−x).
    """
    diff = y_pred[:, :1] - y_pred[:, 1:]
    return jnp.mean(jax.nn.softplus(-diff))


def pairwise_margin_loss(y_pred: jnp.ndarray, margin: float = 1.0) -> jnp.ndarray:
    """Hinge: relu(margin + neg − pos) — reference `pairwise_margin_loss.py`."""
    return jnp.mean(jax.nn.relu(margin + y_pred[:, 1:] - y_pred[:, :1]))


def sigmoid_crossentropy_loss(y_pred: jnp.ndarray) -> jnp.ndarray:
    """Sum-reduced BCE-with-logits; col 0 labeled 1, the rest 0.

    Reference: `sigmoid_crossentropy_loss.py:7-21` (reduction='sum').
    """
    labels = jnp.zeros_like(y_pred).at[:, 0].set(1.0)
    per = jax.nn.softplus(y_pred) - labels * y_pred  # stable BCE-with-logits
    return jnp.sum(per)


def softmax_crossentropy_loss(y_pred: jnp.ndarray) -> jnp.ndarray:
    """Sampled softmax CE on column 0 — reference `softmax_crossentropy_loss.py`."""
    logp = jax.nn.log_softmax(y_pred, axis=1)
    return -jnp.mean(logp[:, 0])


def bpr_loss(pos_score: jnp.ndarray, neg_score: jnp.ndarray,
             gamma: float = 1e-10) -> jnp.ndarray:
    """recbole BPRLoss: −log(γ + σ(pos−neg)) — `model/loss.py:21-44`."""
    return -jnp.mean(jnp.log(gamma + jax.nn.sigmoid(pos_score - neg_score)))


def binary_crossentropy(logits: jnp.ndarray, labels: jnp.ndarray,
                        from_logits: bool = True) -> jnp.ndarray:
    """Mean BCE for CTR ranking heads."""
    logits = logits.reshape(-1)
    labels = labels.reshape(-1).astype(logits.dtype)
    if from_logits:
        per = jax.nn.softplus(logits) - labels * logits
    else:
        p = jnp.clip(logits, _EPS, 1.0 - _EPS)
        per = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    return jnp.mean(per)


def embedding_reg_loss(params, p: int = 2, prefix: str = "emb_") -> jnp.ndarray:
    """p-norm regularizer over embedding tables only.

    Mirrors the reference's split of emb vs net regularization
    (`match_model.py:71-89`, recbole EmbLoss `model/loss.py:56-77`).
    """
    leaves = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if any(str(k).startswith(prefix) for k in keys):
            leaves.append(leaf)
    if not leaves:
        return jnp.asarray(0.0)
    # the reference scales by 1/p ((emb_lambda/emb_p)*||W||_p^p,
    # `match_model.py:84-89`) — omitting it makes any lambda tuned on the
    # reference p-times stronger here
    return sum(jnp.sum(jnp.abs(l) ** p) for l in leaves) / p


def full_softmax_loss(full_scores: jnp.ndarray, target_ids: jnp.ndarray) -> jnp.ndarray:
    """CE over the full item vocabulary (recbole loss_type='CE',
    `sasrec.py:144-150`): full_scores (B, vocab), target_ids (B,) int."""
    logp = jax.nn.log_softmax(full_scores, axis=-1)
    return -jnp.mean(jnp.take_along_axis(
        logp, target_ids[:, None].astype(jnp.int32), axis=1))


_MATCHING_LOSSES = {
    "CosineContrastiveLoss": cosine_contrastive_loss,
    "MSELoss": lambda y, **kw: mse_matching_loss(y),
    "PairwiseLogisticLoss": lambda y, **kw: pairwise_logistic_loss(y),
    "PairwiseMarginLoss": pairwise_margin_loss,
    "SigmoidCrossEntropyLoss": lambda y, **kw: sigmoid_crossentropy_loss(y),
    "SoftmaxCrossEntropyLoss": lambda y, **kw: softmax_crossentropy_loss(y),
}


def get_matching_loss(name: str, **kwargs) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Loss registry keyed by the reference class names (`losses/__init__.py`)."""
    if name not in _MATCHING_LOSSES:
        raise NotImplementedError(f"matching loss {name}")
    fn = _MATCHING_LOSSES[name]
    return lambda y_pred: fn(y_pred, **kwargs)


def get_ranking_loss(name: str) -> Callable:
    name = name.lower()
    if name in ("binary_crossentropy", "bce", "logloss"):
        return binary_crossentropy
    if name in ("mse", "mean_squared_error"):
        return lambda logits, labels: jnp.mean(
            jnp.square(logits.reshape(-1) - labels.reshape(-1)))
    raise NotImplementedError(f"ranking loss {name}")
