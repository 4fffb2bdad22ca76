"""Traditional / closed-form recommenders: Pop, ItemKNN, EASE.

Re-designed from recbole's 0-epoch "traditional" family
(`third_party/recbole/model/general_recommender/{pop,itemknn,ease}.py`,
trained by the TraditionalTrainer in one shot `trainer/trainer.py`), and
daisy's EASE/KNN (`third_party/daisy/model/`): no gradient training — `fit`
computes statistics/closed forms on device (matmul-heavy paths hit the MXU),
`full_scores` serves (U-batch, I) score matrices, and `user_embs`-free
retrieval evaluation goes through `topk_items`.

The interaction matrix is built dense (num_users × num_items, float32) —
fine for the classic benchmark scales these models target; the matmuls
X·Xᵀ / matrix inverse dominate and map straight onto the TPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Pop", "ItemKNN", "EASE", "build_interaction_matrix"]


def build_interaction_matrix(user_ids, item_ids, num_users: int,
                             num_items: int) -> np.ndarray:
    X = np.zeros((num_users, num_items), dtype=np.float32)
    X[np.asarray(user_ids), np.asarray(item_ids)] = 1.0
    return X


class Pop:
    """Most-popular baseline (`pop.py`): score = global item count."""

    def fit(self, user_ids, item_ids, num_users: int, num_items: int) -> "Pop":
        counts = np.bincount(np.asarray(item_ids), minlength=num_items)
        self.scores = jnp.asarray(counts, jnp.float32)
        self.num_items = num_items
        return self

    def full_scores(self, user_rows: np.ndarray) -> jnp.ndarray:
        return jnp.broadcast_to(self.scores, (len(user_rows), self.num_items))


class ItemKNN:
    """Item-item cosine KNN (`itemknn.py` / daisy KNNCF): S = cos(Xᵀ X) with
    optional top-k sparsification; user scores = X·S."""

    def __init__(self, topk: int = 100, shrink: float = 0.0):
        self.topk = topk
        self.shrink = shrink

    def fit(self, user_ids, item_ids, num_users: int, num_items: int) -> "ItemKNN":
        X = jnp.asarray(build_interaction_matrix(
            user_ids, item_ids, num_users, num_items))
        G = jnp.dot(X.T, X, preferred_element_type=jnp.float32)
        norms = jnp.sqrt(jnp.diagonal(G))
        denom = norms[:, None] * norms[None, :] + self.shrink + 1e-6
        S = G / denom
        S = S - jnp.diag(jnp.diagonal(S))  # no self-similarity
        if self.topk and self.topk < num_items:
            thresh = jax.lax.top_k(S, self.topk)[0][:, -1:]
            S = jnp.where(S >= thresh, S, 0.0)
        self.X = X
        self.S = S
        return self

    def full_scores(self, user_rows: np.ndarray) -> jnp.ndarray:
        return jnp.dot(self.X[jnp.asarray(user_rows)], self.S,
                       preferred_element_type=jnp.float32)


class EASE:
    """Embarrassingly shallow autoencoder (`ease.py`, closed form):
    B = −P/diag(P) with P = (XᵀX + λI)⁻¹ and diag(B)=0; scores = X·B."""

    def __init__(self, reg_weight: float = 250.0):
        self.reg_weight = reg_weight

    def fit(self, user_ids, item_ids, num_users: int, num_items: int) -> "EASE":
        X = jnp.asarray(build_interaction_matrix(
            user_ids, item_ids, num_users, num_items))
        G = jnp.dot(X.T, X, preferred_element_type=jnp.float32)
        G = G + self.reg_weight * jnp.eye(num_items, dtype=jnp.float32)
        P = jnp.linalg.inv(G)
        B = -P / jnp.diagonal(P)[None, :]
        B = B - jnp.diag(jnp.diagonal(B))
        self.X = X
        self.B = B
        return self

    def full_scores(self, user_rows: np.ndarray) -> jnp.ndarray:
        return jnp.dot(self.X[jnp.asarray(user_rows)], self.B,
                       preferred_element_type=jnp.float32)


def topk_items(model, user_rows: np.ndarray, topk: int,
               mask_seen: Optional[jnp.ndarray] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Serve top-k from a traditional model, optionally masking seen items
    (X>0 rows)."""
    scores = model.full_scores(user_rows)
    if mask_seen is not None:
        scores = jnp.where(mask_seen > 0, -1e9, scores)
    s, i = jax.lax.top_k(scores, topk)
    return np.asarray(s), np.asarray(i)
