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

__all__ = ["Pop", "ItemKNN", "EASE", "PureSVD", "SLIM", "ADMMSLIM",
           "NCEPLRec", "build_interaction_matrix"]


def build_interaction_matrix(user_ids, item_ids, num_users: int,
                             num_items: int) -> np.ndarray:
    """Alias of `autoencoder.build_history_matrix` (one multi-hot builder)."""
    from recbox_tpu.models.matching.autoencoder import build_history_matrix
    return build_history_matrix(user_ids, item_ids, num_users, num_items)


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
            # keep the top-k neighbors PER TARGET COLUMN: scores = X·S
            # consume S column-wise, and the reference (recbole
            # ComputeSimilarity / daisy KNNCF) keeps each target item's
            # own k nearest neighbors. S is symmetric here, so the column
            # threshold is the row top-k threshold transposed.
            thresh = jax.lax.top_k(S, self.topk)[0][:, -1]
            S = jnp.where(S >= thresh[None, :], S, 0.0)
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


class PureSVD:
    """Truncated-SVD CF (`third_party/daisy/model/PureSVDRecommender.py`):
    X ≈ U_k Σ_k V_kᵀ; scores = (X V_k) V_kᵀ."""

    def __init__(self, factors: int = 64):
        self.factors = factors

    def fit(self, user_ids, item_ids, num_users: int, num_items: int) -> "PureSVD":
        X = build_interaction_matrix(user_ids, item_ids, num_users, num_items)
        # full SVD on the dense matrix — benchmark scales; TPU-side matmul serve
        _, _, vt = np.linalg.svd(X, full_matrices=False)
        V = vt[: self.factors].T                     # (N, k)
        self.X = jnp.asarray(X)
        self.V = jnp.asarray(V.astype(np.float32))
        return self

    def full_scores(self, user_rows: np.ndarray) -> jnp.ndarray:
        proj = jnp.dot(self.X[jnp.asarray(user_rows)], self.V,
                       preferred_element_type=jnp.float32)
        return jnp.dot(proj, self.V.T, preferred_element_type=jnp.float32)


class SLIM:
    """Sparse linear item model (`third_party/daisy/model/SLiMRecommender.py`,
    recbole `slimelastic.py`): per-item ElasticNet regressions
    X_i ≈ X W_i with W_ii = 0, W ≥ 0.

    Solved by batched proximal coordinate descent on the Gram matrix — one
    (N, N) formulation updating a full coordinate row at a time across all
    targets, instead of sklearn's per-column Python loop."""

    def __init__(self, l1_reg: float = 1e-3, l2_reg: float = 1e-3,
                 n_iters: int = 30, positive_only: bool = True):
        self.l1 = l1_reg
        self.l2 = l2_reg
        self.n_iters = n_iters
        self.positive_only = positive_only

    def fit(self, user_ids, item_ids, num_users: int, num_items: int) -> "SLIM":
        X = jnp.asarray(build_interaction_matrix(
            user_ids, item_ids, num_users, num_items))
        G = jnp.dot(X.T, X, preferred_element_type=jnp.float32)   # (N, N)
        diag = jnp.diagonal(G)
        l1 = self.l1 * num_users
        l2 = self.l2 * num_users
        eye = jnp.eye(num_items, dtype=bool)

        def coord_pass(W, _):
            def update_row(j, W):
                # residual correlation for coordinate j against every target
                r = G[j] - G[j] @ W                   # (N,)
                w_j = W[j]
                rho = r + diag[j] * w_j
                w_new = jnp.sign(rho) * jnp.maximum(jnp.abs(rho) - l1, 0.0) \
                    / (diag[j] + l2 + 1e-9)
                if self.positive_only:
                    w_new = jnp.maximum(w_new, 0.0)
                w_new = jnp.where(eye[j], 0.0, w_new)  # zero diagonal
                return W.at[j].set(w_new)

            W = jax.lax.fori_loop(0, num_items, update_row, W)
            return W, None

        W0 = jnp.zeros((num_items, num_items), jnp.float32)
        W, _ = jax.lax.scan(coord_pass, W0, None, length=self.n_iters)
        self.X = X
        self.W = W
        return self

    def full_scores(self, user_rows: np.ndarray) -> jnp.ndarray:
        return jnp.dot(self.X[jnp.asarray(user_rows)], self.W,
                       preferred_element_type=jnp.float32)


class ADMMSLIM:
    """ADMM-SLIM (recbole `admmslim.py`): item-item weights by ADMM splitting
    with L1 + L2 + zero-diagonal constraints — all (N, N) matmuls."""

    def __init__(self, lambda1: float = 1.0, lambda2: float = 10.0,
                 rho: float = 100.0, n_iters: int = 50,
                 positive_only: bool = True):
        self.l1 = lambda1
        self.l2 = lambda2
        self.rho = rho
        self.n_iters = n_iters
        self.positive_only = positive_only

    def fit(self, user_ids, item_ids, num_users: int, num_items: int) -> "ADMMSLIM":
        X = jnp.asarray(build_interaction_matrix(
            user_ids, item_ids, num_users, num_items))
        G = jnp.dot(X.T, X, preferred_element_type=jnp.float32)
        P = jnp.linalg.inv(G + (self.l2 + self.rho)
                           * jnp.eye(num_items, dtype=jnp.float32))
        eye = jnp.eye(num_items, dtype=jnp.float32)

        def step(carry, _):
            C, Z, Y = carry
            # B-update with zero-diagonal via lagrangian gamma
            B_hat = P @ (G + self.rho * (Z - Y))
            gamma = jnp.diagonal(B_hat) / jnp.maximum(jnp.diagonal(P), 1e-9)
            B = B_hat - P * gamma[None, :]
            # Z-update: soft threshold
            U = B + Y
            Z = jnp.sign(U) * jnp.maximum(jnp.abs(U) - self.l1 / self.rho, 0.0)
            if self.positive_only:
                Z = jnp.maximum(Z, 0.0)
            Z = Z * (1.0 - eye)
            Y = Y + B - Z
            return (B, Z, Y), None

        Z0 = jnp.zeros((num_items, num_items), jnp.float32)
        (B, Z, _), _ = jax.lax.scan(
            step, (Z0, Z0, Z0), None, length=self.n_iters)
        self.X = X
        self.W = Z
        return self

    def full_scores(self, user_rows: np.ndarray) -> jnp.ndarray:
        return jnp.dot(self.X[jnp.asarray(user_rows)], self.W,
                       preferred_element_type=jnp.float32)


class NCEPLRec:
    """NCE-PLRec (recbole `nceplrec.py` shape): projected linear
    recommendation on the noise-contrastive de-popularized matrix.

    Q_ui = X_ui · max(log(num_users / pop_i), 0)  (NCE weighting), then a
    rank-k SVD of Q gives the projection; scores = X V_k Σ_k^{β−1} V_kᵀ —
    β < 1 damps the popularity directions."""

    def __init__(self, rank: int = 64, beta: float = 0.8,
                 reg_weight: float = 1e2):
        self.rank = rank
        self.beta = beta
        self.reg_weight = reg_weight

    def fit(self, user_ids, item_ids, num_users: int, num_items: int) -> "NCEPLRec":
        X = build_interaction_matrix(user_ids, item_ids, num_users, num_items)
        pop = np.maximum(X.sum(0), 1.0)
        w = np.maximum(np.log(num_users / pop), 0.0)
        Q = X * w[None, :]
        u, s, vt = np.linalg.svd(Q, full_matrices=False)
        k = min(self.rank, len(s))
        V = vt[:k].T                                   # (N, k)
        s_k = s[:k]
        # damped projection with ridge regularization
        scale = np.power(np.maximum(s_k, 1e-9), self.beta - 1.0)
        scale = scale * (s_k ** 2 / (s_k ** 2 + self.reg_weight))
        self.X = jnp.asarray(X)
        self.W = jnp.asarray((V * scale[None, :]).astype(np.float32))
        self.V = jnp.asarray(V.astype(np.float32))
        return self

    def full_scores(self, user_rows: np.ndarray) -> jnp.ndarray:
        proj = jnp.dot(self.X[jnp.asarray(user_rows)], self.W,
                       preferred_element_type=jnp.float32)
        return jnp.dot(proj, self.V.T, preferred_element_type=jnp.float32)
