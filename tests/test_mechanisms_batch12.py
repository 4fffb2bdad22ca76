"""Mechanism tests batch 12 — EXACTNESS proofs for the closed-form
traditional family (`recbox_tpu/models/matching/traditional.py`).

Unlike the learns-signal batches (which plant structure a trained model
must exploit above a documented chance level), these models are solved in
closed form, so the strongest possible test is available: compare the
device-side solution against an independent host-side computation of the
same mathematical object —

* EASE      vs the textbook  B = -P/diag(P), P=(XtX+lI)^-1  in numpy
            (reference: third_party/recbole/.../ease.py closed form);
* SLIM      vs sklearn.linear_model.ElasticNet per target column
            (reference: third_party/daisy/model/SLiMRecommender.py uses
            exactly this sklearn solver; our batched Gram coordinate
            descent must land on the same optimum);
* ADMMSLIM  vs its own convex objective: the ADMM fixed point must beat
            every feasible perturbation (diag=0, W>=0) we throw at it;
* PureSVD   vs numpy's rank-k SVD reconstruction U_k S_k V_k^T;
* ItemKNN   vs hand-computed cosine similarity + per-COLUMN top-k
            semantics (recbole ComputeSimilarity keeps each target
            item's own k nearest neighbors);
* Pop       vs raw bincounts;
* NCEPLRec  vs the de-popularized damped-spectral formula in numpy.

No chance levels apply here — the pass criterion is numerical identity
(or strict objective dominance for the iterative solvers).
"""

import numpy as np
import pytest

from recbox_tpu.models.matching.traditional import (
    ADMMSLIM, EASE, SLIM, ItemKNN, NCEPLRec, Pop, PureSVD,
    build_interaction_matrix,
)


def _toy_interactions(seed=0, num_users=60, num_items=12, density=0.25):
    rng = np.random.default_rng(seed)
    mask = rng.random((num_users, num_items)) < density
    # every user and item interacts at least once (keeps Gram well-posed)
    mask[np.arange(num_users), rng.integers(0, num_items, num_users)] = True
    mask[rng.integers(0, num_users, num_items), np.arange(num_items)] = True
    users, items = np.nonzero(mask)
    return users.astype(np.int64), items.astype(np.int64), num_users, num_items


def test_ease_matches_textbook_closed_form():
    users, items, U, I = _toy_interactions(seed=1)
    reg = 37.5
    model = EASE(reg_weight=reg).fit(users, items, U, I)

    X = build_interaction_matrix(users, items, U, I).astype(np.float64)
    P = np.linalg.inv(X.T @ X + reg * np.eye(I))
    B = -P / np.diag(P)[None, :]
    np.fill_diagonal(B, 0.0)

    np.testing.assert_allclose(np.asarray(model.B), B, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(model.full_scores(np.arange(U))), X @ B, atol=5e-3)


def test_slim_matches_sklearn_elasticnet_columns():
    """Our batched Gram-matrix coordinate descent and sklearn's ElasticNet
    minimize the same objective
        0.5*||x_j - X w||^2 + U*l1*||w||_1 + 0.5*U*l2*||w||^2,  w>=0, w_j=0
    (sklearn parameterization: alpha=(l1+l2), l1_ratio=l1/(l1+l2), after
    dividing through by n_samples=U). The optimum is unique (elastic net is
    strictly convex for l2>0), so the two solvers must agree column-wise."""
    from sklearn.linear_model import ElasticNet

    users, items, U, I = _toy_interactions(seed=2)
    l1, l2 = 1e-3, 1e-3
    model = SLIM(l1_reg=l1, l2_reg=l2, n_iters=400).fit(users, items, U, I)
    W = np.asarray(model.W)

    X = build_interaction_matrix(users, items, U, I).astype(np.float64)
    enet = ElasticNet(alpha=l1 + l2, l1_ratio=l1 / (l1 + l2), positive=True,
                      fit_intercept=False, max_iter=20000, tol=1e-10)
    W_ref = np.zeros((I, I))
    for j in range(I):
        Xj = X.copy()
        Xj[:, j] = 0.0            # zero-diagonal constraint: drop own column
        enet.fit(Xj, X[:, j])
        W_ref[:, j] = enet.coef_
        W_ref[j, j] = 0.0

    assert np.abs(np.diag(W)).max() == 0.0
    assert W.min() >= 0.0
    np.testing.assert_allclose(W, W_ref, atol=2e-3)


def _admm_objective(X, W, l1, l2):
    resid = X - X @ W
    return (0.5 * np.sum(resid ** 2) + 0.5 * l2 * np.sum(W ** 2)
            + l1 * np.abs(W).sum())


def test_admmslim_fixed_point_beats_feasible_perturbations():
    """ADMM on a convex objective converges to the global optimum; the
    returned Z must therefore (a) satisfy the constraints exactly and
    (b) strictly dominate every feasible perturbation of itself on the
    objective 0.5||X-XW||^2 + 0.5*l2||W||^2 + l1||W||_1 (diag=0, W>=0)."""
    users, items, U, I = _toy_interactions(seed=3)
    l1, l2, rho = 0.5, 2.0, 20.0
    model = ADMMSLIM(lambda1=l1, lambda2=l2, rho=rho, n_iters=400).fit(
        users, items, U, I)
    Z = np.asarray(model.W, dtype=np.float64)

    assert np.abs(np.diag(Z)).max() == 0.0
    assert Z.min() >= 0.0

    X = build_interaction_matrix(users, items, U, I).astype(np.float64)
    base = _admm_objective(X, Z, l1, l2)
    rng = np.random.default_rng(0)
    off_diag = ~np.eye(I, dtype=bool)
    for scale in (1e-2, 1e-1, 1.0):
        for _ in range(25):
            delta = rng.normal(0.0, scale, (I, I)) * off_diag
            cand = np.maximum(Z + delta, 0.0)
            np.fill_diagonal(cand, 0.0)
            assert _admm_objective(X, cand, l1, l2) >= base - 1e-6, (
                f"perturbation at scale {scale} beat the ADMM point")
    # and it must beat the trivial feasible points
    assert base < _admm_objective(X, np.zeros((I, I)), l1, l2)


def test_puresvd_matches_numpy_rank_k_reconstruction():
    users, items, U, I = _toy_interactions(seed=4)
    k = 4
    model = PureSVD(factors=k).fit(users, items, U, I)

    X = build_interaction_matrix(users, items, U, I).astype(np.float64)
    u, s, vt = np.linalg.svd(X, full_matrices=False)
    recon = (u[:, :k] * s[:k]) @ vt[:k]
    np.testing.assert_allclose(
        np.asarray(model.full_scores(np.arange(U))), recon, atol=1e-4)

    # full rank reproduces X exactly (V V^T = I on the row space)
    full = PureSVD(factors=I).fit(users, items, U, I)
    np.testing.assert_allclose(
        np.asarray(full.full_scores(np.arange(U))), X, atol=1e-4)


def test_itemknn_cosine_exact_and_column_topk():
    users, items, U, I = _toy_interactions(seed=5)
    X = build_interaction_matrix(users, items, U, I).astype(np.float64)
    G = X.T @ X
    norms = np.sqrt(np.diag(G))
    S_ref = G / (norms[:, None] * norms[None, :] + 1e-6)
    np.fill_diagonal(S_ref, 0.0)

    dense = ItemKNN(topk=0).fit(users, items, U, I)   # topk=0 => keep all
    np.testing.assert_allclose(np.asarray(dense.S), S_ref, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dense.full_scores(np.arange(U))), X @ S_ref, atol=1e-4)

    k = 3
    sparse = ItemKNN(topk=k).fit(users, items, U, I)
    S_k = np.asarray(sparse.S)
    for j in range(I):
        kept = np.nonzero(S_k[:, j])[0]
        # at least k survivors (ties at the threshold may add more), and
        # every kept value belongs to the column's k largest similarities
        thresh = np.sort(S_ref[:, j])[-k]
        assert len(kept) >= min(k, (S_ref[:, j] > 0).sum())
        assert (S_ref[kept, j] >= thresh - 1e-9).all()
        np.testing.assert_allclose(S_k[kept, j], S_ref[kept, j], atol=1e-5)


def test_pop_scores_are_exact_bincounts():
    users, items, U, I = _toy_interactions(seed=6)
    model = Pop().fit(users, items, U, I)
    counts = np.bincount(items, minlength=I).astype(np.float32)
    scores = np.asarray(model.full_scores(np.arange(5)))
    assert scores.shape == (5, I)
    np.testing.assert_array_equal(scores[0], counts)
    np.testing.assert_array_equal(scores, np.broadcast_to(counts, (5, I)))


def test_nceplrec_matches_depopularized_spectral_formula():
    users, items, U, I = _toy_interactions(seed=7)
    rank, beta, reg = 6, 0.7, 10.0
    model = NCEPLRec(rank=rank, beta=beta, reg_weight=reg).fit(
        users, items, U, I)

    X = build_interaction_matrix(users, items, U, I).astype(np.float64)
    pop = np.maximum(X.sum(0), 1.0)
    w = np.maximum(np.log(U / pop), 0.0)
    _, s, vt = np.linalg.svd(X * w[None, :], full_matrices=False)
    k = min(rank, len(s))
    V = vt[:k].T
    scale = np.power(np.maximum(s[:k], 1e-9), beta - 1.0)
    scale = scale * (s[:k] ** 2 / (s[:k] ** 2 + reg))
    ref = X @ (V * scale[None, :]) @ V.T

    np.testing.assert_allclose(
        np.asarray(model.full_scores(np.arange(U))), ref, atol=1e-4)
