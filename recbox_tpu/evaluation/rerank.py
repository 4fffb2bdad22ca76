"""Listwise reranking metrics: MAP@k / NDCG@k / clicks@k over scored lists.

Vectorized equivalent of librerank's `evaluate_multi`
(`third_party/librerank/utils.py:318-385`): lists are reordered by predicted
score, metrics computed against the click labels, averaged over lists.
Optional position-bias de-biasing divides clicks by propensities before
scoring (the reference's `props` path).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["evaluate_rerank"]


def evaluate_rerank(
    scores: np.ndarray,          # (B, N) predicted scores
    labels: np.ndarray,          # (B, N) clicks/relevance
    mask: Optional[np.ndarray] = None,   # (B, N) valid positions
    ks: Sequence[int] = (5, 10),
    props: Optional[np.ndarray] = None,  # (B, N) position propensities
) -> Dict[str, float]:
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels, dtype=np.float64)
    B, N = scores.shape
    if mask is None:
        mask = np.ones_like(scores, dtype=bool)
    else:
        mask = np.asarray(mask, dtype=bool)
    if props is not None:
        labels = labels / np.clip(np.asarray(props, dtype=np.float64), 1e-6, None)
    scores = np.where(mask, scores, -np.inf)
    order = np.argsort(-scores, axis=1, kind="stable")
    sorted_labels = np.take_along_axis(labels * mask, order, axis=1)
    out: Dict[str, float] = {}
    for k in ks:
        kk = min(k, N)   # lists shorter than k: score what exists
        top = sorted_labels[:, :kk]
        # clicks captured in top-k
        out[f"clicks@{k}"] = float(np.mean(np.sum(top, axis=1)))
        # MAP@k over binarized labels
        binary = (top > 0).astype(np.float64)
        cum = np.cumsum(binary, axis=1)
        prec = cum / (np.arange(kk) + 1.0)
        hits = np.sum(binary, axis=1)
        ap = np.sum(prec * binary, axis=1) / np.maximum(hits, 1.0)
        out[f"MAP@{k}"] = float(np.mean(np.where(hits > 0, ap, 0.0)))
        # NDCG@k with gain = label (graded), log2 discounts
        disc = 1.0 / np.log2(np.arange(kk) + 2.0)
        dcg = np.sum(top * disc, axis=1)
        ideal = np.take_along_axis(
            labels * mask, np.argsort(-(labels * mask), axis=1, kind="stable"),
            axis=1)[:, :kk]
        idcg = np.sum(ideal * disc, axis=1)
        out[f"NDCG@{k}"] = float(np.mean(np.where(idcg > 0, dcg / np.maximum(idcg, 1e-12), 0.0)))
    return out
