"""CTR evaluation: AUC / logloss / grouped gAUC / avgAUC / MRR / NDCG@k.

Vectorized re-implementation of `recbox/ranking/metrics.py:25-111` without
sklearn, pandas, or mp.Pool:

* AUC — exact Mann-Whitney rank statistic with average-rank tie handling
  (numerically identical to sklearn.roc_auc_score);
* grouped metrics — one group sort into contiguous segments, then
  per-segment numpy reductions (no pandas groupby / process pool);
* weighting matches the reference exactly: gAUC weights groups by sample
  count, avgAUC weights equally, both skip single-class groups
  (`metrics.py:71-87`); MRR/NDCG average over all groups with weight 1.

Everything is numpy (eval-side, scores already on host); `auc_jax` offers an
on-device histogram-bucketed AUC for in-training-loop monitoring.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional, Sequence

import re
import jax.numpy as jnp
import numpy as np

__all__ = ["evaluate_ctr", "auc_score", "log_loss", "grouped_auc", "auc_jax"]


def _average_ranks(x: np.ndarray) -> np.ndarray:
    """1-based ranks with ties sharing their average rank."""
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=np.float64)
    sx = x[order]
    # boundaries of tie runs
    boundary = np.ones(len(x), dtype=bool)
    boundary[1:] = sx[1:] != sx[:-1]
    run_ids = np.cumsum(boundary) - 1
    idx = np.arange(1, len(x) + 1, dtype=np.float64)
    sums = np.zeros(run_ids[-1] + 1 if len(x) else 0)
    counts = np.zeros_like(sums)
    np.add.at(sums, run_ids, idx)
    np.add.at(counts, run_ids, 1.0)
    ranks[order] = (sums / counts)[run_ids]
    return ranks


def auc_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1).astype(np.float64)
    n_pos = float(np.sum(y_true > 0))
    n_neg = float(len(y_true) - n_pos)
    if n_pos == 0 or n_neg == 0:
        raise ValueError("AUC undefined with a single class")
    ranks = _average_ranks(y_pred)
    return float((np.sum(ranks[y_true > 0]) - n_pos * (n_pos + 1) / 2)
                 / (n_pos * n_neg))


def log_loss(y_true: np.ndarray, y_pred: np.ndarray, eps: float = 1e-7) -> float:
    y_true = np.asarray(y_true, dtype=np.float64).reshape(-1)
    p = np.clip(np.asarray(y_pred, dtype=np.float64).reshape(-1), eps, 1 - eps)
    return float(-np.mean(y_true * np.log(p) + (1 - y_true) * np.log(1 - p)))


def _group_segments(group_id: np.ndarray):
    """Sort by group; return (order, segment start offsets, lengths)."""
    order = np.argsort(group_id, kind="mergesort")
    g = group_id[order]
    boundary = np.ones(len(g), dtype=bool)
    boundary[1:] = g[1:] != g[:-1]
    starts = np.flatnonzero(boundary)
    lengths = np.diff(np.append(starts, len(g)))
    return order, starts, lengths


def grouped_auc(y_true, y_pred, group_id, weighted: bool = True) -> float:
    """gAUC (weighted=True, DIN) or avgAUC (weighted=False, MIND)."""
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    group_id = np.asarray(group_id).reshape(-1)
    order, starts, lengths = _group_segments(group_id)
    yt, yp = y_true[order], y_pred[order]
    num, den = 0.0, 0.0
    for s, n in zip(starts, lengths):
        t = yt[s:s + n]
        p = yp[s:s + n]
        pos = float(np.sum(t > 0))
        if pos == 0 or pos == n:
            continue
        auc = auc_score(t, p)
        w = float(n) if weighted else 1.0
        num += auc * w
        den += w
    return num / den if den > 0 else 0.0


def _grouped_rank_metric(y_true, y_pred, group_id, fn) -> float:
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    group_id = np.asarray(group_id).reshape(-1)
    order, starts, lengths = _group_segments(group_id)
    yt, yp = y_true[order], y_pred[order]
    total, count = 0.0, 0
    for s, n in zip(starts, lengths):
        total += fn(yt[s:s + n], yp[s:s + n])
        count += 1
    return total / max(count, 1)


def _mrr(y_true, y_pred) -> float:
    order = np.argsort(-y_pred, kind="mergesort")
    t = y_true[order]
    rr = t / (np.arange(len(t)) + 1.0)
    return float(np.sum(rr) / (np.sum(t) + 1e-12))


def _ndcg(y_true, y_pred, k: int) -> float:
    def dcg(t, p):
        order = np.argsort(-p, kind="mergesort")[:k]
        gains = 2.0 ** t[order] - 1.0
        discounts = np.log2(np.arange(len(order)) + 2.0)
        return float(np.sum(gains / discounts))
    idcg = dcg(y_true, y_true)
    return dcg(y_true, y_pred) / (idcg + 1e-12)


def evaluate_ctr(
    y_true: np.ndarray,
    y_pred: np.ndarray,
    metrics: Sequence[str],
    group_id: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Drop-in equivalent of `evaluate_metrics` (`ranking/metrics.py:25-59`)."""
    out: "OrderedDict[str, float]" = OrderedDict()

    # collect every grouped metric up front: the device engine computes
    # gAUC/avgAUC/MRR and all NDCG@k in ONE 3-lexsort pass — calling it
    # once per metric would redo the sorts (and compile per ks signature)
    grouped_names, ndcg_ks = [], []
    for metric in metrics:
        if metric in ("gAUC", "avgAUC", "MRR"):
            grouped_names.append(metric)
        elif metric.startswith("NDCG"):
            m = re.search(r"(?:k\s*=\s*|@)(\d+)", metric)
            if metric != "NDCG" and m is None:
                raise ValueError(
                    f"cannot parse k from metric {metric!r}; use "
                    "'NDCG(k=10)' or 'NDCG@10'")
            ndcg_ks.append(int(m.group(1)) if m else 10)
    grouped_vals = None
    if grouped_names or ndcg_ks:
        assert group_id is not None, "group_index is required."
        from recbox_tpu.evaluation.grouped import grouped_metrics_device
        grouped_vals = grouped_metrics_device(
            y_true, y_pred, group_id, grouped_names,
            ndcg_ks=tuple(dict.fromkeys(ndcg_ks)))

    for metric in metrics:
        if metric in ("logloss", "binary_crossentropy"):
            out[metric] = log_loss(y_true, y_pred)
        elif metric == "AUC":
            out[metric] = auc_score(y_true, y_pred)
        elif metric in ("ACC", "accuracy"):
            out[metric] = float(np.mean((np.asarray(y_pred).reshape(-1) > 0.5)
                                        == (np.asarray(y_true).reshape(-1) > 0.5)))
        elif metric == "MAE":
            # recbole value metric (`evaluator/metrics.py:383-404`)
            out[metric] = float(np.mean(np.abs(
                np.asarray(y_true, np.float64).reshape(-1)
                - np.asarray(y_pred, np.float64).reshape(-1))))
        elif metric == "RMSE":
            # recbole value metric (`evaluator/metrics.py:406-424`)
            out[metric] = float(np.sqrt(np.mean(np.square(
                np.asarray(y_true, np.float64).reshape(-1)
                - np.asarray(y_pred, np.float64).reshape(-1)))))
        elif metric in ("gAUC", "avgAUC", "MRR"):
            out[metric] = grouped_vals[metric]
        elif metric.startswith("NDCG"):
            m = re.search(r"(?:k\s*=\s*|@)(\d+)", metric)
            k = int(m.group(1)) if m else 10
            out[metric] = grouped_vals[f"NDCG@{k}"]
        else:
            raise ValueError(f"metric={metric} not supported.")
    return dict(out)


def auc_jax(probs: jnp.ndarray, labels: jnp.ndarray,
            num_buckets: int = 8192) -> jnp.ndarray:
    """On-device histogram AUC (jit-safe; error ≤ ~1/num_buckets).

    Buckets probabilities in [0,1], then AUC = Σ_b neg_cdf_below(b)·pos(b)
    + ½·neg(b)·pos(b), normalized. Useful inside the training loop where a
    host sklearn-style sort would force a device→host sync; the exact host
    `auc_score` remains the final-eval path.
    """
    probs = probs.reshape(-1)
    labels = labels.reshape(-1).astype(jnp.float32)
    b = jnp.clip((probs * num_buckets).astype(jnp.int32), 0, num_buckets - 1)
    pos_hist = jnp.zeros(num_buckets).at[b].add(labels)
    neg_hist = jnp.zeros(num_buckets).at[b].add(1.0 - labels)
    neg_below = jnp.cumsum(neg_hist) - neg_hist
    num = jnp.sum(pos_hist * (neg_below + 0.5 * neg_hist))
    den = jnp.sum(pos_hist) * jnp.sum(neg_hist)
    return num / jnp.maximum(den, 1e-12)
