"""On-device grouped CTR metrics: gAUC / avgAUC / MRR / NDCG@k.

SURVEY §6 hard-part 4 ("grouped metrics without pandas groupby —
segment-sorted on-device reductions") delivered for the metric loop
itself: the reference computes these with a pandas groupby + mp.Pool
(`recbox/ranking/metrics.py:38-58`), and the round-1 port kept a host
Python loop over groups (`evaluation/ctr.py` `_grouped_rank_metric`) —
quadratically painful at production eval scale. This module computes every
group's metric with THREE stable lexsorts + flat segment reductions, no
per-group control flow:

  sort 1, keys (group, pred asc)  — tie-averaged within-group ranks for the
      Mann-Whitney AUC (ties share the average rank, sklearn-identical);
  sort 2, keys (group, pred desc) — descending ranks for MRR and the DCG
      numerator (stability wrt original order matches the host engine's
      mergesort semantics);
  sort 3, keys (group, label desc) — ideal ranks for the IDCG denominator.

Group starts come from a running max over boundary indices
(`associative_scan`), per-group sums from `segment_sum` with the row count
as the static segment bound. Weighting matches the reference exactly:
gAUC weights groups by sample count, avgAUC equally, both skip
single-class groups (`metrics.py:71-87`); MRR/NDCG average over ALL
groups with weight 1.

Numbers are identical to the host loop engine (asserted in
tests/test_ctr_metrics.py); the speedup at 1M rows is measured in
tools/prof_grouped_metrics.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["grouped_metrics_device"]


def _cummax(x):
    return jax.lax.associative_scan(jnp.maximum, x)


def _group_layout(group_sorted):
    """(boundary, seg_id, group_start_idx, rank) for pre-sorted arrays."""
    n = group_sorted.shape[0]
    idx = jnp.arange(n)
    boundary = jnp.concatenate(
        [jnp.ones(1, bool), group_sorted[1:] != group_sorted[:-1]])
    seg = jnp.cumsum(boundary) - 1
    gstart = _cummax(jnp.where(boundary, idx, -1))
    rank = idx - gstart + 1  # 1-based within-group rank
    return boundary, seg, gstart, rank


@functools.partial(jax.jit, static_argnames=("ks",))
def _grouped_device(y, p, g, ks: Tuple[int, ...]):
    """Returns (gAUC, avgAUC, MRR, {k: NDCG@k}) as device scalars."""
    n = y.shape[0]
    y = y.astype(jnp.float32)
    p = p.astype(jnp.float32)
    idx = jnp.arange(n)
    seg_sum = lambda vals, seg: jax.ops.segment_sum(vals, seg,
                                                    num_segments=n)

    # ---- sort 1: (group, pred asc) → tie-averaged AUC ranks -------------
    o1 = jnp.lexsort((p, g))
    g1, y1, p1 = g[o1], y[o1], p[o1]
    b1, seg1, gstart1, _ = _group_layout(g1)
    tie_b = b1 | jnp.concatenate([jnp.ones(1, bool), p1[1:] != p1[:-1]])
    tie_id = jnp.cumsum(tie_b) - 1
    tie_start = _cummax(jnp.where(tie_b, idx, -1))
    tie_len = seg_sum(jnp.ones(n), tie_id)[tie_id]
    # first rank in the tie run + (len-1)/2 = average shared rank
    avg_rank = (tie_start - gstart1 + 1) + (tie_len - 1.0) / 2.0
    pos1 = (y1 > 0).astype(jnp.float32)
    cnt = seg_sum(jnp.ones(n), seg1)
    npos = seg_sum(pos1, seg1)
    nneg = cnt - npos
    pos_rank_sum = seg_sum(avg_rank * pos1, seg1)
    denom = jnp.maximum(npos * nneg, 1.0)
    auc_g = (pos_rank_sum - npos * (npos + 1.0) / 2.0) / denom
    two_class = (npos > 0) & (nneg > 0)
    w_cnt = jnp.where(two_class, cnt, 0.0)
    gauc = jnp.sum(auc_g * w_cnt) / jnp.maximum(jnp.sum(w_cnt), 1e-12)
    n_valid = jnp.sum(two_class)
    avgauc = jnp.sum(jnp.where(two_class, auc_g, 0.0)) \
        / jnp.maximum(n_valid, 1e-12)
    gauc = jnp.where(jnp.sum(w_cnt) > 0, gauc, 0.0)
    avgauc = jnp.where(n_valid > 0, avgauc, 0.0)

    # ---- sort 2: (group, pred desc) → MRR + DCG -------------------------
    o2 = jnp.lexsort((-p, g))
    g2, y2 = g[o2], y[o2]
    b2, seg2, _, rank2 = _group_layout(g2)
    n_groups = jnp.sum(b2).astype(jnp.float32)
    occupied = seg_sum(jnp.ones(n), seg2) > 0   # segment ids in use
    rr = y2 / rank2.astype(jnp.float32)
    mrr_g = seg_sum(rr, seg2) / (seg_sum(y2, seg2) + 1e-12)
    mrr = jnp.sum(jnp.where(occupied, mrr_g, 0.0)) \
        / jnp.maximum(n_groups, 1.0)

    # ---- sort 3: (group, label desc) → IDCG -----------------------------
    o3 = jnp.lexsort((-y, g))
    g3, y3 = g[o3], y[o3]
    _, seg3, _, rank3 = _group_layout(g3)

    ndcgs = {}
    for k in ks:
        disc2 = jnp.where(rank2 <= k,
                          1.0 / jnp.log2(rank2.astype(jnp.float32) + 1.0),
                          0.0)
        dcg_g = seg_sum((jnp.exp2(y2) - 1.0) * disc2, seg2)
        disc3 = jnp.where(rank3 <= k,
                          1.0 / jnp.log2(rank3.astype(jnp.float32) + 1.0),
                          0.0)
        idcg_g = seg_sum((jnp.exp2(y3) - 1.0) * disc3, seg3)
        ndcg_g = dcg_g / (idcg_g + 1e-12)
        ndcgs[k] = jnp.sum(jnp.where(occupied, ndcg_g, 0.0)) \
            / jnp.maximum(n_groups, 1.0)
    return gauc, avgauc, mrr, ndcgs


def grouped_metrics_device(
    y_true: np.ndarray,
    y_pred: np.ndarray,
    group_id: np.ndarray,
    metrics: Sequence[str],
    ndcg_ks: Sequence[int] = (),
) -> Dict[str, float]:
    """Segment-sorted grouped metrics; same contract as the host loop.

    ``metrics`` accepts 'gAUC' / 'avgAUC' / 'MRR' exactly (anything else
    raises — a typo must not silently drop a metric); NDCG cutoffs go in
    ``ndcg_ks`` and come back under string keys ``'NDCG@{k}'``.
    """
    y = jnp.asarray(np.asarray(y_true).reshape(-1))
    p = jnp.asarray(np.asarray(y_pred).reshape(-1))
    g = jnp.asarray(np.asarray(group_id).reshape(-1))
    gauc, avgauc, mrr, ndcgs = _grouped_device(y, p, g, tuple(ndcg_ks))
    out = {}
    for m in metrics:
        if m == "gAUC":
            out[m] = float(gauc)
        elif m == "avgAUC":
            out[m] = float(avgauc)
        elif m == "MRR":
            out[m] = float(mrr)
        else:
            raise ValueError(
                f"unknown grouped metric {m!r}; expected gAUC/avgAUC/MRR "
                "(NDCG cutoffs go in ndcg_ks)")
    for k in ndcg_ks:
        out[f"NDCG@{k}"] = float(ndcgs[k])
    return out
