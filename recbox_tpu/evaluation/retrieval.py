"""On-device retrieval evaluation: full-corpus MIPS top-k + vectorized metrics.

TPU-native replacement for the reference's faiss + multiprocessing pipeline
(`recbox/core/metrics.py:11-68`, `recbox/utils/ann/faiss.py:3-15`): scores are
one (chunk × corpus) matmul on the MXU, train-clicked items are masked with
−1e9 scatter, `lax.top_k` replaces the faiss search + argsort, and all metric
formulas (`core/metrics.py:71-190`) are computed as vectorized reductions on
device — no per-user Python, no mp.Pool.

Metric strings use the reference spelling: "Recall(k=20)", "NDCG(k=10)", ….
Supported: Recall, nRecall, Precision, F1, DCG, NDCG, MRR, HitRate, MAP.

Exactness note: the reference searches top-500 *then* masks train items, so a
user with >480 train items in the top-500 could lose true candidates; here the
mask is applied to the full score matrix before top-k, which is exact.
"""

from __future__ import annotations

import functools
import math
import re
from typing import Dict, List, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["evaluate_retrieval", "retrieval_metrics_from_topk", "parse_metric",
           "std_gauc"]

NEG_INF = -1e9
_METRIC_RE = re.compile(r"^(\w+)\(k=(\d+)\)$")


def parse_metric(metric: str) -> Tuple[str, int]:
    m = _METRIC_RE.match(metric.replace(" ", ""))
    if not m:
        raise NotImplementedError(f"metrics={metric} not implemented.")
    return m.group(1), int(m.group(2))


def _pad_lists(list_of_lists: Sequence[Sequence[int]], pad: int) -> np.ndarray:
    max_len = max((len(l) for l in list_of_lists), default=1)
    max_len = max(max_len, 1)
    out = np.full((len(list_of_lists), max_len), pad, dtype=np.int32)
    for i, l in enumerate(list_of_lists):
        if len(l):
            out[i, : len(l)] = np.asarray(list(l), dtype=np.int32)
    return out


@functools.partial(jax.jit, static_argnames=("max_topk",))
def _topk_chunk(user_embs, item_embs, train_items, max_topk: int):
    """scores = U·Iᵀ, mask train items, return top-k item ids.

    Multi-interest users (MIND/ComiRec) pass (U, K, D) embeddings; the item
    score is the max over the K interests — exactly the per-interest
    retrieve-and-merge protocol (`rechub/models/matching/mind.py`)."""
    if user_embs.ndim == 3:
        scores = jnp.einsum("ukd,id->uki", user_embs, item_embs).max(axis=1)
    else:
        scores = jnp.dot(user_embs, item_embs.T,
                         preferred_element_type=jnp.float32)
    # scatter −1e9 at train-clicked items; padded entries (= num_items) drop
    rows = jnp.arange(scores.shape[0])[:, None]
    masked = scores.at[rows, train_items].add(NEG_INF, mode="drop")
    _, topk_items = jax.lax.top_k(masked, max_topk)
    # unmasked scores of the selected items ride along so callers never
    # recompute the dominant U x I matmul
    top_scores = jnp.take_along_axis(scores, topk_items, axis=1)
    return topk_items, top_scores


@functools.partial(jax.jit, static_argnames=("ks",))
def _metrics_chunk(topk_items, true_items, ks: Tuple[Tuple[str, int], ...]):
    """Per-user metric values for every (name, k) from top-k ids + true ids."""
    valid = true_items >= 0  # (C, T)
    num_true = jnp.sum(valid, axis=1).astype(jnp.float32)  # (C,)
    # hits[c, i] = topk_items[c, i] ∈ true_items[c]
    eq = (topk_items[:, :, None] == true_items[:, None, :]) & valid[:, None, :]
    hits = jnp.any(eq, axis=-1).astype(jnp.float32)  # (C, K)
    K = topk_items.shape[1]
    pos = jnp.arange(K, dtype=jnp.float32)
    # discounts use natural log like the reference (cancels in NDCG)
    # NATURAL-log discount — reference parity (`core/metrics.py:131`
    # uses np.log). Raw DCG therefore reads 1/ln2 = 1.4427x the textbook
    # log2 value; NDCG is invariant to the base (dcg/idcg share it).
    disc = 1.0 / jnp.log(2.0 + pos)
    out = {}
    for name, k in ks:
        h = hits[:, :k]
        nh = jnp.sum(h, axis=1)
        if name == "Recall":
            val = nh / (num_true + 1e-12)
        elif name == "nRecall":
            val = nh / jnp.minimum(float(k), num_true + 1e-12)
        elif name == "Precision":
            val = nh / (k + 1e-12)
        elif name == "F1":
            p = nh / (k + 1e-12)
            r = nh / (num_true + 1e-12)
            val = 2 * p * r / (p + r + 1e-12)
        elif name == "DCG":
            val = jnp.sum(h * disc[:k], axis=1)
        elif name == "NDCG":
            dcg = jnp.sum(h * disc[:k], axis=1)
            ideal_n = jnp.minimum(num_true, float(k))
            icum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(disc[:k])])
            idcg = icum[jnp.clip(ideal_n, 0, k).astype(jnp.int32)]
            val = dcg / (idcg + 1e-12)
        elif name == "MRR":
            # reference-parity semantics (`core/metrics.py` MRR): SUM of
            # reciprocal ranks over ALL hits (ARHR-style, can exceed 1.0).
            # recbole/standard first-hit MRR is `StdMRR` below.
            val = jnp.sum(h / (pos[:k] + 1.0), axis=1)
        elif name == "StdMRR":
            # standard/recbole MRR: reciprocal rank of the FIRST hit only
            # (`third_party/recbole/evaluator/metrics.py:67-97`)
            first = jnp.argmax(h, axis=1)
            val = jnp.where(nh > 0, 1.0 / (first + 1.0), 0.0)
        elif name == "HitRate":
            val = (nh > 0).astype(jnp.float32)
        elif name == "MAP":
            # reference-parity semantics (`core/metrics.py` MAP): average
            # precision normalized by the number of hits RETRIEVED.
            # recbole/standard normalization is `StdMAP` below.
            prec_at_i = jnp.cumsum(h, axis=1) / (pos[:k] + 1.0)
            val = jnp.sum(prec_at_i * h, axis=1) / (nh + 1e-12)
        elif name == "StdMAP":
            # recbole MAP@k: normalized by min(|relevant|, k)
            # (`third_party/recbole/evaluator/metrics.py:99-137`)
            prec_at_i = jnp.cumsum(h, axis=1) / (pos[:k] + 1.0)
            val = jnp.sum(prec_at_i * h, axis=1) \
                / (jnp.minimum(num_true, float(k)) + 1e-12)
        else:
            raise NotImplementedError(f"metric {name}")
        out[f"{name}(k={k})"] = val
    return out


def evaluate_retrieval(
    user_embs: np.ndarray,
    item_embs: np.ndarray,
    train_user2items: Mapping[int, Sequence[int]],
    valid_user2items: Mapping[int, Sequence[int]],
    query_indices: Sequence[int],
    metrics: Sequence[str] = ("Recall(k=20)", "NDCG(k=10)"),
    chunk_size: int = 1024,
    exclude_items: Sequence[int] = (),
) -> Dict[str, float]:
    """Drop-in functional equivalent of `evaluate_metrics` (`core/metrics.py:11`).

    Args mirror the reference: embeddings for each evaluated query row, the
    item corpus matrix, per-user train/valid item-id lists, and metric
    strings. ``exclude_items`` masks catalog rows that are not real items
    for EVERY user — e.g. the PAD/OOV row 0 of a tokenizer-layout corpus,
    which recbole's full-sort protocol likewise −inf-masks; without it an
    untrained pad embedding competes in top-k. Duplicate ids inside a
    user's valid list are collapsed (lists are sets per user in the
    reference), so `num_true` cannot be inflated by repeat interactions.
    """
    parsed = tuple(parse_metric(m) for m in metrics)
    max_topk = max(k for _, k in parsed)
    num_users = len(user_embs)
    num_items = item_embs.shape[0]
    # large-catalog guard: the per-chunk score buffer is (chunk, V) fp32 —
    # at V=1M a 4096-user chunk would be 16 GB. Clamp so the buffer stays
    # <= ~1 GB (2^28 floats); exactness is unaffected, only chunking.
    chunk_size = max(1, min(chunk_size, (1 << 28) // max(num_items, 1)))
    excl = list(exclude_items)
    train_lists = [list(train_user2items.get(q, ())) + excl
                   for q in query_indices]
    true_lists = [list(dict.fromkeys(valid_user2items.get(q, ())))
                  for q in query_indices]
    train_padded = _pad_lists(train_lists, pad=num_items)  # out-of-range ⇒ drop
    true_padded = _pad_lists(true_lists, pad=-1)
    item_embs = jnp.asarray(item_embs)

    sums = {f"{n}(k={k})": 0.0 for n, k in parsed}
    # pad user count to a multiple of chunk_size to keep one compiled shape
    for start in range(0, num_users, chunk_size):
        end = min(start + chunk_size, num_users)
        cu = np.asarray(user_embs[start:end])
        ct = train_padded[start:end]
        cv = true_padded[start:end]
        pad_rows = chunk_size - (end - start)
        if pad_rows:
            cu = np.pad(cu, ((0, pad_rows),) + ((0, 0),) * (cu.ndim - 1))
            ct = np.pad(ct, ((0, pad_rows), (0, 0)), constant_values=num_items)
            cv = np.pad(cv, ((0, pad_rows), (0, 0)), constant_values=-1)
        topk, _ = _topk_chunk(jnp.asarray(cu), item_embs, jnp.asarray(ct),
                              max_topk)
        vals = _metrics_chunk(topk, jnp.asarray(cv), parsed)
        n_real = end - start
        for key, v in vals.items():
            sums[key] += float(jnp.sum(v[:n_real]))
    return {m: sums[f"{n}(k={k})"] / num_users for m, (n, k) in zip(metrics, parsed)}


def std_gauc(scores: np.ndarray, pos_matrix: np.ndarray) -> float:
    """Full-sort GAUC with recbole's exact semantics
    (`third_party/recbole/evaluator/metrics.py:233-318` +
    `evaluator/collector.py:169-185`): per-user AUC over the user's
    *rankable* items (entries scored ``-inf`` are masked history/PAD —
    recbole's full-sort protocol scores them −inf and its
    ``desc_scores.argmin`` user-length excludes them), tie values share
    their average rank (collector `_average_rank`), users with zero
    positives or zero negatives among rankable items are EXCLUDED, and
    the per-user AUCs are weighted by the user's positive count.

    This is distinct from the CTR-stage ``grouped_auc`` (fuxictr/DIN
    semantics: weight = group sample count — `ranking/metrics.py:60-87`);
    both semantics ship, like the MRR/StdMRR split.

    Args:
        scores: (U, I) float matrix; −inf marks non-rankable entries.
        pos_matrix: (U, I) 0/1 ground-truth matrix (positives must be
            finite-scored).
    Verified per-metric against the runnable reference evaluator in
    tools/parity_eval_metrics.py / tests/test_evaluator_equivalence.py.
    """
    from recbox_tpu.evaluation.ctr import auc_score

    scores = np.asarray(scores, dtype=np.float64)
    pos_matrix = np.asarray(pos_matrix)
    num, den = 0.0, 0.0
    for u in range(scores.shape[0]):
        rankable = np.isfinite(scores[u])
        t = pos_matrix[u][rankable]
        p = scores[u][rankable]
        n_pos = float(t.sum())
        if n_pos == 0 or n_pos == len(t):
            continue  # degenerate user: no positives or no negatives
        num += auc_score(t, p) * n_pos
        den += n_pos
    return num / den if den > 0 else 0.0


def retrieval_metrics_from_topk(topk_items, true_items, metrics) -> Dict[str, float]:
    """Metrics from precomputed top-k ids (used by sharded serving tests)."""
    parsed = tuple(parse_metric(m) for m in metrics)
    vals = _metrics_chunk(jnp.asarray(topk_items), jnp.asarray(true_items), parsed)
    return {m: float(jnp.mean(vals[f"{n}(k={k})"])) for m, (n, k) in zip(metrics, parsed)}


def full_sort_topk(user_embs, item_embs, k: int,
                   train_items=None):
    """Case-study top-k (`third_party/recbole/utils/case_study.py:78-119`
    full_sort_topk analog): scores every corpus item for the given users,
    optionally masking train-clicked items (padded with num_items), and
    returns (scores, item_ids) — the offline inspection/serving helper."""
    user_embs = jnp.asarray(user_embs)
    item_embs = jnp.asarray(item_embs)
    if train_items is None:
        train_items = jnp.full((user_embs.shape[0], 1), item_embs.shape[0],
                               dtype=jnp.int32)
    ids, top_scores = _topk_chunk(user_embs, item_embs,
                                  jnp.asarray(train_items), k)
    return np.asarray(top_scores), np.asarray(ids)
