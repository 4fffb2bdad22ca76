"""Negative sampling (host-side, fully vectorized — no mp.Pool shards).

Re-designs the reference's samplers:
  - epoch-level uniform negative sampling with optional positive-exclusion
    renormalization (`recbox/matching/pytorch/dataloaders/h5_generator.py:72-95,
    132-181`) — the reference forks a process pool and pickles shards to tmp
    files; here it is one vectorized numpy draw per epoch;
  - alias-table popularity sampling (`third_party/recbole/sampler/sampler.py:
    71-97` O(1) draws) — used for 'popularity' distributions;
  - the four rechub strategies (`rechub/utils/match.py:22-63`): 0 uniform,
    1 popularity^0.75 ("word2vec"), 2 log-rank, 3 tencent-style.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["AliasTable", "sample_negatives", "popularity_distribution"]


class AliasTable:
    """O(1) sampling from a discrete distribution (Walker's alias method)."""

    def __init__(self, probs: np.ndarray):
        probs = np.asarray(probs, dtype=np.float64)
        probs = probs / probs.sum()
        n = len(probs)
        self.n = n
        self.prob = np.zeros(n)
        self.alias = np.zeros(n, dtype=np.int64)
        scaled = probs * n
        small = [i for i in range(n) if scaled[i] < 1.0]
        large = [i for i in range(n) if scaled[i] >= 1.0]
        while small and large:
            s, l = small.pop(), large.pop()
            self.prob[s] = scaled[s]
            self.alias[s] = l
            scaled[l] = scaled[l] - (1.0 - scaled[s])
            (small if scaled[l] < 1.0 else large).append(l)
        for i in large + small:
            self.prob[i] = 1.0

    def sample(self, size, rng: np.random.Generator) -> np.ndarray:
        idx = rng.integers(0, self.n, size=size)
        accept = rng.random(size=size) < self.prob[idx]
        return np.where(accept, idx, self.alias[idx])


def popularity_distribution(item_counts: np.ndarray, strategy: int = 1) -> np.ndarray:
    """rechub `negative_sample` distributions (`utils/match.py:22-63`).

    strategy: 0 = uniform, 1 = count^0.75 (word2vec), 2 = log(count+1)
    popularity, 3 = tencent RALM log-rank decay
    (log(k+2)−log(k+1))/log(n+1) over the popularity rank k.
    """
    counts = np.asarray(item_counts, dtype=np.float64)
    if strategy == 1:
        p = np.power(np.maximum(counts, 0.0), 0.75)
    elif strategy == 2:
        p = np.log(np.maximum(counts, 0.0) + 1.0) + 1e-6
    elif strategy == 3:
        order = np.argsort(-counts)
        ranks = np.empty_like(order)
        ranks[order] = np.arange(len(counts))
        p = (np.log(ranks + 2.0) - np.log(ranks + 1.0)) \
            / np.log(len(counts) + 1.0)
    else:
        p = np.ones_like(counts)
    total = p.sum()
    return p / total if total > 0 else np.full_like(p, 1.0 / len(p))


def sample_negatives(
    pos_items: np.ndarray,
    num_items: int,
    num_negs: int,
    rng: np.random.Generator,
    probs: Optional[np.ndarray] = None,
    exclude_pos: bool = False,
    max_resample_rounds: int = 8,
    seen_matrix: Optional[np.ndarray] = None,
    user_rows: Optional[np.ndarray] = None,
    exclude_ids: Sequence[int] = (),
) -> np.ndarray:
    """Draw (N, num_negs) negative item ids for N positive interactions.

    ``exclude_pos`` re-draws collisions with the row's positive item
    (the reference's renormalized-probability variant, `h5_generator.py:78-86`,
    realized here by bounded rejection resampling — equivalent distribution).

    ``seen_matrix`` (num_users, num_items) bool + ``user_rows`` (N,) re-draws
    negatives the user has ANY train interaction with — recbole's
    used-ids exclusion (`sampler/sampler.py:147-192` sample_by_user_ids),
    which matters for dense users where uniform negatives often hit other
    positives.

    ``exclude_ids`` are catalog rows that are not real items (PAD/OOV rows
    of a tokenizer-layout corpus): never drawn — recbole's sampler draws
    real tokens only (`sampler/sampler.py` value range [1, n_items)).
    """
    if seen_matrix is not None and user_rows is None:
        raise ValueError("seen_matrix needs user_rows (per-row user ids)")
    n = len(pos_items)
    shape = (n, num_negs)
    excl = np.asarray(sorted(set(int(x) for x in exclude_ids)), np.int64) \
        if len(exclude_ids) else None
    if probs is None:
        negs = rng.integers(0, num_items, size=shape)
    else:
        if excl is not None:
            probs = np.asarray(probs, np.float64).copy()
            probs[excl[excl < len(probs)]] = 0.0
        table = AliasTable(probs)
        negs = table.sample(shape, rng)

    def collisions(negs):
        bad = np.zeros(shape, bool)
        if exclude_pos:
            bad |= negs == pos_items[:, None]
        if seen_matrix is not None:
            bad |= seen_matrix[user_rows[:, None], negs]
        if excl is not None:
            bad |= np.isin(negs, excl)
        return bad

    if exclude_pos or seen_matrix is not None or excl is not None:
        for _ in range(max_resample_rounds):
            bad = collisions(negs)
            k = int(bad.sum())
            if k == 0:
                break
            if probs is None:
                negs[bad] = rng.integers(0, num_items, size=k)
            else:
                negs[bad] = table.sample(k, rng)
    return negs.astype(np.int32)
