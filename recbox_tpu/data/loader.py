"""Batch iteration over dict-of-array datasets with static shapes.

Replaces the reference's torch DataLoader stack (`h5_generator.py:225-255`,
`h5_block_dataloader.py:26-118`): datasets are dicts of numpy arrays (the
output of FeatureEncoder.transform or `shards.load_shards`); iteration yields
fixed-shape batch dicts ready for device upload. The final partial batch is
either dropped (training) or padded with a `__mask__` weight column (eval) so
every step reuses one compiled XLA program.

`MatchingLoader` adds the matching-stage semantics of the reference
TrainGenerator (`h5_generator.py:108-181`): epoch-level negative resampling
(vectorized — no mp.Pool/pickle shards) and corpus-row gathering so each batch
carries the positive + sampled-negative item features.
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from recbox_tpu.data.sampling import sample_negatives
from recbox_tpu.features.schema import FeatureMap

__all__ = ["ArrayLoader", "MatchingLoader", "num_batches"]

MASK_KEY = "__mask__"


def num_batches(n: int, batch_size: int, drop_last: bool) -> int:
    return n // batch_size if drop_last else math.ceil(n / batch_size)


class ArrayLoader:
    """Shuffled fixed-shape batches over a dict of equal-length arrays."""

    def __init__(
        self,
        arrays: Dict[str, np.ndarray],
        batch_size: int = 2048,
        shuffle: bool = True,
        drop_last: bool = False,
        seed: int = 2024,
    ):
        lengths = {k: len(v) for k, v in arrays.items()}
        assert len(set(lengths.values())) == 1, f"ragged columns: {lengths}"
        self.arrays = arrays
        self.n = next(iter(lengths.values()))
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.epoch = 0

    def __len__(self) -> int:
        return num_batches(self.n, self.batch_size, self.drop_last)

    @property
    def num_samples(self) -> int:
        return self.n

    def peek_batch(self) -> Dict[str, np.ndarray]:
        """A shape-representative first batch WITHOUT epoch side effects
        (no shuffle/RNG advance, no negative-sampling pass) — what
        Trainer.init needs to trace shapes."""
        bs = min(self.batch_size, self.n)
        batch = {k: v[:bs] for k, v in self.arrays.items()}
        if bs < self.batch_size:
            pad = self.batch_size - bs
            batch = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                     for k, v in batch.items()}
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = np.arange(self.n)
        if self.shuffle:
            self.rng.shuffle(idx)
        self.epoch += 1
        bs = self.batch_size
        stop = (self.n // bs) * bs if self.drop_last else self.n
        for start in range(0, stop, bs):
            sel = idx[start:start + bs]
            batch = {k: v[sel] for k, v in self.arrays.items()}
            if len(sel) < bs:  # pad + mask the tail batch
                pad = bs - len(sel)
                batch = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                         for k, v in batch.items()}
                mask = np.zeros(bs, dtype=np.float32)
                mask[: len(sel)] = 1.0
                batch[MASK_KEY] = mask
            else:
                batch[MASK_KEY] = np.ones(bs, dtype=np.float32)
            yield batch


class MatchingLoader(ArrayLoader):
    """Training loader for two-tower matching with per-epoch negative sampling.

    Args:
      feature_map: schema (query_index/corpus_index wiring).
      train_arrays: encoded interactions; must contain the corpus_index column
        holding the positive item id per row.
      corpus_arrays: encoded item corpus; row i = features of item id i.
      num_negs: negatives per positive (reference default 10 at
        `h5_generator.py:226`).
      sampling_probs: optional per-item sampling distribution (popularity);
        None = uniform.
      exclude_pos: re-draw negatives colliding with the row positive.
      exclude_seen: re-draw negatives the user has ANY train interaction
        with (recbole's used-ids exclusion, `sampler/sampler.py:147-192`);
        needs the query_index column in train_arrays.

    Yields batches with item features shaped (B, 1+num_negs, ...) — column 0
    is the positive, matching the loss contract (`losses/*`).
    """

    def __init__(
        self,
        feature_map: FeatureMap,
        train_arrays: Dict[str, np.ndarray],
        corpus_arrays: Dict[str, np.ndarray],
        batch_size: int = 2048,
        num_negs: int = 10,
        sampling_probs: Optional[np.ndarray] = None,
        exclude_pos: bool = False,
        exclude_seen: bool = False,
        shuffle: bool = True,
        seed: int = 2024,
        exclude_ids: Sequence[int] = (),
    ):
        super().__init__(train_arrays, batch_size=batch_size, shuffle=shuffle,
                         drop_last=True, seed=seed)
        self.feature_map = feature_map
        self.corpus_arrays = corpus_arrays
        self.num_negs = num_negs
        self.sampling_probs = sampling_probs
        self.exclude_pos = exclude_pos
        # catalog rows that are not real items (PAD/OOV rows): never drawn
        # as negatives (recbole's sampler draws real tokens only)
        self.exclude_ids = tuple(exclude_ids)
        self.item_col = feature_map.corpus_index
        assert self.item_col in train_arrays, (
            f"train arrays missing corpus_index column {self.item_col!r}")
        self.num_items = len(next(iter(corpus_arrays.values())))
        self.seen_matrix = None
        self.user_col = feature_map.query_index
        if exclude_seen:
            assert self.user_col in train_arrays, (
                "exclude_seen needs the query_index column in train arrays")
            users = np.asarray(train_arrays[self.user_col], np.int64)
            items = np.asarray(train_arrays[self.item_col], np.int64)
            self.seen_matrix = np.zeros(
                (int(users.max()) + 1, self.num_items), bool)
            self.seen_matrix[users, items] = True

    def peek_batch(self) -> Dict[str, np.ndarray]:
        """Shape-representative batch with candidate columns, sampling
        negatives for just batch_size rows (the full __iter__ front-loads
        an entire epoch's negative sampling)."""
        bs = min(self.batch_size, self.n)
        batch = {k: v[:bs] for k, v in self.arrays.items()}
        pos = np.asarray(batch[self.item_col], np.int64)
        rng = np.random.default_rng(0)
        negs = sample_negatives(pos, self.num_items, self.num_negs, rng,
                                probs=self.sampling_probs,
                                exclude_pos=self.exclude_pos,
                                exclude_ids=self.exclude_ids)
        ids = np.concatenate([pos[:, None], negs], axis=1)
        batch["__item_ids__"] = ids.astype(np.int32)
        for k, v in self.corpus_arrays.items():
            batch[f"item::{k}"] = v[ids]
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        pos_items = self.arrays[self.item_col].astype(np.int64)
        # epoch-level resampling, seeded per epoch like the reference
        # (`h5_generator.py:132-153`)
        epoch_rng = np.random.default_rng(self.rng.integers(0, 2**31))
        user_rows = (self.arrays[self.user_col].astype(np.int64)
                     if self.seen_matrix is not None else None)
        negs = sample_negatives(
            pos_items, self.num_items, self.num_negs, epoch_rng,
            probs=self.sampling_probs, exclude_pos=self.exclude_pos,
            seen_matrix=self.seen_matrix, user_rows=user_rows,
            exclude_ids=self.exclude_ids,
        )
        item_ids = np.concatenate([pos_items[:, None], negs], axis=1)  # (N, 1+negs)

        idx = np.arange(self.n)
        if self.shuffle:
            self.rng.shuffle(idx)
        self.epoch += 1
        bs = self.batch_size
        for start in range(0, (self.n // bs) * bs, bs):
            sel = idx[start:start + bs]
            batch = {k: v[sel] for k, v in self.arrays.items()}
            ids = item_ids[sel]  # (B, 1+negs)
            batch["__item_ids__"] = ids.astype(np.int32)
            for k, v in self.corpus_arrays.items():
                batch[f"item::{k}"] = v[ids]  # (B, 1+negs, ...)
            yield batch
