"""Model base classes for the three cascade stages.

Functional (flax.linen) re-design of the reference model contracts:
  - MatchingModel (`recbox/matching/pytorch/models/match_model.py:13-241`):
    `user_tower` / `item_tower` encoders + similarity scoring over
    (B, 1+num_negs) sampled items; dot or cosine similarity;
  - RankingModel (`recbox/ranking/pytorch/models/ranking_model.py:29-283`):
    batch dict → logits (B,) with a task output activation;
  - training concerns (fit/compile/earlystop) live in
    `recbox_tpu.training.trainer`, not on the model — models are pure.

Batch layout conventions:
  - user/context features: `batch[name] -> (B, ...)`
  - sampled item features (matching train): `batch["item::" + name] ->
    (B, 1+num_negs, ...)`, positive in column 0 (`MatchingLoader`)
  - labels (ranking): `batch[label] -> (B,)`
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from recbox_tpu.features.schema import FeatureMap

__all__ = ["MatchingModel", "RankingModel", "extract_item_batch", "similarity_scores"]

ITEM_PREFIX = "item::"


def extract_item_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Pull `item::`-prefixed features and flatten (B, S, ...) → (B·S, ...)."""
    out = {}
    for k, v in batch.items():
        if k.startswith(ITEM_PREFIX):
            name = k[len(ITEM_PREFIX):]
            out[name] = v.reshape((-1,) + v.shape[2:])
    return out


def similarity_scores(user_emb: jnp.ndarray, item_emb: jnp.ndarray,
                      num_candidates: int, similarity: str = "dot",
                      temperature: float = 1.0) -> jnp.ndarray:
    """(B, D) × (B·S, D) → (B, S) per-row candidate scores."""
    item_emb = item_emb.reshape(user_emb.shape[0], num_candidates, -1)
    if similarity == "cosine":
        user_emb = user_emb / jnp.maximum(
            jnp.linalg.norm(user_emb, axis=-1, keepdims=True), 1e-12)
        item_emb = item_emb / jnp.maximum(
            jnp.linalg.norm(item_emb, axis=-1, keepdims=True), 1e-12)
    scores = jnp.einsum("bd,bsd->bs", user_emb, item_emb)
    return scores / temperature


class MatchingModel(nn.Module):
    """Two-tower base: subclasses define `user_tower` and `item_tower`.

    __call__ with a train batch returns (B, 1+num_negs) scores (column 0 =
    positive) for the matching losses; `encode_user` / `encode_item` expose
    the towers for full-corpus retrieval eval — mirroring the reference
    evaluate() path (`match_model.py:205-225`).
    """

    feature_map: FeatureMap
    embedding_dim: int = 64
    similarity: str = "dot"          # 'dot' | 'cosine'
    temperature: float = 1.0

    def user_tower(self, batch, train: bool = False) -> jnp.ndarray:
        raise NotImplementedError

    def item_tower(self, batch, train: bool = False) -> jnp.ndarray:
        raise NotImplementedError

    def _serve_normalize(self, emb: jnp.ndarray) -> jnp.ndarray:
        # cosine-trained models must SERVE in cosine space too: the
        # retrieval evaluator and RetrievalService rank by plain dot
        # product of the encoded towers, so the towers normalize here —
        # otherwise eval/serving would rank by a different function than
        # the one the loss optimized (train/serve skew)
        if self.similarity == "cosine":
            return emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb

    def encode_user(self, batch, train: bool = False) -> jnp.ndarray:
        return self._serve_normalize(self.user_tower(batch, train))

    def encode_item(self, batch, train: bool = False) -> jnp.ndarray:
        return self._serve_normalize(self.item_tower(batch, train))

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False) -> jnp.ndarray:
        user_emb = self.user_tower(batch, train)
        item_batch = extract_item_batch(batch)
        item_emb = self.item_tower(item_batch, train)
        num_candidates = batch["__item_ids__"].shape[1]
        return similarity_scores(user_emb, item_emb, num_candidates,
                                 self.similarity, self.temperature)


class RankingModel(nn.Module):
    """CTR base: subclasses implement `forward(batch, train) -> (B,) logits`.

    `__call__` returns raw logits; the output activation (sigmoid for binary
    tasks, reference `ranking_model.py:118-127`) is applied by the loss /
    evaluator, keeping the logit path fused and numerically stable.
    """

    feature_map: FeatureMap

    def forward(self, batch, train: bool = False) -> jnp.ndarray:
        raise NotImplementedError

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False) -> jnp.ndarray:
        logits = self.forward(batch, train)
        return logits.reshape(-1)
