"""Multi-interest & contrastive matching models: MIND, ComiRec, SimpleX,
YoutubeSBC.

Re-designed from the rechub matching zoo:
  - MIND (`third_party/rechub/models/matching/mind.py:17-100`): capsule
    dynamic routing extracts K interest vectors; training scores the target
    with label-aware attention (softmax^p over interests), serving retrieves
    per interest and merges (handled natively by the retrieval engine's
    (U, K, D) path);
  - ComiRec-SA (`comirec.py`): self-attentive K interests, argmax-interest
    training;
  - SimpleX (`third_party/recbole/model/general_recommender/simplex.py`
    shape): user = g·user_emb + (1−g)·mean(history), cosine scores, intended
    for CosineContrastiveLoss;
  - YoutubeSBC (`youtube_sbc.py`): in-batch sampled softmax with log-q
    popularity correction — train via `train_method="inbatch_scores"` with
    `sampled_softmax_inbatch_loss`.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from recbox_tpu.models.base import MatchingModel, extract_item_batch
from recbox_tpu.nn.attention import CapsuleNetwork, MultiInterestSA
from recbox_tpu.nn.core import MLP
from recbox_tpu.nn.embedding import FeatureEmbedding, concat_embeddings, emb_init

__all__ = ["MIND", "ComiRec", "SimpleX", "YoutubeSBC",
           "sampled_softmax_inbatch_loss"]


def sampled_softmax_inbatch_loss(scores: jnp.ndarray, log_q=None) -> jnp.ndarray:
    """In-batch softmax CE on the diagonal with optional log-q correction
    (`youtube_sbc.py` log-uniform/popularity correction)."""
    if log_q is not None:
        scores = scores - log_q[None, :]
    logp = jax.nn.log_softmax(scores, axis=1)
    return -jnp.mean(jnp.diagonal(logp))


class _MultiInterestBase(MatchingModel):
    """Shared plumbing: item table + history embedding + interest scoring."""

    max_seq_len: int = 50
    interest_num: int = 4
    # label-aware attention power (MIND pow_p); higher → harder argmax
    pow_p: float = 2.0

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        init = nn.with_partitioning(emb_init(), (("data", "model"), None))
        self.item_table = self.param("emb_item", init,
                                     (spec.vocab_size, self.embedding_dim))
        self.extractor = self.make_extractor()

    def make_extractor(self) -> nn.Module:
        raise NotImplementedError

    def _history(self, batch):
        seq = batch["item_seq"]
        emb = jnp.take(jnp.asarray(self.item_table), seq, axis=0)
        mask = seq != 0
        return emb * mask[..., None].astype(emb.dtype), mask

    def interests(self, batch, train: bool = False) -> jnp.ndarray:
        emb, mask = self._history(batch)
        return self.extractor(emb, mask)  # (B, K, D)

    def user_tower(self, batch, train: bool = False):
        # serving: expose all interests; the retrieval engine maxes over K
        return self.interests(batch, train)

    def item_tower(self, batch, train: bool = False):
        return jnp.take(jnp.asarray(self.item_table),
                        batch[self.feature_map.corpus_index], axis=0)

    def __call__(self, batch, train: bool = False):
        """(B, 1+negs) scores with label-aware interest attention.

        The attention over the K interests is conditioned on the POSITIVE
        (column 0) ONLY — the reference selects the best interest by
        argmax against the label item and scores every candidate with that
        single user vector (`mind.py:56-65`); the MIND paper's soft form
        is softmax((interest·label)^p). Attending per candidate instead
        would score each negative by its own best-matching interest
        (approximately max over K), systematically inflating negative
        logits relative to the reference objective.
        """
        interests = self.interests(batch, train)          # (B, K, D)
        item_batch = extract_item_batch(batch)
        item_emb = self.item_tower(item_batch, train)     # (B·S, D)
        S = batch["__item_ids__"].shape[1]
        item_emb = item_emb.reshape(-1, S, self.embedding_dim)
        pos_logits = jnp.einsum("bkd,bd->bk", interests, item_emb[:, 0, :])
        att = jax.nn.softmax(jnp.power(jnp.abs(pos_logits), self.pow_p)
                             * jnp.sign(pos_logits), axis=1)   # (B, K)
        user_vec = jnp.einsum("bk,bkd->bd", att, interests)    # (B, D)
        scores = jnp.einsum("bd,bsd->bs", user_vec, item_emb)
        return scores / self.temperature


class MIND(_MultiInterestBase):
    """Capsule dynamic-routing multi-interest extractor."""

    routing_rounds: int = 3

    def make_extractor(self):
        return CapsuleNetwork(interest_num=self.interest_num,
                              routing_rounds=self.routing_rounds, name="capsule")


class ComiRec(_MultiInterestBase):
    """Self-attentive multi-interest extractor (ComiRec-SA)."""

    def make_extractor(self):
        return MultiInterestSA(interest_num=self.interest_num, name="sa")


class SimpleX(MatchingModel):
    """User = g·id-embedding + (1−g)·mean(history); cosine similarity.

    Train with CosineContrastiveLoss (`similarity='cosine'` is forced).
    """

    gamma: float = 0.5
    max_seq_len: int = 50
    similarity: str = "cosine"

    def setup(self):
        uspec = self.feature_map[self.feature_map.query_index]
        ispec = self.feature_map[self.feature_map.corpus_index]
        init = nn.with_partitioning(emb_init(), (("data", "model"), None))
        self.user_table = self.param("emb_user", init,
                                     (uspec.vocab_size, self.embedding_dim))
        self.item_table = self.param("emb_item", init,
                                     (ispec.vocab_size, self.embedding_dim))

    def user_tower(self, batch, train: bool = False):
        ue = jnp.take(jnp.asarray(self.user_table),
                      batch[self.feature_map.query_index], axis=0)
        if "item_seq" in batch:
            seq = batch["item_seq"]
            emb = jnp.take(jnp.asarray(self.item_table), seq, axis=0)
            mask = (seq != 0).astype(emb.dtype)[..., None]
            hist = jnp.sum(emb * mask, axis=1) / jnp.maximum(
                jnp.sum(mask, axis=1), 1e-9)
            return self.gamma * ue + (1.0 - self.gamma) * hist
        return ue

    def item_tower(self, batch, train: bool = False):
        return jnp.take(jnp.asarray(self.item_table),
                        batch[self.feature_map.corpus_index], axis=0)


class YoutubeSBC(MatchingModel):
    """Sampled-softmax-bias-corrected two-tower (in-batch negatives).

    Train with `train_method="inbatch_scores"`:
      scores (B, B) = user_tower · item_towerᵀ over the batch; diagonal is
      the positive; pass the batch's `__log_q__` column (log sampling
      probability of each item, e.g. log popularity) for correction.
    """

    user_hidden_units: Sequence[int] = (128, 64)
    item_hidden_units: Sequence[int] = (128, 64)
    dropout: float = 0.0

    def setup(self):
        self.user_emb = FeatureEmbedding(self.feature_map, source="user",
                                         name="user_embedding")
        self.item_emb = FeatureEmbedding(self.feature_map, source="item",
                                         name="item_embedding")
        self.user_mlp = MLP(self.user_hidden_units[:-1],
                            output_dim=self.user_hidden_units[-1],
                            dropout=self.dropout, name="user_mlp")
        self.item_mlp = MLP(self.item_hidden_units[:-1],
                            output_dim=self.item_hidden_units[-1],
                            dropout=self.dropout, name="item_mlp")

    def user_tower(self, batch, train: bool = False):
        x = concat_embeddings(self.user_emb(batch),
                              self.feature_map.by_source("user"))
        return self.user_mlp(x, train=train)

    def item_tower(self, batch, train: bool = False):
        x = concat_embeddings(self.item_emb(batch),
                              self.feature_map.by_source("item"))
        return self.item_mlp(x, train=train)

    def inbatch_scores(self, batch, train: bool = False) -> jnp.ndarray:
        u = self.user_tower(batch, train)
        i = self.item_tower(batch, train)
        return jnp.dot(u, i.T, preferred_element_type=jnp.float32) \
            / self.temperature
