"""Two-tower matching models: MF, DSSM, YoutubeDNN.

Re-designed equivalents of the reference matching zoo:
  - MF: pure embedding towers (reference shape:
    `third_party/recbole/model/general_recommender/bpr.py:27-97` /
    `third_party/daisy/model/MFRecommender.py:25-60`) — trained with any of
    the six matching losses (BPR = PairwiseLogisticLoss);
  - DSSM: per-tower MLPs over all tower features
    (`third_party/rechub/models/matching/dssm.py`);
  - YoutubeDNN: user tower = MLP over [pooled history ⊕ user features],
    item tower = item embedding (`rechub/models/matching/youtube_dnn.py`).

All towers consume the FeatureMap's `source`-routed features, so the same
class covers id-only MF and feature-rich variants.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from recbox_tpu.features.schema import FeatureMap
from recbox_tpu.models.base import MatchingModel
from recbox_tpu.nn.core import MLP
from recbox_tpu.nn.embedding import FeatureEmbedding, concat_embeddings

__all__ = ["MF", "DSSM", "YoutubeDNN"]


class MF(MatchingModel):
    """Matrix factorization: user/item id embeddings, dot or cosine scores.

    `emb_init_scheme='xavier_normal'` reproduces recbole BPR's init
    (`bpr.py:43`) — init parity moves metrics more than kernels do
    (SURVEY §7 hard part 7)."""

    emb_init_scheme: str = "normal"

    def setup(self):
        self.user_emb = FeatureEmbedding(
            self.feature_map, source="user", embedding_dim=self.embedding_dim,
            emb_init_scheme=self.emb_init_scheme, name="user_embedding")
        self.item_emb = FeatureEmbedding(
            self.feature_map, source="item", embedding_dim=self.embedding_dim,
            emb_init_scheme=self.emb_init_scheme, name="item_embedding")

    def user_tower(self, batch, train: bool = False):
        embs = self.user_emb(batch)
        feats = self.feature_map.by_source("user")
        # sum multiple user features into one vector (id-only MF = identity)
        return sum(embs[f.name] for f in feats if f.name in embs)

    def item_tower(self, batch, train: bool = False):
        embs = self.item_emb(batch)
        feats = self.feature_map.by_source("item")
        return sum(embs[f.name] for f in feats if f.name in embs)


class DSSM(MatchingModel):
    """Deep structured semantic model: MLP over each tower's concat features."""

    user_hidden_units: Sequence[int] = (256, 128, 64)
    item_hidden_units: Sequence[int] = (256, 128, 64)
    activation: str = "relu"
    dropout: float = 0.0
    batch_norm: bool = False

    def setup(self):
        self.user_emb = FeatureEmbedding(self.feature_map, source="user",
                                         name="user_embedding")
        self.item_emb = FeatureEmbedding(self.feature_map, source="item",
                                         name="item_embedding")
        self.user_mlp = MLP(self.user_hidden_units[:-1], activation=self.activation,
                            output_dim=self.user_hidden_units[-1],
                            dropout=self.dropout, batch_norm=self.batch_norm,
                            name="user_mlp")
        self.item_mlp = MLP(self.item_hidden_units[:-1], activation=self.activation,
                            output_dim=self.item_hidden_units[-1],
                            dropout=self.dropout, batch_norm=self.batch_norm,
                            name="item_mlp")

    def user_tower(self, batch, train: bool = False):
        embs = self.user_emb(batch)
        x = concat_embeddings(embs, self.feature_map.by_source("user"))
        return self.user_mlp(x, train=train)

    def item_tower(self, batch, train: bool = False):
        embs = self.item_emb(batch)
        x = concat_embeddings(embs, self.feature_map.by_source("item"))
        return self.item_mlp(x, train=train)


class YoutubeDNN(MatchingModel):
    """YoutubeDNN retrieval: deep user tower vs. plain item embedding.

    The item tower is the (shared) item-id embedding so that user vectors and
    the corpus live in one space; sequence history features (share_embedding
    with the item id) are mean-pooled into the user tower input.
    """

    hidden_units: Sequence[int] = (256, 128, 64)
    activation: str = "relu"
    dropout: float = 0.0

    def setup(self):
        self.user_emb = FeatureEmbedding(self.feature_map, source="user",
                                         embedding_dim=self.embedding_dim,
                                         name="user_embedding")
        self.item_emb = FeatureEmbedding(self.feature_map, source="item",
                                         embedding_dim=self.embedding_dim,
                                         name="item_embedding")
        self.user_mlp = MLP(self.hidden_units[:-1], activation=self.activation,
                            output_dim=self.embedding_dim,
                            dropout=self.dropout, name="user_mlp")

    def user_tower(self, batch, train: bool = False):
        embs = self.user_emb(batch)
        x = concat_embeddings(embs, self.feature_map.by_source("user"))
        return self.user_mlp(x, train=train)

    def item_tower(self, batch, train: bool = False):
        embs = self.item_emb(batch)
        feats = self.feature_map.by_source("item")
        return sum(embs[f.name] for f in feats if f.name in embs)
