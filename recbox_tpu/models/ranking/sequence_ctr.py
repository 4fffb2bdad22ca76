"""Sequence-aware CTR models: DIN and BST.

Re-designed from the reference (`third_party/deepctr/models/sequence/din.py`,
`bst.py`, `third_party/rechub/models/ranking/din.py`, target attention from
`recbox/ranking/pytorch/layers/attentions/target_attention.py`):

* DIN — the behavior sequence is pooled by target attention against the
  candidate item instead of mean pooling; everything else is a DNN.
* BST — transformer over [history ‖ candidate] positions, concat with other
  features into an MLP.

Config: `history_feature` names the sequence feature, `target_feature` the
candidate item feature; they must share an embedding table
(`share_embedding`) so attention compares like with like.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from recbox_tpu.models.base import RankingModel
from recbox_tpu.nn.attention import TargetAttention, TransformerEncoder
from recbox_tpu.nn.core import MLP
from recbox_tpu.nn.embedding import FeatureEmbedding, concat_embeddings

__all__ = ["DIN", "BST"]


class DIN(RankingModel):
    """Deep interest network: target attention over the behavior sequence."""

    embedding_dim: int = 16
    history_feature: str = "hist"
    target_feature: str = "item_id"
    attention_hidden_units: Sequence[int] = (80, 40)
    attention_activation: str = "dice"
    attention_use_softmax: bool = False
    hidden_units: Sequence[int] = (200, 80)
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        embs = FeatureEmbedding(self.feature_map,
                                embedding_dim=self.embedding_dim,
                                sequence_pooling=False,
                                name="embedding")(batch)
        hist = embs[self.history_feature]              # (B, L, D)
        target = embs[self.target_feature]             # (B, D)
        spec = self.feature_map[self.history_feature]
        pad = spec.padding_idx if spec.padding_idx is not None else spec.vocab_size - 1
        mask = batch[self.history_feature] != pad
        pooled = TargetAttention(
            hidden_units=tuple(self.attention_hidden_units),
            activation=self.attention_activation,
            use_softmax=self.attention_use_softmax,
            name="attention")(target, hist, mask, train=train)
        other = {k: v for k, v in embs.items() if k != self.history_feature}
        other_feats = tuple(f for f in self.feature_map.input_features
                            if f.name != self.history_feature)
        flat = concat_embeddings(other, other_feats)
        x = jnp.concatenate([flat, pooled], axis=-1)
        logit = MLP(self.hidden_units, activation=self.activation,
                    output_dim=1, dropout=self.dropout,
                    name="dnn")(x, train=train)
        return logit.reshape(-1)


class BST(RankingModel):
    """Behavior sequence transformer: self-attention over history+candidate."""

    embedding_dim: int = 16
    history_feature: str = "hist"
    target_feature: str = "item_id"
    n_layers: int = 1
    n_heads: int = 2
    hidden_units: Sequence[int] = (200, 80)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        embs = FeatureEmbedding(self.feature_map,
                                embedding_dim=self.embedding_dim,
                                sequence_pooling=False,
                                name="embedding")(batch)
        hist = embs[self.history_feature]              # (B, L, D)
        target = embs[self.target_feature]             # (B, D)
        spec = self.feature_map[self.history_feature]
        pad = spec.padding_idx if spec.padding_idx is not None else spec.vocab_size - 1
        mask = jnp.concatenate(
            [batch[self.history_feature] != pad,
             jnp.ones((hist.shape[0], 1), bool)], axis=1)
        seq = jnp.concatenate([hist, target[:, None, :]], axis=1)
        from recbox_tpu.nn.attention import PositionalEmbedding
        seq = PositionalEmbedding(seq.shape[1], name="pos")(seq)
        enc = TransformerEncoder(n_layers=self.n_layers, n_heads=self.n_heads,
                                 hidden_dropout=self.dropout,
                                 attn_dropout=self.dropout,
                                 name="encoder")(seq, mask=mask, train=train)
        enc_flat = (enc * mask[..., None].astype(enc.dtype)).reshape(
            enc.shape[0], -1)
        other = {k: v for k, v in embs.items() if k != self.history_feature}
        other_feats = tuple(f for f in self.feature_map.input_features
                            if f.name != self.history_feature)
        flat = concat_embeddings(other, other_feats)
        x = jnp.concatenate([flat, enc_flat], axis=-1)
        logit = MLP(self.hidden_units, output_dim=1, dropout=self.dropout,
                    name="dnn")(x, train=train)
        return logit.reshape(-1)
