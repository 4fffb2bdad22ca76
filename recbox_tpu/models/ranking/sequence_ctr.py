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
import jax
import jax.numpy as jnp

from recbox_tpu.models.base import RankingModel
from recbox_tpu.nn.attention import TargetAttention, TransformerEncoder
from recbox_tpu.nn.core import MLP
from recbox_tpu.nn.embedding import FeatureEmbedding, concat_embeddings

__all__ = ["DIN", "BST", "DIEN", "DSIN"]


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


class _AUGRUCell(nn.Module):
    """GRU cell whose update gate is scaled by an attention score — DIEN's
    interest-evolution core (`deepctr/contrib/rnn_v2.py` AUGRU / recbole
    `dien.py` DynamicRNN). Inputs are [x_t ‖ a_t] with a_t the last column."""

    features: int

    @nn.compact
    def __call__(self, carry, inputs):
        h = carry
        x, att = inputs[..., :-1], inputs[..., -1:]
        dense_i = lambda name: nn.Dense(self.features, name=name)
        dense_h = lambda name: nn.Dense(self.features, use_bias=False,
                                        name=name)
        r = nn.sigmoid(dense_i("ir")(x) + dense_h("hr")(h))
        z = nn.sigmoid(dense_i("iz")(x) + dense_h("hz")(h))
        n = nn.tanh(dense_i("in")(x) + r * dense_h("hn")(h))
        z = att * z
        new_h = (1.0 - z) * h + z * n
        return new_h, new_h

    @property
    def num_feature_axes(self):
        return 1

    def initialize_carry(self, rng, input_shape):
        return jnp.zeros(input_shape[:-1] + (self.features,))


class DIEN(RankingModel):
    """Deep interest evolution network (`deepctr/models/sequence/dien.py`):
    interest extraction GRU over the behavior sequence, target-attention
    scores drive an AUGRU whose final state is the evolved interest.

    `auxiliary_logits` exposes the extraction-layer CTR head for DIEN's
    auxiliary loss (click vs sampled-negative next behaviors); wire it via a
    custom loss_fn when training with auxiliary supervision.
    """

    embedding_dim: int = 16
    history_feature: str = "hist"
    target_feature: str = "item_id"
    gru_hidden: int = 16
    hidden_units: Sequence[int] = (200, 80)
    activation: str = "dice"
    dropout: float = 0.0

    def setup(self):
        if self.gru_hidden != self.embedding_dim:
            # the attention compares target embeddings against GRU states
            # and the auxiliary loss dots interest states with behavior
            # embeddings — silent subspace slicing at mismatched widths
            # would compute meaningless scores
            raise ValueError(
                f"DIEN requires gru_hidden == embedding_dim "
                f"({self.gru_hidden} != {self.embedding_dim})")
        # submodules live in setup so both __call__ and auxiliary_logits can
        # reuse the extraction GRU (flax allows one compact method only)
        self.embedding = FeatureEmbedding(self.feature_map,
                                          embedding_dim=self.embedding_dim,
                                          sequence_pooling=False)
        self.gru1 = nn.RNN(nn.GRUCell(self.gru_hidden))
        self.att = MLP((80, 40), activation="sigmoid", output_dim=1)
        self.augru = nn.RNN(_AUGRUCell(self.gru_hidden))
        self.dnn = MLP(self.hidden_units, activation=self.activation,
                       output_dim=1, dropout=self.dropout)

    def _embed(self, batch):
        embs = self.embedding(batch)
        spec = self.feature_map[self.history_feature]
        pad = spec.padding_idx if spec.padding_idx is not None else spec.vocab_size - 1
        mask = batch[self.history_feature] != pad
        return embs, mask

    def __call__(self, batch, train: bool = False):
        embs, mask = self._embed(batch)
        hist = embs[self.history_feature]                  # (B, L, D)
        target = embs[self.target_feature]                 # (B, D)
        # interest extraction
        interest = self.gru1(hist)
        # attention scores target vs extracted interests
        att_in = jnp.concatenate(
            [interest, jnp.broadcast_to(target[:, None, :self.gru_hidden],
                                        interest.shape),
             interest * target[:, None, :self.gru_hidden]], axis=-1)
        scores = self.att(att_in)[..., 0]
        # masked softmax over the sequence (the reference's
        # att_weight_normalization, `dien.py`): AUGRU gates z_eff = att·z
        # must stay in [0, 1] — raw linear-head scores can be negative
        # (extrapolating AWAY from the candidate state) or > 1 (overshoot)
        scores = jnp.where(mask, scores, -1e9)
        scores = jax.nn.softmax(scores, axis=-1)
        scores = jnp.where(mask, scores, 0.0)[..., None]   # (B, L, 1)
        # interest evolution via AUGRU
        evolved = self.augru(jnp.concatenate([interest, scores], axis=-1))
        final = evolved[:, -1, :]
        other = {k: v for k, v in embs.items() if k != self.history_feature}
        other_feats = tuple(f for f in self.feature_map.input_features
                            if f.name != self.history_feature)
        flat = concat_embeddings(other, other_feats)
        x = jnp.concatenate([flat, final], axis=-1)
        logit = self.dnn(x, train=train)
        return logit.reshape(-1)

    def auxiliary_logits(self, batch, neg_hist_feature: str = "neg_hist",
                         train: bool = False):
        """(B, L−1, 2) logits: interest state t vs (pos, neg) behavior t+1 —
        DIEN's auxiliary-loss inputs (`dien.py` auxiliary_loss)."""
        embs, _ = self._embed(batch)
        hist = embs[self.history_feature]
        interest = self.gru1(hist)
        # fallback negatives = the NEXT user's behaviors (batch roll) — the
        # sampled-negative analog when no neg_hist column exists. (The old
        # jnp.flip(hist) default used the user's OWN clicks as negatives,
        # colliding with the positive at the midpoint.)
        neg = embs.get(neg_hist_feature, jnp.roll(hist, 1, axis=0))
        h = interest[:, :-1, : self.embedding_dim]
        pos_l = jnp.sum(h * hist[:, 1:], axis=-1)
        neg_l = jnp.sum(h * neg[:, 1:], axis=-1)
        return jnp.stack([pos_l, neg_l], axis=-1)


class DSIN(RankingModel):
    """Deep session interest network (`deepctr/models/sequence/dsin.py`):
    the behavior sequence is split into sessions; per-session self-attention
    pools session interests, a Bi-GRU models their evolution, and two
    activation units attend both views against the target."""

    embedding_dim: int = 16
    history_feature: str = "hist"
    target_feature: str = "item_id"
    session_count: int = 5
    n_heads: int = 2
    hidden_units: Sequence[int] = (200, 80)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        embs = FeatureEmbedding(self.feature_map,
                                embedding_dim=self.embedding_dim,
                                sequence_pooling=False,
                                name="embedding")(batch)
        hist = embs[self.history_feature]                  # (B, L, D)
        target = embs[self.target_feature]                 # (B, D)
        spec = self.feature_map[self.history_feature]
        pad = spec.padding_idx if spec.padding_idx is not None else spec.vocab_size - 1
        mask = batch[self.history_feature] != pad
        B, L, D = hist.shape
        S = self.session_count
        assert L % S == 0, "history length must divide into session_count"
        K = L // S
        sess = hist.reshape(B * S, K, D)
        sess_mask = mask.reshape(B * S, K)
        # bias-encoded per-session self-attention → avg pool (session interest)
        enc = TransformerEncoder(n_layers=1, n_heads=self.n_heads,
                                 hidden_dropout=self.dropout,
                                 attn_dropout=self.dropout,
                                 name="session_att")(sess, mask=sess_mask,
                                                     train=train)
        w = sess_mask[..., None].astype(enc.dtype)
        interest = (jnp.sum(enc * w, axis=1)
                    / jnp.maximum(jnp.sum(w, axis=1), 1e-12)).reshape(B, S, D)
        sess_valid = mask.reshape(B, S, K).any(-1)
        # session evolution: bidirectional GRU over the VALID sessions only
        # (the reference uses bidirectional_dynamic_rnn + sequence_length;
        # a plain flip would run the backward recurrence through empty
        # padded sessions). seq_lengths assumes the valid run is a PREFIX,
        # but the framework's default tokenizer padding is 'pre' (valid
        # sessions form a SUFFIX) — roll each row so its valid run starts
        # at position 0, run the length-aware RNNs, and roll back.
        sess_len = jnp.sum(sess_valid.astype(jnp.int32), axis=-1)
        lead = jnp.argmax(sess_valid.astype(jnp.int32), axis=-1)  # 1st valid
        pos = jnp.arange(S)[None, :]
        fwd_idx = (pos + lead[:, None]) % S                   # to prefix
        inv_idx = (pos - lead[:, None]) % S                   # back
        pre = jnp.take_along_axis(interest, fwd_idx[..., None], axis=1)
        fwd = nn.RNN(nn.GRUCell(D), name="gru_fwd")(
            pre, seq_lengths=sess_len)
        bwd = nn.RNN(nn.GRUCell(D), name="gru_bwd", reverse=True,
                     keep_order=True)(pre, seq_lengths=sess_len)
        evolved = jnp.take_along_axis(fwd + bwd, inv_idx[..., None], axis=1)
        att1 = TargetAttention(use_softmax=True, name="act1")(
            target, interest, sess_valid, train=train)
        att2 = TargetAttention(use_softmax=True, name="act2")(
            target, evolved, sess_valid, train=train)
        other = {k: v for k, v in embs.items() if k != self.history_feature}
        other_feats = tuple(f for f in self.feature_map.input_features
                            if f.name != self.history_feature)
        flat = concat_embeddings(other, other_feats)
        x = jnp.concatenate([flat, att1, att2], axis=-1)
        logit = MLP(self.hidden_units, output_dim=1, dropout=self.dropout,
                    name="dnn")(x, train=train)
        return logit.reshape(-1)
