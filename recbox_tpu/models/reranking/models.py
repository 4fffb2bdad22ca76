"""Listwise reranking models: PRM, DLCM, SetRank, miDNN, GSF.

Re-designed from the librerank rerankers
(`third_party/librerank/reranker.py:251-417`): TF1 placeholder graphs become
pure flax modules over a fixed-size candidate list.

Batch contract (the output of the ranking stage):
  item_feats (B, N, D) — per-candidate feature vectors (embeddings and/or
    dense features, padded to list size N);
  mask (B, N) bool — valid candidates;
  labels (B, N) float — click/relevance labels (training/eval only).
Models return (B, N) scores; invalid positions should be ignored via the
mask by losses/metrics (`listwise_bce`, `evaluate_rerank`).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from recbox_tpu.nn.attention import PositionalEmbedding, TransformerEncoder
from recbox_tpu.nn.core import MLP

__all__ = ["PRM", "DLCM", "SetRank", "MiDNN", "GSF", "listwise_bce",
           "listwise_softmax_ce"]


def listwise_bce(scores: jnp.ndarray, labels: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
    """Masked per-item BCE — librerank's logloss (`reranker.py:104-118`)."""
    labels = labels.astype(scores.dtype)
    m = mask.astype(scores.dtype)
    per = jax.nn.softplus(scores) - labels * scores
    # where(), not multiplication: a NaN/inf score at a masked position
    # would survive per*0 and poison the whole-batch loss
    per = jnp.where(m > 0, per, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(m), 1.0)


def listwise_softmax_ce(scores: jnp.ndarray, labels: jnp.ndarray,
                        mask: jnp.ndarray) -> jnp.ndarray:
    """Softmax CE over the list against the normalized click distribution
    (librerank's attention-based loss variant)."""
    neg_inf = jnp.asarray(-1e9, scores.dtype)
    logp = jax.nn.log_softmax(jnp.where(mask, scores, neg_inf), axis=-1)
    labels = labels.astype(scores.dtype) * mask.astype(scores.dtype)
    target = labels / jnp.maximum(jnp.sum(labels, axis=-1, keepdims=True), 1e-9)
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


class PRM(nn.Module):
    """Personalized re-ranking model (`reranker.py:331-367`): input MLP +
    position embedding → transformer blocks → per-item score head."""

    d_model: int = 64
    n_layers: int = 2
    n_heads: int = 2
    max_list_len: int = 50
    dropout: float = 0.0

    @nn.compact
    def __call__(self, item_feats, mask, train: bool = False):
        x = nn.Dense(self.d_model, name="input_proj")(item_feats)
        x = PositionalEmbedding(self.max_list_len, name="pos")(x)
        x = TransformerEncoder(n_layers=self.n_layers, n_heads=self.n_heads,
                               hidden_dropout=self.dropout,
                               attn_dropout=self.dropout,
                               name="encoder")(x, mask=mask, train=train)
        return nn.Dense(1, name="score")(x)[..., 0]


class DLCM(nn.Module):
    """Deep listwise context model (`reranker.py:385-417`): GRU over the
    list; score = local activation between each hidden state and the final
    context vector."""

    hidden_size: int = 64

    @nn.compact
    def __call__(self, item_feats, mask, train: bool = False):
        h = nn.RNN(nn.GRUCell(self.hidden_size), name="gru")(item_feats)
        # final context = last valid hidden state
        seq_len = jnp.sum(mask.astype(jnp.int32), axis=-1)
        idx = jnp.maximum(seq_len - 1, 0)[:, None, None]
        ctx = jnp.take_along_axis(h, idx.repeat(h.shape[-1], axis=2), axis=1)[:, 0]
        w_ctx = nn.Dense(self.hidden_size, use_bias=False, name="wc")(ctx)
        return jnp.einsum("blh,bh->bl", h, jnp.tanh(w_ctx))


class SetRank(nn.Module):
    """Permutation-invariant set attention (`reranker.py:368-384`): self
    attention WITHOUT position embeddings, per-item head."""

    d_model: int = 64
    n_layers: int = 2
    n_heads: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, item_feats, mask, train: bool = False):
        x = nn.Dense(self.d_model, name="input_proj")(item_feats)
        x = TransformerEncoder(n_layers=self.n_layers, n_heads=self.n_heads,
                               hidden_dropout=self.dropout,
                               attn_dropout=self.dropout,
                               name="encoder")(x, mask=mask, train=train)
        return nn.Dense(1, name="score")(x)[..., 0]


class MiDNN(nn.Module):
    """miDNN (`reranker.py:302-330`): append global list statistics
    (max/min-normalized features over the list) to each item, then a
    pointwise MLP."""

    hidden_units: Sequence[int] = (128, 64)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, item_feats, mask, train: bool = False):
        m = mask[..., None].astype(item_feats.dtype)
        big = jnp.where(m > 0, item_feats, -jnp.inf)
        small = jnp.where(m > 0, item_feats, jnp.inf)
        fmax = jnp.max(big, axis=1, keepdims=True)
        fmin = jnp.min(small, axis=1, keepdims=True)
        # fully-masked rows give fmax=-inf/fmin=+inf: -inf*0 = NaN would
        # poison the batch loss — neutralize the stats for empty lists
        empty = ~jnp.isfinite(fmax)
        fmax = jnp.where(empty, 0.0, fmax)
        fmin = jnp.where(empty, 0.0, fmin)
        denom = jnp.maximum(fmax - fmin, 1e-9)
        global_feat = jnp.where(m > 0, (item_feats - fmin) / denom, 0.0)
        x = jnp.concatenate([item_feats, global_feat], axis=-1)
        return MLP(self.hidden_units, output_dim=1, dropout=self.dropout,
                   name="mlp")(x, train=train)[..., 0]


class GSF(nn.Module):
    """Groupwise scoring function (`reranker.py:251-301`): score each item by
    averaging a shared DNN applied to sliding groups of size m that contain
    it (circular), instead of enumerating permutations."""

    group_size: int = 3
    hidden_units: Sequence[int] = (128, 64)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, item_feats, mask, train: bool = False):
        B, N, D = item_feats.shape
        m = self.group_size
        # zero padded slots FIRST: circular groups mix arbitrary pad
        # content into valid items' group scores otherwise (every other
        # reranker here honors the mask contract)
        item_feats = item_feats * mask[..., None].astype(item_feats.dtype)
        # circular groups starting at every position: (B, N, m, D)
        idx = (jnp.arange(N)[:, None] + jnp.arange(m)[None, :]) % N
        groups = item_feats[:, idx]                    # (B, N, m, D)
        flat = groups.reshape(B, N, m * D)
        scores_per_group = MLP(self.hidden_units, output_dim=m,
                               dropout=self.dropout,
                               name="group_mlp")(flat, train=train)  # (B,N,m)
        # scatter group-member scores back to items: member j of group g is
        # item (g+j) mod N
        out = jnp.zeros((B, N), item_feats.dtype)
        for j in range(m):
            out = out.at[:, (jnp.arange(N) + j) % N].add(scores_per_group[:, :, j])
        return out / m
