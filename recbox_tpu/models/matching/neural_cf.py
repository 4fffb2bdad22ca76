"""Neural collaborative filtering: models whose score is a learned function
f(u, i) rather than a dot product.

TPU-native re-designs of recbole's general recommenders
(`third_party/recbole/model/general_recommender/{neumf,convncf,nais,fism,
enmf}.py`). These don't factor into user/item towers, so they subclass
`PairScoringModel`: `__call__` scores the sampled candidate ids (B, 1+negs)
directly, and `full_scores` broadcasts f(u, ·) over the whole corpus — the
recbole `full_sort_predict` protocol (batched over users; XLA keeps the
(B, N, D) intermediates fused).

Batch contract: `user_id` (B,), candidate ids via `__item_ids__` (B, S);
history-based models (NAIS/FISM/ENMF) additionally read `hist` (B, L)
zero-padded item histories.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from recbox_tpu.models.base import MatchingModel
from recbox_tpu.nn.core import MLP
from recbox_tpu.nn.embedding import emb_init

__all__ = ["PairScoringModel", "NeuMF", "ConvNCF", "NAIS", "FISM", "ENMF"]


def _sharded(init=None):
    return nn.with_partitioning(init or emb_init(), (("data", "model"), None))


class PairScoringModel(MatchingModel):
    """Base for f(u, i) scorers. Subclasses implement
    `score(batch, item_ids, train) -> (B, S)`."""

    num_users: int = 0
    num_items: int = 0

    def score(self, batch, item_ids, train: bool = False) -> jnp.ndarray:
        raise NotImplementedError

    def __call__(self, batch, train: bool = False) -> jnp.ndarray:
        return self.score(batch, batch["__item_ids__"], train)

    def full_scores(self, batch, train: bool = False) -> jnp.ndarray:
        B = batch[self.feature_map.query_index].shape[0] \
            if self.feature_map.query_index in batch else batch["user_id"].shape[0]
        ids = jnp.broadcast_to(jnp.arange(self.num_items)[None, :],
                               (B, self.num_items))
        return self.score(batch, ids, train)

    def user_tower(self, batch, train: bool = False):  # pragma: no cover
        raise NotImplementedError("pair-scoring models have no user tower")

    def item_tower(self, batch, train: bool = False):  # pragma: no cover
        raise NotImplementedError("pair-scoring models have no item tower")


class NeuMF(PairScoringModel):
    """Neural MF (`neumf.py` shape): GMF elementwise product ⊕ MLP over
    concatenated user/item embeddings, fused by a final linear head."""

    mlp_hidden_units: Sequence[int] = (128, 64)
    dropout: float = 0.0

    def setup(self):
        D = self.embedding_dim
        self.gmf_user = self.param("emb_gmf_user", _sharded(), (self.num_users, D))
        self.gmf_item = self.param("emb_gmf_item", _sharded(), (self.num_items, D))
        self.mlp_user = self.param("emb_mlp_user", _sharded(), (self.num_users, D))
        self.mlp_item = self.param("emb_mlp_item", _sharded(), (self.num_items, D))
        self.mlp = MLP(self.mlp_hidden_units, dropout=self.dropout, name="mlp")
        self.head = nn.Dense(1, use_bias=False,
                             kernel_init=nn.initializers.xavier_normal(),
                             name="head")

    def score(self, batch, item_ids, train: bool = False):
        u = batch["user_id"]
        gu = jnp.take(jnp.asarray(self.gmf_user), u, axis=0)[:, None]   # (B,1,D)
        gi = jnp.take(jnp.asarray(self.gmf_item), item_ids, axis=0)     # (B,S,D)
        mu = jnp.take(jnp.asarray(self.mlp_user), u, axis=0)[:, None]
        mi = jnp.take(jnp.asarray(self.mlp_item), item_ids, axis=0)
        gmf = gu * gi
        mlp_in = jnp.concatenate(
            [jnp.broadcast_to(mu, mi.shape), mi], axis=-1)
        deep = self.mlp(mlp_in, train=train)
        out = self.head(jnp.concatenate([gmf, deep], axis=-1))
        return out[..., 0]


class ConvNCF(PairScoringModel):
    """Convolutional NCF (`convncf.py` shape): CNN over the D×D outer
    product of user/item embeddings. full_scores is O(N·D²) per user — serve
    it in user chunks (the reference pays the same cost)."""

    channels: Sequence[int] = (16, 16)

    def setup(self):
        D = self.embedding_dim
        self.user_table = self.param("emb_user", _sharded(), (self.num_users, D))
        self.item_table = self.param("emb_item", _sharded(), (self.num_items, D))
        self.convs = [nn.Conv(c, kernel_size=(2, 2), strides=(2, 2),
                              name=f"conv{k}")
                      for k, c in enumerate(self.channels)]
        self.head = nn.Dense(1, use_bias=False,
                             kernel_init=nn.initializers.xavier_normal(),
                             name="head")

    def score(self, batch, item_ids, train: bool = False):
        u = jnp.take(jnp.asarray(self.user_table), batch["user_id"], axis=0)
        i = jnp.take(jnp.asarray(self.item_table), item_ids, axis=0)
        B, S, D = i.shape
        outer = jnp.einsum("bd,bse->bsde", u, i).reshape(B * S, D, D, 1)
        x = outer
        for conv in self.convs:
            x = jax.nn.relu(conv(x))
        x = jnp.sum(x, axis=(1, 2))              # (B·S, C)
        return self.head(x).reshape(B, S)


class _HistoryScorer(PairScoringModel):
    """Shared NAIS/FISM machinery: score(u, i) from the user's padded
    history against the candidate, with item biases and the self-exclusion
    mask (a history item never attends to itself as the target —
    `nais.py`/`fism.py` inter_matrix diagonal removal)."""

    alpha: float = 0.5
    split_to: int = 0  # recbole memory knob; XLA fuses, so unused

    def setup(self):
        D = self.embedding_dim
        self.src_table = self.param("emb_src", _sharded(), (self.num_items, D))
        self.dst_table = self.param("emb_dst", _sharded(), (self.num_items, D))
        self.item_bias = self.param("bias_item", nn.initializers.zeros,
                                    (self.num_items,))
        self.extra_setup()

    def extra_setup(self):
        pass

    def _history(self, batch, item_ids):
        hist = batch["hist"]                                   # (B, L)
        mask = hist != 0
        src = jnp.take(jnp.asarray(self.src_table), hist, axis=0)   # (B,L,D)
        dst = jnp.take(jnp.asarray(self.dst_table), item_ids, axis=0)  # (B,S,D)
        sim = jnp.einsum("bld,bsd->bsl", src, dst)
        # exclude the target itself from its own history evidence
        self_mask = hist[:, None, :] == item_ids[:, :, None]   # (B,S,L)
        valid = mask[:, None, :] & ~self_mask
        counts = jnp.maximum(jnp.sum(valid, axis=-1), 1).astype(sim.dtype)
        return sim, valid, counts


class FISM(_HistoryScorer):
    """Factored item similarity (`fism.py`): score = b_i +
    |H|^−α Σ_{j∈H} ⟨p_j, q_i⟩."""

    def score(self, batch, item_ids, train: bool = False):
        sim, valid, counts = self._history(batch, item_ids)
        agg = jnp.sum(jnp.where(valid, sim, 0.0), axis=-1)
        coeff = jnp.power(counts, -self.alpha)
        return agg * coeff + jnp.take(jnp.asarray(self.item_bias),
                                      item_ids, axis=0)


class NAIS(_HistoryScorer):
    """Neural attentive item similarity (`nais.py`): FISM with an attention
    net over [p_j ⊙ q_i] and β-smoothed softmax normalization."""

    beta: float = 0.5
    attention_dim: int = 32

    def extra_setup(self):
        self.att_mlp = nn.Dense(self.attention_dim, name="att_hidden")
        self.att_out = nn.Dense(1, use_bias=False, name="att_out")

    def score(self, batch, item_ids, train: bool = False):
        # shares the sim/validity machinery (incl. the self-exclusion
        # invariant) with FISM via _history
        sim, valid, _ = self._history(batch, item_ids)
        src = jnp.take(jnp.asarray(self.src_table), batch["hist"], axis=0)
        dst = jnp.take(jnp.asarray(self.dst_table), item_ids, axis=0)
        prod = src[:, None, :, :] * dst[:, :, None, :]          # (B,S,L,D)
        logits = self.att_out(jax.nn.relu(self.att_mlp(prod)))[..., 0]
        # clamp before exp: an unbounded Dense logit > ~88 overflows f32 to
        # inf and the smoothed-softmax ratio becomes inf/inf = NaN. A plain
        # max-subtraction does NOT cancel here (the β exponent on the
        # denominator breaks the identity), so clamp instead — exact for
        # every sane logit, finite always.
        w = jnp.where(valid, jnp.exp(jnp.minimum(logits, 60.0)), 0.0)
        denom = jnp.power(jnp.maximum(jnp.sum(w, axis=-1), 1e-12), self.beta)
        agg = jnp.sum(w * sim, axis=-1) / denom
        return agg + jnp.take(jnp.asarray(self.item_bias), item_ids, axis=0)


class ENMF(PairScoringModel):
    """Efficient neural MF (`enmf.py`): user repr = dropout-pooled history
    embedding; the companion `enmf_loss` implements the all-item efficient
    squared loss with the (ΣhhT)(ΣvvT) trick — no negative sampling."""

    dropout: float = 0.5

    def setup(self):
        D = self.embedding_dim
        self.item_table = self.param("emb_item", _sharded(), (self.num_items, D))
        self.h = self.param("h", nn.initializers.constant(0.01), (D, 1))
        self.drop = nn.Dropout(self.dropout)

    def user_repr(self, batch, train: bool = False):
        hist = batch["hist"]
        mask = (hist != 0)[..., None]
        emb = jnp.take(jnp.asarray(self.item_table), hist, axis=0)
        emb = self.drop(emb * mask.astype(emb.dtype),
                        deterministic=not train)
        return jnp.sum(emb, axis=1)                            # (B, D)

    def score(self, batch, item_ids, train: bool = False):
        u = self.user_repr(batch, train)
        v = jnp.take(jnp.asarray(self.item_table), item_ids, axis=0)
        h = jnp.asarray(self.h)[:, 0]
        return jnp.einsum("bd,bsd,d->bs", u, v, h)

    def all_scores_and_parts(self, batch, train: bool = False):
        """Returns (pos_scores (B, L), user_repr, item_table, h) for
        `enmf_loss`."""
        u = self.user_repr(batch, train)
        hist = batch["hist"]
        v = jnp.take(jnp.asarray(self.item_table), hist, axis=0)
        h = jnp.asarray(self.h)[:, 0]
        pos = jnp.einsum("bd,bld,d->bl", u, v, h)
        return pos, u, jnp.asarray(self.item_table), h


def enmf_loss(pos_scores, user_repr, item_table, h, hist_mask,
              neg_weight: float = 0.5) -> jnp.ndarray:
    """ENMF whole-corpus squared loss (`enmf.py` calculate_loss):
    c0 Σ_u Σ_i ŷ² − Σ_{(u,i)∈R} [(1+c0)·2ŷ − (1+c0)ŷ² − ... ] reduced via
    (Σ_u uuᵀ)·(Σ_i vvᵀ) — O((B+N)·D²) instead of O(B·N)."""
    mask = hist_mask.astype(pos_scores.dtype)
    pos_part = jnp.sum(((1.0 - neg_weight) * pos_scores * pos_scores
                        - 2.0 * pos_scores) * mask)
    gram_u = jnp.einsum("bd,be->de", user_repr, user_repr)
    hv = item_table * h[None, :]
    gram_v = jnp.einsum("id,ie->de", hv, hv)
    neg_part = neg_weight * jnp.sum(gram_u * gram_v)
    return (pos_part + neg_part) / pos_scores.shape[0]


class NNCF(PairScoringModel):
    """Neighborhood-enhanced NCF (recbole `nncf.py` shape): GMF user/item
    product concatenated with convolved neighborhood embeddings — the user's
    item-neighborhood embedded through the item table and vice versa, each
    passed through Conv1d + max-pool. Neighbor tables are fixed-size
    (`data.knowledge.build_neighbor_table`-style) host-built arrays."""

    user_neighbors: object = None   # StaticArray (num_users, K) of item ids
    item_neighbors: object = None   # StaticArray (num_items, K) of user ids
    conv_channels: int = 16
    conv_kernel: int = 3
    mlp_hidden_units: Sequence[int] = (64, 32)
    dropout: float = 0.0

    def setup(self):
        D = self.embedding_dim
        self.user_table = self.param("emb_user", _sharded(), (self.num_users, D))
        self.item_table = self.param("emb_item", _sharded(), (self.num_items, D))
        self.u_conv = nn.Conv(self.conv_channels, kernel_size=(self.conv_kernel,),
                              name="u_conv")
        self.i_conv = nn.Conv(self.conv_channels, kernel_size=(self.conv_kernel,),
                              name="i_conv")
        self.mlp = MLP(self.mlp_hidden_units, dropout=self.dropout, name="mlp")
        self.head = nn.Dense(1, use_bias=False,
                             kernel_init=nn.initializers.xavier_normal(),
                             name="head")

    def _neigh_repr(self, ids, table, conv):
        # ids (..., K) → embed → conv over neighbors → max pool → (..., C)
        emb = jnp.take(table, ids, axis=0)
        out = jax.nn.relu(conv(emb))
        return jnp.max(out, axis=-2)

    def score(self, batch, item_ids, train: bool = False):
        u_ids = batch["user_id"]
        u = jnp.take(jnp.asarray(self.user_table), u_ids, axis=0)    # (B, D)
        i = jnp.take(jnp.asarray(self.item_table), item_ids, axis=0)  # (B,S,D)
        un_ids = jnp.take(jnp.asarray(self.user_neighbors.value), u_ids, axis=0)
        in_ids = jnp.take(jnp.asarray(self.item_neighbors.value), item_ids, axis=0)
        un = self._neigh_repr(un_ids, jnp.asarray(self.item_table),
                              self.u_conv)                            # (B, C)
        inr = self._neigh_repr(in_ids, jnp.asarray(self.user_table),
                               self.i_conv)                           # (B,S,C)
        B, S, D = i.shape
        gmf = u[:, None] * i
        x = jnp.concatenate(
            [gmf, jnp.broadcast_to(un[:, None], (B, S, un.shape[-1])), inr],
            axis=-1)
        h = self.mlp(x, train=train)
        return self.head(h)[..., 0]
