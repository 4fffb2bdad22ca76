"""Graph collaborative filtering: LightGCN and NGCF.

TPU-native re-design of the recbole graph models
(`third_party/recbole/model/general_recommender/lightgcn.py:32-120`,
`ngcf.py`): the reference builds a scipy sparse normalized adjacency and
calls torch.sparse.mm; here the graph is a static padded edge list and each
propagation layer is gather → scale → `segment_sum` (SURVEY §7 hard part 6 —
scipy-free, static shapes, XLA-fusable).

Graph: bipartite user–item with symmetric normalization
coef(u,i) = 1/√(deg(u)·deg(i)). Embeddings propagate K hops; LightGCN
averages the layer outputs (no transforms), NGCF applies per-layer dense
transforms with bi-interaction.

Batch contract matches the matching stage: `user_id` ints for the user tower,
corpus_index ints for the item tower; train with BPR via MatchingLoader.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from recbox_tpu.models.base import MatchingModel, extract_item_batch, similarity_scores
from recbox_tpu.nn.embedding import emb_init

__all__ = ["LightGCN", "NGCF", "build_norm_edges"]


def build_norm_edges(user_ids: np.ndarray, item_ids: np.ndarray,
                     num_users: int, num_items: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Edge arrays (rows=users, cols=items, coef=1/√(dᵤ·dᵢ)) from interactions.

    Deduplicates repeated (u, i) pairs — the adjacency is binary like
    recbole's inter_matrix (`dataset.py:1846-1868`).
    """
    pairs = np.unique(np.stack([user_ids, item_ids], axis=1), axis=0)
    u, i = pairs[:, 0].astype(np.int32), pairs[:, 1].astype(np.int32)
    du = np.bincount(u, minlength=num_users).astype(np.float64)
    di = np.bincount(i, minlength=num_items).astype(np.float64)
    coef = 1.0 / np.sqrt(np.maximum(du[u], 1) * np.maximum(di[i], 1))
    return u, i, coef.astype(np.float32)


class _GraphBase(MatchingModel):
    """Shared edge plumbing. Edge arrays are static module fields (hashable
    tuples keep the flax dataclass frozen-friendly; converted to jnp once)."""

    num_users: int = 0
    num_items: int = 0
    n_layers: int = 2
    edge_users: Tuple[int, ...] = ()
    edge_items: Tuple[int, ...] = ()
    edge_coefs: Tuple[float, ...] = ()
    # 'normal' (1e-4, `match_model.py:91-114`) | 'xavier_uniform' (recbole
    # LightGCN/NGCF `xavier_uniform_initialization`, init.py:34) |
    # 'xavier_normal'. Init scale is LOAD-BEARING at production scale
    # (docs/QUALITY_PARITY.md ml1m-scale LightGCN rows).
    emb_init_scheme: str = "normal"

    def _table_init(self):
        if self.emb_init_scheme == "xavier_uniform":
            base = nn.initializers.xavier_uniform()
        elif self.emb_init_scheme == "xavier_normal":
            base = nn.initializers.xavier_normal()
        elif self.emb_init_scheme == "normal":
            base = emb_init()
        else:  # a typo here silently confounds init experiments — refuse
            raise ValueError(
                f"emb_init_scheme={self.emb_init_scheme!r}: expected "
                "'normal' | 'xavier_uniform' | 'xavier_normal'")
        return nn.with_partitioning(base, (("data", "model"), None))

    def _edges(self):
        u = jnp.asarray(np.asarray(self.edge_users, dtype=np.int32))
        i = jnp.asarray(np.asarray(self.edge_items, dtype=np.int32))
        c = jnp.asarray(np.asarray(self.edge_coefs, dtype=np.float32))
        return u, i, c

    def _propagate_hop(self, user_emb, item_emb, coefs=None):
        """One symmetric-normalized hop over the bipartite graph; ``coefs``
        overrides the edge coefficients (e.g. SGL's dropout-rescaled views)."""
        u, i, c = self._edges()
        if coefs is not None:
            c = coefs
        msg_to_user = jax.ops.segment_sum(
            item_emb[i] * c[:, None], u, num_segments=self.num_users)
        msg_to_item = jax.ops.segment_sum(
            user_emb[u] * c[:, None], i, num_segments=self.num_items)
        return msg_to_user, msg_to_item


class LightGCN(_GraphBase):
    """LightGCN: K parameter-free hops, mean over layer outputs
    (`lightgcn.py:32-120`)."""

    def setup(self):
        init = self._table_init()
        self.user_table = self.param("emb_user", init,
                                     (self.num_users, self.embedding_dim))
        self.item_table = self.param("emb_item", init,
                                     (self.num_items, self.embedding_dim))

    def propagated(self, coefs=None):
        ue = jnp.asarray(self.user_table)
        ie = jnp.asarray(self.item_table)
        user_layers, item_layers = [ue], [ie]
        for _ in range(self.n_layers):
            ue, ie = self._propagate_hop(ue, ie, coefs=coefs)
            user_layers.append(ue)
            item_layers.append(ie)
        return (jnp.mean(jnp.stack(user_layers), axis=0),
                jnp.mean(jnp.stack(item_layers), axis=0))

    def user_tower(self, batch, train: bool = False):
        ue, _ = self.propagated()
        return ue[batch[self.feature_map.query_index]]

    def item_tower(self, batch, train: bool = False):
        _, ie = self.propagated()
        return ie[batch[self.feature_map.corpus_index]]

    def __call__(self, batch, train: bool = False):
        # propagate once per step, score positives+negatives together
        ue, ie = self.propagated()
        user_emb = ue[batch[self.feature_map.query_index]]
        item_ids = batch["__item_ids__"]
        item_emb = ie[item_ids.reshape(-1)]
        return similarity_scores(user_emb, item_emb, item_ids.shape[1],
                                 self.similarity, self.temperature)


class _NGCFLayer(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, ego, side):
        # W1(side+ego-ish aggregate) + W2(side ⊙ ego), leaky-relu
        sum_part = nn.Dense(self.dim, name="w1")(side + ego)
        bi_part = nn.Dense(self.dim, name="w2")(side * ego)
        return jax.nn.leaky_relu(sum_part + bi_part, negative_slope=0.2)


class NGCF(_GraphBase):
    """NGCF: transformed propagation with bi-interaction, concat of layer
    outputs (`ngcf.py` shape). `dropout` applies the reference's message
    dropout to each layer's output during training."""

    dropout: float = 0.0

    def setup(self):
        init = self._table_init()
        self.user_table = self.param("emb_user", init,
                                     (self.num_users, self.embedding_dim))
        self.item_table = self.param("emb_item", init,
                                     (self.num_items, self.embedding_dim))
        self.layers = [_NGCFLayer(self.embedding_dim, name=f"gnn{k}")
                       for k in range(self.n_layers)]
        self.msg_dropout = nn.Dropout(self.dropout)

    def propagated(self, train: bool = False):
        ue = jnp.asarray(self.user_table)
        ie = jnp.asarray(self.item_table)
        user_layers, item_layers = [ue], [ie]
        for layer in self.layers:
            su, si = self._propagate_hop(ue, ie)
            ue = layer(ue, su)
            ie = layer(ie, si)
            if self.dropout:
                ue = self.msg_dropout(ue, deterministic=not train)
                ie = self.msg_dropout(ie, deterministic=not train)
            un = ue / jnp.maximum(jnp.linalg.norm(ue, axis=-1, keepdims=True), 1e-12)
            inm = ie / jnp.maximum(jnp.linalg.norm(ie, axis=-1, keepdims=True), 1e-12)
            user_layers.append(un)
            item_layers.append(inm)
        return (jnp.concatenate(user_layers, axis=-1),
                jnp.concatenate(item_layers, axis=-1))

    def user_tower(self, batch, train: bool = False):
        ue, _ = self.propagated(train)
        return ue[batch[self.feature_map.query_index]]

    def item_tower(self, batch, train: bool = False):
        _, ie = self.propagated(train)
        return ie[batch[self.feature_map.corpus_index]]

    def __call__(self, batch, train: bool = False):
        ue, ie = self.propagated(train)
        user_emb = ue[batch[self.feature_map.query_index]]
        item_ids = batch["__item_ids__"]
        item_emb = ie[item_ids.reshape(-1)]
        return similarity_scores(user_emb, item_emb, item_ids.shape[1],
                                 self.similarity, self.temperature)
