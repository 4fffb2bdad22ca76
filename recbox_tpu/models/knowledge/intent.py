"""Intent-aware and contrastive KG recommenders: KGIN, MCCLK, and the
KG-memory sequential model KSR.

TPU-native re-designs of recbole's
`third_party/recbole/model/knowledge_recommender/{kgin,mcclk}.py` and
`sequential_recommender/ksr.py`, on the static edge-array machinery of
`data/knowledge.py` (padded edges, fixed-K neighbor tables, segment_sum
aggregation — no dynamic graphs).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from recbox_tpu.models.base import MatchingModel, similarity_scores
from recbox_tpu.models.knowledge.models import StaticArray
from recbox_tpu.models.matching.graph_extended import infonce
from recbox_tpu.models.sequential.models import (
    SequentialRecommender, _last_valid, right_align_to_left,
)
from recbox_tpu.nn.embedding import emb_init

__all__ = ["KGIN", "MCCLK", "KSR"]


def _sharded(std: float = 0.01):
    return nn.with_partitioning(emb_init(std), (("data", "model"), None))


class KGIN(MatchingModel):
    """KG-based intent network (`kgin.py` shape): P user intents, each a
    softmax mixture over relations; relational KG aggregation on the item
    side, intent-weighted interaction aggregation on the user side.

    `independence_loss` regularizes intents apart (cosine form — recbole
    offers cosine/distance-correlation variants)."""

    num_users: int = 0
    n_entities: int = 0
    n_relations: int = 0
    n_intents: int = 4
    n_layers: int = 2
    # interaction edges (user→item) and KG triples, host-built
    inter_users: StaticArray = None
    inter_items: StaticArray = None
    kg_heads: StaticArray = None
    kg_relations: StaticArray = None
    kg_tails: StaticArray = None

    def setup(self):
        D = self.embedding_dim
        self.user_table = self.param("emb_user", _sharded(), (self.num_users, D))
        self.entity_table = self.param("emb_entity", _sharded(),
                                       (self.n_entities, D))
        self.rel_table = self.param("emb_rel", emb_init(0.01),
                                    (self.n_relations, D))
        self.intent_logits = self.param(
            "intent_logits", nn.initializers.normal(0.1),
            (self.n_intents, self.n_relations))

    def _intents(self) -> jnp.ndarray:
        """(P, D) intent vectors = softmax-over-relations mixtures."""
        w = jax.nn.softmax(jnp.asarray(self.intent_logits), axis=-1)
        return jnp.dot(w, jnp.asarray(self.rel_table))

    def propagated(self):
        iu = jnp.asarray(self.inter_users.value)
        ii = jnp.asarray(self.inter_items.value)
        kh = jnp.asarray(self.kg_heads.value)
        kr = jnp.asarray(self.kg_relations.value)
        kt = jnp.asarray(self.kg_tails.value)
        ue = jnp.asarray(self.user_table)
        ee = jnp.asarray(self.entity_table)
        rel = jnp.asarray(self.rel_table)
        intents = self._intents()                              # (P, D)
        deg_u = jnp.maximum(jax.ops.segment_sum(
            jnp.ones_like(iu, jnp.float32), iu,
            num_segments=self.num_users), 1.0)
        deg_e = jnp.maximum(jax.ops.segment_sum(
            jnp.ones_like(kh, jnp.float32), kh,
            num_segments=self.n_entities), 1.0)
        user_out, ent_out = ue, ee
        for _ in range(self.n_layers):
            # item side: relational aggregation e_h ← mean_r (r ⊙ e_t)
            msg = rel[kr] * ent_out[kt]
            ent_agg = jax.ops.segment_sum(
                msg, kh, num_segments=self.n_entities) / deg_e[:, None]
            # user side: intent-weighted aggregation over clicked items
            att = jax.nn.softmax(
                jnp.einsum("ud,pd->up", user_out, intents), axis=-1)  # (U, P)
            intent_mix = jnp.dot(att, intents)                        # (U, D)
            msg_u = intent_mix[iu] * ent_out[ii]
            user_agg = jax.ops.segment_sum(
                msg_u, iu, num_segments=self.num_users) / deg_u[:, None]
            user_out = user_out + user_agg
            ent_out = ent_out + ent_agg
        return user_out, ent_out

    def independence_loss(self) -> jnp.ndarray:
        """Mean pairwise |cos| between intent vectors (`kgin.py` cosine
        independence)."""
        t = self._intents()
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
        g = jnp.abs(jnp.dot(t, t.T))
        P = g.shape[0]
        return (jnp.sum(g) - P) / jnp.maximum(P * (P - 1), 1)

    def user_tower(self, batch, train: bool = False):
        ue, _ = self.propagated()
        return ue[batch[self.feature_map.query_index]]

    def item_tower(self, batch, train: bool = False):
        _, ee = self.propagated()
        return ee[batch[self.feature_map.corpus_index]]

    def __call__(self, batch, train: bool = False):
        ue, ee = self.propagated()
        user_emb = ue[batch[self.feature_map.query_index]]
        item_ids = batch["__item_ids__"]
        item_emb = ee[item_ids.reshape(-1)]
        return similarity_scores(user_emb, item_emb, item_ids.shape[1],
                                 self.similarity, self.temperature)


class MCCLK(MatchingModel):
    """Multi-level cross-view contrastive KG rec (`mcclk.py`, compact):
    collaborative view = LightGCN over user–item edges; semantic view =
    relation-aware one-hop KG aggregation of items; scoring uses the fused
    item embedding; `contrastive_loss` aligns the two item views (the
    reference's local-level contrast — its global/structural level reuses
    the same InfoNCE shape)."""

    num_users: int = 0
    n_entities: int = 0
    n_relations: int = 0
    n_layers: int = 2
    ssl_tau: float = 0.2
    inter_users: StaticArray = None
    inter_items: StaticArray = None
    kg_heads: StaticArray = None
    kg_relations: StaticArray = None
    kg_tails: StaticArray = None

    def setup(self):
        D = self.embedding_dim
        self.user_table = self.param("emb_user", _sharded(), (self.num_users, D))
        self.entity_table = self.param("emb_entity", _sharded(),
                                       (self.n_entities, D))
        self.rel_table = self.param("emb_rel", emb_init(0.01),
                                    (self.n_relations, D))

    def collaborative_view(self):
        iu = jnp.asarray(self.inter_users.value)
        ii = jnp.asarray(self.inter_items.value)
        ue = jnp.asarray(self.user_table)
        ee = jnp.asarray(self.entity_table)
        du = jnp.maximum(jax.ops.segment_sum(
            jnp.ones_like(iu, jnp.float32), iu, num_segments=self.num_users), 1.0)
        di = jnp.maximum(jax.ops.segment_sum(
            jnp.ones_like(ii, jnp.float32), ii, num_segments=self.n_entities), 1.0)
        coef = 1.0 / jnp.sqrt(du[iu] * di[ii])
        u_layers, i_layers = [ue], [ee]
        for _ in range(self.n_layers):
            msg_u = jax.ops.segment_sum(i_layers[-1][ii] * coef[:, None], iu,
                                        num_segments=self.num_users)
            msg_i = jax.ops.segment_sum(u_layers[-1][iu] * coef[:, None], ii,
                                        num_segments=self.n_entities)
            u_layers.append(msg_u)
            i_layers.append(msg_i)
        return (jnp.mean(jnp.stack(u_layers), 0),
                jnp.mean(jnp.stack(i_layers), 0))

    def semantic_view(self):
        kh = jnp.asarray(self.kg_heads.value)
        kr = jnp.asarray(self.kg_relations.value)
        kt = jnp.asarray(self.kg_tails.value)
        ee = jnp.asarray(self.entity_table)
        rel = jnp.asarray(self.rel_table)
        deg = jnp.maximum(jax.ops.segment_sum(
            jnp.ones_like(kh, jnp.float32), kh,
            num_segments=self.n_entities), 1.0)
        out = ee
        for _ in range(self.n_layers):
            msg = rel[kr] * out[kt]
            out = out + jax.ops.segment_sum(
                msg, kh, num_segments=self.n_entities) / deg[:, None]
        return out

    def contrastive_loss(self, batch) -> jnp.ndarray:
        _, collab_i = self.collaborative_view()
        sem_i = self.semantic_view()
        pos = batch["__item_ids__"][:, 0]
        return infonce(collab_i[pos], sem_i[pos], self.ssl_tau)

    def _fused(self):
        ue, collab_i = self.collaborative_view()
        sem_i = self.semantic_view()
        return ue, collab_i + sem_i

    def user_tower(self, batch, train: bool = False):
        ue, _ = self._fused()
        return ue[batch[self.feature_map.query_index]]

    def item_tower(self, batch, train: bool = False):
        _, ie = self._fused()
        return ie[batch[self.feature_map.corpus_index]]

    def __call__(self, batch, train: bool = False):
        ue, ie = self._fused()
        user_emb = ue[batch[self.feature_map.query_index]]
        item_ids = batch["__item_ids__"]
        item_emb = ie[item_ids.reshape(-1)]
        return similarity_scores(user_emb, item_emb, item_ids.shape[1],
                                 self.similarity, self.temperature)


class _KSREncoder(nn.Module):
    embedding_dim: int
    hidden_size: int
    dropout: float

    @nn.compact
    def __call__(self, emb, mask, seq_len, train: bool = False):
        x = nn.Dropout(self.dropout, deterministic=not train)(emb)
        h = nn.RNN(nn.GRUCell(self.hidden_size), name="gru")(x)
        return _last_valid(h, seq_len)


class KSR(SequentialRecommender):
    """Knowledge-enhanced sequential rec (`ksr.py` shape): GRU interest
    state + a key-value KG memory — the entities linked to consumed items
    are attended by the GRU state; user repr = Dense([h ‖ memory])."""

    num_users: int = 0
    n_entities: int = 0
    hidden_size: int = 64
    right_align: bool = True
    kg_neighbors: StaticArray = None    # (n_entities, K) entity neighbors

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        D = self.embedding_dim
        init = nn.with_partitioning(emb_init(), (("data", "model"), None))
        self.item_table = self.param("emb_item", init, (spec.vocab_size, D))
        self.entity_table = self.param("emb_entity", _sharded(),
                                       (self.n_entities, D))
        self.encoder = _KSREncoder(D, self.hidden_size, self.dropout,
                                   name="ksr_gru")
        self.query_proj = nn.Dense(D, use_bias=False, name="q")
        self.out_proj = nn.Dense(D, name="out")

    def user_tower(self, batch, train: bool = False):
        seq = right_align_to_left(batch["item_seq"], batch["seq_len"])
        mask = seq != 0
        emb = jnp.take(self._table(), seq, axis=0)
        emb = emb * mask[..., None].astype(emb.dtype)
        h = self.encoder(emb, mask, batch["seq_len"], train)   # (B, H)
        # KG memory: entities of consumed items (items are entities 0..n_i)
        neigh = jnp.take(jnp.asarray(self.kg_neighbors.value),
                         jnp.clip(seq, 0, self.n_entities - 1), axis=0)
        B, L, K = neigh.shape
        mem = jnp.take(jnp.asarray(self.entity_table),
                       neigh.reshape(B, L * K), axis=0)        # (B, LK, D)
        mem_mask = jnp.repeat(mask, K, axis=1)
        q = self.query_proj(h)
        att = jnp.einsum("bmd,bd->bm", mem, q)
        att = jnp.where(mem_mask, att, -1e9)
        att = jax.nn.softmax(att, axis=-1)
        m = jnp.einsum("bm,bmd->bd", att, mem)
        return self.out_proj(jnp.concatenate([q, m], axis=-1))
