"""GNN / memory knowledge-aware recommenders: KGCN, KGNNLS, KGAT, RippleNet.

TPU-native re-designs of
`third_party/recbole/model/knowledge_recommender/{kgcn,kgnnls,kgat,
ripplenet}.py`. The dynamic adjacency dicts of the reference become
static-shape structures from `recbox_tpu.data.knowledge`:

  * KGCN/KGNNLS walk a fixed-K neighbor table — the receptive field is a
    (B·S, K^h) gather per hop, aggregated with user-relation softmax
    attention (einsum-batched, no per-node loops);
  * KGAT propagates over the padded collaborative-KG edge list with inline
    TransR attention (segment softmax over in-edges) — the reference
    recomputes attention once per epoch with a full pass; computing it in
    the forward keeps it exact and jit-fused;
  * RippleNet reads per-user ripple memories (B, H, M) from the batch.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from recbox_tpu.models.base import MatchingModel, similarity_scores
from recbox_tpu.models.matching.neural_cf import PairScoringModel
from recbox_tpu.models.knowledge.models import StaticArray
from recbox_tpu.nn.embedding import emb_init

__all__ = ["KGCN", "KGNNLS", "KGAT", "RippleNet"]


def _sharded(std: float = 0.01):
    return nn.with_partitioning(emb_init(std), (("data", "model"), None))


class KGCN(PairScoringModel):
    """Knowledge graph convolutional network (`kgcn.py`): the candidate
    item's h-hop KG receptive field is aggregated with user-specific
    relation attention π(u, r) = softmax_K(u·r)."""

    n_entities: int = 0
    n_relations: int = 0
    n_hops: int = 1
    aggregator: str = "sum"        # 'sum' | 'neighbor' | 'concat'
    neighbor_entities: StaticArray = None   # (n_entities, K)
    neighbor_relations: StaticArray = None

    def setup(self):
        D = self.embedding_dim
        self.user_table = self.param("emb_user", _sharded(), (self.num_users, D))
        self.entity_table = self.param("emb_entity", _sharded(),
                                       (self.n_entities, D))
        self.rel_table = self.param("emb_rel", emb_init(0.01),
                                    (self.n_relations, D))
        self.agg_dense = [nn.Dense(D, name=f"agg{k}")
                          for k in range(self.n_hops)]

    def _receptive_field(self, items):
        """items (B,) → per-hop entity/relation index arrays
        [(B,1), (B,K), (B,K²), …]."""
        ent_tab = jnp.asarray(self.neighbor_entities.value)
        rel_tab = jnp.asarray(self.neighbor_relations.value)
        K = ent_tab.shape[1]
        B = items.shape[0]
        ents = [items[:, None]]
        rels = []
        for h in range(self.n_hops):
            prev = ents[-1].reshape(B, -1)
            ents.append(jnp.take(ent_tab, prev, axis=0).reshape(B, -1))
            rels.append(jnp.take(rel_tab, prev, axis=0).reshape(B, -1))
        return ents, rels

    def _aggregate(self, user_emb, items, train):
        """One candidate column: items (B,) → (B, D) item representations."""
        ents, rels = self._receptive_field(items)
        etab = jnp.asarray(self.entity_table)
        rtab = jnp.asarray(self.rel_table)
        K = jnp.asarray(self.neighbor_entities.value).shape[1]
        # entity vectors per hop
        vecs = [jnp.take(etab, e, axis=0) for e in ents]     # (B, K^h, D)
        for depth in range(self.n_hops, 0, -1):
            nxt = []
            for hop in range(depth):
                self_v = vecs[hop]                           # (B, K^hop, D)
                neigh = vecs[hop + 1].reshape(
                    self_v.shape[0], self_v.shape[1], K, -1)  # (B,K^hop,K,D)
                r = jnp.take(rtab, rels[hop], axis=0).reshape(neigh.shape)
                pi = jax.nn.softmax(
                    jnp.einsum("bd,bnkd->bnk", user_emb, r), axis=-1)
                agg = jnp.einsum("bnk,bnkd->bnd", pi, neigh)
                dense = self.agg_dense[self.n_hops - depth]
                if self.aggregator == "neighbor":
                    out = dense(agg)
                elif self.aggregator == "concat":
                    out = dense(jnp.concatenate([self_v, agg], axis=-1))
                else:
                    out = dense(self_v + agg)
                act = jnp.tanh if depth == 1 else jax.nn.relu
                nxt.append(act(out))
            vecs = nxt + [None] * 0
        return vecs[0][:, 0]                                  # (B, D)

    def score(self, batch, item_ids, train: bool = False):
        u = jnp.take(jnp.asarray(self.user_table), batch["user_id"], axis=0)
        B, S = item_ids.shape
        u_rep = jnp.repeat(u, S, axis=0)
        i_rep = self._aggregate(u_rep, item_ids.reshape(-1), train)
        return jnp.sum(u_rep * i_rep, axis=-1).reshape(B, S)


class KGNNLS(KGCN):
    """KGCN + label smoothness (`kgnnls.py`): interaction labels propagate
    over the same receptive field with the user-relation weights; the
    candidate item is held out (label forced to 0.5 'unknown'); `ls_loss`
    is the BCE between the propagated label and the ground truth."""

    def label_propagate(self, batch, item_ids, item_labels):
        """item_labels: (B, n_entities) per-user entity labels (items the
        user clicked = 1, rest 0). Returns predicted labels (B, S)."""
        u = jnp.take(jnp.asarray(self.user_table), batch["user_id"], axis=0)
        rtab = jnp.asarray(self.rel_table)
        K = jnp.asarray(self.neighbor_entities.value).shape[1]
        B, S = item_ids.shape
        u_rep = jnp.repeat(u, S, axis=0)
        lab_rep = jnp.repeat(item_labels, S, axis=0)          # (B·S, n_ent)
        flat_items = item_ids.reshape(-1)
        # holdout: the candidate's own label is unknown (0.5)
        lab_rep = lab_rep.at[jnp.arange(lab_rep.shape[0]), flat_items].set(0.5)
        ents, rels = self._receptive_field(flat_items)
        labs = [jnp.take_along_axis(lab_rep, e, axis=1) for e in ents]
        for depth in range(self.n_hops, 0, -1):
            nxt = []
            for hop in range(depth):
                self_l = labs[hop]
                neigh = labs[hop + 1].reshape(
                    self_l.shape[0], self_l.shape[1], K)
                r = jnp.take(rtab, rels[hop], axis=0).reshape(
                    neigh.shape + (-1,))
                pi = jax.nn.softmax(
                    jnp.einsum("bd,bnkd->bnk", u_rep, r), axis=-1)
                nxt.append(jnp.einsum("bnk,bnk->bn", pi, neigh))
            labs = nxt
        return labs[0][:, 0].reshape(B, S)

    def ls_loss(self, batch, item_ids, item_labels, targets) -> jnp.ndarray:
        pred = jnp.clip(self.label_propagate(batch, item_ids, item_labels),
                        1e-6, 1 - 1e-6)
        return -jnp.mean(targets * jnp.log(pred)
                         + (1 - targets) * jnp.log(1 - pred))


class KGAT(MatchingModel):
    """Knowledge graph attention network (`kgat.py`): users and entities in
    one table; attentive propagation over the collaborative KG with TransR
    edge attention and bi-interaction aggregation; layer outputs concat."""

    num_users: int = 0
    n_entities: int = 0
    n_relations: int = 0
    n_layers: int = 2
    kg_dim: int = 16
    ckg_heads: StaticArray = None      # (E,) — users offset by n_entities
    ckg_relations: StaticArray = None
    ckg_tails: StaticArray = None

    def setup(self):
        D = self.embedding_dim
        n_nodes = self.n_entities + self.num_users
        self.node_table = self.param("emb_node", _sharded(), (n_nodes, D))
        self.rel_table = self.param("emb_rel", emb_init(0.01),
                                    (self.n_relations, self.kg_dim))
        self.rel_proj = self.param("rel_proj", nn.initializers.xavier_normal(),
                                   (self.n_relations, D, self.kg_dim))
        self.agg_sum = [nn.Dense(D, name=f"agg_sum{k}")
                        for k in range(self.n_layers)]
        self.agg_bi = [nn.Dense(D, name=f"agg_bi{k}")
                       for k in range(self.n_layers)]

    def _edges(self):
        return (jnp.asarray(self.ckg_heads.value),
                jnp.asarray(self.ckg_relations.value),
                jnp.asarray(self.ckg_tails.value))

    def _attention(self, emb):
        """π(h, r, t) = (W_r e_t)·tanh(W_r e_h + r), softmaxed over each
        head's out-edges (`kgat.py` generate_transE_score)."""
        h, r, t = self._edges()
        M = jnp.take(jnp.asarray(self.rel_proj), r, axis=0)   # (E, D, k)
        re = jnp.take(jnp.asarray(self.rel_table), r, axis=0)
        eh = jnp.einsum("ed,edk->ek", emb[h], M)
        et = jnp.einsum("ed,edk->ek", emb[t], M)
        logits = jnp.sum(et * jnp.tanh(eh + re), axis=-1)
        n_nodes = emb.shape[0]
        mx = jax.ops.segment_max(logits, h, num_segments=n_nodes)
        ex = jnp.exp(logits - mx[h])
        z = jax.ops.segment_sum(ex, h, num_segments=n_nodes)
        return ex / jnp.maximum(z[h], 1e-12)

    def propagated(self):
        h, _, t = self._edges()
        emb = jnp.asarray(self.node_table)
        n_nodes = emb.shape[0]
        layers = [emb]
        x = emb
        for k in range(self.n_layers):
            att = self._attention(x)
            agg = jax.ops.segment_sum(x[t] * att[:, None], h,
                                      num_segments=n_nodes)
            x = (jax.nn.leaky_relu(self.agg_sum[k](x + agg), 0.2)
                 + jax.nn.leaky_relu(self.agg_bi[k](x * agg), 0.2))
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                                1e-12)
            layers.append(x)
        return jnp.concatenate(layers, axis=-1)

    def user_tower(self, batch, train: bool = False):
        emb = self.propagated()
        return emb[batch[self.feature_map.query_index] + self.n_entities]

    def item_tower(self, batch, train: bool = False):
        emb = self.propagated()
        return emb[batch[self.feature_map.corpus_index]]

    def __call__(self, batch, train: bool = False):
        emb = self.propagated()
        user_emb = emb[batch[self.feature_map.query_index] + self.n_entities]
        item_ids = batch["__item_ids__"]
        item_emb = emb[item_ids.reshape(-1)]
        return similarity_scores(user_emb, item_emb, item_ids.shape[1],
                                 self.similarity, self.temperature)

    def kg_loss(self, batch) -> jnp.ndarray:
        """TransR BPR on CKG triples (`kgat.py` calculate_kg_loss)."""
        emb = jnp.asarray(self.node_table)
        r_ids = batch["kg_relation"]
        M = jnp.take(jnp.asarray(self.rel_proj), r_ids, axis=0)
        re = jnp.take(jnp.asarray(self.rel_table), r_ids, axis=0)
        hp = jnp.einsum("bd,bdk->bk", emb[batch["kg_head"]], M)
        tp = jnp.einsum("bd,bdk->bk", emb[batch["kg_tail"]], M)
        tn = jnp.einsum("bd,bdk->bk", emb[batch["kg_neg_tail"]], M)
        pos = -jnp.sum(jnp.square(hp + re - tp), axis=-1)
        neg = -jnp.sum(jnp.square(hp + re - tn), axis=-1)
        return -jnp.mean(jax.nn.log_sigmoid(pos - neg))


class RippleNet(PairScoringModel):
    """RippleNet (`ripplenet.py`): the user's multi-hop ripple memories
    attend against the candidate item; o_h = Σ_m softmax(v·R_m h_m)·t_m,
    score = v·Σ_h o_h. Batch carries `ripple_heads/relations/tails`
    (B, H, M) from `data.knowledge.build_ripple_sets`."""

    n_entities: int = 0
    n_relations: int = 0
    n_hops: int = 2

    def setup(self):
        D = self.embedding_dim
        self.entity_table = self.param("emb_entity", _sharded(),
                                       (self.n_entities, D))
        self.rel_matrices = self.param("rel_mat",
                                       nn.initializers.xavier_normal(),
                                       (self.n_relations, D, D))

    def score(self, batch, item_ids, train: bool = False):
        etab = jnp.asarray(self.entity_table)
        rmat = jnp.asarray(self.rel_matrices)
        v = jnp.take(etab, item_ids, axis=0)                    # (B, S, D)
        h_e = jnp.take(etab, batch["ripple_heads"], axis=0)     # (B, H, M, D)
        t_e = jnp.take(etab, batch["ripple_tails"], axis=0)
        R = jnp.take(rmat, batch["ripple_relations"], axis=0)   # (B,H,M,D,D)
        Rh = jnp.einsum("bhmde,bhme->bhmd", R, h_e)             # (B, H, M, D)
        o = jnp.zeros_like(v)
        for hop in range(self.n_hops):
            p = jax.nn.softmax(
                jnp.einsum("bsd,bmd->bsm", v, Rh[:, hop]), axis=-1)
            o = o + jnp.einsum("bsm,bmd->bsd", p, t_e[:, hop])
        return jnp.sum(v * o, axis=-1)

    def kg_loss(self, batch) -> jnp.ndarray:
        """Triple reconstruction term (`ripplenet.py` kge loss):
        σ(hᵀ R t) should be high for true ripple triples."""
        etab = jnp.asarray(self.entity_table)
        rmat = jnp.asarray(self.rel_matrices)
        h_e = jnp.take(etab, batch["ripple_heads"], axis=0)
        t_e = jnp.take(etab, batch["ripple_tails"], axis=0)
        R = jnp.take(rmat, batch["ripple_relations"], axis=0)
        s = jnp.einsum("bhmd,bhmde,bhme->bhm", h_e, R, t_e)
        return -jnp.mean(jax.nn.log_sigmoid(s))
