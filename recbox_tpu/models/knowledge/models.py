"""Translation-based knowledge-aware recommenders: CKE, CFKG, KTUP, MKR.

TPU-native re-designs of recbole's knowledge_recommender family
(`third_party/recbole/model/knowledge_recommender/{cke,cfkg,ktup,mkr}.py`).
KG supervision enters as extra loss methods over triple batches
(`kg_head`/`kg_relation`/`kg_tail`/`kg_neg_tail` int arrays); the CF scoring
path stays dot-product (MatchingModel) wherever the architecture factors,
with translation distances folded into augmented score tables (per-row
constants cancel in BPR / softmax CE — see `sequential/extended.py`
TransRec for the algebra).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from recbox_tpu.models.base import MatchingModel
from recbox_tpu.models.matching.neural_cf import PairScoringModel
from recbox_tpu.nn.core import MLP
from recbox_tpu.nn.embedding import emb_init

__all__ = ["CKE", "CFKG", "KTUP", "MKR", "StaticArray"]


class StaticArray:
    """Hashable identity wrapper so big numpy tables can sit on flax module
    fields (module dataclass fields must be hashable; identity semantics —
    a new table means a new module means a recompile, which is correct)."""

    def __init__(self, value):
        self.value = np.asarray(value)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def _sharded(std: float = 1e-4):
    return nn.with_partitioning(emb_init(std), (("data", "model"), None))


def _l2sq(x, axis=-1):
    return jnp.sum(jnp.square(x), axis=axis)


class CKE(MatchingModel):
    """Collaborative knowledge embedding (`cke.py`): MF scoring with
    item repr = item emb + entity emb; TransR loss on KG triples."""

    num_users: int = 0
    num_items: int = 0
    n_entities: int = 0
    n_relations: int = 0
    kg_dim: int = 32

    def setup(self):
        D = self.embedding_dim
        self.user_table = self.param("emb_user", _sharded(), (self.num_users, D))
        self.item_table = self.param("emb_item", _sharded(), (self.num_items, D))
        self.entity_table = self.param("emb_entity", _sharded(0.01),
                                       (self.n_entities, D))
        self.rel_table = self.param("emb_rel", emb_init(0.01),
                                    (self.n_relations, self.kg_dim))
        self.rel_proj = self.param("rel_proj", nn.initializers.xavier_normal(),
                                   (self.n_relations, D, self.kg_dim))

    def user_tower(self, batch, train: bool = False):
        return jnp.take(jnp.asarray(self.user_table),
                        batch[self.feature_map.query_index], axis=0)

    def item_tower(self, batch, train: bool = False):
        ids = batch[self.feature_map.corpus_index]
        return (jnp.take(jnp.asarray(self.item_table), ids, axis=0)
                + jnp.take(jnp.asarray(self.entity_table), ids, axis=0))

    def kg_loss(self, batch) -> jnp.ndarray:
        """TransR margin-free BPR over (h, r, t) vs (h, r, t') —
        `cke.py` _get_kg_loss."""
        h = jnp.take(jnp.asarray(self.entity_table), batch["kg_head"], axis=0)
        t = jnp.take(jnp.asarray(self.entity_table), batch["kg_tail"], axis=0)
        tn = jnp.take(jnp.asarray(self.entity_table), batch["kg_neg_tail"], axis=0)
        r = jnp.take(jnp.asarray(self.rel_table), batch["kg_relation"], axis=0)
        M = jnp.take(jnp.asarray(self.rel_proj), batch["kg_relation"], axis=0)
        hp = jnp.einsum("bd,bdk->bk", h, M)
        tp = jnp.einsum("bd,bdk->bk", t, M)
        tnp_ = jnp.einsum("bd,bdk->bk", tn, M)
        pos = -_l2sq(hp + r - tp)
        neg = -_l2sq(hp + r - tnp_)
        return -jnp.mean(jax.nn.log_sigmoid(pos - neg))


class CFKG(MatchingModel):
    """CF as knowledge graph (`cfkg.py`): users, items, entities share one
    translation space; score(u, i) = −‖e_u + r_interact − e_i‖², expanded
    into an augmented dot product for MIPS retrieval."""

    num_users: int = 0
    n_entities: int = 0
    n_relations: int = 1

    def setup(self):
        D = self.embedding_dim
        self.user_table = self.param("emb_user", _sharded(0.01),
                                     (self.num_users, D))
        self.entity_table = self.param("emb_entity", _sharded(0.01),
                                       (self.n_entities, D))
        self.rel_table = self.param("emb_rel", emb_init(0.01),
                                    (self.n_relations, D))

    def _table(self):
        e = jnp.asarray(self.entity_table)
        return jnp.concatenate([2.0 * e, -_l2sq(e)[:, None]], axis=1)

    def user_tower(self, batch, train: bool = False):
        u = jnp.take(jnp.asarray(self.user_table),
                     batch[self.feature_map.query_index], axis=0)
        x = u + jnp.asarray(self.rel_table)[0][None, :]
        return jnp.concatenate([x, jnp.ones((x.shape[0], 1), x.dtype)], axis=-1)

    def item_tower(self, batch, train: bool = False):
        return jnp.take(self._table(),
                        batch[self.feature_map.corpus_index], axis=0)

    def full_scores_table(self) -> jnp.ndarray:
        return self._table()

    def kg_loss(self, batch) -> jnp.ndarray:
        """TransE BPR on KG triples (`cfkg.py` shares one loss for both
        edge kinds; interactions flow through __call__)."""
        h = jnp.take(jnp.asarray(self.entity_table), batch["kg_head"], axis=0)
        t = jnp.take(jnp.asarray(self.entity_table), batch["kg_tail"], axis=0)
        tn = jnp.take(jnp.asarray(self.entity_table), batch["kg_neg_tail"], axis=0)
        r = jnp.take(jnp.asarray(self.rel_table), batch["kg_relation"], axis=0)
        pos = -_l2sq(h + r - t)
        neg = -_l2sq(h + r - tn)
        return -jnp.mean(jax.nn.log_sigmoid(pos - neg))


class KTUP(PairScoringModel):
    """KTUP (`ktup.py`): TransH scoring with soft preference induction —
    the (u, i) pair attends over P preference relations; user/item are
    projected off the induced hyperplane before translation."""

    num_users: int = 0
    num_items: int = 0
    n_entities: int = 0
    n_relations: int = 0
    n_preferences: int = 4

    def setup(self):
        D = self.embedding_dim
        self.user_table = self.param("emb_user", _sharded(0.01),
                                     (self.num_users, D))
        self.entity_table = self.param("emb_entity", _sharded(0.01),
                                       (self.n_entities, D))
        self.pref_table = self.param("emb_pref", emb_init(0.01),
                                     (self.n_preferences, D))
        self.pref_norm = self.param("emb_pref_norm", emb_init(0.01),
                                    (self.n_preferences, D))
        self.rel_table = self.param("emb_rel", emb_init(0.01),
                                    (self.n_relations, D))
        self.rel_norm = self.param("emb_rel_norm", emb_init(0.01),
                                   (self.n_relations, D))

    @staticmethod
    def _project(x, w):
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        return x - jnp.sum(x * w, axis=-1, keepdims=True) * w

    def score(self, batch, item_ids, train: bool = False):
        u = jnp.take(jnp.asarray(self.user_table), batch["user_id"], axis=0)
        i = jnp.take(jnp.asarray(self.entity_table), item_ids, axis=0)  # (B,S,D)
        prefs = jnp.asarray(self.pref_table)
        norms = jnp.asarray(self.pref_norm)
        logits = jnp.einsum("bsd,pd->bsp", u[:, None] + i, prefs)
        alpha = jax.nn.softmax(logits, axis=-1)
        r = jnp.einsum("bsp,pd->bsd", alpha, prefs)
        w = jnp.einsum("bsp,pd->bsd", alpha, norms)
        u_p = self._project(jnp.broadcast_to(u[:, None], i.shape), w)
        i_p = self._project(i, w)
        return -_l2sq(u_p + r - i_p)

    def kg_loss(self, batch) -> jnp.ndarray:
        """TransH BPR over triples (`ktup.py` kg part)."""
        h = jnp.take(jnp.asarray(self.entity_table), batch["kg_head"], axis=0)
        t = jnp.take(jnp.asarray(self.entity_table), batch["kg_tail"], axis=0)
        tn = jnp.take(jnp.asarray(self.entity_table), batch["kg_neg_tail"], axis=0)
        r = jnp.take(jnp.asarray(self.rel_table), batch["kg_relation"], axis=0)
        w = jnp.take(jnp.asarray(self.rel_norm), batch["kg_relation"], axis=0)
        pos = -_l2sq(self._project(h, w) + r - self._project(t, w))
        neg = -_l2sq(self._project(h, w) + r - self._project(tn, w))
        return -jnp.mean(jax.nn.log_sigmoid(pos - neg))


class _CrossCompress(nn.Module):
    """MKR cross&compress unit (`mkr.py` CrossCompressUnit): C = v eᵀ,
    v' = C w_vv + Cᵀ w_ev + b_v (and symmetrically for e) — implemented
    without materializing C via the rank-1 identity C w = v (e·w)."""

    dim: int

    @nn.compact
    def __call__(self, v, e):
        D = self.dim
        w_vv = self.param("w_vv", nn.initializers.xavier_normal(), (D, 1))
        w_ev = self.param("w_ev", nn.initializers.xavier_normal(), (D, 1))
        w_ve = self.param("w_ve", nn.initializers.xavier_normal(), (D, 1))
        w_ee = self.param("w_ee", nn.initializers.xavier_normal(), (D, 1))
        b_v = self.param("b_v", nn.initializers.zeros, (D,))
        b_e = self.param("b_e", nn.initializers.zeros, (D,))
        # C w_vv = v (e·w_vv); Cᵀ w_ev = e (v·w_ev)
        ev = jnp.sum(e * w_vv[:, 0], axis=-1, keepdims=True)
        ve = jnp.sum(v * w_ev[:, 0], axis=-1, keepdims=True)
        v_new = v * ev + e * ve + b_v
        ee = jnp.sum(e * w_ve[:, 0], axis=-1, keepdims=True)
        vv = jnp.sum(v * w_ee[:, 0], axis=-1, keepdims=True)
        e_new = v * ee + e * vv + b_e
        return v_new, e_new


class MKR(MatchingModel):
    """Multi-task KG + rec (`mkr.py`): the item path runs L cross&compress
    units against the item's aligned entity; the user path is an MLP; the KG
    task predicts tails from MLP([h_L ‖ r]) — both tasks share the units."""

    num_users: int = 0
    num_items: int = 0
    n_entities: int = 0
    n_relations: int = 0
    n_layers_cc: int = 1
    user_hidden: Sequence[int] = (64,)

    def setup(self):
        D = self.embedding_dim
        self.user_table = self.param("emb_user", _sharded(0.01),
                                     (self.num_users, D))
        self.item_table = self.param("emb_item", _sharded(0.01),
                                     (self.num_items, D))
        self.entity_table = self.param("emb_entity", _sharded(0.01),
                                       (self.n_entities, D))
        self.rel_table = self.param("emb_rel", emb_init(0.01),
                                    (self.n_relations, D))
        self.cc_units = [_CrossCompress(D, name=f"cc{k}")
                         for k in range(self.n_layers_cc)]
        self.user_mlp = MLP(self.user_hidden, output_dim=D, name="user_mlp")
        self.kg_mlp = MLP((self.embedding_dim,), output_dim=D, name="kg_mlp")

    def _item_repr(self, item_ids):
        v = jnp.take(jnp.asarray(self.item_table), item_ids, axis=0)
        e = jnp.take(jnp.asarray(self.entity_table), item_ids, axis=0)
        for cc in self.cc_units:
            v, e = cc(v, e)
        return v, e

    def user_tower(self, batch, train: bool = False):
        u = jnp.take(jnp.asarray(self.user_table),
                     batch[self.feature_map.query_index], axis=0)
        return self.user_mlp(u, train=train)

    def item_tower(self, batch, train: bool = False):
        v, _ = self._item_repr(batch[self.feature_map.corpus_index])
        return v

    def kg_loss(self, batch, train: bool = False) -> jnp.ndarray:
        """Tail prediction through the shared units (`mkr.py` kge part):
        maximize σ(t̂·t) for true tails, minimize for corrupted ones."""
        h_ids = batch["kg_head"]
        # heads that are items flow through cross&compress (aligned ids)
        h_item = jnp.clip(h_ids, 0, self.num_items - 1)
        v, e = self._item_repr(h_item)
        is_item = (h_ids < self.num_items)[:, None]
        h_emb = jnp.where(
            is_item, e, jnp.take(jnp.asarray(self.entity_table), h_ids, axis=0))
        r = jnp.take(jnp.asarray(self.rel_table), batch["kg_relation"], axis=0)
        t_hat = self.kg_mlp(jnp.concatenate([h_emb, r], axis=-1), train=train)
        t = jnp.take(jnp.asarray(self.entity_table), batch["kg_tail"], axis=0)
        tn = jnp.take(jnp.asarray(self.entity_table), batch["kg_neg_tail"],
                      axis=0)
        pos = jnp.sum(t_hat * t, axis=-1)
        neg = jnp.sum(t_hat * tn, axis=-1)
        return -jnp.mean(jax.nn.log_sigmoid(pos)
                         + jax.nn.log_sigmoid(-neg))
