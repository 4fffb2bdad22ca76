"""Extended sequential recommender zoo.

TPU-native re-designs of the remaining recbole sequential family
(`third_party/recbole/model/sequential_recommender/*.py`): BERT4Rec, FPMC,
TransRec, HGN, SHAN, FOSSIL, HRM, NPE, CORE, LightSANs, FDSA, RepeatNet and
the sparse-interest SINE (`third_party/rechub/models/matching/sine.py`).

All models subclass `SequentialRecommender` (`models.py`): user history is a
left-padded `item_seq` (B, L) with PAD=0 plus `seq_len` (B,); models that
condition on the user identity additionally read `user_id` (B,) and require
`num_users`.

Scoring stays a dot product against `_table()` so every model plugs into the
sampled-negative losses, full-softmax CE, and the sharded retrieval engine.
Models whose native score is *not* a plain dot product (TransRec's translation
distance, FOSSIL's item bias) use score-space augmentation: the item table is
extended with norm/bias columns and the user vector with matching constants,
which preserves ranking and softmax/BPR losses exactly (constant per-row
shifts cancel).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recbox_tpu.models.sequential.models import SequentialRecommender, _last_valid
from recbox_tpu.nn.attention import PositionalEmbedding, TransformerEncoder
from recbox_tpu.nn.embedding import emb_init

__all__ = ["BERT4Rec", "FPMC", "TransRec", "HGN", "SHAN", "FOSSIL", "HRM",
           "NPE", "CORE", "LightSANs", "FDSA", "RepeatNet", "SINE"]


def _sharded_emb_init():
    return nn.with_partitioning(emb_init(), (("data", "model"), None))


def _masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray,
                    axis: int = -1) -> jnp.ndarray:
    logits = jnp.where(mask, logits, jnp.full_like(logits, -1e9))
    return jax.nn.softmax(logits, axis=axis)


# ---------------------------------------------------------------------------
# BERT4Rec — bidirectional transformer with a [MASK] token
# ---------------------------------------------------------------------------

class _BERT4RecEncoder(nn.Module):
    embedding_dim: int
    max_seq_len: int
    n_layers: int
    n_heads: int
    dropout: float
    dtype: object = None

    @nn.compact
    def __call__(self, emb, mask, seq_len, train: bool = False):
        x = PositionalEmbedding(self.max_seq_len, name="pos")(emb)
        x = nn.LayerNorm(epsilon=1e-12)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        # bidirectional: cloze-style models attend in both directions
        # (`bert4rec.py` get_attention_mask is non-causal)
        return TransformerEncoder(
            n_layers=self.n_layers, n_heads=self.n_heads,
            hidden_dropout=self.dropout, attn_dropout=self.dropout,
            causal=False, dtype=self.dtype,
            name="encoder")(x, mask=mask, train=train)


class BERT4Rec(SequentialRecommender):
    """Bidirectional encoder with cloze training (`bert4rec.py` shape).

    The item table carries one extra row — the [MASK] token (id =
    vocab_size). Next-item inference appends [MASK] to the history and reads
    the hidden state at that position; cloze training uses
    `masked_item_scores` over externally sampled masked positions (mask
    sampling is data-pipeline work, kept out of the jitted model).
    """

    n_layers: int = 2
    n_heads: int = 2

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        self._vocab = spec.vocab_size
        self.item_table = self.param(
            "emb_item", _sharded_emb_init(),
            (spec.vocab_size + 1, self.embedding_dim))   # +1 = [MASK]
        self.encoder = self.make_encoder()

    def make_encoder(self):
        return _BERT4RecEncoder(self.embedding_dim, self.max_seq_len,
                                self.n_layers, self.n_heads, self.dropout,
                                dtype=self._enc_dtype(), name="bert4rec")

    @property
    def mask_token(self) -> int:
        return self._vocab

    def _table(self):
        return jnp.asarray(self.item_table)[: self._vocab]

    def _encode(self, item_seq, seq_len, train):
        emb = jnp.take(jnp.asarray(self.item_table), item_seq, axis=0)
        mask = item_seq != 0
        emb = emb * mask[..., None].astype(emb.dtype)
        return self.encoder(emb, mask, seq_len, train)

    def user_tower(self, batch, train: bool = False):
        # append [MASK]: [0,..,i1..ik] → [0,..,i1..ik,MASK] (drops the oldest
        # slot when full — recbole's reconstruct_test_data analog)
        item_seq = batch["item_seq"]
        mask_col = jnp.full((item_seq.shape[0], 1), self.mask_token,
                            dtype=item_seq.dtype)
        shifted = jnp.concatenate([item_seq[:, 1:], mask_col], axis=1)
        h = self._encode(shifted, batch["seq_len"] + 1, train)
        return h[:, -1, :]

    def masked_item_scores(self, item_seq, seq_len, positions,
                           train: bool = False) -> jnp.ndarray:
        """Cloze scores: `item_seq` already has [MASK] at `positions` (B, P);
        returns (B, P, vocab) logits at those positions."""
        h = self._encode(item_seq, seq_len, train)
        gathered = jnp.take_along_axis(
            h, positions[..., None].astype(jnp.int32), axis=1)  # (B, P, D)
        return jnp.einsum("bpd,vd->bpv", gathered, self._table(),
                          preferred_element_type=jnp.float32)

    def fused_cloze_loss(self, item_seq, seq_len, positions, labels,
                         weights=None, train: bool = False) -> jnp.ndarray:
        """Cloze CE over the full vocabulary WITHOUT the (B, P, vocab)
        logits tensor (flash-CE, `ops/pallas/fused_ce.py`): the (B, P)
        masked positions flatten to kernel rows, `weights` (B, P) masks
        invalid/pad positions exactly (0-weight rows are no-ops in loss
        and grads). The large-vocab cloze path — same crossover guidance
        as `fused_ce_loss`."""
        from recbox_tpu.ops.pallas.fused_ce import fused_softmax_ce
        h = self._encode(item_seq, seq_len, train)
        gathered = jnp.take_along_axis(
            h, positions[..., None].astype(jnp.int32), axis=1)  # (B, P, D)
        flat = gathered.reshape(-1, gathered.shape[-1])
        w = None if weights is None else weights.reshape(-1)
        return fused_softmax_ce(flat, self._table(),
                                labels.reshape(-1).astype(jnp.int32), w)


# ---------------------------------------------------------------------------
# FPMC — factorized personalized Markov chain
# ---------------------------------------------------------------------------

class FPMC(SequentialRecommender):
    """score(u, last, i) = ⟨V_ui(u), V_iu(i)⟩ + ⟨V_il(last), V_li(i)⟩
    (`fpmc.py` shape). The two item-side factors are concatenated into one
    2D-wide scoring table so retrieval stays a single MIPS."""

    num_users: int = 0

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        D = self.embedding_dim
        init = _sharded_emb_init()
        self.item_table = self.param("emb_item", init, (spec.vocab_size, D))     # V_iu
        self.li_table = self.param("emb_item_li", init, (spec.vocab_size, D))    # V_li
        self.il_table = self.param("emb_item_il", init, (spec.vocab_size, D))    # V_il
        self.ui_table = self.param("emb_user", init, (self.num_users, D))        # V_ui
        self.encoder = None

    def _table(self):
        return jnp.concatenate(
            [jnp.asarray(self.item_table), jnp.asarray(self.li_table)], axis=1)

    def user_tower(self, batch, train: bool = False):
        u = jnp.take(jnp.asarray(self.ui_table), batch["user_id"], axis=0)
        last = jnp.take(jnp.asarray(self.il_table),
                        batch["item_seq"][:, -1], axis=0)
        return jnp.concatenate([u, last], axis=-1)


# ---------------------------------------------------------------------------
# TransRec — translation-based sequential recommendation
# ---------------------------------------------------------------------------

class TransRec(SequentialRecommender):
    """score = b_i − ‖t_u + e_last − e_i‖² (`transrec.py` shape).

    Expanded: 2(t_u+e_last)·e_i − ‖e_i‖² + b_i (+ user-constant, dropped —
    per-row constants cancel in BPR and softmax CE). The item table is
    augmented with [−‖e‖², b] columns; the user vector with [1, 1]."""

    num_users: int = 0

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        D = self.embedding_dim
        init = _sharded_emb_init()
        self.item_table = self.param("emb_item", init, (spec.vocab_size, D))
        self.user_table = self.param("emb_user", init, (self.num_users, D))
        self.item_bias = self.param("bias_item", nn.initializers.zeros,
                                    (spec.vocab_size, 1))
        self.encoder = None

    def _table(self):
        e = jnp.asarray(self.item_table)
        sq = -jnp.sum(jnp.square(e), axis=1, keepdims=True)
        return jnp.concatenate([e, sq, jnp.asarray(self.item_bias)], axis=1)

    def user_tower(self, batch, train: bool = False):
        t_u = jnp.take(jnp.asarray(self.user_table), batch["user_id"], axis=0)
        e_last = jnp.take(jnp.asarray(self.item_table),
                          batch["item_seq"][:, -1], axis=0)
        x = t_u + e_last
        ones = jnp.ones((x.shape[0], 1), x.dtype)
        return jnp.concatenate([2.0 * x, ones, ones], axis=-1)


# ---------------------------------------------------------------------------
# HGN — hierarchical gating network
# ---------------------------------------------------------------------------

class _HGNEncoder(nn.Module):
    embedding_dim: int
    max_seq_len: int

    @nn.compact
    def __call__(self, emb, mask, user_emb):
        D = self.embedding_dim
        # feature gating: g1 = σ(emb·W1 + u·W2)   (`hgn.py` feature_gating)
        g1 = jax.nn.sigmoid(nn.Dense(D, name="w1")(emb)
                            + nn.Dense(D, use_bias=False, name="w2")(user_emb)[:, None])
        gated = emb * g1
        # instance gating: per-position weights (`hgn.py` instance_gating)
        w3 = nn.Dense(1, use_bias=False, name="w3")(gated)[..., 0]   # (B, L)
        w4 = nn.Dense(self.max_seq_len, use_bias=False, name="w4")(user_emb)
        g2 = jax.nn.sigmoid(w3 + w4) * mask.astype(emb.dtype)
        denom = jnp.maximum(jnp.sum(g2, axis=1, keepdims=True), 1e-12)
        return jnp.einsum("bl,bld->bd", g2, gated) / denom


class HGN(SequentialRecommender):
    """Hierarchical gating (`hgn.py` shape): feature gate → instance gate →
    avg pool; final score = ⟨u + pooled + Σ history, e_i⟩ (the last term is
    the item-item product folded into the user vector)."""

    num_users: int = 0

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        init = _sharded_emb_init()
        self.item_table = self.param("emb_item", init,
                                     (spec.vocab_size, self.embedding_dim))
        self.user_table = self.param("emb_user", init,
                                     (self.num_users, self.embedding_dim))
        self.encoder = _HGNEncoder(self.embedding_dim, self.max_seq_len,
                                   name="hgn")

    def user_tower(self, batch, train: bool = False):
        item_seq = batch["item_seq"]
        mask = item_seq != 0
        emb = jnp.take(self._table(), item_seq, axis=0)
        emb = emb * mask[..., None].astype(emb.dtype)
        u = jnp.take(jnp.asarray(self.user_table), batch["user_id"], axis=0)
        pooled = self.encoder(emb, mask, u)
        return u + pooled + jnp.sum(emb, axis=1)


# ---------------------------------------------------------------------------
# SHAN — sequential hierarchical attention network
# ---------------------------------------------------------------------------

class _SHANAttention(nn.Module):
    embedding_dim: int

    @nn.compact
    def __call__(self, seq, mask, user_emb):
        key = jax.nn.relu(nn.Dense(self.embedding_dim, name="proj")(seq))
        logits = jnp.einsum("bld,bd->bl", key, user_emb)
        alpha = _masked_softmax(logits, mask)
        return jnp.einsum("bl,bld->bd", alpha, seq)


class SHAN(SequentialRecommender):
    """Two-level attention with the user embedding as query (`shan.py`
    shape): long-term attention over the full history, then short-term
    attention over [long ; last `short_len` items]."""

    num_users: int = 0
    short_len: int = 5

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        init = _sharded_emb_init()
        self.item_table = self.param("emb_item", init,
                                     (spec.vocab_size, self.embedding_dim))
        self.user_table = self.param("emb_user", init,
                                     (self.num_users, self.embedding_dim))
        self.long_att = _SHANAttention(self.embedding_dim, name="long")
        self.short_att = _SHANAttention(self.embedding_dim, name="short")
        self.encoder = None

    def user_tower(self, batch, train: bool = False):
        item_seq = batch["item_seq"]
        mask = item_seq != 0
        emb = jnp.take(self._table(), item_seq, axis=0)
        emb = emb * mask[..., None].astype(emb.dtype)
        u = jnp.take(jnp.asarray(self.user_table), batch["user_id"], axis=0)
        long = self.long_att(emb, mask, u)
        short_emb = emb[:, -self.short_len:]
        short_mask = mask[:, -self.short_len:]
        cand = jnp.concatenate([long[:, None], short_emb], axis=1)
        cand_mask = jnp.concatenate(
            [jnp.ones((mask.shape[0], 1), bool), short_mask], axis=1)
        return self.short_att(cand, cand_mask, u)


# ---------------------------------------------------------------------------
# FOSSIL — FISM similarity + high-order Markov chains
# ---------------------------------------------------------------------------

class FOSSIL(SequentialRecommender):
    """user repr = Σ history / |H|^α + Σ_k η_k · e_{last−k}, η_k = global +
    per-user (`fossil.py` shape). Item bias folded in via augmentation."""

    num_users: int = 0
    alpha: float = 0.5
    order_k: int = 1

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        init = _sharded_emb_init()
        self.item_table = self.param("emb_item", init,
                                     (spec.vocab_size, self.embedding_dim))
        self.item_bias = self.param("bias_item", nn.initializers.zeros,
                                    (spec.vocab_size, 1))
        self.eta_bias = self.param("eta_bias", nn.initializers.zeros,
                                   (self.order_k,))
        self.eta_user = self.param("emb_eta_user", emb_init(),
                                   (self.num_users, self.order_k))
        self.encoder = None

    def _table(self):
        return jnp.concatenate(
            [jnp.asarray(self.item_table), jnp.asarray(self.item_bias)], axis=1)

    def user_tower(self, batch, train: bool = False):
        item_seq, seq_len = batch["item_seq"], batch["seq_len"]
        mask = item_seq != 0
        emb = jnp.take(jnp.asarray(self.item_table), item_seq, axis=0)
        emb = emb * mask[..., None].astype(emb.dtype)
        denom = jnp.power(jnp.maximum(seq_len, 1).astype(emb.dtype),
                          self.alpha)[:, None]
        sim = jnp.sum(emb, axis=1) / denom
        eta = (jnp.asarray(self.eta_bias)[None, :]
               + jnp.take(jnp.asarray(self.eta_user), batch["user_id"], axis=0))
        markov = jnp.einsum("bk,bkd->bd", eta, emb[:, -self.order_k:][:, ::-1])
        ones = jnp.ones((sim.shape[0], 1), sim.dtype)
        return jnp.concatenate([sim + markov, ones], axis=-1)


# ---------------------------------------------------------------------------
# HRM — hierarchical representation model
# ---------------------------------------------------------------------------

class HRM(SequentialRecommender):
    """Two-level pooling of [user ; pooled last-transaction items]
    (`hrm.py` shape); 'max' or 'avg' at each level."""

    num_users: int = 0
    high_order: int = 2          # items in the "last transaction"
    pool_layer1: str = "max"
    pool_layer2: str = "avg"

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        init = _sharded_emb_init()
        self.item_table = self.param("emb_item", init,
                                     (spec.vocab_size, self.embedding_dim))
        self.user_table = self.param("emb_user", init,
                                     (self.num_users, self.embedding_dim))
        self.encoder = None

    @staticmethod
    def _pool(x, mask, mode):
        m = mask[..., None].astype(x.dtype)
        if mode == "max":
            return jnp.max(jnp.where(m > 0, x, jnp.full_like(x, -1e9)), axis=1)
        return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-12)

    def user_tower(self, batch, train: bool = False):
        item_seq = batch["item_seq"][:, -self.high_order:]
        mask = item_seq != 0
        # guard the all-PAD case (short histories) for max pooling
        mask = mask.at[:, -1].set(True)
        emb = jnp.take(self._table(), item_seq, axis=0)
        l1 = self._pool(emb, mask, self.pool_layer1)
        u = jnp.take(jnp.asarray(self.user_table), batch["user_id"], axis=0)
        pair = jnp.stack([u, l1], axis=1)
        return self._pool(pair, jnp.ones(pair.shape[:2], bool), self.pool_layer2)


# ---------------------------------------------------------------------------
# NPE — neural personalized embedding
# ---------------------------------------------------------------------------

class NPE(SequentialRecommender):
    """user repr = dropout(relu(u) + relu(Σ history)); items scored through a
    relu'd output table (`npe.py` shape)."""

    num_users: int = 0

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        init = _sharded_emb_init()
        self.item_table = self.param("emb_item", init,
                                     (spec.vocab_size, self.embedding_dim))
        self.out_table = self.param("emb_item_out", init,
                                    (spec.vocab_size, self.embedding_dim))
        self.user_table = self.param("emb_user", init,
                                     (self.num_users, self.embedding_dim))
        self.drop = nn.Dropout(self.dropout)
        self.encoder = None

    def _table(self):
        return jax.nn.relu(jnp.asarray(self.out_table))

    def user_tower(self, batch, train: bool = False):
        item_seq = batch["item_seq"]
        mask = (item_seq != 0)[..., None]
        emb = jnp.take(jnp.asarray(self.item_table), item_seq, axis=0)
        hist = jnp.sum(emb * mask.astype(emb.dtype), axis=1)
        u = jnp.take(jnp.asarray(self.user_table), batch["user_id"], axis=0)
        out = jax.nn.relu(u) + jax.nn.relu(hist)
        return self.drop(out, deterministic=not train)


# ---------------------------------------------------------------------------
# CORE — representation-consistent cosine scoring
# ---------------------------------------------------------------------------

class _COREEncoder(nn.Module):
    """Transformer-weighted combination of history embeddings — the user
    vector stays inside the item-embedding convex cone (`core.py` 'trm')."""

    embedding_dim: int
    max_seq_len: int
    n_layers: int
    n_heads: int
    dropout: float
    mode: str  # 'trm' | 'ave'
    dtype: object = None

    @nn.compact
    def __call__(self, emb, mask, seq_len, train: bool = False):
        if self.mode == "ave":
            alpha = mask.astype(emb.dtype)
        else:
            x = PositionalEmbedding(self.max_seq_len, name="pos")(emb)
            x = nn.LayerNorm(epsilon=1e-12)(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = TransformerEncoder(
                n_layers=self.n_layers, n_heads=self.n_heads,
                hidden_dropout=self.dropout, attn_dropout=self.dropout,
                causal=True, dtype=self.dtype,
                name="encoder")(x, mask=mask, train=train)
            alpha = nn.Dense(1, name="alpha")(x)[..., 0]
            alpha = _masked_softmax(alpha, mask)
        denom = jnp.maximum(jnp.sum(alpha, axis=1, keepdims=True), 1e-12)
        return jnp.einsum("bl,bld->bd", alpha / denom, emb)


class CORE(SequentialRecommender):
    """CORE (`core.py` shape): cosine scoring at temperature 0.07 with the
    session vector constrained to a weighted mean of item embeddings."""

    n_layers: int = 2
    n_heads: int = 2
    encoder_mode: str = "trm"
    similarity: str = "cosine"
    temperature: float = 0.07

    def make_encoder(self):
        return _COREEncoder(self.embedding_dim, self.max_seq_len,
                            self.n_layers, self.n_heads, self.dropout,
                            self.encoder_mode, dtype=self._enc_dtype(),
                            name="core")

    def full_scores(self, batch, train: bool = False):
        user = self.user_tower(batch, train)
        user = user / jnp.maximum(
            jnp.linalg.norm(user, axis=-1, keepdims=True), 1e-12)
        table = self._table()
        table = table / jnp.maximum(
            jnp.linalg.norm(table, axis=-1, keepdims=True), 1e-12)
        return jnp.dot(user, table.T,
                       preferred_element_type=jnp.float32) / self.temperature


# ---------------------------------------------------------------------------
# LightSANs — low-rank decoupled self-attention
# ---------------------------------------------------------------------------

class _LightSANsLayer(nn.Module):
    embedding_dim: int
    n_heads: int
    k_interests: int
    dropout: float

    @nn.compact
    def __call__(self, x, pos, mask, train: bool = False):
        B, L, D = x.shape
        H, K = self.n_heads, self.k_interests
        dh = D // H

        def heads(t, name):
            return nn.DenseGeneral((H, dh), name=name)(t)  # (..., H, dh)

        q, k, v = heads(x, "q"), heads(x, "k"), heads(x, "v")
        # item-to-interest aggregation: softmax over L (low-rank factor)
        theta = nn.DenseGeneral((H, K), name="theta")(x)          # (B, L, H, K)
        theta = _masked_softmax(jnp.swapaxes(theta, 1, 3),        # (B, K, H, L)
                                mask[:, None, None, :], axis=-1)
        k_low = jnp.einsum("bkhl,blhd->bkhd", theta, k)
        v_low = jnp.einsum("bkhl,blhd->bkhd", theta, v)
        attn = jax.nn.softmax(
            jnp.einsum("blhd,bkhd->bhlk", q, k_low) / jnp.sqrt(dh), axis=-1)
        ctx = jnp.einsum("bhlk,bkhd->blhd", attn, v_low)
        # decoupled positional attention — key-mask the PAD positions: their
        # v rows are arbitrary after LayerNorm/deeper layers, and an
        # unmasked softmax would mix them into every output
        pq, pk = heads(pos, "pq"), heads(pos, "pk")
        pscores = jnp.einsum("blhd,bmhd->bhlm", pq, pk) / jnp.sqrt(dh)
        pscores = jnp.where(mask[:, None, None, :], pscores, -1e9)
        pattn = jax.nn.softmax(pscores, axis=-1)
        pctx = jnp.einsum("bhlm,bmhd->blhd", pattn, v)
        out = (ctx + pctx).reshape(B, L, D)
        out = nn.Dense(D, name="o")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        x = nn.LayerNorm(epsilon=1e-12)(x + out)
        # FFN
        h = nn.Dense(4 * D, name="ff1")(x)
        h = jax.nn.gelu(h)
        h = nn.Dense(D, name="ff2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=1e-12)(x + h)


class _LightSANsEncoder(nn.Module):
    embedding_dim: int
    max_seq_len: int
    n_layers: int
    n_heads: int
    k_interests: int
    dropout: float

    @nn.compact
    def __call__(self, emb, mask, seq_len, train: bool = False):
        pos_table = self.param("pos", nn.initializers.normal(0.02),
                               (self.max_seq_len, self.embedding_dim))
        L = emb.shape[1]
        pos = jnp.broadcast_to(pos_table[None, -L:], emb.shape)
        x = nn.LayerNorm(epsilon=1e-12)(emb)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(self.n_layers):
            x = _LightSANsLayer(self.embedding_dim, self.n_heads,
                                self.k_interests, self.dropout,
                                name=f"layer{i}")(x, pos, mask, train)
        return x[:, -1, :]


class LightSANs(SequentialRecommender):
    """Low-rank decoupled self-attention (`lightsans.py` shape): O(L·k)
    attention via k latent interests + decoupled position attention."""

    n_layers: int = 2
    n_heads: int = 2
    k_interests: int = 5

    def make_encoder(self):
        return _LightSANsEncoder(self.embedding_dim, self.max_seq_len,
                                 self.n_layers, self.n_heads,
                                 self.k_interests, self.dropout,
                                 name="lightsans")


# ---------------------------------------------------------------------------
# FDSA — feature-level deeper self-attention
# ---------------------------------------------------------------------------

class _FDSAEncoder(nn.Module):
    embedding_dim: int
    max_seq_len: int
    n_layers: int
    n_heads: int
    dropout: float
    dtype: object = None

    @nn.compact
    def __call__(self, item_emb, feat_emb, mask, seq_len, train: bool = False):
        def stream(x, name):
            x = PositionalEmbedding(self.max_seq_len, name=f"{name}_pos")(x)
            x = nn.LayerNorm(epsilon=1e-12)(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            return TransformerEncoder(
                n_layers=self.n_layers, n_heads=self.n_heads,
                hidden_dropout=self.dropout, attn_dropout=self.dropout,
                causal=True, dtype=self.dtype,
                name=name)(x, mask=mask, train=train)

        hi = stream(item_emb, "item_trm")[:, -1, :]
        hf = stream(feat_emb, "feat_trm")[:, -1, :]
        out = jnp.concatenate([hi, hf], axis=-1)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return nn.Dense(self.embedding_dim, name="proj")(out)


class FDSA(SequentialRecommender):
    """Dual self-attention over item ids and item features (`fdsa.py` shape).

    The feature stream embeds `feature_seq_name` (a parallel (B, L) sequence,
    e.g. category ids) when the batch provides it; otherwise features are a
    learned projection of the item embeddings (vanilla-attention analog of
    recbole's feature fusion)."""

    n_layers: int = 2
    n_heads: int = 2
    feature_seq_name: str = "feat_seq"
    feature_vocab: int = 0

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        init = _sharded_emb_init()
        self.item_table = self.param("emb_item", init,
                                     (spec.vocab_size, self.embedding_dim))
        if self.feature_vocab:
            self.feat_table = self.param("emb_feat", init,
                                         (self.feature_vocab, self.embedding_dim))
        self.feat_proj = nn.Dense(self.embedding_dim, name="feat_from_item")
        self.encoder = _FDSAEncoder(self.embedding_dim, self.max_seq_len,
                                    self.n_layers, self.n_heads, self.dropout,
                                    dtype=self._enc_dtype(), name="fdsa")

    def user_tower(self, batch, train: bool = False):
        item_seq, seq_len = batch["item_seq"], batch["seq_len"]
        mask = item_seq != 0
        emb = jnp.take(self._table(), item_seq, axis=0)
        emb = emb * mask[..., None].astype(emb.dtype)
        if self.feature_vocab and self.feature_seq_name in batch:
            feat = jnp.take(jnp.asarray(self.feat_table),
                            batch[self.feature_seq_name], axis=0)
            feat = feat * mask[..., None].astype(feat.dtype)
        else:
            feat = self.feat_proj(emb)
        return self.encoder(emb, feat, mask, seq_len, train)


# ---------------------------------------------------------------------------
# RepeatNet — repeat-or-explore copy mechanism
# ---------------------------------------------------------------------------

class _RepeatNetCore(nn.Module):
    embedding_dim: int
    hidden_size: int
    dropout: float
    vocab_size: int

    @nn.compact
    def __call__(self, emb, item_seq, mask, seq_len, train: bool = False):
        x = nn.Dropout(self.dropout, deterministic=not train)(emb)
        h = nn.RNN(nn.GRUCell(self.hidden_size), name="gru")(x)
        ht = _last_valid(h, seq_len)

        def attend(name):
            e = nn.Dense(self.hidden_size, name=f"{name}_u")(h) \
                + nn.Dense(self.hidden_size, use_bias=False,
                           name=f"{name}_w")(ht)[:, None]
            a = nn.Dense(1, use_bias=False, name=f"{name}_v")(jnp.tanh(e))[..., 0]
            a = _masked_softmax(a, mask)
            return a, jnp.einsum("bl,blh->bh", a, h)

        # repeat-explore gate (`repeatnet.py` RepeatExploreMechanism)
        _, c_re = attend("gate")
        gate = jax.nn.softmax(nn.Dense(2, use_bias=False, name="gate_out")(
            jnp.concatenate([ht, c_re], axis=-1)), axis=-1)
        # repeat head: attention weights copied onto history item ids
        a_rep, _ = attend("repeat")
        B = item_seq.shape[0]
        p_repeat = jnp.zeros((B, self.vocab_size), a_rep.dtype)
        p_repeat = p_repeat.at[
            jnp.arange(B)[:, None], item_seq].add(a_rep * mask.astype(a_rep.dtype))
        # explore head: softmax over the vocabulary, history items suppressed
        _, c_ex = attend("explore")
        logits = nn.Dense(self.vocab_size, use_bias=False, name="explore_out")(
            jnp.concatenate([ht, c_ex], axis=-1))
        seen = jnp.zeros((B, self.vocab_size), bool).at[
            jnp.arange(B)[:, None], item_seq].set(True)
        seen = seen.at[:, 0].set(False)
        p_explore = jax.nn.softmax(
            jnp.where(seen, jnp.full_like(logits, -1e9), logits), axis=-1)
        return gate[:, :1] * p_repeat + gate[:, 1:] * p_explore


class RepeatNet(SequentialRecommender):
    """Repeat-aware session model (`repeatnet.py` shape). `full_scores`
    returns log-probabilities; since they are already normalized,
    `full_softmax_loss`'s log-softmax is the identity on them, so the
    standard CE training path applies unchanged."""

    hidden_size: int = 64
    right_align: bool = True

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        self.item_table = self.param("emb_item", _sharded_emb_init(),
                                     (spec.vocab_size, self.embedding_dim))
        self.core = _RepeatNetCore(self.embedding_dim, self.hidden_size,
                                   self.dropout, spec.vocab_size, name="core")
        self.encoder = None

    def _probs(self, batch, train):
        from recbox_tpu.models.sequential.models import right_align_to_left
        item_seq = right_align_to_left(batch["item_seq"], batch["seq_len"])
        mask = item_seq != 0
        emb = jnp.take(self._table(), item_seq, axis=0)
        emb = emb * mask[..., None].astype(emb.dtype)
        return self.core(emb, item_seq, mask, batch["seq_len"], train)

    def full_scores(self, batch, train: bool = False):
        return jnp.log(self._probs(batch, train) + 1e-12)

    def user_tower(self, batch, train: bool = False):  # pragma: no cover
        raise NotImplementedError("RepeatNet scores via full_scores (copy "
                                  "mechanism has no single user vector)")

    def __call__(self, batch, train: bool = False):
        scores = self.full_scores(batch, train)
        item_ids = batch["__item_ids__"]
        return jnp.take_along_axis(scores, item_ids, axis=1)


# ---------------------------------------------------------------------------
# SINE — sparse-interest network
# ---------------------------------------------------------------------------

class _SINEEncoder(nn.Module):
    embedding_dim: int
    prototype_num: int     # size of the concept pool (L_c)
    interest_num: int      # active concepts per user (k)
    dropout: float

    @nn.compact
    def __call__(self, emb, mask, seq_len, train: bool = False):
        D, K = self.embedding_dim, self.interest_num
        pool = self.param("prototypes", nn.initializers.normal(0.02),
                          (self.prototype_num, D))
        fmask = mask.astype(emb.dtype)
        # self-attentive virtual user vector z_u
        a = nn.Dense(1, name="att1")(jnp.tanh(nn.Dense(D, name="att0")(emb)))[..., 0]
        a = _masked_softmax(a, mask)
        z = jnp.einsum("bl,bld->bd", a, emb)
        # sparse concept activation: top-k prototypes per user
        sim = jnp.dot(z, pool.T)                                # (B, Lc)
        topv, topi = jax.lax.top_k(sim, K)                      # (B, K)
        c = jnp.take(pool, topi, axis=0) * jax.nn.sigmoid(topv)[..., None]
        # per-concept attention over the history
        key = jnp.tanh(nn.Dense(D, name="key")(emb))            # (B, L, D)
        att = jnp.einsum("bld,bkd->bkl", key, c) / jnp.sqrt(D)
        att = _masked_softmax(att, mask[:, None, :])
        phi = jnp.einsum("bkl,bld->bkd", att, emb)              # (B, K, D)
        # intent aggregation: weight interests by next-intent prediction
        hat = jnp.tanh(nn.Dense(D, name="agg")(
            jnp.sum(emb * fmask[..., None], axis=1)
            / jnp.maximum(seq_len, 1)[:, None].astype(emb.dtype)))
        e = jax.nn.softmax(
            jnp.einsum("bkd,bd->bk", phi, hat) / 0.1, axis=-1)
        return jnp.einsum("bk,bkd->bd", e, phi)


class SINE(SequentialRecommender):
    """Sparse-interest network (`rechub/models/matching/sine.py` /
    recbole `sine.py` shape): activate k of L_c concept prototypes per user,
    attend per concept, aggregate by predicted next intent."""

    prototype_num: int = 50
    interest_num: int = 4

    def make_encoder(self):
        return _SINEEncoder(self.embedding_dim, self.prototype_num,
                            self.interest_num, self.dropout, name="sine")
