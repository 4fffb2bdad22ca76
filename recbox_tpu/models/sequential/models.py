"""Sequential (next-item) recommender zoo: SASRec, GRU4Rec, NARM, STAMP,
Caser, NextItNet.

Re-designed from the recbole sequential family
(`third_party/recbole/model/sequential_recommender/*.py`): each model encodes
the user's chronological item history (left-padded `item_seq` (B, L) with
PAD=0, `seq_len` (B,)) into one vector in item-embedding space, then scores by
dot product — so the whole family plugs into the matching-stage machinery
(sampled-negative losses, full-corpus retrieval eval, sharded serving).

Training protocols supported:
  - sampled negatives: `__call__` over a MatchingLoader batch (B, 1+negs);
  - full softmax CE over the corpus (recbole's loss_type='CE',
    `sasrec.py:144-150`): `full_scores` → optax integer-label CE.

Structure note: each model = the shared base (owns the row-shardable item
table + scoring plumbing, entry points usable under `apply(method=...)`) plus
an inner @nn.compact encoder submodule created in setup — flax permits inline
parameter creation in only one compact method per module.

Batch layout comes from `recbox_tpu.data.sequential`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recbox_tpu.models.base import MatchingModel
from recbox_tpu.nn.attention import PositionalEmbedding, TransformerEncoder
from recbox_tpu.nn.embedding import emb_init

__all__ = ["SequentialRecommender", "SASRec", "GRU4Rec", "NARM", "STAMP",
           "Caser", "NextItNet"]


def right_align_to_left(item_seq: jnp.ndarray, seq_len: jnp.ndarray) -> jnp.ndarray:
    """Convert left-padded [0..0, i1..ik] rows to right-padded [i1..ik, 0..0]."""
    L = item_seq.shape[1]
    shift = (L - seq_len)[:, None]
    idx = (jnp.arange(L)[None, :] + shift) % L
    return jnp.take_along_axis(item_seq, idx, axis=1)


def _last_valid(h: jnp.ndarray, seq_len: jnp.ndarray) -> jnp.ndarray:
    """h (B, L, H), right-padded → hidden at position seq_len−1."""
    idx = jnp.maximum(seq_len - 1, 0)[:, None, None].astype(jnp.int32)
    return jnp.take_along_axis(h, idx.repeat(h.shape[-1], axis=2), axis=1)[:, 0]


class SequentialRecommender(MatchingModel):
    """Base: owns the (shardable) item table; the encoder is a submodule.

    The item vocabulary comes from the FeatureMap's corpus_index feature
    (ids ≥ 1; 0 = PAD). `item_tower` is a plain table lookup so user vectors
    and corpus rows share one space (recbole convention).
    """

    max_seq_len: int = 50
    dropout: float = 0.2
    right_align: bool = False  # RNN/conv-style encoders want right padding
    # 'bfloat16' runs the encoder matmuls and the (B, vocab) full-softmax
    # logits matmul in bf16 with fp32 accumulation (params/loss stay fp32) —
    # the MXU-native precision. Wired through every transformer-based
    # encoder (SASRec, BERT4Rec, CORE, FDSA, GCSAN, S3Rec); RNN/conv
    # encoders ignore it. 'float32' (default) = pre-round-5 numerics.
    compute_dtype: str = "float32"

    @property
    def _cdtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def _enc_dtype(self):
        """Encoder computation dtype: bf16 when opted in, None = flax default
        (fp32). Passed by every transformer-based make_encoder."""
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        init = nn.with_partitioning(emb_init(), (("data", "model"), None))
        self.item_table = self.param(
            "emb_item", init, (spec.vocab_size, self.embedding_dim))
        self.encoder = self.make_encoder()

    def make_encoder(self) -> nn.Module:
        raise NotImplementedError

    def _table(self) -> jnp.ndarray:
        return jnp.asarray(self.item_table)

    def encode_sequence(self, item_seq, seq_len, train: bool = False):
        if self.right_align:
            item_seq = right_align_to_left(item_seq, seq_len)
        emb = jnp.take(self._table(), item_seq, axis=0)
        mask = item_seq != 0
        emb = emb * mask[..., None].astype(emb.dtype)
        return self.encoder(emb, mask, seq_len, train)

    def user_tower(self, batch, train: bool = False):
        return self.encode_sequence(batch["item_seq"], batch["seq_len"], train)

    def item_tower(self, batch, train: bool = False):
        return jnp.take(self._table(), batch[self.feature_map.corpus_index], axis=0)

    def full_scores(self, batch, train: bool = False) -> jnp.ndarray:
        """(B, vocab) scores over the item vocabulary (CE training / recbole
        `full_sort_predict` analog)."""
        user = self.user_tower(batch, train)
        cd = self._cdtype
        return jnp.dot(user.astype(cd), self._table().astype(cd).T,
                       preferred_element_type=jnp.float32) / self.temperature

    def fused_ce_loss(self, batch, train: bool = False) -> jnp.ndarray:
        """Scalar CE loss over the full vocabulary WITHOUT materializing the
        (B, vocab) logits: `ops/pallas/fused_ce.fused_softmax_ce` (flash-CE,
        online logsumexp over corpus tiles). Numerically equivalent to
        ``full_softmax_loss(self.full_scores(batch), batch[corpus_index])``
        under the bf16 compute path. The LARGE-VOCAB train path: measured
        v5e train steps (2026-08-20) — V=1M 31.7 ms vs 57.4 for the XLA
        formulation (1.81x), B=8192xV=1M 164 ms where XLA cannot compile
        at all (32 GB logits); below ~100k items keep `full_scores` +
        `full_softmax_loss` (XLA's context sharing wins there — 7.25 vs
        7.81 ms at the 60k bench regime). Use as the train method with an
        identity loss adapter::

            Trainer(model, lambda out, b: out, cfg,
                    train_method="fused_ce_loss")
        """
        from recbox_tpu.ops.pallas.fused_ce import fused_softmax_ce
        user = self.user_tower(batch, train)
        return fused_softmax_ce(user / self.temperature, self._table(),
                                batch[self.feature_map.corpus_index])


# --- encoders ---------------------------------------------------------------

class _SASRecEncoder(nn.Module):
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
        x = TransformerEncoder(
            n_layers=self.n_layers, n_heads=self.n_heads,
            hidden_dropout=self.dropout, attn_dropout=self.dropout,
            causal=True, dtype=self.dtype, name="encoder")(x, mask=mask,
                                                           train=train)
        return x[:, -1, :]  # left-padded ⇒ last position = most recent item


class SASRec(SequentialRecommender):
    """Self-attentive sequential rec (`sasrec.py:144-150` shape)."""

    n_layers: int = 2
    n_heads: int = 2

    def make_encoder(self):
        return _SASRecEncoder(self.embedding_dim, self.max_seq_len,
                              self.n_layers, self.n_heads, self.dropout,
                              dtype=self._enc_dtype(), name="sasrec")


class _GRU4RecEncoder(nn.Module):
    embedding_dim: int
    hidden_size: int
    n_layers: int
    dropout: float

    @nn.compact
    def __call__(self, emb, mask, seq_len, train: bool = False):
        x = nn.Dropout(self.dropout, deterministic=not train)(emb)
        for i in range(self.n_layers):
            x = nn.RNN(nn.GRUCell(self.hidden_size), name=f"gru{i}")(x)
        return nn.Dense(self.embedding_dim, name="proj")(_last_valid(x, seq_len))


class GRU4Rec(SequentialRecommender):
    """GRU session encoder (`gru4rec.py` shape)."""

    hidden_size: int = 128
    n_layers: int = 1
    right_align: bool = True

    def make_encoder(self):
        return _GRU4RecEncoder(self.embedding_dim, self.hidden_size,
                               self.n_layers, self.dropout, name="gru4rec")


class _NARMEncoder(nn.Module):
    embedding_dim: int
    hidden_size: int
    dropout: float

    @nn.compact
    def __call__(self, emb, mask, seq_len, train: bool = False):
        x = nn.Dropout(self.dropout, deterministic=not train)(emb)
        h = nn.RNN(nn.GRUCell(self.hidden_size), name="gru")(x)
        ht = _last_valid(h, seq_len)
        q1 = nn.Dense(self.hidden_size, use_bias=False, name="a1")(h)
        q2 = nn.Dense(self.hidden_size, use_bias=False, name="a2")(ht)
        alpha = nn.Dense(1, use_bias=False, name="v")(
            jax.nn.sigmoid(q1 + q2[:, None, :]))[..., 0]
        alpha = alpha * mask.astype(alpha.dtype)
        local = jnp.einsum("bl,blh->bh", alpha, h)
        c = jnp.concatenate([ht, local], axis=-1)
        c = nn.Dropout(self.dropout, deterministic=not train)(c)
        return nn.Dense(self.embedding_dim, use_bias=False, name="b")(c)


class NARM(SequentialRecommender):
    """Neural attentive session rec (`narm.py` shape): global + local reps."""

    hidden_size: int = 128
    right_align: bool = True

    def make_encoder(self):
        return _NARMEncoder(self.embedding_dim, self.hidden_size, self.dropout,
                            name="narm")


class _STAMPEncoder(nn.Module):
    embedding_dim: int

    @nn.compact
    def __call__(self, emb, mask, seq_len, train: bool = False):
        D = self.embedding_dim
        denom = jnp.maximum(seq_len, 1)[:, None].astype(emb.dtype)
        ms = jnp.sum(emb, axis=1) / denom                    # mean memory
        mt = emb[:, -1, :]                                   # last click
        w1 = nn.Dense(D, use_bias=False, name="w1")(emb)
        w2 = nn.Dense(D, use_bias=False, name="w2")(mt)
        w3 = nn.Dense(D, use_bias=False, name="w3")(ms)
        ba = self.param("ba", nn.initializers.zeros, (D,))
        alpha = nn.Dense(1, use_bias=False, name="w0")(
            jax.nn.sigmoid(w1 + w2[:, None] + w3[:, None] + ba))[..., 0]
        alpha = alpha * mask.astype(alpha.dtype)
        ma = jnp.einsum("bl,bld->bd", alpha, emb) + ms
        hs = jnp.tanh(nn.Dense(D, name="mlp_a")(ma))
        ht = jnp.tanh(nn.Dense(D, name="mlp_b")(mt))
        return hs * ht


class STAMP(SequentialRecommender):
    """Short-term attention/memory priority (`stamp.py` shape)."""

    def make_encoder(self):
        return _STAMPEncoder(self.embedding_dim, name="stamp")


class _CaserEncoder(nn.Module):
    embedding_dim: int
    n_h: int
    n_v: int
    heights: Sequence[int]
    dropout: float

    @nn.compact
    def __call__(self, emb, mask, seq_len, train: bool = False):
        B, L, D = emb.shape
        img = emb[..., None]  # (B, L, D, 1) NHWC
        h_outs = []
        for h in self.heights:
            conv = nn.Conv(self.n_h, kernel_size=(h, D), padding="VALID",
                           name=f"hconv{h}")(img)      # (B, L-h+1, 1, n_h)
            conv = jax.nn.relu(conv)[:, :, 0, :]
            h_outs.append(jnp.max(conv, axis=1))       # (B, n_h)
        v = nn.Conv(self.n_v, kernel_size=(L, 1), padding="VALID",
                    name="vconv")(img)                 # (B, 1, D, n_v)
        v = jax.nn.relu(v).reshape(B, -1)
        z = jnp.concatenate(h_outs + [v], axis=-1)
        z = nn.Dropout(self.dropout, deterministic=not train)(z)
        return jax.nn.relu(nn.Dense(self.embedding_dim, name="fc")(z))


class Caser(SequentialRecommender):
    """Convolutional sequence embedding (`caser.py` shape)."""

    n_h: int = 8
    n_v: int = 4
    heights: Sequence[int] = (2, 3, 4)

    def make_encoder(self):
        return _CaserEncoder(self.embedding_dim, self.n_h, self.n_v,
                             tuple(self.heights), self.dropout, name="caser")


class _NextItNetEncoder(nn.Module):
    embedding_dim: int
    dilations: Sequence[int]
    kernel_size: int

    @nn.compact
    def __call__(self, emb, mask, seq_len, train: bool = False):
        x = emb
        D = self.embedding_dim
        for i, d in enumerate(self.dilations):
            r = nn.LayerNorm(name=f"ln_a{i}")(x)
            r = jax.nn.relu(r)
            r = nn.Conv(D, kernel_size=(self.kernel_size,),
                        kernel_dilation=(d,), padding="CAUSAL",
                        name=f"conv_a{i}")(r)
            r = nn.LayerNorm(name=f"ln_b{i}")(r)
            r = jax.nn.relu(r)
            r = nn.Conv(D, kernel_size=(self.kernel_size,),
                        kernel_dilation=(2 * d,), padding="CAUSAL",
                        name=f"conv_b{i}")(r)
            x = x + r
        return x[:, -1, :]


class NextItNet(SequentialRecommender):
    """Dilated causal CNN (`nextitnet.py` shape)."""

    dilations: Sequence[int] = (1, 2, 4)
    kernel_size: int = 3

    def make_encoder(self):
        return _NextItNetEncoder(self.embedding_dim, tuple(self.dilations),
                                 self.kernel_size, name="nextitnet")
