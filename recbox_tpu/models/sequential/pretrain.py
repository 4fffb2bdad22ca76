"""Self-supervised sequential pretraining: S3Rec and GRU4RecF.

TPU-native re-designs of recbole's
`third_party/recbole/model/sequential_recommender/{s3rec,gru4recf}.py`:

* S3Rec — a bidirectional transformer pretrained with MIP (masked item
  prediction), SP (segment prediction), and — when an item-attribute table
  is provided — AAP/MAP (attribute association/masked attribute
  prediction); fine-tuning switches to the causal SASRec protocol on the
  same weights. Mask sampling is data-pipeline work (host RNG), the model
  exposes the loss heads.
* GRU4RecF — GRU4Rec with fused item-feature sequences (recbole's
  'feature fusion' variant): the GRU consumes [item emb ‖ feature emb].
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recbox_tpu.models.sequential.models import (
    GRU4Rec, SequentialRecommender, _last_valid,
)
from recbox_tpu.models.sequential.extended import _BERT4RecEncoder
from recbox_tpu.nn.attention import PositionalEmbedding, TransformerEncoder
from recbox_tpu.nn.embedding import emb_init

__all__ = ["S3Rec", "GRU4RecF"]


class S3Rec(SequentialRecommender):
    """S3Rec (`s3rec.py` shape). Pretrain heads:

    * `mip_logits(seq, seq_len, positions)` — masked-position scores against
      the full item table (the [MASK] token is the last table row);
    * `sp_logits(seq, seq_len, seg, seg_len, neg_seg, neg_seg_len)` —
      bilinear segment-vs-context scores (positive and corrupted segment);
    * `aap_logits` / `map_logits` — attribute heads when `n_attributes` > 0.

    Fine-tune path = causal `user_tower`/`full_scores` (SASRec protocol).
    """

    n_layers: int = 2
    n_heads: int = 2
    n_attributes: int = 0

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        self._vocab = spec.vocab_size
        init = nn.with_partitioning(emb_init(), (("data", "model"), None))
        self.item_table = self.param(
            "emb_item", init, (spec.vocab_size + 1, self.embedding_dim))
        self.encoder = _BERT4RecEncoder(
            self.embedding_dim, self.max_seq_len, self.n_layers,
            self.n_heads, self.dropout, dtype=self._enc_dtype(),
            name="encoder")
        self.causal_encoder = TransformerEncoder(
            n_layers=self.n_layers, n_heads=self.n_heads,
            hidden_dropout=self.dropout, attn_dropout=self.dropout,
            causal=True, dtype=self._enc_dtype(), name="causal")
        self.pos = PositionalEmbedding(self.max_seq_len, name="pos")
        self.sp_bilinear = nn.Dense(self.embedding_dim, use_bias=False,
                                    name="sp_w")
        if self.n_attributes:
            self.aap_head = nn.Dense(self.n_attributes, use_bias=False,
                                     name="aap_w")

    @property
    def mask_token(self) -> int:
        return self._vocab

    def _table(self):
        return jnp.asarray(self.item_table)[: self._vocab]

    def _bi_encode(self, seq, seq_len, train):
        emb = jnp.take(jnp.asarray(self.item_table), seq, axis=0)
        mask = seq != 0
        emb = emb * mask[..., None].astype(emb.dtype)
        return self.encoder(emb, mask, seq_len, train)

    # -- fine-tune (SASRec protocol) -------------------------------------
    def user_tower(self, batch, train: bool = False):
        seq = batch["item_seq"]
        mask = seq != 0
        x = jnp.take(jnp.asarray(self.item_table), seq, axis=0)
        x = x * mask[..., None].astype(x.dtype)
        x = self.pos(x)
        h = self.causal_encoder(x, mask=mask, train=train)
        return h[:, -1, :]

    # -- pretrain heads ----------------------------------------------------
    def mip_logits(self, item_seq, seq_len, positions,
                   train: bool = False) -> jnp.ndarray:
        """(B, P, vocab) logits at masked positions (`s3rec.py` MIP)."""
        h = self._bi_encode(item_seq, seq_len, train)
        g = jnp.take_along_axis(h, positions[..., None].astype(jnp.int32),
                                axis=1)
        return jnp.einsum("bpd,vd->bpv", g, self._table(),
                          preferred_element_type=jnp.float32)

    def sp_logits(self, item_seq, seq_len, segment, segment_len,
                  neg_segment, neg_segment_len,
                  train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Segment prediction (`s3rec.py` SP): context repr vs (pos, neg)
        segment reprs through a bilinear head; returns (pos, neg) logits."""
        ctx = self._bi_encode(item_seq, seq_len, train)[:, -1, :]
        pos_r = self._bi_encode(segment, segment_len, train)[:, -1, :]
        neg_r = self._bi_encode(neg_segment, neg_segment_len, train)[:, -1, :]
        w_ctx = self.sp_bilinear(ctx)
        return (jnp.sum(w_ctx * pos_r, axis=-1),
                jnp.sum(w_ctx * neg_r, axis=-1))

    def aap_logits(self, item_seq, seq_len, train: bool = False):
        """(B, L, n_attributes) attribute-association logits (`s3rec.py`
        AAP — also serves MAP at masked positions)."""
        if not self.n_attributes:
            raise ValueError("S3Rec built with n_attributes=0")
        h = self._bi_encode(item_seq, seq_len, train)
        return self.aap_head(h)

    def pretrain_losses(self, batch, weights=(0.2, 1.0, 1.0, 0.5),
                        train: bool = True) -> jnp.ndarray:
        """Joint pretrain loss over a reconstructed batch (`s3rec.py`
        pretrain(): AAP + MIP + MAP + SP, each a summed BCE-with-logits as in
        the reference; positional pos/neg MIP scoring, last-position segment
        contexts). `batch` keys are produced by
        `training/pretrain.reconstruct_pretrain_batch` (left-padded):
        masked_seq, pos_items, neg_items, masked_segment, pos_segment,
        neg_segment, seq_len; optional attributes (B, L, n_attributes)
        multi-hot. `weights` = (aap, mip, map, sp)."""
        aap_w, mip_w, map_w, sp_w = weights
        masked_seq = batch["masked_seq"]
        seq_len = batch["seq_len"]
        h = self._bi_encode(masked_seq, seq_len, train)          # (B, L, D)
        table = jnp.asarray(self.item_table)

        def bce(logits, target):  # elementwise BCE-with-logits
            return (jnp.maximum(logits, 0) - logits * target
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))

        mip_mask = (masked_seq == self.mask_token).astype(jnp.float32)
        valid = (masked_seq != 0).astype(jnp.float32)

        # MIP: per-position pos-vs-neg contrast at masked positions
        pos_e = jnp.take(table, batch["pos_items"], axis=0)
        neg_e = jnp.take(table, batch["neg_items"], axis=0)
        mip_dist = jnp.sum(h * pos_e, -1) - jnp.sum(h * neg_e, -1)
        mip_loss = jnp.sum(bce(mip_dist, jnp.ones_like(mip_dist)) * mip_mask)

        # AAP (non-masked valid positions) + MAP (masked positions)
        aap_loss = map_loss = 0.0
        if self.n_attributes and "attributes" in batch:
            attrs = batch["attributes"].astype(jnp.float32)
            scores = self.aap_head(h)
            per_pos = jnp.sum(bce(scores, attrs), axis=-1)
            aap_loss = jnp.sum(per_pos * valid * (1.0 - mip_mask))
            map_loss = jnp.sum(per_pos * mip_mask)

        # SP: bilinear last-position context vs pos/neg segment encodings
        def last(seq):
            sl = jnp.sum((seq != 0).astype(jnp.int32), axis=-1)
            return self._bi_encode(seq, sl, train)[:, -1, :]
        ctx = self.sp_bilinear(last(batch["masked_segment"]))
        sp_dist = (jnp.sum(ctx * last(batch["pos_segment"]), -1)
                   - jnp.sum(ctx * last(batch["neg_segment"]), -1))
        sp_loss = jnp.sum(bce(sp_dist, jnp.ones_like(sp_dist)))

        return (aap_w * aap_loss + mip_w * mip_loss
                + map_w * map_loss + sp_w * sp_loss)


class _GRU4RecFEncoder(nn.Module):
    embedding_dim: int
    hidden_size: int
    n_layers: int
    dropout: float

    @nn.compact
    def __call__(self, emb, mask, seq_len, train: bool = False):
        x = nn.Dropout(self.dropout, deterministic=not train)(emb)
        for i in range(self.n_layers):
            x = nn.RNN(nn.GRUCell(self.hidden_size), name=f"gru{i}")(x)
        return nn.Dense(self.embedding_dim, name="proj")(
            _last_valid(x, seq_len))


class GRU4RecF(GRU4Rec):
    """GRU4Rec with item-feature fusion (`gru4recf.py`): the recurrent input
    is [item emb ‖ feature emb], features from a parallel (B, L) id sequence
    (`feature_seq_name`, e.g. category ids)."""

    feature_seq_name: str = "feat_seq"
    feature_vocab: int = 0

    def setup(self):
        spec = self.feature_map[self.feature_map.corpus_index]
        init = nn.with_partitioning(emb_init(), (("data", "model"), None))
        self.item_table = self.param("emb_item", init,
                                     (spec.vocab_size, self.embedding_dim))
        if self.feature_vocab:
            self.feat_table = self.param(
                "emb_feat", init, (self.feature_vocab, self.embedding_dim))
        self.encoder = _GRU4RecFEncoder(self.embedding_dim, self.hidden_size,
                                        self.n_layers, self.dropout,
                                        name="gru4recf")

    def user_tower(self, batch, train: bool = False):
        from recbox_tpu.models.sequential.models import right_align_to_left
        seq = right_align_to_left(batch["item_seq"], batch["seq_len"])
        mask = seq != 0
        emb = jnp.take(self._table(), seq, axis=0)
        if self.feature_vocab and self.feature_seq_name in batch:
            fseq = right_align_to_left(batch[self.feature_seq_name],
                                       batch["seq_len"])
            femb = jnp.take(jnp.asarray(self.feat_table), fseq, axis=0)
        else:
            femb = jnp.zeros_like(emb)
        x = jnp.concatenate([emb, femb], axis=-1)
        x = x * mask[..., None].astype(x.dtype)
        return self.encoder(x, mask, batch["seq_len"], train)
