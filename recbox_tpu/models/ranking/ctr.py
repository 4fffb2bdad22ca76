"""CTR ranking model zoo (single-task, binary click prediction).

TPU-first re-implementations of the reference CTR family — model shapes from
`third_party/deepctr/models/*` (functional ctors), interaction layers from
`recbox/ranking/pytorch/layers/interactions/*`, field embedding machinery from
`third_party/recbole/model/abstract_recommender.py:215-560` (ContextRecommender).

All models consume a FeatureMap and a batch dict, return (B,) logits:
  LR            — first-order only (`deepctr` linear logit)
  FM            — LR + second-order factorization machine
  DNN           — plain deep tower over concat embeddings (FNN shape)
  WideDeep      — LR wide part + deep tower (`deepctr/models/wdl.py`)
  DeepFM        — LR + FM + deep tower (`deepctr/models/deepfm.py:22`)
  NFM           — bi-interaction pooling + MLP (`deepctr/models/nfm.py`)
  AFM           — attention-weighted pairwise products (`deepctr/models/afm.py`)
  DCN           — CrossNet ⊕ deep tower (`deepctr/models/dcn.py`)
  DCNv2         — CrossNetV2 / CrossNetMix variants (`dcnmix.py`)
  xDeepFM       — CIN + LR + deep (`deepctr/models/xdeepfm.py`)
  AutoInt       — stacked self-attention interactions (`deepctr/models/autoint.py`)
  PNN           — inner-product network (`deepctr/models/pnn.py`)
  FiBiNET       — SENET + bilinear interactions (`deepctr/models/fibinet.py`)

The field-aware / input-aware / convolutional / graph families live in
`ctr_extended.py` (FFM, FwFM, FmFM, FEFM, DeepFEFM, ONN, CCPM, FGCNN, FLEN,
IFM, DIFM, EDCN, MLR, FiGNN, EulerNet, DeepIM, HFM, DCNMix, FNN).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from recbox_tpu.features.schema import FeatureMap
from recbox_tpu.models.base import RankingModel
from recbox_tpu.nn.core import MLP, FactorizationMachine, LogisticRegression
from recbox_tpu.nn.embedding import FeatureEmbedding, concat_embeddings, stack_embeddings
from recbox_tpu.nn.interactions import (
    BilinearInteraction, CompressedInteractionNet, CrossNet, CrossNetMix,
    CrossNetV2, InnerProduct, InteractingLayer, SENET,
)

__all__ = ["LR", "FM", "DNN", "WideDeep", "DeepFM", "NFM", "AFM", "DCN",
           "DCNv2", "xDeepFM", "AutoInt", "PNN", "FiBiNET"]


class _FieldModel(RankingModel):
    """Shared machinery: uniform-width field embeddings + optional 1-d linear.

    ``compute_dtype='bfloat16'`` runs embeddings/MLPs in bf16 (params stay
    fp32; the loss/logits come back fp32) — the MXU-native precision, ~2×
    step throughput on TPU at equal quality for CTR workloads.
    """

    embedding_dim: int = 16
    compute_dtype: str = "float32"
    # 'normal' = normal(1e-4), the recbox regime (`match_model.py:91-114`);
    # 'xavier_normal' = recbole's xavier_normal_initialization — use for
    # recbole-protocol parity runs (init scale moves convergence speed
    # materially at production scale)
    emb_init_scheme: str = "normal"

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def _embedding(self, name="embedding") -> FeatureEmbedding:
        return FeatureEmbedding(self.feature_map,
                                embedding_dim=self.embedding_dim,
                                emb_init_scheme=self.emb_init_scheme,
                                dtype=self._dtype, name=name)

    def _mlp(self, hidden_units, name="dnn", **kw) -> MLP:
        return MLP(hidden_units, dtype=self._dtype, name=name, **kw)

    def _linear_embedding(self) -> FeatureEmbedding:
        # first-order weights = dim-1 embeddings (FM linear term)
        return FeatureEmbedding(self.feature_map, embedding_dim=1, name="linear")

    def _first_order(self, lin_embs) -> jnp.ndarray:
        # the nn/core.py LogisticRegression block over stacked (B, F, 1)
        # dim-1 lookups — single source of truth for the first-order term
        x = stack_embeddings(lin_embs, self.feature_map.input_features)
        return LogisticRegression(name="lr")(x)  # (B, 1)


class LR(_FieldModel):
    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        return self._first_order(lin).reshape(-1)


class FM(_FieldModel):
    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        embs = self._embedding()(batch)
        field = stack_embeddings(embs, self.feature_map.input_features)
        logit = self._first_order(lin) + FactorizationMachine()(field)
        return logit.reshape(-1)


class DNN(_FieldModel):
    hidden_units: Sequence[int] = (400, 400, 400)
    activation: str = "relu"
    dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train: bool = False):
        embs = self._embedding()(batch)
        x = concat_embeddings(embs, self.feature_map.input_features)
        logit = MLP(self.hidden_units, dtype=self._dtype, activation=self.activation, output_dim=1,
                    dropout=self.dropout, batch_norm=self.batch_norm)(x, train=train)
        return logit.reshape(-1)


class WideDeep(_FieldModel):
    hidden_units: Sequence[int] = (400, 400, 400)
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        embs = self._embedding()(batch)
        x = concat_embeddings(embs, self.feature_map.input_features)
        deep = MLP(self.hidden_units, dtype=self._dtype, activation=self.activation, output_dim=1,
                   dropout=self.dropout)(x, train=train)
        return (self._first_order(lin) + deep).reshape(-1)


class DeepFM(_FieldModel):
    hidden_units: Sequence[int] = (400, 400, 400)
    activation: str = "relu"
    dropout: float = 0.0
    batch_norm: bool = False
    # feature_major_compute=True keeps activations in (F, B, D) layout end
    # to end: per-feature row slices of the packed gather are ADJACENT row
    # blocks, so stacking on axis 0 is a contiguous concat (vs the
    # (B, F, D) interleave, a transpose-shaped copy XLA materializes both
    # forward and in the row-grad pipeline — the ~6 ms/step "machinery"
    # documented in bench.py). FM reduces over axis 0 directly and the
    # first DNN layer contracts the feature axis via einsum('fbd,fdh->bh')
    # — numerically identical to flatten+Dense (test_feature_major_
    # equivalence transplants params between the two paths).
    feature_major_compute: bool = False

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        embs = self._embedding()(batch)
        if self.feature_major_compute:
            return self._feature_major_logit(lin, embs, batch, train)
        field = stack_embeddings(embs, self.feature_map.input_features)
        flat = field.reshape(field.shape[0], -1)
        logit = (self._first_order(lin).astype(jnp.float32)
                 + FactorizationMachine()(field).astype(jnp.float32)
                 + self._mlp(self.hidden_units, activation=self.activation,
                             output_dim=1, dropout=self.dropout,
                             batch_norm=self.batch_norm)(
                     flat, train=train).astype(jnp.float32))
        return logit.reshape(-1)

    def _feature_major_logit(self, lin, embs, batch, train):
        from recbox_tpu.nn.core import get_activation
        from recbox_tpu.nn.embedding import rows_block_key

        # block fast path (PackedEmbeddingTrainer(block_rows=True)): the
        # categorical rows arrive as ONE schema-ordered (Fc, B, D) array
        # per module — consume it directly, splitting FM and the first DNN
        # layer over feature RUNS (both are feature-sums, so the (F, B, D)
        # stack is never materialized; its fwd copy and bwd split were
        # ~1 ms/step of the measured fwd/bwd slack, tools/prof_fwdbwd.py:
        # model 6.46 ms vs same-math ideal 5.38 at bench shapes). The
        # trainer only emits blocks when every categorical feature is
        # covered, 1-D, unfrozen, and padding-free; param names/shapes/
        # inits are IDENTICAL to the stacked path below, so one model
        # trains with blocks and evaluates without.
        cat_block = batch.get(rows_block_key(("embedding",)))
        lin_block = batch.get(rows_block_key(("linear",)))
        if cat_block is not None and lin_block is not None:
            return self._feature_major_block_logit(
                cat_block, lin_block, lin, embs, train)

        def pooled(emb_dict):
            parts = []
            for spec in self.feature_map.input_features:
                if spec.name not in emb_dict:
                    continue
                e = emb_dict[spec.name]
                if e.ndim == 3:      # sequence: masked mean (stack_embeddings)
                    valid = jnp.any(e != 0, axis=-1).astype(e.dtype)
                    counts = jnp.maximum(jnp.sum(valid, axis=1), 1.0)
                    e = jnp.sum(e, axis=1) / counts[:, None]
                parts.append(e)
            return jnp.stack(parts, axis=0)              # (F, B, D)

        x = pooled(embs)                                 # (F, B, D)
        lx = pooled(lin)                                 # (F, B, 1)
        F, B, D = x.shape
        # first-order: sum of per-field scalar weights + bias
        # (LogisticRegression's 3-D branch, reduced over axis 0 here)
        lr_bias = self.param("lr_bias", nn.initializers.zeros, (1,))
        first = jnp.sum(lx.astype(jnp.float32), axis=(0, 2)) + lr_bias
        # FM second order: 0.5(sum^2 - sum of squares), feature axis = 0
        s = jnp.sum(x, axis=0)
        fm = 0.5 * jnp.sum(jnp.square(s) - jnp.sum(jnp.square(x), axis=0),
                           axis=-1)
        # DNN first layer as a feature-axis contraction: kernel is drawn at
        # the flat (F*D, H) fan-in (same xavier statistics as Dense) and
        # viewed (F, D, H) — einsum('fbd,fdh->bh') == flatten+matmul
        h0 = self.hidden_units[0]

        def w1_init(key, shape, dtype=jnp.float32):
            flat = nn.initializers.xavier_normal()(key, (F * D, h0), dtype)
            return flat.reshape(F, D, h0)

        w1 = self.param("dnn_w1", w1_init, (F, D, h0))
        b1 = self.param("dnn_b1", nn.initializers.zeros, (h0,))
        h = jnp.einsum("fbd,fdh->bh", x, w1.astype(x.dtype)) \
            + b1.astype(x.dtype)
        if self.batch_norm:
            h = nn.BatchNorm(use_running_average=not train,
                             name="dnn_bn1")(h)
        h = get_activation(self.activation)(h)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        deep = self._mlp(tuple(self.hidden_units[1:]), name="dnn_rest",
                         activation=self.activation, output_dim=1,
                         dropout=self.dropout, batch_norm=self.batch_norm)(
            h, train=train)
        return (first.astype(jnp.float32) + fm.astype(jnp.float32)
                + deep.reshape(-1).astype(jnp.float32)).reshape(-1)

    def _feature_major_block_logit(self, cat_block, lin_block, lin, embs,
                                   train):
        """Stack-free feature-major DeepFM over run-split blocks.

        Same math and params as `_feature_major_logit`'s stacked form —
        FM's 0.5(sum² − sum-of-squares) and einsum('fbd,fdh->bh') both
        distribute over a partition of the feature axis, so each maximal
        schema-order run (the categorical block, each numeric stretch)
        contributes independently and the full (F, B, D) never exists."""
        import itertools

        from recbox_tpu.nn.core import get_activation

        specs = [s for s in self.feature_map.input_features
                 if s.name in embs]
        cat_i = 0
        parts = []                                  # (F_run, B, D) pieces
        for is_cat, grp in itertools.groupby(
                specs, key=lambda s: s.type == "categorical"):
            g = list(grp)
            if is_cat:
                parts.append(cat_block[cat_i:cat_i + len(g)]
                             .astype(self._dtype))
                cat_i += len(g)
            else:
                parts.append(jnp.stack([embs[s.name] for s in g], axis=0))
        if cat_i != cat_block.shape[0]:
            raise ValueError(
                f"rows block carries {cat_block.shape[0]} features but the "
                f"schema embeds {cat_i} categorical columns")
        F = sum(p.shape[0] for p in parts)
        D = parts[0].shape[-1]
        # first-order: categorical weights ride the dim-1 block; numeric
        # first-order entries come from the linear module's dict
        lr_bias = self.param("lr_bias", nn.initializers.zeros, (1,))
        first = jnp.sum(lin_block.astype(jnp.float32), axis=(0, 2)) + lr_bias
        for s in specs:
            if s.type != "categorical":
                first = first + lin[s.name].astype(jnp.float32).reshape(-1)
        # FM second order, run-split
        s_sum = sum(jnp.sum(p, axis=0) for p in parts)
        sq_sum = sum(jnp.sum(jnp.square(p), axis=0) for p in parts)
        fm = 0.5 * jnp.sum(jnp.square(s_sum) - sq_sum, axis=-1)
        # first DNN layer, run-split over the same (F, D, H) kernel
        h0 = self.hidden_units[0]

        def w1_init(key, shape, dtype=jnp.float32):
            flat = nn.initializers.xavier_normal()(key, (F * D, h0), dtype)
            return flat.reshape(F, D, h0)

        w1 = self.param("dnn_w1", w1_init, (F, D, h0))
        b1 = self.param("dnn_b1", nn.initializers.zeros, (h0,))
        h = b1.astype(self._dtype)
        off = 0
        for p in parts:
            h = h + jnp.einsum("fbd,fdh->bh", p,
                               w1[off:off + p.shape[0]].astype(p.dtype))
            off += p.shape[0]
        if self.batch_norm:
            h = nn.BatchNorm(use_running_average=not train,
                             name="dnn_bn1")(h)
        h = get_activation(self.activation)(h)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        deep = self._mlp(tuple(self.hidden_units[1:]), name="dnn_rest",
                         activation=self.activation, output_dim=1,
                         dropout=self.dropout, batch_norm=self.batch_norm)(
            h, train=train)
        return (first.astype(jnp.float32) + fm.astype(jnp.float32)
                + deep.reshape(-1).astype(jnp.float32)).reshape(-1)


class NFM(_FieldModel):
    hidden_units: Sequence[int] = (128, 128)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        embs = self._embedding()(batch)
        field = stack_embeddings(embs, self.feature_map.input_features)
        # bi-interaction pooling: 0.5(sum² − sum of squares) kept as a vector
        bi = 0.5 * (jnp.square(jnp.sum(field, axis=1))
                    - jnp.sum(jnp.square(field), axis=1))  # (B, D)
        deep = MLP(self.hidden_units, dtype=self._dtype, output_dim=1,
                   dropout=self.dropout)(bi, train=train)
        return (self._first_order(lin) + deep).reshape(-1)


class AFM(_FieldModel):
    attention_dim: int = 16
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        embs = self._embedding()(batch)
        field = stack_embeddings(embs, self.feature_map.input_features)
        F = field.shape[1]
        iu, ju = jnp.triu_indices(F, k=1)
        prod = field[:, iu] * field[:, ju]  # (B, P, D)
        att = nn.Dense(self.attention_dim)(prod)
        att = jax.nn.relu(att)
        att = nn.Dense(1, use_bias=False)(att)  # (B, P, 1)
        att = jax.nn.softmax(att, axis=1)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        pooled = jnp.sum(att * prod, axis=1)  # (B, D)
        p = nn.Dense(1, use_bias=False)(pooled)
        return (self._first_order(lin) + p).reshape(-1)


class DCN(_FieldModel):
    num_cross_layers: int = 3
    hidden_units: Sequence[int] = (400, 400)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        embs = self._embedding()(batch)
        x = concat_embeddings(embs, self.feature_map.input_features)
        cross = CrossNet(self.num_cross_layers)(x)
        deep = MLP(self.hidden_units, dtype=self._dtype, dropout=self.dropout)(x, train=train)
        logit = nn.Dense(1, kernel_init=nn.initializers.xavier_normal())(
            jnp.concatenate([cross, deep], axis=-1))
        return logit.reshape(-1)


class DCNv2(_FieldModel):
    num_cross_layers: int = 3
    hidden_units: Sequence[int] = (400, 400)
    dropout: float = 0.0
    model_structure: str = "parallel"   # 'parallel' | 'stacked' | 'crossnet_only'
    use_low_rank_mixture: bool = False
    low_rank: int = 32
    num_experts: int = 4

    @nn.compact
    def __call__(self, batch, train: bool = False):
        embs = self._embedding()(batch)
        x = concat_embeddings(embs, self.feature_map.input_features)
        if self.use_low_rank_mixture:
            cross = CrossNetMix(self.num_cross_layers, self.low_rank,
                                self.num_experts)(x)
        else:
            cross = CrossNetV2(self.num_cross_layers)(x)
        if self.model_structure == "crossnet_only":
            out = cross
        elif self.model_structure == "stacked":
            out = MLP(self.hidden_units, dtype=self._dtype, dropout=self.dropout)(cross, train=train)
        else:
            deep = MLP(self.hidden_units, dtype=self._dtype, dropout=self.dropout)(x, train=train)
            out = jnp.concatenate([cross, deep], axis=-1)
        logit = nn.Dense(1, kernel_init=nn.initializers.xavier_normal())(out)
        return logit.reshape(-1)


class xDeepFM(_FieldModel):
    cin_layer_sizes: Sequence[int] = (16, 16)
    hidden_units: Sequence[int] = (400, 400)
    dropout: float = 0.0
    # 'identity' = recbox/fuxictr CIN; 'relu' = recbole's per-layer CIN
    # activation (see CompressedInteractionNet.activation for the measured
    # head-to-head)
    cin_activation: str = "identity"

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        embs = self._embedding()(batch)
        field = stack_embeddings(embs, self.feature_map.input_features)
        flat = field.reshape(field.shape[0], -1)
        cin = CompressedInteractionNet(tuple(self.cin_layer_sizes),
                                       activation=self.cin_activation)(field)
        deep = MLP(self.hidden_units, dtype=self._dtype, output_dim=1,
                   dropout=self.dropout)(flat, train=train)
        return (self._first_order(lin) + cin + deep).reshape(-1)


class AutoInt(_FieldModel):
    num_attention_layers: int = 3
    attention_dim: int = 16
    num_heads: int = 2
    hidden_units: Sequence[int] = ()    # optional parallel DNN
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        embs = self._embedding()(batch)
        field = stack_embeddings(embs, self.feature_map.input_features)
        x = field
        for _ in range(self.num_attention_layers):
            x = InteractingLayer(self.attention_dim, self.num_heads)(x)
        logit = nn.Dense(1, kernel_init=nn.initializers.xavier_normal())(
            x.reshape(x.shape[0], -1))
        if self.hidden_units:
            flat = field.reshape(field.shape[0], -1)
            logit = logit + MLP(tuple(self.hidden_units), dtype=self._dtype, output_dim=1,
                                dropout=self.dropout)(flat, train=train)
        return logit.reshape(-1)


class PNN(_FieldModel):
    hidden_units: Sequence[int] = (400, 400)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        embs = self._embedding()(batch)
        field = stack_embeddings(embs, self.feature_map.input_features)
        flat = field.reshape(field.shape[0], -1)
        inner = InnerProduct()(field)
        x = jnp.concatenate([flat, inner], axis=-1)
        logit = MLP(self.hidden_units, dtype=self._dtype, output_dim=1,
                    dropout=self.dropout)(x, train=train)
        return logit.reshape(-1)


class FiBiNET(_FieldModel):
    hidden_units: Sequence[int] = (400, 400)
    reduction_ratio: int = 3
    bilinear_type: str = "field_interaction"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        embs = self._embedding()(batch)
        field = stack_embeddings(embs, self.feature_map.input_features)
        senet_field = SENET(self.reduction_ratio)(field)
        bi_raw = BilinearInteraction(self.bilinear_type, name="bilinear_raw")(field)
        bi_se = BilinearInteraction(self.bilinear_type, name="bilinear_se")(senet_field)
        x = jnp.concatenate([bi_raw, bi_se], axis=-1)
        deep = MLP(self.hidden_units, dtype=self._dtype, output_dim=1,
                   dropout=self.dropout)(x, train=train)
        return (self._first_order(lin) + deep).reshape(-1)
