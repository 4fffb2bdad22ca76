"""Extended CTR ranking zoo.

TPU-first re-implementations of the remaining reference CTR families:
field-aware models (FFM/FwFM/FmFM/FEFM — recbole `context_aware_recommender/
{ffm,fwfm}.py`, deepctr `deepfefm.py`), input-aware reweighting (IFM/DIFM —
`deepctr/models/{ifm,difm}.py`), convolutional interactions (CCPM/FGCNN —
`deepctr/models/{ccpm,fgcnn}.py`), field graphs (FiGNN — recbole `fignn.py`),
complex-space interactions (EulerNet — recbole `eulernet.py`), bridge/
regulation dual streams (EDCN — `deepctr/models/edcn.py`), piecewise-linear
mixtures (MLR — `deepctr/models/mlr.py`), grouped bi-interactions (FLEN —
`deepctr/models/flen.py`), ONN/NFFM (`deepctr/models/onn.py`), and the
interaction-layer showcases DeepIM / HFM
(`recbox/ranking/pytorch/layers/interactions/{interaction_machine,
holographic_interaction}.py`).

All pairwise interactions use batched einsum/gram forms (MXU-tiled), never
per-pair Python loops; pair indices are static `triu_indices`.

Reference-parity notes (the round-2 deviations list is closed):
  * ONN/CCPM/FGCNN/EDCN include the deepctr first-order linear logit
    (`deepctr/feature_column.py:141-170` get_linear_logit, wired by each
    model ctor, e.g. `deepctr/models/ccpm.py`);
  * FiGNN's readout matches recbole's AttentionalPrediction
    (`fignn.py:95-143`): per-field score mlp1(h) gated by an UN-sigmoided
    mlp2 over the FLATTENED full state;
  * EulerNet matches `recbole/.../eulernet.py:60-162`: initial phase =
    embedding, modulus = mu; bias_lam/bias_theta added inside the
    log-modulus/phase mix (pre-exp), shared implicit linear + relu.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recbox_tpu.models.ranking.ctr import _FieldModel, DNN, DCNv2
from recbox_tpu.nn.core import MLP, FactorizationMachine
from recbox_tpu.nn.embedding import concat_embeddings, stack_embeddings
from recbox_tpu.nn.interactions import (
    HolographicInteraction, InnerProduct, InteractingLayer, InteractionMachine,
)

__all__ = ["FFM", "FwFM", "FmFM", "FEFM", "DeepFEFM", "ONN", "CCPM", "FGCNN",
           "FLEN", "IFM", "DIFM", "EDCN", "MLR", "FiGNN", "EulerNet",
           "DeepIM", "HFM", "DCNMix", "FNN"]


def _pairs(F: int):
    return jnp.triu_indices(F, k=1)


class _FieldAwareBase(_FieldModel):
    """Field-aware embedding helper: each feature gets F embeddings of width
    D (one per partner field), materialized as one D·F-wide embedding and
    reshaped to (B, F, F, D) — E[:, i, f] = v_{i→field f}."""

    def _field_aware_stack(self, batch) -> jnp.ndarray:
        F = self.feature_map.num_fields
        wide = self._embedding_of_width(F * self.embedding_dim, "ffm_embedding")(batch)
        x = stack_embeddings(wide, self.feature_map.input_features)  # (B,F,F*D)
        B = x.shape[0]
        return x.reshape(B, F, F, self.embedding_dim)

    def _embedding_of_width(self, dim, name):
        from recbox_tpu.nn.embedding import FeatureEmbedding
        return FeatureEmbedding(self.feature_map, embedding_dim=dim,
                                dtype=self._dtype, name=name)


class FFM(_FieldAwareBase):
    """Field-aware FM: Σ_{i<j} ⟨v_{i→fj}, v_{j→fi}⟩ + linear
    (recbole `ffm.py` shape)."""

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        E = self._field_aware_stack(batch)
        iu, ju = _pairs(E.shape[1])
        inter = jnp.sum(E[:, iu, ju] * E[:, ju, iu], axis=(1, 2))
        return (self._first_order(lin).reshape(-1)
                + inter.astype(jnp.float32))


class FwFM(_FieldModel):
    """Field-weighted FM: Σ_{i<j} r_ij ⟨v_i, v_j⟩ + linear
    (recbole `fwfm.py` shape)."""

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        F = field.shape[1]
        iu, ju = _pairs(F)
        r = self.param("pair_weight", nn.initializers.xavier_normal(),
                       (len(iu), 1))
        gram = jnp.einsum("bfd,bgd->bfg", field, field)
        inter = jnp.sum(gram[:, iu, ju] * r[None, :, 0], axis=1)
        return (self._first_order(lin).reshape(-1)
                + inter.astype(jnp.float32))


class FmFM(_FieldModel):
    """Field-matrix FM: Σ_{i<j} ⟨v_i M_ij, v_j⟩ — one learned (D, D) kernel
    per field pair (FmFM/FvFM family; FuxiCTR lineage of the reference's
    ranking stage)."""

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        iu, ju = _pairs(field.shape[1])
        M = self.param("pair_kernel", nn.initializers.xavier_normal(),
                       (len(iu), self.embedding_dim, self.embedding_dim))
        left = jnp.einsum("bpd,pde->bpe", field[:, iu], M)
        inter = jnp.sum(left * field[:, ju], axis=(1, 2))
        return (self._first_order(lin).reshape(-1)
                + inter.astype(jnp.float32))


class _FEFMCore(nn.Module):
    """Field-embedded FM interactions: s_ij = v_i (W_ij + W_ijᵀ) v_j
    (symmetric kernels; `deepctr/models/deepfefm.py` shape). Returns the
    (B, P) interaction vector."""

    embedding_dim: int

    @nn.compact
    def __call__(self, field):
        iu, ju = _pairs(field.shape[1])
        W = self.param("pair_kernel", nn.initializers.xavier_normal(),
                       (len(iu), self.embedding_dim, self.embedding_dim))
        Wsym = W + jnp.swapaxes(W, 1, 2)
        left = jnp.einsum("bpd,pde->bpe", field[:, iu], Wsym)
        return jnp.sum(left * field[:, ju], axis=-1)  # (B, P)


class FEFM(_FieldModel):
    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        s = _FEFMCore(self.embedding_dim)(field)
        return (self._first_order(lin).reshape(-1)
                + jnp.sum(s, axis=1).astype(jnp.float32))


class DeepFEFM(_FieldModel):
    """FEFM + DNN over [flat embeddings ‖ interaction vector]
    (`deepctr/models/deepfefm.py`)."""

    hidden_units: Sequence[int] = (256, 128, 64)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        s = _FEFMCore(self.embedding_dim)(field)
        flat = field.reshape(field.shape[0], -1)
        deep = self._mlp(self.hidden_units, output_dim=1,
                         dropout=self.dropout)(
            jnp.concatenate([flat, s.astype(flat.dtype)], axis=-1), train=train)
        return (self._first_order(lin).reshape(-1)
                + jnp.sum(s, axis=1).astype(jnp.float32)
                + deep.reshape(-1).astype(jnp.float32))


class ONN(_FieldAwareBase):
    """ONN/NFFM (`deepctr/models/onn.py`): field-aware pair inner products
    concatenated with per-feature embeddings, into a DNN, plus the
    first-order linear logit (`feature_column.py:141-170`)."""

    hidden_units: Sequence[int] = (400, 400)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        E = self._field_aware_stack(batch)
        F = E.shape[1]
        iu, ju = _pairs(F)
        prods = jnp.sum(E[:, iu, ju] * E[:, ju, iu], axis=-1)     # (B, P)
        flat = concat_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        x = jnp.concatenate([flat, prods.astype(flat.dtype)], axis=-1)
        logit = self._mlp(self.hidden_units, output_dim=1,
                          dropout=self.dropout)(x, train=train)
        return (self._first_order(lin).reshape(-1)
                + logit.reshape(-1).astype(jnp.float32))


class CCPM(_FieldModel):
    """Convolutional click prediction (`deepctr/models/ccpm.py`): Conv1d over
    the field axis + flexible p-max pooling per layer."""

    conv_kernel_widths: Sequence[int] = (6, 5)
    conv_filters: Sequence[int] = (4, 4)
    hidden_units: Sequence[int] = (128,)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        B, F, D = field.shape
        x = jnp.swapaxes(field, 1, 2).reshape(B * D, F, 1)  # conv along fields
        n = len(self.conv_filters)
        for i, (w, f) in enumerate(zip(self.conv_kernel_widths,
                                       self.conv_filters)):
            x = nn.Conv(f, kernel_size=(w,), padding="SAME",
                        name=f"conv{i}")(x)
            x = jnp.tanh(x)
            # flexible p-max pooling: keep top-k positions per channel
            L = x.shape[1]
            k = max(1, int((1 - (i + 1) / n) * L)) if i < n - 1 else 3
            k = min(k, L)
            x = jnp.swapaxes(jax.lax.top_k(jnp.swapaxes(x, 1, 2), k)[0], 1, 2)
        x = x.reshape(B, -1)
        logit = self._mlp(self.hidden_units, output_dim=1,
                          dropout=self.dropout)(x, train=train)
        # + first-order linear logit (`deepctr/models/ccpm.py` via
        # get_linear_logit, `feature_column.py:141-170`)
        return (self._first_order(lin).reshape(-1)
                + logit.reshape(-1).astype(jnp.float32))


class FGCNN(_FieldModel):
    """Feature-generation CNN (`deepctr/models/fgcnn.py`): conv+pool over the
    field map generates recombined synthetic fields; an inner-product model
    runs over [raw ‖ generated] fields."""

    conv_filters: Sequence[int] = (6, 8)
    conv_kernel_widths: Sequence[int] = (7, 7)
    new_maps: Sequence[int] = (3, 3)
    pooling_widths: Sequence[int] = (2, 2)
    hidden_units: Sequence[int] = (128, 64)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        B, F, D = field.shape
        x = field[..., None]                                  # (B, F, D, 1)
        new_fields = []
        for i, (f, w, m, p) in enumerate(zip(
                self.conv_filters, self.conv_kernel_widths,
                self.new_maps, self.pooling_widths)):
            x = nn.Conv(f, kernel_size=(w, 1), padding="SAME",
                        name=f"conv{i}")(x)
            x = jnp.tanh(x)
            x = nn.max_pool(x, window_shape=(p, 1), strides=(p, 1))
            Fi = x.shape[1]
            flatdim = Fi * f
            rec = nn.Dense(Fi * m * D, name=f"recombine{i}")(
                jnp.swapaxes(x, 2, 3).reshape(B, D, flatdim)
                .reshape(B, -1))
            new_fields.append(jnp.tanh(rec).reshape(B, Fi * m, D))
        all_fields = jnp.concatenate([field] + new_fields, axis=1)
        inner = InnerProduct()(all_fields)
        flat = all_fields.reshape(B, -1)
        xcat = jnp.concatenate([flat, inner.astype(flat.dtype)], axis=-1)
        logit = self._mlp(self.hidden_units, output_dim=1,
                          dropout=self.dropout)(xcat, train=train)
        # + first-order linear logit (`deepctr/models/fgcnn.py` via
        # get_linear_logit, `feature_column.py:141-170`)
        return (self._first_order(lin).reshape(-1)
                + logit.reshape(-1).astype(jnp.float32))


class FLEN(_FieldModel):
    """Field-leveraged embedding network (`deepctr/models/flen.py`): fields
    are grouped by their `source` tag; inter-group MF products + intra-group
    FM bi-interactions + a DNN stream."""

    hidden_units: Sequence[int] = (256, 128)
    dropout: float = 0.0

    def _groups(self) -> Tuple[Tuple[int, ...], ...]:
        feats = self.feature_map.input_features
        keys = []
        for f in feats:
            if f.source not in keys:
                keys.append(f.source)
        return tuple(tuple(i for i, f in enumerate(feats) if f.source == k)
                     for k in keys)

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        B = field.shape[0]
        groups = self._groups()
        g_sum, fm_parts = [], []
        for idx in groups:
            sub = field[:, jnp.asarray(idx)]
            g_sum.append(jnp.sum(sub, axis=1))
            fm_parts.append(0.5 * (jnp.square(jnp.sum(sub, axis=1))
                                   - jnp.sum(jnp.square(sub), axis=1)))
        gs = jnp.stack(g_sum, axis=1)                       # (B, G, D)
        G = gs.shape[1]
        if G > 1:
            iu, ju = _pairs(G)
            rw = self.param("mf_weight", nn.initializers.ones, (len(iu), 1))
            mf = jnp.sum(gs[:, iu] * gs[:, ju] * rw[None, :, :], axis=1)
        else:
            mf = jnp.zeros_like(gs[:, 0])
        fm = sum(fm_parts)
        deep = self._mlp(self.hidden_units, dropout=self.dropout)(
            field.reshape(B, -1), train=train)
        out = jnp.concatenate(
            [mf.astype(deep.dtype), fm.astype(deep.dtype), deep], axis=-1)
        logit = nn.Dense(1, kernel_init=nn.initializers.xavier_normal())(out)
        return (self._first_order(lin) + logit.astype(jnp.float32)).reshape(-1)


class IFM(_FieldModel):
    """Input-aware FM (`deepctr/models/ifm.py`): a factor-estimating network
    produces per-instance field importances that rescale both the linear and
    FM terms."""

    fen_hidden_units: Sequence[int] = (64, 64)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        B, F, D = field.shape
        m = self._mlp(self.fen_hidden_units, output_dim=F, name="fen",
                      dropout=self.dropout)(field.reshape(B, -1), train=train)
        m = jax.nn.softmax(m.astype(jnp.float32), axis=-1) * F  # (B, F)
        lin_stack = stack_embeddings(lin, self.feature_map.input_features)
        bias = self.param("bias", nn.initializers.zeros, (1,))
        first = jnp.sum(lin_stack[..., 0] * m, axis=1) + bias
        scaled = field * m[..., None].astype(field.dtype)
        fm = FactorizationMachine()(scaled).reshape(-1)
        return first.reshape(-1) + fm.astype(jnp.float32)


class DIFM(_FieldModel):
    """Dual input-aware FM (`deepctr/models/difm.py`): bit-wise (DNN) and
    vector-wise (multi-head self-attention) factor estimating networks."""

    fen_hidden_units: Sequence[int] = (64,)
    att_dim: int = 8
    num_heads: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        B, F, D = field.shape
        m_bit = self._mlp(self.fen_hidden_units, output_dim=F, name="fen_bit",
                          dropout=self.dropout)(field.reshape(B, -1),
                                                train=train)
        att = InteractingLayer(self.att_dim, self.num_heads,
                               name="fen_vec")(field)
        m_vec = nn.Dense(F, use_bias=False, name="fen_vec_out")(
            att.reshape(B, -1))
        m = (m_bit + m_vec).astype(jnp.float32)                       # (B, F)
        lin_stack = stack_embeddings(lin, self.feature_map.input_features)
        bias = self.param("bias", nn.initializers.zeros, (1,))
        first = jnp.sum(lin_stack[..., 0] * m, axis=1) + bias
        scaled = field * m[..., None].astype(field.dtype)
        fm = FactorizationMachine()(scaled).reshape(-1)
        return first.reshape(-1) + fm.astype(jnp.float32)


class _Regulation(nn.Module):
    """EDCN regulation module: temperature-softmax field gates
    (`deepctr/layers/core.py` RegulationModule)."""

    num_fields: int
    tau: float = 1.0

    @nn.compact
    def __call__(self, field):
        g = self.param("gate", nn.initializers.ones, (self.num_fields, 1))
        w = jax.nn.softmax(g / self.tau, axis=0)
        return (field * w[None]).reshape(field.shape[0], -1)


class EDCN(_FieldModel):
    """Enhanced DCN (`deepctr/models/edcn.py`): parallel cross/deep streams
    exchanging information through pointwise-product bridge modules, each
    stream re-gated by a regulation module per layer."""

    num_layers: int = 3
    bridge_type: str = "pointwise_addition"  # | 'hadamard_product'
    tau: float = 1.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        B, F, D = field.shape
        dim = F * D
        x0 = field.reshape(B, -1)
        xc = _Regulation(F, self.tau, name="reg_c0")(field)
        xd = _Regulation(F, self.tau, name="reg_d0")(field)
        for i in range(self.num_layers):
            w = nn.Dense(dim, name=f"cross{i}",
                         kernel_init=nn.initializers.xavier_normal())(xc)
            xc = x0 * w + xc
            xd = nn.Dense(dim, name=f"deep{i}")(xd)
            xd = jax.nn.relu(xd)
            bridge = (xc + xd if self.bridge_type == "pointwise_addition"
                      else xc * xd)
            if i < self.num_layers - 1:
                bf = bridge.reshape(B, F, D)
                xc = _Regulation(F, self.tau, name=f"reg_c{i + 1}")(bf)
                xd = _Regulation(F, self.tau, name=f"reg_d{i + 1}")(bf)
        out = jnp.concatenate([xc, xd, bridge], axis=-1)
        logit = nn.Dense(1, kernel_init=nn.initializers.xavier_normal())(out)
        # + first-order linear logit (`deepctr/models/edcn.py` via
        # get_linear_logit, `feature_column.py:141-170`)
        return (self._first_order(lin).reshape(-1)
                + logit.reshape(-1).astype(jnp.float32))


class MLR(_FieldModel):
    """Mixed logistic regression / LS-PLM (`deepctr/models/mlr.py`):
    p = Σ_m softmax(uᵀx)_m · σ(wᵀx)_m over m regions; returned as a logit
    for the shared BCE-on-logits loss path."""

    num_regions: int = 4

    @nn.compact
    def __call__(self, batch, train: bool = False):
        flat = concat_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        region = jax.nn.softmax(
            nn.Dense(self.num_regions, name="region")(flat), axis=-1)
        learner = jax.nn.sigmoid(
            nn.Dense(self.num_regions, name="learner")(flat))
        p = jnp.clip(jnp.sum(region * learner, axis=-1), 1e-7, 1 - 1e-7)
        return jnp.log(p / (1.0 - p)).astype(jnp.float32)


class _FiGNNLayer(nn.Module):
    """One FiGNN propagation step: attentional field graph + GRU state update
    with residual (recbole `fignn.py` GraphLayer)."""

    embedding_dim: int

    @nn.compact
    def __call__(self, h, w_adj, h0, cell):
        a = jnp.einsum("bfg,bgd->bfd",
                       w_adj, nn.Dense(self.embedding_dim, name="wp")(h))
        B, F, D = h.shape
        new_h, _ = cell(h.reshape(B * F, D), a.reshape(B * F, D))
        return new_h.reshape(B, F, D) + h0


class FiGNN(_FieldModel):
    """Field-interaction GNN (recbole `fignn.py`): self-attended field
    states propagate over a learned fully-connected field graph; per-field
    readout logits with attentional weights."""

    gnn_steps: int = 2
    att_dim: int = 16
    num_heads: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        B, F, D = field.shape
        h0 = InteractingLayer(D // self.num_heads, self.num_heads,
                              name="init_att")(field)
        h0 = nn.Dense(D, name="init_proj")(h0)
        # learned edge weights: leaky-relu attention on pair concat, softmax
        # over neighbors with the diagonal masked out
        src = nn.Dense(1, use_bias=False, name="att_src")(h0)     # (B, F, 1)
        dst = nn.Dense(1, use_bias=False, name="att_dst")(h0)
        e = jax.nn.leaky_relu(src + jnp.swapaxes(dst, 1, 2), 0.2)  # (B, F, F)
        eye = jnp.eye(F, dtype=bool)[None]
        w_adj = jax.nn.softmax(jnp.where(eye, -1e9, e), axis=-1)
        cell = nn.GRUCell(D, name="gru")
        h = h0
        layer = _FiGNNLayer(D, name="prop")
        for _ in range(self.gnn_steps):
            h = layer(h, w_adj, h0, cell)
        # attentional readout (`fignn.py:95-143` AttentionalPrediction):
        # per-field score mlp1(h_i) weighted by mlp2 over the FLATTENED
        # full state (Linear(F*D -> F), no bias, NO sigmoid — the
        # reference multiplies the raw weights)
        score = nn.Dense(1, use_bias=False, name="mlp1")(h)[..., 0]   # (B, F)
        weight = nn.Dense(F, use_bias=False, name="mlp2")(
            h.reshape(B, F * D))                                      # (B, F)
        return jnp.sum(score * weight, axis=1).astype(jnp.float32)


def _orders_init(key, shape, dtype=jnp.float32):
    """softmax(randn/0.01, axis=0) — near-one-hot columns, the reference's
    `init_orders` (`eulernet.py:106-111`)."""
    return jax.nn.softmax(jax.random.normal(key, shape, dtype) / 0.01, axis=0)


class _EulerLayer(nn.Module):
    """One Euler interaction layer (`eulernet.py:95-162`
    EulerInteractionLayer): explicit stream mixes log-modulus/phase across
    fields through `inter_orders` with bias_lam/bias_theta added INSIDE the
    mix (pre-exp / in the rotation angle); implicit stream is one SHARED
    linear over the flattened real/imag parts + relu; outputs add."""

    feature_dim: int
    out_fields: int
    apply_norm: bool = False
    drop_ex: float = 0.0
    drop_im: float = 0.0

    @nn.compact
    def __call__(self, r, p, train: bool = False):
        B, Fin, D = r.shape
        # explicit stream uses the PRE-dropout signal for lam/theta
        # (reference order: lam/theta computed, then drop_im on r/p)
        log_l = 0.5 * jnp.log(r * r + p * p + 1e-8)         # (B, Fin, D)
        theta = jnp.arctan2(p, r)
        log_l = nn.Dropout(self.drop_ex)(log_l, deterministic=not train)
        theta = nn.Dropout(self.drop_ex)(theta, deterministic=not train)
        orders = self.param("inter_orders", _orders_init,
                            (Fin, self.out_fields))
        bias_lam = self.param(
            "bias_lam", nn.initializers.normal(0.01),
            (1, D, self.out_fields))
        bias_theta = self.param(
            "bias_theta", nn.initializers.normal(0.01),
            (1, D, self.out_fields))
        lam_o = jnp.einsum("bfd,fg->bdg", log_l, orders) + bias_lam
        th_o = jnp.einsum("bfd,fg->bdg", theta, orders) + bias_theta
        lam_o = jnp.swapaxes(jnp.exp(lam_o), 1, 2)          # (B, Fout, D)
        th_o = jnp.swapaxes(th_o, 1, 2)
        # implicit stream: ONE linear shared by real and imag parts
        im_lin = nn.Dense(self.out_fields * D, name="im",
                          kernel_init=nn.initializers.normal(0.1))
        rd = nn.Dropout(self.drop_im)(r, deterministic=not train)
        pd = nn.Dropout(self.drop_im)(p, deterministic=not train)
        r_i = jax.nn.relu(im_lin(rd.reshape(B, -1))).reshape(
            B, self.out_fields, D)
        p_i = jax.nn.relu(im_lin(pd.reshape(B, -1))).reshape(
            B, self.out_fields, D)
        o_r = r_i + lam_o * jnp.cos(th_o)
        o_p = p_i + lam_o * jnp.sin(th_o)
        if self.apply_norm:
            o_r = nn.LayerNorm(name="norm_r")(o_r)
            o_p = nn.LayerNorm(name="norm_p")(o_p)
        return o_r, o_p


class EulerNet(_FieldModel):
    """EulerNet (recbole `eulernet.py:25-162`): adaptive-order interactions
    in complex space. Initial lift uses the EMBEDDING as the phase and a
    learned per-field modulus mu (`forward`: r = mu*cos(e), p = mu*sin(e));
    each layer mixes log-modulus/phase across fields (Euler's formula turns
    multiplicative crosses into additive transforms) with biases inside the
    rotation; the head applies ONE shared linear to the real and imag parts
    and sums (`reg(o_r) + reg(o_p)`)."""

    order_layers: Sequence[int] = (16, 16)   # fields-out per Euler layer
    apply_norm: bool = False
    dropout: float = 0.0                     # drop_ex = drop_im = dropout

    @nn.compact
    def __call__(self, batch, train: bool = False):
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        B, F, D = field.shape
        e = field.astype(jnp.float32)
        mu = self.param("mu", nn.initializers.ones, (1, F, 1))
        r, p = mu * jnp.cos(e), mu * jnp.sin(e)
        for i, f_out in enumerate(self.order_layers):
            r, p = _EulerLayer(D, f_out, apply_norm=self.apply_norm,
                               drop_ex=self.dropout, drop_im=self.dropout,
                               name=f"euler{i}")(r, p, train=train)
        reg = nn.Dense(1, kernel_init=nn.initializers.normal(0.01),
                       name="reg")
        logit = reg(r.reshape(B, -1)) + reg(p.reshape(B, -1))
        return logit.reshape(-1).astype(jnp.float32)


class DeepIM(_FieldModel):
    """Interaction machine + parallel DNN
    (`recbox/ranking/pytorch/layers/interactions/interaction_machine.py`)."""

    im_order: int = 3
    hidden_units: Sequence[int] = (256, 128)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        im = InteractionMachine(self.im_order)(field).reshape(-1)
        deep = self._mlp(self.hidden_units, output_dim=1,
                         dropout=self.dropout)(
            field.reshape(field.shape[0], -1), train=train).reshape(-1)
        return im.astype(jnp.float32) + deep.astype(jnp.float32)


class HFM(_FieldModel):
    """Holographic FM (`holographic_interaction.py`): circular conv/corr pair
    interactions; `deep=True` adds a DNN over them (HFM+)."""

    interaction_type: str = "circular_convolution"
    deep: bool = False
    hidden_units: Sequence[int] = (256, 128)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        lin = self._linear_embedding()(batch)
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        inter = HolographicInteraction(self.interaction_type)(field)
        if self.deep:
            out = self._mlp(self.hidden_units, output_dim=1,
                            dropout=self.dropout)(inter, train=train)
        else:
            B = field.shape[0]
            D = field.shape[2]
            out = jnp.sum(inter.reshape(B, -1, D), axis=(1, 2))[:, None]
        return (self._first_order(lin)
                + out.reshape(-1, 1).astype(jnp.float32)).reshape(-1)


class DCNMix(DCNv2):
    """DCN-Mix (`deepctr/models/dcnmix.py`): DCNv2 with the low-rank
    mixture-of-experts cross network."""

    use_low_rank_mixture: bool = True


class FNN(DNN):
    """FNN (`deepctr/models/fnn.py` shape): a deep tower over factorization
    embeddings. (The reference's FM-pretraining is an init strategy, not an
    architecture — load pretrained tables via FeatureSpec.pretrain_path.)"""
