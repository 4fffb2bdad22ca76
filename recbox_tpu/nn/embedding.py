"""Feature embedding engine (flax.linen).

TPU-first re-design of the reference's embedding layers
(`recbox/core/pytorch/layers/embedding.py:10-138` EmbeddingLayer /
EmbeddingDictLayer and `third_party/rechub/basic/layers.py:29-150`):

* one table per *table_name* — `share_embedding` features alias the same
  parameter (reference `embedding.py:44-55`);
* categorical → row lookup; numeric → value × learned d-vector (equivalent to
  the reference's bias-free Linear(1, d)); sequence → lookup + masked
  mean/sum pooling or raw (B, L, D) for attention models;
* `padding_idx` rows are zeroed by masking at lookup time (instead of relying
  on a zeroed parameter row, which an optimizer would un-zero);
* tables carry flax partitioning metadata ``(('data','model'), None)`` —
  row-sharded over the COMBINED device grid, so no replica of a table exists
  anywhere and per-step collective bytes stay batch-scaled (a 'model'-only
  spec replicates tables across 'data' and GSPMD then all-reduces a DENSE
  vocab-sized gradient across data shards; measured vocab-scaled in
  `tools/inspect_sharded_hlo.py`) — so a pjit over a
  Mesh(('data','model')) row-shards every vocabulary across the model axis —
  XLA then emits the gather + collectives over ICI (the reference has no
  analog; its tables are replicated nn.Embedding).

Lookups stay plain `jnp.take` so XLA can fuse them; a Pallas gather path for
very large tables lives in `recbox_tpu/ops/pallas`.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from recbox_tpu.features.schema import (
    CATEGORICAL, NUMERIC, SEQUENCE, FeatureMap, FeatureSpec,
)

__all__ = ["FeatureEmbedding", "concat_embeddings", "stack_embeddings",
           "masked_pool", "ROWS_PREFIX", "rows_key_for"]

# Sparse-update protocol: when a batch contains
# f"{ROWS_PREFIX}{module_path}:{feature}", the layer uses those pre-gathered
# embedding rows instead of creating/gathering its table param. Keys are
# scoped by the FeatureEmbedding module path because one model can embed the
# same feature through several modules of different widths (e.g. DeepFM's
# dim-D 'embedding' and dim-1 'linear'). The sparse trainer
# (`training/sparse.py`) gathers rows outside the differentiated function, so
# the backward pass produces compact (B, D) row gradients instead of a dense
# vocab-sized scatter.
ROWS_PREFIX = "__rows__"

# Block variant of the protocol: f"{BLOCK_PREFIX}{module_path}" carries ONE
# (F, B, D) array holding this module's pre-gathered rows for ALL of its
# categorical in-batch features, F-ordered by the schema
# (feature_map.input_features). Emitted by PackedEmbeddingTrainer when a
# pack's features are exactly the batch's categorical set: per-feature
# entries are then contiguous row blocks of the single packed gather, so
# the block is a free reshape+slice of it, the module's per-feature reads
# become slices XLA folds back into the block for feature-major consumers,
# and the backward pass yields one (F, B, D) gradient that reshapes
# directly into the (N, D) slot gradient (replacing a 26-way concat at
# bench shapes — part of the measured fwd/bwd slack, tools/prof_fwdbwd.py).
BLOCK_PREFIX = "__rows_block__"


def rows_key_for(module_path, feature_name: str) -> str:
    return ROWS_PREFIX + "/".join(module_path) + ":" + feature_name


def rows_block_key(module_path) -> str:
    return BLOCK_PREFIX + "/".join(module_path)


def emb_init(std: float = 1e-4):
    """normal(std=1e-4) — the reference regime (`match_model.py:91-114`)."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


def _load_pretrained_matrix(path: str) -> np.ndarray:
    """Load a (vocab, dim) matrix from .npy, or .npz (key 'embeddings'
    preferred, else the single array)."""
    data = np.load(path, allow_pickle=False)
    if isinstance(data, np.ndarray):
        return data
    keys = list(data.keys())
    key = "embeddings" if "embeddings" in keys else keys[0]
    if "embeddings" not in keys and len(keys) > 1:
        raise ValueError(
            f"pretrained npz {path!r} has multiple arrays {keys}; store "
            "the matrix under the key 'embeddings'")
    return data[key]


def _pretrained_init(path: str, rows: int, dim: int, fallback):
    """Initializer that fills the leading rows from a pretrained matrix
    (`FeatureSpec.pretrain_path`); rows beyond the file (PAD/shared-vocab
    extension) keep the fallback draw. Reference load semantics:
    `recbox/core/pytorch/layers/embedding.py:30-107`."""
    def init(key, shape, dtype=jnp.float32):
        arr = _load_pretrained_matrix(path)
        if arr.ndim != 2 or arr.shape[1] != dim:
            raise ValueError(
                f"pretrained matrix {path!r} has shape {arr.shape}; "
                f"expected (<= {rows}, {dim})")
        if arr.shape[0] > rows:
            raise ValueError(
                f"pretrained matrix {path!r} has {arr.shape[0]} rows but "
                f"the table only has {rows}")
        base = fallback(key, shape, dtype)
        return base.at[:arr.shape[0]].set(jnp.asarray(arr, dtype))
    return init


def masked_pool(seq_emb: jnp.ndarray, mask: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Pool (B, L, D) under a (B, L) validity mask.

    Reference: MaskedAveragePooling / MaskedSumPooling
    (`recbox/core/pytorch/layers/sequence.py:4-19`).
    """
    mask = mask.astype(seq_emb.dtype)[..., None]
    summed = jnp.sum(seq_emb * mask, axis=1)
    if mode == "sum":
        return summed
    if mode == "mean":
        counts = jnp.maximum(jnp.sum(mask, axis=1), 1e-12)
        return summed / counts
    raise ValueError(f"unknown pooling mode {mode!r}")


class FeatureEmbedding(nn.Module):
    """Embeds a batch dict into {feature_name: (B, D) or (B, L, D)} arrays.

    Attributes:
      feature_map: schema.
      source: restrict to one tower ('user'/'item'); None embeds everything.
      embedding_dim: override all per-feature dims with one width (needed by
        field-interaction models that stack fields into (B, F, D)).
      sequence_pooling: if False, sequence features stay (B, L, D) regardless
        of their spec pooling (used by DIN/SASRec-style attention models).
      param_dtype / dtype: storage vs compute precision (bfloat16 compute by
        default keeps MXU-friendly math; params stay fp32 for optimizer
        stability).
    """

    feature_map: FeatureMap
    source: Optional[str] = None
    embedding_dim: Optional[int] = None
    sequence_pooling: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    shard_tables: bool = True
    # table init: 'normal' (std=emb_init_std, the recbox matching regime,
    # `match_model.py:91-114`) or 'xavier_normal' (recbole's
    # xavier_normal_initialization — required for recbole quality parity)
    emb_init_scheme: str = "normal"
    emb_init_std: float = 1e-4

    def _features(self) -> Tuple[FeatureSpec, ...]:
        if self.source is None:
            return self.feature_map.input_features
        return self.feature_map.by_source(self.source)

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats = self._features()
        # one param per distinct table; shared features resolve to it
        tables: Dict[str, jnp.ndarray] = {}
        out: Dict[str, jnp.ndarray] = {}
        # block protocol (see BLOCK_PREFIX): one (F, B, D) array covering
        # every categorical in-batch feature, schema-ordered; cast ONCE so
        # per-feature reads stay pure slices of one array
        block = batch.get(rows_block_key(self.path))
        if block is not None:
            block = block.astype(self.dtype)
        block_i = 0

        def get_table(spec: FeatureSpec, dim: int) -> jnp.ndarray:
            tname = spec.table_name
            if tname in tables:
                return tables[tname]
            owner = self.feature_map.feature_dict.get(tname, spec)
            # shared sequence features add a PAD row beyond the base vocab
            rows = max(owner.vocab_size, spec.vocab_size)
            pretrain = owner.pretrain_path
            for f in self.feature_map.features:
                if f.table_name == tname:
                    rows = max(rows, f.vocab_size)
                    pretrain = pretrain or f.pretrain_path
            if self.emb_init_scheme == "xavier_normal":
                init = nn.initializers.xavier_normal()
            elif self.emb_init_scheme == "xavier_uniform":
                init = nn.initializers.xavier_uniform()
            elif self.emb_init_scheme == "normal":
                init = emb_init(self.emb_init_std)
            else:
                # same guard as _GraphBase._table_init: a typo silently
                # falling back to normal(1e-4) would confound exactly the
                # init-parity experiments the schemes exist for
                raise NotImplementedError(
                    f"emb_init_scheme={self.emb_init_scheme!r}: expected "
                    "'normal' | 'xavier_normal' | 'xavier_uniform'")
            if pretrain:
                # pretrained load semantics (`embedding.py:30-107`): file
                # vectors fill the leading rows, remaining rows (PAD/extra)
                # keep the default draw
                init = _pretrained_init(pretrain, rows, dim, init)
            # per-table placement: FeatureSpec.shard_table overrides the
            # module default — False replicates a small/hot table on every
            # device (its tiny grad all-reduce beats the id/row exchange;
            # `parallel.placement.plan_table_placement` makes the call)
            shard = owner.shard_table if owner.shard_table is not None \
                else self.shard_tables
            if shard:
                init = nn.with_partitioning(init, (("data", "model"), None))
            table = self.param(f"emb_{tname}", init, (rows, dim), self.param_dtype)
            tables[tname] = table
            return table

        def is_frozen(spec: FeatureSpec) -> bool:
            tname = spec.table_name
            owner = self.feature_map.feature_dict.get(tname, spec)
            return owner.freeze_emb or spec.freeze_emb

        for spec in feats:
            dim = self.embedding_dim or spec.embedding_dim
            name = spec.name
            if name not in batch:
                continue
            x = batch[name]
            if spec.type == NUMERIC:
                w = self.param(f"num_{name}", nn.initializers.xavier_normal(),
                               (1, dim), self.param_dtype)
                out[name] = (x.astype(self.dtype)[:, None]
                             * jnp.asarray(w, self.dtype))
            elif spec.type == CATEGORICAL:
                rows_key = rows_key_for(self.path, name)
                if block is not None:
                    emb = block[block_i]
                    block_i += 1
                elif rows_key in batch:
                    emb = batch[rows_key].astype(self.dtype)
                else:
                    # gather in param dtype, cast the (small) result — casting
                    # the whole table first would stream every row via the VPU
                    emb = jnp.take(jnp.asarray(get_table(spec, dim)), x,
                                   axis=0).astype(self.dtype)
                if is_frozen(spec):
                    # freeze_emb: no gradient reaches the table (covers the
                    # dense path AND the sparse/packed trainers' injected
                    # __rows__, whose row grads become exact zeros)
                    emb = jax.lax.stop_gradient(emb)
                if spec.padding_idx is not None:
                    emb = emb * (x != spec.padding_idx).astype(self.dtype)[..., None]
                out[name] = emb
            elif spec.type == SEQUENCE:
                rows_key = rows_key_for(self.path, name)
                if rows_key in batch:
                    emb = batch[rows_key].astype(self.dtype)  # (B, L, D)
                else:
                    emb = jnp.take(jnp.asarray(get_table(spec, dim)), x,
                                   axis=0).astype(self.dtype)  # (B, L, D)
                if is_frozen(spec):
                    emb = jax.lax.stop_gradient(emb)
                pad = spec.padding_idx if spec.padding_idx is not None else spec.vocab_size - 1
                mask = (x != pad)
                emb = emb * mask.astype(self.dtype)[..., None]
                if self.sequence_pooling and spec.pooling in ("mean", "sum"):
                    out[name] = masked_pool(emb, mask, spec.pooling)
                elif self.sequence_pooling and spec.pooling == "concat":
                    out[name] = emb.reshape(emb.shape[0], -1)
                else:
                    out[name] = emb
        return out


def concat_embeddings(emb_dict: Dict[str, jnp.ndarray], feats: Tuple[FeatureSpec, ...]) -> jnp.ndarray:
    """Concatenate per-feature embeddings into one flat (B, sum_dim) tensor.

    Deterministic feature order (schema order) — reference `dict2tensor`
    (`embedding.py:120-138`). 3-D entries are flattened.
    """
    parts = []
    for spec in feats:
        if spec.name not in emb_dict:
            continue
        e = emb_dict[spec.name]
        if e.ndim == 3:
            e = e.reshape(e.shape[0], -1)
        parts.append(e)
    return jnp.concatenate(parts, axis=-1)


def stack_embeddings(emb_dict: Dict[str, jnp.ndarray], feats: Tuple[FeatureSpec, ...]) -> jnp.ndarray:
    """Stack equal-width field embeddings into (B, F, D) for interaction layers."""
    parts = []
    for spec in feats:
        if spec.name not in emb_dict:
            continue
        e = emb_dict[spec.name]
        if e.ndim == 3:
            # a pooled view is required for field stacking. Padding steps
            # arrive zero-masked from FeatureEmbedding, so divide by the
            # VALID count (an unmasked mean over L dilutes short histories)
            valid = jnp.any(e != 0, axis=-1).astype(e.dtype)       # (B, L)
            counts = jnp.maximum(jnp.sum(valid, axis=1), 1.0)
            e = jnp.sum(e, axis=1) / counts[:, None]
        parts.append(e)
    return jnp.stack(parts, axis=1)
