"""Packed embedding training: one gather + one scatter per step, total.

Why: on TPU, random-row gather/scatter from HBM is *latency-bound per row*
(~12-19 ns/row measured on v5e, `tools/prof_embedding_update.py`), so step
cost scales with the NUMBER of row operations, not bytes. The reference
regime (DeepFM-style CTR) pays, per feature: a dim-D gather ('embedding'
module), a dim-1 gather ('linear' module), a dense vocab-sized grad scatter
for each, and a dense Adam sweep over every row. `SparseEmbeddingTrainer`
removes the dense sweeps but still issues per-table gathers/scatters plus
separate accumulator traffic.

This trainer packs, for each vocabulary, ALL of its embedding columns across
modules plus one AdaGrad accumulator scalar per module into a single
physical row:

    [ emb_D columns | linear_1 column | acc_emb | acc_linear ]   (per row)

and stacks every same-layout vocabulary into one tall (ΣV, W) array with row
offsets. f32 rows pad to 128 lanes on TPU — for D=64 the packed layout fits
entirely in lanes the padding was already wasting, so the extra columns are
FREE in both HBM footprint and row-op bytes. One `jnp.take` per step fetches
rows + optimizer state for every feature and module at once; one
`.at[ids].add` writes back the AdaGrad delta and the accumulator increment.
Row-update traffic drops from O(#tables × row-ops) to exactly 2 row-ops per
example-feature, and the dense-optimizer HBM sweep disappears entirely.

Optimizer semantics: row-wise AdaGrad (the DLRM/production-recsys standard).
Duplicate ids in one batch scatter-ADD their deltas; each duplicate's
denominator uses v_pre + its own g² (per-example AdaGrad) rather than the
post-accumulation v an exact two-pass update would use — the two-pass
variant costs 3 row-ops/step instead of 2 and the difference is a slightly
smaller denominator on duplicate ids only. (Sort+segment dedup before the
scatter was measured and REJECTED: argsort of 851k ids alone costs 13 ms
and the full dedup pipeline 64 ms, while the plain scatter is nearly
duplicate-insensitive — 20.0 ms on Zipf-skewed ids at 9% unique vs 17.9 ms
uniform; `tools/prof_dedup_scatter.py`.) Embedding rows are exempt from
global-norm clipping (dense params keep the reference's clip=10,
`ranking_model.py:137`).

If packing the accumulator columns would cross a 128-lane boundary (value
columns already a multiple of 128), accumulators live in a separate (ΣV, S)
array instead of blowing up the pack's padded width.

Restriction (same as `SparseEmbeddingTrainer`): categorical/sequence
features must flow through `FeatureEmbedding` modules (the `__rows__`
protocol in `nn/embedding.py`), with the schema on `model.feature_map`.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recbox_tpu.features.schema import CATEGORICAL, SEQUENCE
from recbox_tpu.nn.embedding import rows_key_for
from recbox_tpu.training.sparse import _merge_params, split_sparse_params
from recbox_tpu.training.trainer import Trainer

logger = logging.getLogger("recbox_tpu")

__all__ = ["PackedEmbeddingTrainer"]


class _Slot:
    """One module-table position inside a pack's row layout."""

    __slots__ = ("module_path", "dim", "col_start", "acc_col")

    def __init__(self, module_path: tuple, dim: int, col_start: int,
                 acc_col: int):
        self.module_path = module_path
        self.dim = dim
        self.col_start = col_start
        self.acc_col = acc_col  # column in the pack, or slot index if split


class _Bundle:
    """All tables sharing one vocabulary (tname), packed into pack rows
    [row_offset, row_offset + rows)."""

    __slots__ = ("tname", "row_offset", "rows", "table_keys", "features")

    def __init__(self, tname, row_offset, rows, table_keys, features):
        self.tname = tname
        self.row_offset = row_offset
        self.rows = rows
        self.table_keys = table_keys  # per slot: key into table_paths
        self.features = features      # feature names routed to this bundle


class _NoInitTx:
    """Stub that skips optax state allocation during the parent's init()
    (table-leaf Adam moments would be vocab-sized)."""

    def __init__(self, tx):
        self._tx = tx

    def init(self, params):
        return None


class PackedEmbeddingTrainer(Trainer):
    """Trainer with packed-row embeddings + in-row AdaGrad state.

    Extra knobs: ``embedding_lr`` (default = config.learning_rate),
    ``adagrad_init`` / ``adagrad_eps``; ``direct_init`` (None = auto) picks
    the big-vocab init path that never materializes dense tables;
    ``table_initializer(key, shape)`` overrides the direct path's draw
    (default normal std=1e-4, `FeatureEmbedding`'s default scheme).
    """

    def __init__(self, *args, embedding_lr: float = None,
                 adagrad_init: float = 0.0, adagrad_eps: float = 1e-8,
                 direct_init: bool = None, table_initializer=None,
                 embedding_optimizer: str = "adagrad",
                 adam_b1: float = 0.9, adam_b2: float = 0.999,
                 delta_kernel: str = "auto", block_rows: bool = False,
                 **kwargs):
        super().__init__(*args, **kwargs)
        if embedding_optimizer not in ("adagrad", "adam"):
            raise NotImplementedError(
                f"embedding_optimizer={embedding_optimizer!r}")
        if delta_kernel not in ("auto", "pallas", "xla"):
            raise NotImplementedError(f"delta_kernel={delta_kernel!r}")
        # 'pallas': assemble the scatter operand with the fused one-pass
        # kernel (`ops/pallas/packed_delta.py`) for AdaGrad acc-in-row
        # packs; 'xla': the jnp chain; 'auto': the measured winner = 'xla'
        # (v5e 2026-08-18 A/B at bench shapes: xla 37.75 ms/step, pallas
        # 39.51 — XLA fuses the delta chain into the scatter's operand
        # computation, so a pre-scatter kernel only adds a (N, 128) f32
        # HBM round trip; envelope in packed_delta.py).
        self.delta_kernel = delta_kernel
        # block_rows: emit each slot's rows as ONE schema-ordered (F, B, D)
        # block (nn/embedding.py BLOCK_PREFIX) instead of per-feature
        # entries. Measured LOSS at bench shapes both ways it was tried
        # (v5e 2026-08-18): (a) module re-slices the block per feature —
        # 40.1-40.4 vs 36.9 ms/step (XLA does NOT fold the stack-of-slices
        # back into the block, so both materialize); (b) DeepFM's
        # stack-free fast path (`_feature_major_block_logit`, run-split
        # FM/einsum, no (F, B, D) ever built) — still 38.96 vs 36.56
        # ms/step. The per-feature slices XLA plans itself beat every
        # hand-staged block formulation measured. Kept opt-in with parity
        # tests (test_packed_block_rows_*) as the measured-negative record.
        self.block_rows = block_rows
        self.embedding_lr = embedding_lr
        self._emb_lr = None      # resolved at step build; plateau-decayed
        self.adagrad_init = adagrad_init
        self.adagrad_eps = adagrad_eps
        self.direct_init = direct_init
        self.table_initializer = table_initializer
        # 'adagrad': one scalar of state per slot, usually free in the
        # row's 128-lane padding. 'adam': LAZY Adam — per-element m and v
        # packed as [values | m | v] (state decays only at touched rows, the
        # standard sparse-Adam semantics); 3x the value columns but still
        # ONE gather + ONE scatter, vs dense Adam's 3 separately-padded
        # arrays + full-table sweep. Measured at bench shapes (v5e, same
        # run): adagrad 763k ex/s, adam 421k (wider rows), dense Adam 479k —
        # pick adagrad for throughput/capacity, adam for optimizer parity.
        self.embedding_optimizer = embedding_optimizer
        self.adam_b1 = adam_b1
        self.adam_b2 = adam_b2
        self.packs: Dict[str, jnp.ndarray] = {}
        self.accs: Dict[str, jnp.ndarray] = {}     # only for split-acc packs
        self._slots: Dict[str, List[_Slot]] = {}
        self._bundles: Dict[str, List[_Bundle]] = {}
        self._acc_in_row: Dict[str, bool] = {}
        self._pack_store_width: Dict[str, int] = {}
        self._value_width: Dict[str, int] = {}
        self._table_paths: Dict[str, tuple] = {}

    # -- layout construction --------------------------------------------------
    def _plan_layout(self, table_shapes: Dict[str, tuple],
                     paths: Dict[str, tuple], sample_batch) -> None:
        """Fill _slots/_bundles/_acc_in_row from {table_key: (rows, dim)}."""
        fm = self.model.feature_map
        self._table_paths = dict(paths)
        by_tname: Dict[str, List[Tuple[str, tuple, int, int]]] = {}
        for tkey in sorted(table_shapes):
            path = paths[tkey]
            tname = path[-1][len("emb_"):]
            rows, dim = table_shapes[tkey]
            by_tname.setdefault(tname, []).append(
                (tkey, path[:-1], int(rows), int(dim)))

        # group bundles by identical (module_path, dim) signature
        groups: Dict[tuple, List[str]] = {}
        for tname, slots in by_tname.items():
            rows0 = slots[0][2]
            if any(s[2] != rows0 for s in slots):
                raise ValueError(f"tables for {tname!r} disagree on rows")
            sig = tuple((s[1], s[3]) for s in slots)
            groups.setdefault(sig, []).append(tname)

        self._slots, self._bundles, self._acc_in_row = {}, {}, {}
        self._pack_store_width = {}
        self._value_width = {}
        for sig, tnames in sorted(groups.items(), key=lambda kv: str(kv[0])):
            w_val = sum(d for _, d in sig)
            n_slots = len(sig)
            if self.embedding_optimizer == "adam":
                # [values | m | v]: per-element state always rides in-row
                acc_in_row = True
                state_w = 2 * w_val
            else:
                state_w = n_slots
                # free iff the acc columns stay within the 128-lane padding
                acc_in_row = (-(-(w_val + state_w) // 128)
                              == -(-w_val // 128))
            pack_name = "pack_" + "_".join(
                f"{'/'.join(mp)}x{d}" for mp, d in sig)
            slots, col = [], 0
            for i, (mp, d) in enumerate(sig):
                slots.append(_Slot(mp, d, col,
                                   (w_val + i) if acc_in_row else i))
                col += d
            bundles, row = [], 0
            for tname in sorted(tnames):
                tks = [s[0] for s in by_tname[tname]]
                rows = by_tname[tname][0][2]
                feats = tuple(
                    f.name for f in fm.input_features
                    if f.type in (CATEGORICAL, SEQUENCE)
                    and f.table_name == tname and f.name in sample_batch)
                bundles.append(_Bundle(tname, row, rows, tks, feats))
                row += rows
            self._slots[pack_name] = slots
            self._bundles[pack_name] = bundles
            self._acc_in_row[pack_name] = acc_in_row
            # store the pack at its (8,128)-tile padded width: a 67-wide f32
            # array is stored COMPACT between programs but tiled to 128
            # lanes inside them, forcing a layout-change copy at program
            # entry that defeats donation and transiently doubles HBM
            # (observed: 6.49G arg + 12.40G temp for a 12.4G pack). With the
            # width explicit, stored layout == compiled layout, the donated
            # pack aliases in place, and peak HBM is the pack alone.
            used = w_val + state_w if acc_in_row else w_val
            self._pack_store_width[pack_name] = -(-used // 128) * 128
            self._value_width[pack_name] = w_val
        # block-rows eligibility (see nn/embedding.py BLOCK_PREFIX): emit
        # each slot's rows as ONE (F, B, D) schema-ordered block when the
        # single pack's routed features are exactly the batch's categorical
        # set of 1-D columns (no sequences, no shape mixing) and slot
        # module paths are unique. The per-feature reads become slices XLA
        # folds back into the block; the bwd yields one reshapeable
        # gradient instead of an F-way concat.
        self._block_mode = {}
        cat_in_batch = [f.name for f in fm.input_features
                        if f.type == CATEGORICAL and f.name in sample_batch]
        for pname, bundles in self._bundles.items():
            routed = [f for b in bundles for f in b.features]
            slots = self._slots[pname]
            routed_specs = [f for f in fm.input_features if f.name in routed]
            eligible = (
                self.block_rows
                and len(self._bundles) == 1
                and sorted(routed) == sorted(cat_in_batch)
                and all(np.ndim(sample_batch[f]) == 1 for f in routed)
                and len({s.module_path for s in slots}) == len(slots)
                # the model's block fast path reads raw rows — padding
                # masks and freeze stop_gradients live in the module's
                # per-feature path, so gate them out here
                and all(f.padding_idx is None and not f.freeze_emb
                        for f in routed_specs)
            )
            self._block_mode[pname] = eligible
            if eligible:
                # gather in SCHEMA order so the block's F axis matches the
                # module's iteration order (feature_map.input_features)
                offs = {f: b.row_offset for b in bundles for f in b.features}
                self._gather_order = {
                    pname: [(f, offs[f]) for f in cat_in_batch]}
        orphans = [b.tname for bl in self._bundles.values() for b in bl
                   if not b.features]
        if orphans:
            raise ValueError(
                "these emb_* params have no feature routed through the "
                f"__rows__ protocol (FeatureEmbedding): {sorted(orphans)}; "
                "PackedEmbeddingTrainer requires all categorical/sequence "
                "features to flow through FeatureEmbedding modules")

    @property
    def _use_delta_kernel(self) -> bool:
        # 'auto' resolves to the jnp chain: measured LOSS for the Pallas
        # kernel at bench shapes (see __init__ comment / packed_delta.py)
        return self.delta_kernel == "pallas"

    def _pack_width(self, pname: str) -> int:
        slots = self._slots[pname]
        w_val = sum(s.dim for s in slots)
        return w_val + len(slots) if self._acc_in_row[pname] else w_val

    def _packed_physical_bytes(self) -> int:
        """HBM footprint of all packs under (8, 128) f32 tiling."""
        return sum(sum(b.rows for b in self._bundles[p])
                   * self._pack_store_width[p] * 4
                   for p in self._bundles)

    def init(self, sample_batch) -> None:
        from recbox_tpu.models.base import MatchingModel
        if isinstance(self.model, MatchingModel):
            # MatchingModel.__call__ rebuilds item sub-batches
            # (extract_item_batch strips the item:: prefix and flattens),
            # so externally gathered __rows__ keys never reach the item
            # tower — the item table would silently stop training
            raise NotImplementedError(
                "PackedEmbeddingTrainer does not support MatchingModel "
                "towers (item features flow through extract_item_batch, "
                "bypassing the __rows__ protocol); use Trainer")
        # discover the full param tree ABSTRACTLY (no device allocation) so
        # the layout and the init strategy can be chosen before any table
        # bytes exist
        rng = jax.random.fold_in(self._rng, 0)
        batch = {k: jax.ShapeDtypeStruct(np.asarray(v).shape,
                                         np.asarray(v).dtype)
                 for k, v in sample_batch.items()}
        init_kwargs = {}
        if self.train_method is not None:
            init_kwargs["method"] = getattr(self.model, self.train_method)
        abstract = jax.eval_shape(
            lambda r, b: self.model.init({"params": r, "dropout": r}, b,
                                         train=True, **init_kwargs),
            rng, batch)
        import flax
        abs_params = flax.linen.meta.unbox(
            flax.core.unfreeze(abstract)["params"])
        _, abs_tables, paths = split_sparse_params(abs_params)
        if not abs_tables:
            logger.warning("PackedEmbeddingTrainer found no emb_* tables; "
                           "falling back to dense training")
            super().init(sample_batch)
            return
        self._plan_layout({k: v.shape for k, v in abs_tables.items()},
                          paths, sample_batch)

        use_direct = self.direct_init
        if use_direct is None:
            # the exact path materializes dense tables AND the pack: pick
            # direct init when 2x the packed bytes would crowd HBM
            use_direct = self._packed_physical_bytes() * 2 > 8 * 2 ** 30
        if use_direct:
            scheme = getattr(self.model, "emb_init_scheme", "normal")
            if self.table_initializer is None and scheme != "normal":
                # the direct path draws normal(1e-4) and never runs the
                # module's initializer — silently replacing e.g.
                # xavier_normal (~1000x larger std) would regress quality
                # the moment a config crosses the size threshold
                raise ValueError(
                    f"direct_init draws normal(std=1e-4) but the model "
                    f"specifies emb_init_scheme={scheme!r}; pass "
                    "table_initializer= matching the model's scheme (or "
                    "direct_init=False to keep the exact init path)")
            self._init_direct(sample_batch)
        else:
            self._init_exact(sample_batch)
        if self.mesh is not None:
            # row-shard every pack over the COMBINED (data x model) grid —
            # no device holds a table replica, so GSPMD partitions the
            # step's gather/scatter with batch-scaled collectives (id/row
            # exchange). A 'model'-only spec replicates rows across 'data'
            # and forces a vocab-sized dense-gradient all-reduce
            # (tools/inspect_sharded_hlo.py measures both patterns).
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard = NamedSharding(self.mesh, P(("data", "model"), None))
            self.packs = {k: jax.device_put(v, shard)
                          for k, v in self.packs.items()}
            self.accs = {k: jax.device_put(v, shard)
                         for k, v in self.accs.items()}
        n_rows = sum(int(p.shape[0]) for p in self.packs.values())
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(self.params))
        logger.info("packed embedding training (%s init): %d packs, %s "
                    "table rows, %s dense params, acc-in-row: %s",
                    "direct" if use_direct else "exact", len(self.packs),
                    f"{n_rows:,}", f"{n_params:,}",
                    dict(self._acc_in_row))

    def _init_exact(self, sample_batch) -> None:
        """Run the model's real init, then re-layout its tables into packs.

        Values match `Trainer.init` exactly, but dense tables and the packs
        coexist transiently — peak HBM ≈ 2x the table bytes. Table-leaf Adam
        state is never allocated (the optax state is built on the dense
        subtree only)."""
        tx, self.tx = self.tx, _NoInitTx(self.tx)   # defer opt-state init
        try:
            super().init(sample_batch)
        finally:
            self.tx = tx
        dense, tables, _ = split_sparse_params(self.params)
        self.params = dense
        self.opt_state = self.tx.init(self.params)
        self.packs, self.accs = {}, {}
        for pname, bundles in self._bundles.items():
            n_slots = len(self._slots[pname])
            store_w = self._pack_store_width[pname]
            parts, row = [], 0
            for b in bundles:
                vals = [tables[tk] for tk in b.table_keys]
                used = sum(int(v.shape[1]) for v in vals)
                if self.embedding_optimizer == "adagrad" \
                        and self._acc_in_row[pname]:
                    vals.append(jnp.full((b.rows, n_slots),
                                         self.adagrad_init, jnp.float32))
                    used += n_slots
                # adam m/v state initializes to 0 via the zero tile-pad
                if used < store_w:
                    vals.append(jnp.zeros((b.rows, store_w - used),
                                          jnp.float32))
                parts.append(jnp.concatenate(vals, axis=1))
                for tk in b.table_keys:
                    del tables[tk]
                row += b.rows
            self.packs[pname] = jnp.concatenate(parts, axis=0)
            if not self._acc_in_row[pname]:
                self.accs[pname] = jnp.full((row, n_slots),
                                            self.adagrad_init, jnp.float32)

    def _init_direct(self, sample_batch) -> None:
        """Initialize packs ON DEVICE without ever materializing dense
        tables (the big-vocab path: peak HBM ≈ the packed bytes alone).

        Dense params come from `model.init` with every routed feature's
        `__rows__` key stuffed into the batch, so `FeatureEmbedding` never
        creates table params (`nn/embedding.py` rows protocol). Table values
        are drawn directly into the pack with `table_initializer` (default:
        normal std=1e-4, `FeatureEmbedding`'s default scheme — pass the
        model's actual initializer when it differs, e.g. xavier_normal for
        recbole-parity models)."""
        from recbox_tpu.nn.embedding import emb_init
        table_init = self.table_initializer or emb_init(1e-4)

        rng, self._rng = jax.random.split(self._rng)
        stuffed = dict(sample_batch)
        for pname, bundles in self._bundles.items():
            for b in bundles:
                for fname in b.features:
                    shape = np.asarray(sample_batch[fname]).shape
                    for s in self._slots[pname]:
                        stuffed[rows_key_for(s.module_path, fname)] = \
                            np.zeros(shape + (s.dim,), np.float32)
        super().init(stuffed)
        dense, leftovers, _ = split_sparse_params(self.params)
        if leftovers:
            # tables NOT reachable through the rows protocol (e.g. a model
            # embedding a feature absent from the batch) — keep them dense
            raise ValueError(
                "direct_init could not route these tables through the "
                f"__rows__ protocol: {sorted(leftovers)}")
        self.params = dense
        self.opt_state = self.tx.init(self.params)

        self.packs, self.accs = {}, {}
        for pname, bundles in self._bundles.items():
            slots = self._slots[pname]
            n_slots = len(slots)
            store_w = self._pack_store_width[pname]
            total_rows = sum(b.rows for b in bundles)
            if self.embedding_optimizer == "adagrad" \
                    and self._acc_in_row[pname] and self.adagrad_init:
                pack = jnp.full((total_rows, store_w), self.adagrad_init,
                                jnp.float32)
            else:
                pack = jnp.zeros((total_rows, store_w), jnp.float32)

            # draw INSIDE the donated fill so each bundle's transient
            # depends on the previous fill's output — the host cannot race
            # ahead and pile up per-bundle value buffers in HBM
            def make_fill(slots, acc_in_row, n_slots, store_w):
                @partial(jax.jit, static_argnames=("rows",),
                         donate_argnums=(0,))
                def fill(pack, key, off, rows):
                    cols = [table_init(jax.random.fold_in(key, i),
                                       (rows, s.dim))
                            for i, s in enumerate(slots)]
                    used = sum(s.dim for s in slots)
                    if acc_in_row and self.embedding_optimizer == "adagrad":
                        cols.append(jnp.full((rows, n_slots),
                                             self.adagrad_init, jnp.float32))
                        used += n_slots
                    # adam m/v state initializes to 0 via the zero tile-pad
                    if used < store_w:
                        cols.append(jnp.zeros((rows, store_w - used),
                                              jnp.float32))
                    vals = jnp.concatenate(cols, axis=1)
                    return jax.lax.dynamic_update_slice(pack, vals, (off, 0))
                return fill

            fill = make_fill(tuple(slots), self._acc_in_row[pname], n_slots,
                             store_w)
            pack_rng = jax.random.fold_in(rng, len(self.packs))
            for bi, b in enumerate(bundles):
                key = jax.random.fold_in(pack_rng, bi)
                pack = fill(pack, key, jnp.int32(b.row_offset), rows=b.rows)
            self.packs[pname] = pack
            if not self._acc_in_row[pname]:
                self.accs[pname] = jnp.full((total_rows, n_slots),
                                            self.adagrad_init, jnp.float32)

    # -- gather/update as pure functions over (packs, accs) -------------------
    @property
    def _rows_dtype(self):
        """dtype the row slices are handed to the model in: the model's
        compute dtype. When the model runs bf16 (the bench regime), slicing
        out of the gathered block directly in bf16 halves the bytes of the
        slice/stack passes AND of the row-grad concat on the way back —
        ~2 ms/step at Criteo shapes — and merely moves the cast the model
        was doing anyway. Pack values/optimizer state stay f32 (master
        weights)."""
        if getattr(self.model, "compute_dtype", None) == "bfloat16":
            return jnp.bfloat16
        return jnp.float32

    def _gather_rows(self, packs, accs, batch):
        """Returns (rows_dict for the batch, per-pack update context)."""
        from recbox_tpu.nn.embedding import rows_block_key
        rows, ctx = {}, {}
        rdtype = self._rows_dtype
        for pname, bundles in self._bundles.items():
            slots = self._slots[pname]
            block_mode = getattr(self, "_block_mode", {}).get(pname, False)
            segs = []     # (fname, bundle, flat_len, orig_shape)
            ids = []
            if block_mode:
                for fname, row_offset in self._gather_order[pname]:
                    x = batch[fname]
                    ids.append(x.reshape(-1).astype(jnp.int32) + row_offset)
                    segs.append((fname, None, int(np.prod(x.shape)),
                                 x.shape))
            else:
                for b in bundles:
                    for fname in b.features:
                        x = batch[fname]
                        ids.append(x.reshape(-1).astype(jnp.int32)
                                   + b.row_offset)
                        segs.append((fname, b, int(np.prod(x.shape)),
                                     x.shape))
            if not ids:
                continue
            ids = jnp.concatenate(ids) if len(ids) > 1 else ids[0]
            G = jnp.take(packs[pname], ids, axis=0)      # (N, W)
            if self.embedding_optimizer == "adam" \
                    or self._acc_in_row[pname]:
                v_pre = None                             # state sliced from G
            else:
                v_pre = jnp.take(accs[pname], ids, axis=0)   # (N, S)
            if block_mode:
                nf = len(segs)
                bsz = segs[0][2]
                G3 = G.reshape(nf, bsz, G.shape[1])
                for s in slots:
                    rows[rows_block_key(s.module_path)] = \
                        G3[:, :, s.col_start:s.col_start + s.dim] \
                        .astype(rdtype)
                ctx[pname] = (ids, None, G, v_pre)
            else:
                off = 0
                for fname, b, n, shape in segs:
                    for si, s in enumerate(slots):
                        rkey = rows_key_for(s.module_path, fname)
                        rows[rkey] = G[off:off + n,
                                       s.col_start:s.col_start + s.dim] \
                            .astype(rdtype).reshape(shape + (s.dim,))
                    off += n
                ctx[pname] = (ids, segs, G, v_pre)
        return rows, ctx

    def _slot_grads(self, slots, segs, row_grads):
        """Per slot: (N, D) grads concatenated in ids order.

        segs=None marks block mode: the gradient arrived as one (F, B, D)
        array whose flattening IS the ids-order concat."""
        from recbox_tpu.nn.embedding import rows_block_key
        out = []
        for s in slots:
            if segs is None:
                g = row_grads[rows_block_key(s.module_path)]
                out.append(g.reshape(-1, s.dim))
                continue
            parts = []
            for fname, b, n, shape in segs:
                rkey = rows_key_for(s.module_path, fname)
                parts.append(row_grads[rkey].reshape(n, s.dim))
            out.append(jnp.concatenate(parts) if len(parts) > 1
                       else parts[0])
        return out

    def _apply_row_updates(self, packs, accs, row_grads, ctx, emb_lr, step):
        eps = self.adagrad_eps
        new_packs, new_accs = dict(packs), dict(accs)
        for pname, (ids, segs, G, v_pre) in ctx.items():
            slots = self._slots[pname]
            w_val = self._value_width[pname]
            # row grads arrive in the model's compute dtype (possibly bf16,
            # see _rows_dtype); optimizer math runs f32 — the upcast fuses
            # into the delta elementwise chain. Known cost left on the
            # table: XLA propagates the model's feature-major activation
            # layout through the delta pipeline and re-layouts the final
            # (N, W) f32 scatter update with a transposing copy (~436 MB at
            # bench shapes; an optimization_barrier and a 0*G layout anchor
            # were both tried and measured — no improvement / pathological
            # compiles — so the copy stands, documented in bench.py).
            raw_grads = self._slot_grads(slots, segs, row_grads)
            grads = [g.astype(jnp.float32) for g in raw_grads]
            if self.embedding_optimizer == "adam":
                # lazy Adam: m/v blocks mirror the value-column layout at
                # offsets w_val and 2*w_val; scatter-ADD writes the state
                # DELTAS (m_new - m_pre etc.). Duplicate ids in one batch
                # each update from the pre-step state (per-example
                # semantics, the usual sparse-Adam tradeoff).
                b1, b2 = self.adam_b1, self.adam_b2
                t = jnp.maximum(step, 1).astype(jnp.float32)
                bc1 = 1.0 - b1 ** t
                bc2 = 1.0 - b2 ** t
                deltas, m_upds, v_upds = [], [], []
                for s, g in zip(slots, grads):
                    c0, c1 = s.col_start, s.col_start + s.dim
                    m_pre = G[:, w_val + c0:w_val + c1]
                    v_pre_s = G[:, 2 * w_val + c0:2 * w_val + c1]
                    m_new = b1 * m_pre + (1.0 - b1) * g
                    v_new = b2 * v_pre_s + (1.0 - b2) * jnp.square(g)
                    deltas.append(-emb_lr * (m_new / bc1)
                                  / (jnp.sqrt(v_new / bc2) + eps))
                    m_upds.append(m_new - m_pre)
                    v_upds.append(v_new - v_pre_s)
                parts = deltas + m_upds + v_upds
                used = 3 * w_val
            elif self._use_delta_kernel and self._acc_in_row[pname]:
                # fused one-pass operand assembly (Pallas): reads G + the
                # raw compute-dtype grads, writes the finished scatter
                # operand — skips the upcast/concat/relayout
                # materializations of the jnp chain below (measured ~5.7
                # ms/step at bench shapes, tools/prof_packed_step.py)
                from recbox_tpu.ops.pallas.packed_delta import (
                    fused_adagrad_delta,
                )
                store_w = self._pack_store_width[pname]
                upd = fused_adagrad_delta(
                    G, raw_grads, emb_lr,
                    dims=tuple(s.dim for s in slots),
                    acc_cols=tuple(s.acc_col for s in slots),
                    used=w_val + len(slots), store_w=store_w, eps=eps,
                    interpret=jax.default_backend() != "tpu")
                new_packs[pname] = packs[pname].at[ids].add(upd)
                continue
            else:
                deltas, g2_cols = [], []
                for si, (s, g) in enumerate(zip(slots, grads)):
                    g2 = jnp.mean(jnp.square(g), axis=-1)      # (N,)
                    vp = G[:, s.acc_col] if self._acc_in_row[pname] \
                        else v_pre[:, si]
                    v_used = vp + g2
                    deltas.append(-emb_lr * g
                                  / (jnp.sqrt(v_used) + eps)[:, None])
                    g2_cols.append(g2)
                parts = list(deltas)
                used = w_val
                if self._acc_in_row[pname]:
                    parts.append(jnp.stack(g2_cols, axis=1))
                    used += len(slots)
            store_w = self._pack_store_width[pname]
            if used < store_w:   # explicit tile-pad columns (see _plan_layout)
                parts.append(jnp.zeros((ids.shape[0], store_w - used),
                                       jnp.float32))
            new_packs[pname] = packs[pname].at[ids].add(
                jnp.concatenate(parts, axis=1))
            if self.embedding_optimizer != "adam" \
                    and not self._acc_in_row[pname]:
                new_accs[pname] = accs[pname].at[ids].add(
                    jnp.stack(g2_cols, axis=1))
        return new_packs, new_accs

    # -- the train step --------------------------------------------------------
    def _build_train_step(self):
        if not self.packs:
            return super()._build_train_step()
        cfg = self.config
        model = self.model
        loss_fn = self.loss_fn
        mutable_keys = list(self.model_state.keys())
        if self._emb_lr is None:
            if self.embedding_lr is not None:
                self._emb_lr = self.embedding_lr
            elif self.embedding_optimizer == "adam":
                self._emb_lr = cfg.learning_rate
            else:
                # AdaGrad needs a much larger step than Adam-calibrated
                # configs carry (accumulator starts near 0); 5e-2 is the
                # DLRM-regime default — set embedding_lr to override
                self._emb_lr = max(cfg.learning_rate, 5e-2)
        apply_kwargs = {}
        if self.train_method is not None:
            apply_kwargs["method"] = getattr(model, self.train_method)

        # emb_lr is a TRACED step argument, not a closure constant: the
        # plateau lr schedule (_on_plateau → _set_learning_rate) must reach
        # the tables without recompiling the step
        def step_fn(dense_params, packs, accs, model_state, opt_state, batch,
                    rng, step, emb_lr):
            rows, ctx = self._gather_rows(packs, accs, batch)

            def compute_loss(dp, rows):
                # model_state is a step argument (NOT closed over), so
                # mutable collections (batch_stats, …) accumulate across
                # steps and through the K-step scans below
                variables = {"params": dp, **model_state}
                full_batch = {**batch, **rows}
                if mutable_keys:
                    outputs, new_state = model.apply(
                        variables, full_batch, train=True,
                        rngs={"dropout": rng, "reparam": jax.random.fold_in(rng, 1)}, mutable=mutable_keys,
                        **apply_kwargs)
                else:
                    outputs = model.apply(variables, full_batch, train=True,
                                          rngs={"dropout": rng, "reparam": jax.random.fold_in(rng, 1)},
                                          **apply_kwargs)
                    new_state = model_state
                loss = loss_fn(outputs, batch)
                if cfg.embedding_regularizer:
                    # (1/2)*p2 penalty on the TOUCHED rows — same 1/p factor as
                    # embedding_reg_loss on the dense path, so one
                    # lambda means the same thing under every
                    # trainer. Duplicate ids count once per batch
                    # occurrence (the per-example sparse analog of
                    # the dense path's whole-table penalty — untouched rows
                    # receive no gradient either way)
                    loss = loss + cfg.embedding_regularizer * 0.5 * sum(
                        jnp.sum(jnp.square(r.astype(jnp.float32)))
                        for r in rows.values())
                if cfg.net_regularizer:
                    from recbox_tpu.ops.losses import embedding_reg_loss
                    loss = loss + cfg.net_regularizer * embedding_reg_loss(
                        dp, prefix="")
                return loss, new_state

            (loss, new_state), (dgrads, row_grads) = jax.value_and_grad(
                compute_loss, argnums=(0, 1), has_aux=True)(
                    dense_params, rows)
            updates, new_opt_state = self.tx.update(dgrads, opt_state,
                                                    dense_params)
            new_dense = optax.apply_updates(dense_params, updates)
            new_packs, new_accs = self._apply_row_updates(
                packs, accs, row_grads, ctx, emb_lr, step)
            return (new_dense, new_packs, new_accs, new_state,
                    new_opt_state, loss)

        return jax.jit(step_fn, donate_argnums=(0, 1, 2, 3, 4))

    def train_step(self, batch) -> float:
        if self.params is None:
            self.init(batch)
        if not self.packs:
            return super().train_step(batch)
        if self._train_step is None:
            self._train_step = self._build_train_step()
        rng, self._rng = jax.random.split(self._rng)
        dbatch = self._device_batch(batch)
        (self.params, self.packs, self.accs, self.model_state,
         self.opt_state, loss) = self._train_step(
            self.params, self.packs, self.accs, self.model_state,
            self.opt_state, dbatch, rng, jnp.int32(self.step + 1),
            jnp.float32(self._emb_lr))
        self.step += 1
        return loss

    def train_steps_repeat(self, batch, n_steps: int):
        if self.params is None:
            self.init(batch)
        if not self.packs:
            return super().train_steps_repeat(batch, n_steps)
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if not hasattr(self, "_repeat_step"):
            inner = self._train_step

            @partial(jax.jit, static_argnames=("n",),
                     donate_argnums=(0, 1, 2, 3, 4))
            def repeat(dense, packs, accs, model_state, opt_state, batch,
                       rng, step0, emb_lr, n):
                rngs = jax.random.split(rng, n)
                steps = step0 + jnp.arange(1, n + 1, dtype=jnp.int32)

                def body(carry, inp):
                    step_rng, step = inp
                    dense, packs, accs, model_state, opt_state = carry
                    dense, packs, accs, model_state, opt_state, loss = inner(
                        dense, packs, accs, model_state, opt_state, batch,
                        step_rng, step, emb_lr)
                    return (dense, packs, accs, model_state, opt_state), loss

                carry, losses = jax.lax.scan(
                    body, (dense, packs, accs, model_state, opt_state),
                    (rngs, steps))
                return carry + (losses,)

            self._repeat_step = repeat
        rng, self._rng = jax.random.split(self._rng)
        dbatch = self._device_batch(batch)
        (self.params, self.packs, self.accs, self.model_state,
         self.opt_state, losses) = self._repeat_step(
            self.params, self.packs, self.accs, self.model_state,
            self.opt_state, dbatch, rng, jnp.int32(self.step),
            jnp.float32(self._emb_lr), n_steps)
        self.step += n_steps
        return losses

    def train_steps_fused(self, batches):
        first = {k: v[0] for k, v in batches.items()}
        if self.params is None:
            self.init(first)
        if not self.packs:
            return super().train_steps_fused(batches)
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if not hasattr(self, "_fused_step"):
            inner = self._train_step

            @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
            def fused(dense, packs, accs, model_state, opt_state, batches,
                      rng, step0, emb_lr):
                K = len(jax.tree_util.tree_leaves(batches)[0])
                rngs = jax.random.split(rng, K)
                steps = step0 + jnp.arange(1, K + 1, dtype=jnp.int32)

                def body(carry, inp):
                    dense, packs, accs, model_state, opt_state = carry
                    batch, step_rng, step = inp
                    dense, packs, accs, model_state, opt_state, loss = inner(
                        dense, packs, accs, model_state, opt_state, batch,
                        step_rng, step, emb_lr)
                    return (dense, packs, accs, model_state, opt_state), loss

                carry, losses = jax.lax.scan(
                    body, (dense, packs, accs, model_state, opt_state),
                    (batches, rngs, steps))
                return carry + (losses,)

            self._fused_step = fused
        rng, self._rng = jax.random.split(self._rng)
        dbatches = self._device_megabatch(batches)
        (self.params, self.packs, self.accs, self.model_state,
         self.opt_state, losses) = self._fused_step(
            self.params, self.packs, self.accs, self.model_state,
            self.opt_state, dbatches, rng, jnp.int32(self.step),
            jnp.float32(self._emb_lr))
        self.step += int(losses.shape[0])
        return losses

    # -- logical views ----------------------------------------------------------
    @property
    def tables(self) -> Dict[str, jnp.ndarray]:
        """{table_key: (V, D)} logical view of the packed state."""
        out = {}
        for pname, bundles in self._bundles.items():
            pack = self.packs[pname]
            for b in bundles:
                for si, s in enumerate(self._slots[pname]):
                    out[b.table_keys[si]] = pack[
                        b.row_offset:b.row_offset + b.rows,
                        s.col_start:s.col_start + s.dim]
        return out

    @property
    def accumulators(self) -> Dict[str, jnp.ndarray]:
        """{table_key: (V,)} second-moment view: the AdaGrad accumulator,
        or the row-mean of the lazy-Adam v block."""
        out = {}
        for pname, bundles in self._bundles.items():
            if self.embedding_optimizer == "adam":
                w_val = self._value_width[pname]
                pack = self.packs[pname]
                for b in bundles:
                    for si, s in enumerate(self._slots[pname]):
                        c0 = 2 * w_val + s.col_start
                        out[b.table_keys[si]] = jnp.mean(
                            pack[b.row_offset:b.row_offset + b.rows,
                                 c0:c0 + s.dim], axis=-1)
                continue
            src = self.packs[pname] if self._acc_in_row[pname] \
                else self.accs[pname]
            for b in bundles:
                for si, s in enumerate(self._slots[pname]):
                    col = s.acc_col if self._acc_in_row[pname] else si
                    out[b.table_keys[si]] = src[
                        b.row_offset:b.row_offset + b.rows, col]
        return out

    # base predict/apply use full_params(), which merges the packed state
    def full_params(self) -> dict:
        if not self.packs:
            return self.params
        return _merge_params(self.params, self.tables, self._table_paths)

    # -- lr plateau reaches the tables too ----------------------------------
    def _set_learning_rate(self, lr: float) -> None:
        old = self.learning_rate
        super()._set_learning_rate(lr)
        if self._emb_lr is not None and old > 0:
            # decay the embedding lr by the same factor as the dense lr
            # (emb_lr is a traced step argument, so no recompile)
            self._emb_lr = max(self._emb_lr * (lr / old),
                               self.config.min_lr)

    # -- best weights + checkpointing --------------------------------------------
    def _capture_best(self) -> None:
        super()._capture_best()
        self._best_packs = {k: np.asarray(v) for k, v in self.packs.items()}
        self._best_accs = {k: np.asarray(v) for k, v in self.accs.items()}

    def _restore_best(self) -> None:
        super()._restore_best()
        if getattr(self, "_best_packs", None):
            self.packs = {k: jnp.asarray(v)
                          for k, v in self._best_packs.items()}
            self.accs = {k: jnp.asarray(v)
                         for k, v in self._best_accs.items()}
            # plateau reloads happen far more often than load(): the
            # restored packs must come back with the combined-grid
            # sharding or a mesh run re-materializes them replicated
            self._reshard_packed()

    def state_dict(self):
        # the public checkpoint contract (incl. OrbaxCheckpointer): the
        # packed table/optimizer state MUST ride along or an orbax restore
        # would silently revert every embedding to fresh random init.
        # emb_lr rides too: the plateau schedule decays it, and resuming
        # at the static-config value would jump the tables back to the
        # undecayed lr (-1.0 = not yet resolved)
        state = super().state_dict()
        state["packs"] = self.packs
        state["accs"] = self.accs
        state["emb_lr"] = float(self._emb_lr if self._emb_lr is not None
                                else -1.0)
        return state

    def save(self, path: str) -> None:
        from recbox_tpu.training.checkpoint import save_checkpoint
        save_checkpoint(path, self.state_dict())

    def _reshard_packed(self) -> None:
        """Re-apply the combined-grid sharding init() established — a
        restore hands back host/default-placed arrays, and resuming with a
        replicated multi-GB pack would OOM or silently defeat the layout
        guarantees."""
        if self.mesh is None:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard = NamedSharding(self.mesh, P(("data", "model"), None))
        self.packs = {k: jax.device_put(jnp.asarray(v), shard)
                      for k, v in self.packs.items()}
        self.accs = {k: jax.device_put(jnp.asarray(v), shard)
                     for k, v in self.accs.items()}

    def load(self, path: str) -> None:
        from recbox_tpu.training.checkpoint import load_checkpoint
        if self.params is None:
            raise RuntimeError("call init()/fit() before load() so shapes exist")
        state = load_checkpoint(path, self.state_dict())
        self.params = state["params"]
        self.packs = dict(state["packs"])
        self.accs = dict(state["accs"])
        self.model_state = state["model_state"]
        self.opt_state = state["opt_state"]
        self.step = int(state["step"])
        self.epoch = int(state["epoch"])
        self.monitor.restore(state["monitor"])
        saved_lr = float(state.get("emb_lr", -1.0))
        if saved_lr > 0:
            self._emb_lr = saved_lr
        self._reshard_packed()
        # the saved state is the best-so-far (best.ckpt is written on
        # improvement); seed the best-weights cache so plateau reloads and
        # the end-of-fit restore have something to restore after a resume
        self._capture_best()
