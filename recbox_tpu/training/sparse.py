"""Sparse embedding training: row-gradient updates without dense scatters.

The dense-optimizer problem: with V×D tables and Adam, every step reads and
writes table + two moments (≈ 6·V·D floats of HBM traffic) even though a
batch touches only B ≪ V rows. At Criteo shapes (2.6M rows × 64) that is
~4 GB/step — it dominates the step time on one chip.

TPU-native fix (this module):
  1. rows are gathered OUTSIDE the differentiated function and fed to the
     model through the `__rows__` batch protocol (`nn/embedding.py`), so
     autodiff yields compact (B, D) row gradients — no vocab-sized scatter
     in the backward pass;
  2. tables are updated with row-wise AdaGrad (the DLRM/production-recsys
     optimizer): accumulator v is (V,) — one scalar per row — updated and
     applied only at touched rows via scatter-add. Total traffic O(B·D).

Duplicate ids in a batch: gradients scatter-add (exact); the AdaGrad
denominator uses the post-accumulation v (matching TF's sparse Adagrad).

`SparseEmbeddingTrainer` subclasses Trainer: params whose leaf name starts
with `emb_` become sparse tables; everything else trains under the regular
optax chain. This is the single biggest single-chip throughput lever
(~2-4× at Criteo shapes) and composes with the 'model'-axis table sharding.

Operating envelope (v5e, 16 GB HBM, measured round 1):
  * 26 tables × 100k × 64: dense Adam ~530k ex/s, this trainer ~466k ex/s —
    both scatter-bound (row ops are latency-bound ~15-19 ns/row, so
    PER-TABLE gathers/scatters dominate). `training/packed.py`
    (PackedEmbeddingTrainer) fixes exactly that — ONE gather + ONE scatter
    for all tables & optimizer state — and reaches ~0.97M ex/s at the same
    shapes; prefer it whenever all embedded features flow through
    FeatureEmbedding.
  * 26 tables × 1M × 64: dense Adam state alone is ~19 GB → OOM; sparse is
    the single-chip option but watch two HBM multipliers: (a) f32[V, 64]
    pads 2× under the (8, 128) tile — prefer embedding_dim that is a
    multiple of 128 (or bf16 params) for huge vocabs; (b) lax.scan-fused
    steps remat-copy carried tables — use per-step dispatch (or small K)
    when tables dominate HBM. Beyond that, shard tables over the 'model'
    mesh axis (the framework's centerpiece; `parallel/mesh.py`).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recbox_tpu.features.schema import CATEGORICAL, SEQUENCE
from recbox_tpu.nn.embedding import ROWS_PREFIX, rows_key_for
from recbox_tpu.training.trainer import Trainer

logger = logging.getLogger("recbox_tpu")

__all__ = ["SparseEmbeddingTrainer", "split_sparse_params"]


def split_sparse_params(params):
    """Split a flax params tree into (dense_tree, {key: array}, {key: path}).

    Table leaves are identified by the reference naming convention: leaf
    names starting with 'emb_' inside any FeatureEmbedding module. Paths are
    returned separately so only arrays flow through jit boundaries.
    """
    tables: Dict[str, jnp.ndarray] = {}
    paths: Dict[str, tuple] = {}

    def walk(tree, path):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                sub = walk(v, path + (k,))
                if sub:
                    out[k] = sub
            elif k.startswith("emb_"):
                key = "/".join(path + (k,))
                tables[key] = v
                paths[key] = path + (k,)
            else:
                out[k] = v
        return out

    dense = walk(params, ())
    return dense, tables, paths


def _merge_params(dense: dict, tables: Dict[str, jnp.ndarray],
                  paths: Dict[str, tuple]) -> dict:
    out = jax.tree_util.tree_map(lambda x: x, dense)
    for key, arr in tables.items():
        path = paths[key]
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return out


class SparseEmbeddingTrainer(Trainer):
    """Trainer with sparse row-wise-AdaGrad embedding updates.

    Extra config knobs (read from TrainerConfig via duck-typing or defaults):
      embedding_lr: learning rate for tables (default = config.learning_rate)
      adagrad_init / adagrad_eps: accumulator initialization / stability.

    Restriction: the model must consume all categorical/sequence features
    through FeatureEmbedding modules (the `__rows__` protocol), and the
    feature_map must be available as `model.feature_map`.
    """

    def __init__(self, *args, embedding_lr: float = None,
                 adagrad_init: float = 0.0, adagrad_eps: float = 1e-8,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.embedding_lr = embedding_lr
        self._emb_lr = None      # resolved at step build; plateau-decayed
        self.adagrad_init = adagrad_init
        self.adagrad_eps = adagrad_eps
        self.tables: Dict[str, jnp.ndarray] = {}
        self.table_paths: Dict[str, tuple] = {}
        self.accumulators: Dict[str, jnp.ndarray] = {}
        self._feature_tables: List[Tuple[str, str, bool]] = []


    def init(self, sample_batch) -> None:
        super().init(sample_batch)
        dense, tables, paths = split_sparse_params(self.params)
        if not tables:
            logger.warning("SparseEmbeddingTrainer found no emb_* tables; "
                           "falling back to dense training")
            return
        self.params = dense
        self.tables = tables
        self.table_paths = paths
        self.accumulators = {
            k: jnp.full((arr.shape[0],), self.adagrad_init, jnp.float32)
            for k, arr in tables.items()}
        # re-init the optax state for the dense subtree only
        self.opt_state = self.tx.init(self.params)
        # one (rows_key, table_key, feature) route per embedding module ×
        # feature: a model may embed the same feature through several
        # FeatureEmbedding modules of different widths
        fm = self.model.feature_map
        self._feature_tables = []
        for tkey, path in self.table_paths.items():
            module_path = path[:-1]
            tname = path[-1][len("emb_"):]
            for f in fm.input_features:
                if f.type in (CATEGORICAL, SEQUENCE) \
                        and f.table_name == tname and f.name in sample_batch:
                    self._feature_tables.append(
                        (f.name, tkey, rows_key_for(module_path, f.name)))
        n_rows = sum(int(arr.shape[0]) for arr in tables.values())
        logger.info("sparse embedding training: %d tables, %s rows",
                    len(tables), f"{n_rows:,}")

    # -- the sparse train step ------------------------------------------------
    def _build_train_step(self):
        if not self.tables:
            return super()._build_train_step()
        cfg = self.config
        model = self.model
        loss_fn = self.loss_fn
        mutable_keys = list(self.model_state.keys())
        feature_tables = list(self._feature_tables)
        if self._emb_lr is None:
            self._emb_lr = self.embedding_lr \
                if self.embedding_lr is not None else cfg.learning_rate
        eps = self.adagrad_eps
        apply_kwargs = {}
        if self.train_method is not None:
            apply_kwargs["method"] = getattr(model, self.train_method)

        # emb_lr is a TRACED step argument, not a closure constant: the
        # plateau lr schedule (_on_plateau -> _set_learning_rate) must
        # reach the tables without recompiling the step
        def step_fn(dense_params, tables, accums, model_state, opt_state,
                    batch, rng, emb_lr):
            # 1. gather rows outside the grad
            rows = {}
            for fname, tkey, rkey in feature_tables:
                rows[rkey] = jnp.take(tables[tkey], batch[fname], axis=0)

            def compute_loss(dp, rows):
                # model_state is a step argument (NOT closed over): mutable
                # collections (batch_stats, …) must thread through the step
                # and the K-step scans, or running stats would be frozen at
                # their trace-time values
                variables = {"params": dp, **model_state}
                full_batch = {**batch, **rows}
                if mutable_keys:
                    outputs, new_state = model.apply(
                        variables, full_batch, train=True,
                        rngs={"dropout": rng, "reparam": jax.random.fold_in(rng, 1)}, mutable=mutable_keys,
                        **apply_kwargs)
                else:
                    outputs = model.apply(variables, full_batch, train=True,
                                          rngs={"dropout": rng, "reparam": jax.random.fold_in(rng, 1)}, **apply_kwargs)
                    new_state = model_state
                loss = loss_fn(outputs, batch)
                if cfg.embedding_regularizer:
                    # (1/2)*p2 penalty on the TOUCHED rows — same 1/p factor as
                    # embedding_reg_loss on the dense path, so one
                    # lambda means the same thing under every
                    # trainer. Duplicate ids count once per batch
                    # occurrence (the per-example sparse analog of
                    # the dense path's whole-table penalty -- untouched
                    # rows receive no gradient either way)
                    loss = loss + cfg.embedding_regularizer * 0.5 * sum(
                        jnp.sum(jnp.square(r.astype(jnp.float32)))
                        for r in rows.values())
                if cfg.net_regularizer:
                    from recbox_tpu.ops.losses import embedding_reg_loss
                    loss = loss + cfg.net_regularizer * embedding_reg_loss(
                        dp, prefix="")
                return loss, new_state

            (loss, new_state), (dgrads, row_grads) = jax.value_and_grad(
                compute_loss, argnums=(0, 1), has_aux=True)(dense_params, rows)

            # 2. dense params: regular optax update
            updates, new_opt_state = self.tx.update(dgrads, opt_state,
                                                    dense_params)
            new_dense = optax.apply_updates(dense_params, updates)

            # 3. tables: row-wise AdaGrad at touched rows only
            new_tables = dict(tables)
            new_accums = dict(accums)
            # group features by table (shared tables accumulate together)
            by_table: Dict[str, list] = {}
            for fname, tkey, rkey in feature_tables:
                by_table.setdefault(tkey, []).append((fname, rkey))
            for tkey, fnames in by_table.items():
                table = tables[tkey]
                D = table.shape[-1]
                ids = jnp.concatenate(
                    [batch[f].reshape(-1) for f, _ in fnames], axis=0)
                g = jnp.concatenate(
                    [row_grads[rk].reshape(-1, D) for _, rk in fnames],
                    axis=0)
                v = accums[tkey]
                g2 = jnp.mean(jnp.square(g), axis=-1)           # (n,)
                v = v.at[ids].add(g2)
                scale = emb_lr / (jnp.sqrt(v[ids]) + eps)        # (n,)
                table = table.at[ids].add(-scale[:, None] * g)
                new_tables[tkey] = table
                new_accums[tkey] = v
            return new_dense, new_tables, new_accums, new_state, \
                new_opt_state, loss

        return jax.jit(step_fn, donate_argnums=(0, 1, 2, 3, 4))

    def train_step(self, batch) -> float:
        if self.params is None:
            self.init(batch)
        if not self.tables:
            return super().train_step(batch)
        if self._train_step is None:
            self._train_step = self._build_train_step()
        rng, self._rng = jax.random.split(self._rng)
        dbatch = self._device_batch(batch)
        (self.params, self.tables, self.accumulators, self.model_state,
         self.opt_state, loss) = self._train_step(
            self.params, self.tables, self.accumulators, self.model_state,
            self.opt_state, dbatch, rng, jnp.float32(self._emb_lr))
        self.step += 1
        return loss

    # -- inference needs merged params (base predict/apply use full_params) --
    def full_params(self) -> dict:
        return _merge_params(self.params, self.tables, self.table_paths) \
            if self.tables else self.params

    # -- lr plateau reaches the tables too ----------------------------------
    def _set_learning_rate(self, lr: float) -> None:
        old = self.learning_rate
        super()._set_learning_rate(lr)
        if self._emb_lr is not None and old > 0:
            # decay the embedding lr by the same factor as the dense lr
            # (emb_lr is a traced step argument, so no recompile)
            self._emb_lr = max(self._emb_lr * (lr / old),
                               self.config.min_lr)

    # -- best-weights + checkpointing include the tables ----------------------
    def _capture_best(self) -> None:
        super()._capture_best()
        self._best_tables = {k: np.asarray(a) for k, a in self.tables.items()}
        self._best_accums = {k: np.asarray(v)
                             for k, v in self.accumulators.items()}

    def _restore_best(self) -> None:
        super()._restore_best()
        if getattr(self, "_best_tables", None):
            self.tables = {k: jnp.asarray(a)
                           for k, a in self._best_tables.items()}
            self.accumulators = {k: jnp.asarray(v)
                                 for k, v in self._best_accums.items()}

    def state_dict(self):
        # the public checkpoint contract (incl. OrbaxCheckpointer): tables
        # and accumulators MUST ride along or an orbax restore would
        # silently revert every embedding to fresh random init. emb_lr
        # rides too (plateau-decayed; -1.0 = not yet resolved)
        state = super().state_dict()
        state["tables"] = self.tables
        state["accumulators"] = self.accumulators
        state["emb_lr"] = float(self._emb_lr if self._emb_lr is not None
                                else -1.0)
        return state

    def save(self, path: str) -> None:
        from recbox_tpu.training.checkpoint import save_checkpoint
        save_checkpoint(path, self.state_dict())

    def load(self, path: str) -> None:
        from recbox_tpu.training.checkpoint import load_checkpoint
        if self.params is None:
            raise RuntimeError("call init()/fit() before load() so shapes exist")
        state = load_checkpoint(path, self.state_dict())
        self.params = state["params"]
        self.tables = dict(state["tables"])
        self.accumulators = state["accumulators"]
        self.model_state = state["model_state"]
        self.opt_state = state["opt_state"]
        self.step = int(state["step"])
        self.epoch = int(state["epoch"])
        self.monitor.restore(state["monitor"])
        saved_lr = float(state.get("emb_lr", -1.0))
        if saved_lr > 0:
            self._emb_lr = saved_lr
        # seed the best-weights cache from the restored state (best.ckpt is
        # written on improvement, so it IS the best-so-far) — otherwise a
        # resumed run whose evals never improve ends on drifted weights
        self._capture_best()


    def train_steps_repeat(self, batch, n_steps: int):
        """Device-resident K-step scan (see Trainer.train_steps_repeat) with
        the sparse table/accumulator state threaded through the scan."""
        if self.params is None:
            self.init(batch)
        if not self.tables:
            return super().train_steps_repeat(batch, n_steps)
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if not hasattr(self, "_repeat_step"):
            import functools
            inner = self._train_step

            @functools.partial(jax.jit, static_argnames=("n",),
                               donate_argnums=(0, 1, 2, 3, 4))
            def repeat(dense, tables, accums, model_state, opt_state, batch,
                       rng, emb_lr, n):
                rngs = jax.random.split(rng, n)

                def body(carry, step_rng):
                    dense, tables, accums, model_state, opt_state = carry
                    dense, tables, accums, model_state, opt_state, loss = \
                        inner(dense, tables, accums, model_state, opt_state,
                              batch, step_rng, emb_lr)
                    return (dense, tables, accums, model_state,
                            opt_state), loss

                carry, losses = jax.lax.scan(
                    body, (dense, tables, accums, model_state, opt_state),
                    rngs)
                return carry + (losses,)

            self._repeat_step = repeat
        rng, self._rng = jax.random.split(self._rng)
        dbatch = self._device_batch(batch)
        (self.params, self.tables, self.accumulators, self.model_state,
         self.opt_state, losses) = self._repeat_step(
            self.params, self.tables, self.accumulators, self.model_state,
            self.opt_state, dbatch, rng, jnp.float32(self._emb_lr), n_steps)
        self.step += n_steps
        return losses

    def train_steps_fused(self, batches):
        """K stacked batches through one compiled lax.scan with the sparse
        table/accumulator/model state threaded through the carry (the base
        5-arg fused scan cannot drive the 7-arg sparse step)."""
        first = {k: v[0] for k, v in batches.items()}
        if self.params is None:
            self.init(first)
        if not self.tables:
            return super().train_steps_fused(batches)
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if not hasattr(self, "_fused_step"):
            import functools
            inner = self._train_step

            @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
            def fused(dense, tables, accums, model_state, opt_state,
                      batches, rng, emb_lr):
                K = len(jax.tree_util.tree_leaves(batches)[0])
                rngs = jax.random.split(rng, K)

                def body(carry, inp):
                    dense, tables, accums, model_state, opt_state = carry
                    batch, step_rng = inp
                    dense, tables, accums, model_state, opt_state, loss = \
                        inner(dense, tables, accums, model_state, opt_state,
                              batch, step_rng, emb_lr)
                    return (dense, tables, accums, model_state,
                            opt_state), loss

                carry, losses = jax.lax.scan(
                    body, (dense, tables, accums, model_state, opt_state),
                    (batches, rngs))
                return carry + (losses,)

            self._fused_step = fused
        rng, self._rng = jax.random.split(self._rng)
        dbatches = self._device_megabatch(batches)
        (self.params, self.tables, self.accumulators, self.model_state,
         self.opt_state, losses) = self._fused_step(
            self.params, self.tables, self.accumulators, self.model_state,
            self.opt_state, dbatches, rng, jnp.float32(self._emb_lr))
        self.step += int(losses.shape[0])
        return losses
