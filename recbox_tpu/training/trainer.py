"""Unified trainer: one compile-once train step for every stage.

Replaces the reference's five trainer stacks (fit() methods in
`match_model.py:162-203` / `ranking_model.py:136-217`, recbole
`trainer/trainer.py:96-1496`, rechub `trainers/*`, daisy fit loops) with a
single functional trainer:

* the train step — forward, loss (+ split embedding/net regularization,
  `match_model.py:71-89`), global-norm gradient clip (default 10,
  `ranking_model.py:137`), optax update — is one jitted XLA program; batches
  stream onto device, nothing else leaves it;
* reduce-lr-on-plateau with best-weight reload, early stopping with patience,
  best-only checkpointing: exact semantics of `checkpoint_and_earlystop`
  (`match_model.py:138-160`);
* checkpoint/resume carries {params, model_state, opt_state, epoch, monitor}
  like recbole's full training-state checkpoint (`trainer.py:287-340`);
* optional device mesh: when given a Mesh(('data','model')) the same step is
  pjit-sharded — batch over 'data', embedding tables row-sharded over 'model'
  via their flax partitioning metadata; XLA emits the grad all-reduce the
  reference gets from DDP (`trainer.py:60-93`).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial
from typing import Any, Callable, Dict, Mapping, Optional, Union

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import freeze, unfreeze
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recbox_tpu.data.loader import MASK_KEY
from recbox_tpu.ops.losses import embedding_reg_loss
from recbox_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from recbox_tpu.training.monitor import Monitor
from recbox_tpu.utils.seeding import training_key

logger = logging.getLogger("recbox_tpu")

__all__ = ["Trainer", "TrainerConfig"]


@dataclasses.dataclass
class TrainerConfig:
    optimizer: str = "adam"
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    grad_clip_norm: float = 10.0
    epochs: int = 10
    patience: int = 2
    monitor: Union[str, Mapping[str, float]] = "AUC"
    monitor_mode: str = "max"
    lr_decay_factor: float = 0.1        # reduce-lr-on-plateau multiplier
    min_lr: float = 1e-6
    reload_best_on_plateau: bool = True
    # p2 penalty on emb_* tables ((1/p)*||W||_p^p like the reference,
    # match_model.py:84-89). NOTE: this is a FULL-TABLE penalty —
    # deliberately stronger than recbole's EmbLoss, which is the L2 norm of
    # the batch's ego embeddings / batch_size (~5e-8 at reg 1e-5, i.e.
    # numerically zero). Copying a recbole reg_weight verbatim
    # over-regularizes at production scale (measured: −10% LightGCN test
    # recall at ml1m scale, docs/QUALITY_PARITY.md) — use 0 to reproduce
    # recbole, or a much smaller value here.
    embedding_regularizer: float = 0.0
    net_regularizer: float = 0.0        # p2 penalty on everything else
    eval_steps: Optional[int] = None    # eval every N steps (None = per epoch)
    # pack K consecutive batches into one compiled lax.scan (amortizes
    # per-dispatch host overhead; 1 = classic per-step dispatch)
    fused_steps: int = 1
    workdir: Optional[str] = None
    seed: int = 2024
    # PRNG stream implementation: 'rbg' (default — XLA hardware RngBitGenerator
    # for bits, threefry for split/fold_in; −18% SASRec step time on v5e, see
    # utils/seeding.training_key) or 'threefry' (bit-exact pre-round-5 streams)
    rng_impl: str = "rbg"
    log_every: int = 100


def _make_optimizer(cfg: TrainerConfig) -> optax.GradientTransformation:
    def build(learning_rate):
        opts = {
            "adam": lambda: optax.adam(learning_rate),
            "adamw": lambda: optax.adamw(learning_rate, weight_decay=cfg.weight_decay),
            "adagrad": lambda: optax.adagrad(learning_rate),
            "sgd": lambda: optax.sgd(learning_rate),
            "rmsprop": lambda: optax.rmsprop(learning_rate),
        }
        if cfg.optimizer.lower() not in opts:
            raise NotImplementedError(f"optimizer={cfg.optimizer}")
        tx = opts[cfg.optimizer.lower()]()
        if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
            tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
        return tx
    return optax.inject_hyperparams(build)(learning_rate=cfg.learning_rate)


class Trainer:
    """Generic trainer over a flax model + a loss adapter + an evaluator.

    Args:
      model: flax module; ``model.apply(variables, batch, train=...)``.
      loss_fn: ``loss_fn(outputs, batch) -> scalar loss`` (pure jnp).
      eval_fn: ``eval_fn(trainer) -> {metric: value}`` on the validation set.
      config: TrainerConfig.
      mesh: optional jax Mesh(('data','model')) for sharded training.
    """

    def __init__(
        self,
        model,
        loss_fn: Callable,
        config: TrainerConfig,
        eval_fn: Optional[Callable] = None,
        mesh: Optional[Mesh] = None,
        train_method: Optional[str] = None,
    ):
        self.model = model
        self.loss_fn = loss_fn
        self.config = config
        self.eval_fn = eval_fn
        self.mesh = mesh
        # name of the model method driven by the train step; None = __call__.
        # e.g. 'full_scores' for the full-softmax CE protocol of sequential
        # models (recbole loss_type='CE')
        self.train_method = train_method
        if mesh is not None and train_method == "fused_ce_loss":
            # the flash-CE pallas kernels are single-shard ops (no GSPMD
            # sharding rules); under a mesh they would replicate or produce
            # silently wrong per-shard losses — quick_start's auto-route
            # already falls back, this catches direct construction
            raise ValueError(
                "train_method='fused_ce_loss' is a single-shard path and "
                "cannot run under a mesh; use train_method='full_scores' "
                "+ full_softmax_loss (quick_start's auto-route does this "
                "automatically), or call the kernel per-shard from "
                "shard_map")
        self.tx = _make_optimizer(config)
        self.monitor = Monitor(config.monitor, config.monitor_mode,
                               patience=config.patience)
        self.params = None
        self.model_state = {}  # mutable collections (batch_stats, …)
        self.opt_state = None
        self.step = 0
        self.epoch = 0
        self._rng = training_key(config.seed, config.rng_impl)
        self._train_step = None
        self._best_params = None
        self._best_model_state = None
        self._stopped = False
        # optional external stop poll (e.g. PreemptionGuard.should_stop):
        # checked between steps in fit(); returning True aborts the loop
        self.stop_callback = None

    # -- init ----------------------------------------------------------------
    def init(self, sample_batch: Dict[str, np.ndarray]) -> None:
        rng, self._rng = jax.random.split(self._rng)
        batch = self._device_batch(sample_batch)
        init_kwargs = {}
        if self.train_method is not None:
            init_kwargs["method"] = getattr(self.model, self.train_method)
        variables = self.model.init(
            {"params": rng, "dropout": rng,
             "reparam": jax.random.fold_in(rng, 1)},
            batch, train=True, **init_kwargs)
        variables = unfreeze(variables)
        params = variables.pop("params")
        # extract flax partitioning metadata (tables → (('data','model'), None))
        # then unbox to plain arrays for optax
        self.param_specs = flax.linen.get_partition_spec(params)
        params = flax.linen.meta.unbox(params)
        if self.mesh is not None:
            from recbox_tpu.parallel.mesh import shard_params
            params = shard_params(params, self.mesh, self.param_specs)
        self.params = params
        self.model_state = flax.linen.meta.unbox(variables)
        self.opt_state = self.tx.init(self.params)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.params))
        logger.info("initialized model: %s params", f"{n_params:,}")

    def _device_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        if self.mesh is not None:
            from recbox_tpu.parallel.mesh import shard_batch
            return shard_batch(batch, self.mesh)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _device_megabatch(self, batches) -> Dict[str, jnp.ndarray]:
        """Place a stacked (K, B, ...) megabatch: the BATCH dim (axis 1)
        shards over 'data'; plain jnp.asarray would replicate the whole
        stack on every device. Multi-process runs assemble the global
        array from each host's local stack (same contract as
        `parallel.mesh.shard_batch`)."""
        if self.mesh is not None:
            sharding = NamedSharding(self.mesh, P(None, "data"))
            if jax.process_count() > 1:
                return {k: jax.make_array_from_process_local_data(
                            sharding, np.asarray(v))
                        for k, v in batches.items()}
            return {k: jax.device_put(np.asarray(v), sharding)
                    for k, v in batches.items()}
        return {k: jnp.asarray(v) for k, v in batches.items()}

    # -- the compiled train step ---------------------------------------------
    def _build_train_step(self):
        cfg = self.config
        model = self.model
        loss_fn = self.loss_fn
        mutable_keys = list(self.model_state.keys())
        apply_kwargs = {}
        if self.train_method is not None:
            apply_kwargs["method"] = getattr(model, self.train_method)

        def step_fn(params, model_state, opt_state, batch, rng):
            def compute_loss(p):
                variables = {"params": p, **model_state}
                if mutable_keys:
                    outputs, new_state = model.apply(
                        variables, batch, train=True,
                        rngs={"dropout": rng, "reparam": jax.random.fold_in(rng, 1)}, mutable=mutable_keys,
                        **apply_kwargs)
                else:
                    outputs = model.apply(variables, batch, train=True,
                                          rngs={"dropout": rng, "reparam": jax.random.fold_in(rng, 1)}, **apply_kwargs)
                    new_state = model_state
                loss = loss_fn(outputs, batch)
                if cfg.embedding_regularizer:
                    loss = loss + cfg.embedding_regularizer * embedding_reg_loss(p)
                if cfg.net_regularizer:
                    reg = embedding_reg_loss(p, prefix="")  # all params
                    reg = reg - embedding_reg_loss(p)       # minus emb tables
                    loss = loss + cfg.net_regularizer * reg
                return loss, new_state

            (loss, new_state), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(params)
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_state, new_opt_state, loss

        # sharded and single-device paths compile identically: params carry
        # committed shardings from init, batches are placed by _device_batch
        return jax.jit(step_fn, donate_argnums=(0, 1, 2))

    def train_step(self, batch: Dict[str, np.ndarray]) -> float:
        if self.params is None:
            self.init(batch)
        if self._train_step is None:
            self._train_step = self._build_train_step()
        rng, self._rng = jax.random.split(self._rng)
        dbatch = self._device_batch(batch)
        self.params, self.model_state, self.opt_state, loss = self._train_step(
            self.params, self.model_state, self.opt_state, dbatch, rng)
        self.step += 1
        return loss  # device scalar; block only when logged

    def train_steps_fused(self, batches: Dict[str, np.ndarray]) -> jnp.ndarray:
        """Run K train steps inside ONE compiled program.

        `batches` holds (K, B, ...) arrays — K per-step batches stacked on a
        leading axis; a `lax.scan` threads params/opt_state through all K
        steps on device. This amortizes per-dispatch overhead (host→device
        argument shipping, dispatch latency) across K steps — the dominant
        cost when steps are a few ms, and the difference between ~70k and
        ~600k examples/s/chip through this sandbox's TPU tunnel. Returns the
        (K,) per-step losses.
        """
        first = {k: v[0] for k, v in batches.items()}
        if self.params is None:
            self.init(first)
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if not hasattr(self, "_fused_step"):
            inner = self._train_step

            @partial(jax.jit, donate_argnums=(0, 1, 2))
            def fused(params, model_state, opt_state, batches, rng):
                K = len(jax.tree_util.tree_leaves(batches)[0])
                rngs = jax.random.split(rng, K)

                def body(carry, inp):
                    params, model_state, opt_state = carry
                    batch, step_rng = inp
                    params, model_state, opt_state, loss = inner(
                        params, model_state, opt_state, batch, step_rng)
                    return (params, model_state, opt_state), loss

                (params, model_state, opt_state), losses = jax.lax.scan(
                    body, (params, model_state, opt_state), (batches, rngs))
                return params, model_state, opt_state, losses

            self._fused_step = fused
        rng, self._rng = jax.random.split(self._rng)
        dbatches = self._device_megabatch(batches)
        self.params, self.model_state, self.opt_state, losses = \
            self._fused_step(self.params, self.model_state, self.opt_state,
                             dbatches, rng)
        self.step += int(losses.shape[0])
        return losses

    def train_steps_repeat(self, batch: Dict[str, np.ndarray],
                           n_steps: int) -> jnp.ndarray:
        """K train steps on ONE device-resident batch (fresh dropout rng per
        step) — the compute-throughput probe: no per-step host→device batch
        transfer, so it measures the train step itself. For real epochs use
        `train_steps_fused` (distinct batches) or the per-step path."""
        if self.params is None:
            self.init(batch)
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if not hasattr(self, "_repeat_step"):
            inner = self._train_step

            @partial(jax.jit, static_argnames=("n",), donate_argnums=(0, 1, 2))
            def repeat(params, model_state, opt_state, batch, rng, n):
                rngs = jax.random.split(rng, n)

                def body(carry, step_rng):
                    params, model_state, opt_state = carry
                    params, model_state, opt_state, loss = inner(
                        params, model_state, opt_state, batch, step_rng)
                    return (params, model_state, opt_state), loss

                (params, model_state, opt_state), losses = jax.lax.scan(
                    body, (params, model_state, opt_state), rngs)
                return params, model_state, opt_state, losses

            self._repeat_step = repeat
        rng, self._rng = jax.random.split(self._rng)
        dbatch = self._device_batch(batch)
        self.params, self.model_state, self.opt_state, losses = \
            self._repeat_step(self.params, self.model_state, self.opt_state,
                              dbatch, rng, n_steps)
        self.step += n_steps
        return losses

    # -- lr plateau ----------------------------------------------------------
    @property
    def learning_rate(self) -> float:
        return float(self.opt_state.hyperparams["learning_rate"])

    def _set_learning_rate(self, lr: float) -> None:
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)

    def _capture_best(self) -> None:
        self._best_params = jax.tree_util.tree_map(
            lambda x: np.asarray(x), self.params)
        self._best_model_state = jax.tree_util.tree_map(
            lambda x: np.asarray(x), self.model_state)

    def _restore_best(self) -> None:
        if self._best_params is None:
            return
        self.params = jax.tree_util.tree_map(jnp.asarray, self._best_params)
        if self._best_model_state:
            self.model_state = jax.tree_util.tree_map(
                jnp.asarray, self._best_model_state)

    def _on_plateau(self) -> None:
        new_lr = max(self.learning_rate * self.config.lr_decay_factor,
                     self.config.min_lr)
        logger.info("plateau: reducing lr %.3g -> %.3g", self.learning_rate, new_lr)
        if self.config.reload_best_on_plateau:
            self._restore_best()
        self._set_learning_rate(new_lr)

    # -- fit loop ------------------------------------------------------------
    def fit(self, train_loader, epochs: Optional[int] = None,
            valid_loader=None) -> Dict[str, float]:
        if valid_loader is not None:
            # evaluation is driven by eval_fn (a metric callable), not a raw
            # loader — fail loudly instead of silently skipping validation
            raise TypeError(
                "fit() does not consume a raw valid_loader; pass an "
                "evaluator as eval_fn= at construction (e.g. "
                "CTREvaluator/RetrievalEvaluator)")
        epochs = epochs or self.config.epochs
        self._stopped = False   # a prior early-stopped fit() must not leak
        if self.params is None:
            peek = getattr(train_loader, "peek_batch", None)
            sample = peek() if peek is not None else next(iter(train_loader))
            self.init(sample)
        # loader contract (`data/loader.py`): tail batches are DROPPED for
        # training, padded+masked for eval. fit() strips the mask and
        # trains on every row, so a padding loader would silently train on
        # up to batch_size-1 repeats of one example each epoch.
        n = getattr(train_loader, "num_samples", None)
        bs = getattr(train_loader, "batch_size", None)
        if getattr(train_loader, "drop_last", None) is False \
                and n and bs and n % bs:
            if n >= bs:
                raise ValueError(
                    f"training loader pads its tail batch ({n % bs} real "
                    f"rows repeated up to {bs}) and Trainer.fit trains on "
                    "the padding — construct the train loader with "
                    "drop_last=True (the tail is dropped), or align "
                    "batch_size to the dataset size")
            logger.warning(
                "dataset smaller than one batch (%d < %d): training on a "
                "padded batch (last row repeated %d times); prefer "
                "batch_size=%d", n, bs, bs - n, n)
        last_metrics: Dict[str, float] = {}
        K = max(1, self.config.fused_steps)
        # eval fires whenever the step counter CROSSES a multiple of
        # eval_steps (with fused steps the counter advances by K, so a
        # plain `step % eval_steps == 0` could never hit)
        eval_marker = (self.step // self.config.eval_steps
                       if self.config.eval_steps else 0)
        for epoch in range(self.epoch, epochs):
            self.epoch = epoch
            t0 = time.time()
            losses = []
            pending = []
            for i, batch in enumerate(train_loader):
                if self.stop_callback is not None and self.stop_callback():
                    logger.warning("external stop at epoch %d step %d",
                                   epoch, self.step)
                    return last_metrics
                batch.pop(MASK_KEY, None)
                if K > 1:
                    pending.append(batch)
                    if len(pending) < K:
                        continue
                    stacked = {k: np.stack([b[k] for b in pending])
                               for k in pending[0]}
                    pending = []
                    losses.extend(list(self.train_steps_fused(stacked)))
                else:
                    loss = self.train_step(batch)
                    losses.append(loss)
                if self.config.eval_steps \
                        and self.step // self.config.eval_steps > eval_marker:
                    eval_marker = self.step // self.config.eval_steps
                    last_metrics = self._evaluate_and_checkpoint()
                    if self._stopped:
                        break
            # flush a short tail one step at a time (shape stability)
            for batch in pending:
                if self._stopped:
                    break
                losses.append(self.train_step(batch))
                if self.config.eval_steps \
                        and self.step // self.config.eval_steps > eval_marker:
                    eval_marker = self.step // self.config.eval_steps
                    last_metrics = self._evaluate_and_checkpoint()
            mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
            if np.isnan(mean_loss):
                raise ValueError(f"nan loss at epoch {epoch}")
            logger.info("epoch %d: loss %.6f (%.1fs, %d steps)",
                        epoch, mean_loss, time.time() - t0, len(losses))
            if not self.config.eval_steps:
                last_metrics = self._evaluate_and_checkpoint()
            # a completed epoch advances the counter so that a checkpoint
            # saved now RESUMES at the next epoch (recbole resume_checkpoint
            # start_epoch semantics, `trainer.py:312-340`)
            self.epoch = epoch + 1
            if self._stopped:
                logger.info("early stop at epoch %d (best epoch %d)",
                            epoch, self.monitor.best_epoch)
                break
        # restore best weights at the end (`ranking_model.py:160-161`)
        self._restore_best()
        return last_metrics

    def _evaluate_and_checkpoint(self) -> Dict[str, float]:
        if self.eval_fn is None:
            return {}
        metrics = self.eval_fn(self)
        if jax.process_count() > 1:
            # multi-host: each process evaluated ITS shard of the eval data
            # (host_shard_loader); merge sample-weighted like the reference's
            # all-gather map-reduce (`trainer.py:630-652`). Evaluators expose
            # their local row count as `last_sample_count`.
            from recbox_tpu.parallel.distributed import merge_host_metrics
            weight = getattr(self.eval_fn, "last_sample_count", None)
            if weight is None:
                # Equal-weighting hosts whose eval shards differ in size
                # skews the merged metric vs the reference's sample-weighted
                # map-reduce (`trainer.py:630-652`) — make the silent
                # fallback loud so custom eval_fns set last_sample_count.
                logger.warning(
                    "multi-host eval merge: eval_fn has no "
                    "last_sample_count attribute; falling back to equal "
                    "host weights, which is WRONG if hosts' eval shards "
                    "differ in size. Set eval_fn.last_sample_count to the "
                    "local row count after each call.")
                weight = 1.0
            metrics = merge_host_metrics(metrics, float(weight))
        value, improved, should_stop = self.monitor.update(metrics, self.epoch)
        logger.info("eval @ epoch %d step %d: %s -> monitor %.6f%s",
                    self.epoch, self.step,
                    " ".join(f"{k}={v:.6f}" for k, v in metrics.items()),
                    value, " *best*" if improved else "")
        if improved:
            self._capture_best()
            if self.config.workdir:
                self.save(f"{self.config.workdir}/best.ckpt")
        elif not should_stop:
            self._on_plateau()
        self._stopped = should_stop
        return metrics

    # -- inference -----------------------------------------------------------
    def full_params(self) -> dict:
        """The complete params tree for inference (sparse/packed trainers
        override this to materialize their table state)."""
        return self.params

    def apply(self, batch: Dict[str, np.ndarray], method=None, train: bool = False):
        variables = {"params": self.full_params(), **self.model_state}
        if method is not None:
            if train:
                # method signatures differ (many take no train flag and
                # need their own rngs) — silently dropping the flag would
                # run eval-mode behavior the caller didn't ask for
                raise NotImplementedError(
                    "apply(method=..., train=True) is unsupported: call "
                    "model.apply(variables, batch, train=True, rngs=..., "
                    "method=...) directly")
            return self.model.apply(variables, self._device_batch(batch),
                                    method=method)
        return self.model.apply(variables, self._device_batch(batch),
                                train=train)

    def _forward(self):
        """Cached jitted inference function (variables passed as an arg so the
        compilation survives across eval rounds)."""
        if not hasattr(self, "_fwd_fn"):
            model = self.model
            self._fwd_fn = jax.jit(
                lambda variables, batch: model.apply(variables, batch, train=False))
        return self._fwd_fn

    def predict(self, loader, output_key: Optional[Callable] = None) -> np.ndarray:
        """Run forward over a loader, honoring tail-batch masks.

        ``output_key`` extracts the prediction array from structured model
        outputs (a callable, or a mapping key) before concatenation."""
        if getattr(loader, "shuffle", False):
            # a shuffled loader silently misaligns predictions with the
            # caller's label order — scores look healthy but metrics
            # computed against unshuffled labels are chance-level
            raise ValueError(
                "predict() needs an order-preserving loader; construct it "
                "with shuffle=False")
        outs = []
        variables = {"params": self.full_params(), **self.model_state}
        fwd = self._forward()
        for batch in loader:
            mask = batch.pop(MASK_KEY, None)
            raw = fwd(variables, self._device_batch(batch))
            if callable(output_key):
                raw = output_key(raw)
            elif output_key is not None:
                raw = raw[output_key]
            out = np.asarray(raw)
            if mask is not None:
                out = out[mask.astype(bool)] if mask.ndim == 1 else out
            outs.append(out)
        return np.concatenate(outs, axis=0)

    # -- checkpointing -------------------------------------------------------
    def state_dict(self) -> Dict[str, Any]:
        """The full training state (recbole checkpoint-dict shape,
        `trainer.py:287-310`); also the contract for OrbaxCheckpointer's
        async/sharded saves."""
        return {
            "params": self.params,
            "model_state": self.model_state,
            "opt_state": self.opt_state,
            "step": self.step,
            "epoch": self.epoch,
            "monitor": self.monitor.state(),
        }

    def save(self, path: str) -> None:
        save_checkpoint(path, self.state_dict())

    def load(self, path: str) -> None:
        if self.params is None:
            raise RuntimeError("call init()/fit() before load() so shapes exist")
        state = load_checkpoint(path, {
            "params": self.params,
            "model_state": self.model_state,
            "opt_state": self.opt_state,
            "step": self.step,
            "epoch": self.epoch,
            "monitor": self.monitor.state(),
        })
        self.params = state["params"]
        self.model_state = state["model_state"]
        self.opt_state = state["opt_state"]
        self.step = int(state["step"])
        self.epoch = int(state["epoch"])
        self.monitor.restore(state["monitor"])
        # seed the best-weights cache from the restored state (best.ckpt is
        # written on improvement, so it IS the best-so-far) — otherwise a
        # resumed fit() whose evals never beat the checkpointed best would
        # end on last-epoch drifted weights with _restore_best a no-op
        self._capture_best()
