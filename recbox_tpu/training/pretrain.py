"""S3Rec phased pretraining: schedule driver + pretrain-data reconstruction.

TPU-native re-design of the reference's S3Rec pretrain pipeline
(`third_party/recbole/model/sequential_recommender/s3rec.py:266-440`
reconstruct_pretrain_data + pretrain, and `trainer/trainer.py:743-830`
PretrainTrainer/S3RecTrainer):

* `reconstruct_pretrain_batch` — the reference builds masked/segment
  instances with per-row Python loops and `random.randint` rejection
  sampling; here it is one vectorized numpy pass with STATIC shapes
  (fixed (B, L) arrays + validity masks), so the jitted joint-loss step
  never recompiles and the host never loops over rows.
* `S3RecPretrainer` — runs the pretrain phase (joint AAP+MIP+MAP+SP loss,
  Adam, per-epoch checkpoints like PretrainTrainer.save_pretrained_model),
  then hands the pretrained parameters to a fine-tune `Trainer` via
  `transfer_to` (bidirectional encoder + item table are reused; the causal
  fine-tune encoder starts fresh, matching the reference where pretrain
  weights load into the same module set).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recbox_tpu.utils.seeding import training_key

logger = logging.getLogger("recbox_tpu")

__all__ = ["reconstruct_pretrain_batch", "S3RecPretrainer",
           "transfer_pretrained"]


def reconstruct_pretrain_batch(item_seq: np.ndarray, seq_len: np.ndarray,
                               n_items: int, mask_token: int,
                               rng: np.random.Generator,
                               mask_ratio: float = 0.2,
                               attribute_table: Optional[np.ndarray] = None,
                               neg_tries: int = 8) -> Dict[str, np.ndarray]:
    """Vectorized S3Rec pretrain-data reconstruction (`s3rec.py:278-360`).

    Args:
      item_seq: (B, L) right-padded item ids (0 = pad).
      seq_len: (B,) valid lengths.
      n_items: item vocabulary size (ids 1..n_items-1 are real items).
      mask_token: the [MASK] id (model.mask_token == vocab_size).
      mask_ratio: per-position Bernoulli mask probability.
      attribute_table: optional (n_items[+1], A) multi-hot item→attribute
        matrix; when given, the output carries per-position attribute
        targets for AAP/MAP.
      neg_tries: rejection-sampling draws per masked position; a draw
        colliding with ANY item of the row's sequence is rejected (the
        reference loops until clean; with ≥8 draws the residual collision
        probability is negligible and the fallback keeps the last draw).

    Returns dict of LEFT-padded (reference `_padding_zero_at_left`) arrays:
      masked_seq, pos_items, neg_items, masked_segment, pos_segment,
      neg_segment — all (B, L) int32; seq_len (B,); attributes (B, L, A)
      if attribute_table was given.
    """
    item_seq = np.asarray(item_seq)
    seq_len = np.asarray(seq_len).astype(np.int32)
    B, L = item_seq.shape
    j = np.arange(L)[None, :]                       # (1, L)
    valid = j < seq_len[:, None]                    # (B, L)

    # ---- masked item prediction instances -------------------------------
    mask_draw = (rng.random((B, L)) < mask_ratio) & valid
    masked_seq = np.where(mask_draw, mask_token, item_seq)
    pos_items = item_seq.copy()
    # negatives: uniform in [1, n_items), rejecting members of the row set
    cand = rng.integers(1, n_items, size=(B, L, neg_tries)).astype(np.int32)
    member = (cand[:, :, :, None] ==
              np.where(valid, item_seq, -1)[:, None, None, :]).any(-1)
    first_ok = np.argmax(~member, axis=-1)          # first non-member try
    chosen = np.take_along_axis(cand, first_ok[..., None], axis=-1)[..., 0]
    neg_items = np.where(mask_draw, chosen, item_seq).astype(np.int32)

    # ---- segment prediction instances ------------------------------------
    ln = seq_len.astype(np.int64)
    can_segment = ln >= 2
    max_s = np.maximum(ln // 2, 1)
    s = 1 + (rng.random(B) * max_s).astype(np.int64)          # [1, len//2]
    s = np.minimum(s, max_s)
    start = (rng.random(B) * (ln - s + 1)).astype(np.int64)
    in_seg = (j >= start[:, None]) & (j < (start + s)[:, None]) & valid \
        & can_segment[:, None]
    masked_segment = np.where(in_seg, mask_token, item_seq)
    pos_segment = np.where(
        in_seg, item_seq,
        np.where(valid & can_segment[:, None], mask_token, item_seq))
    # negative segment: a random window of the concatenated corpus of rows
    flat = item_seq[valid]                                    # (total,)
    total = len(flat)
    neg_start = (rng.random(B) * np.maximum(total - s, 1)).astype(np.int64)
    neg_idx = np.clip(neg_start[:, None] + (j - start[:, None]), 0, total - 1)
    neg_fill = flat[neg_idx] if total else item_seq
    neg_segment = np.where(in_seg, neg_fill, pos_segment)

    out = {
        "masked_seq": _left_pad(masked_seq, seq_len),
        "pos_items": _left_pad(pos_items, seq_len),
        "neg_items": _left_pad(neg_items, seq_len),
        "masked_segment": _left_pad(masked_segment, seq_len),
        "pos_segment": _left_pad(pos_segment, seq_len),
        "neg_segment": _left_pad(neg_segment, seq_len),
        "seq_len": seq_len,
    }
    if attribute_table is not None:
        att = np.asarray(attribute_table)
        # target attributes follow the ORIGINAL item at each position
        out["attributes"] = att[_left_pad(pos_items, seq_len)]
    return {k: v.astype(np.int32) if v.dtype.kind in "iu" else v
            for k, v in out.items()}


def _left_pad(arr: np.ndarray, seq_len: np.ndarray) -> np.ndarray:
    """Shift right-padded rows so the valid tail ends at the last column
    (reference pads zeros at the left, `s3rec.py:272-276`)."""
    B, L = arr.shape
    shift = (L - seq_len)[:, None]                   # (B, 1)
    j = np.arange(L)[None, :]
    src = j - shift
    gathered = np.take_along_axis(arr, np.clip(src, 0, L - 1), axis=1)
    return np.where(src >= 0, gathered, 0)


def transfer_pretrained(init_params: dict, pretrained: dict) -> dict:
    """Graft pretrained subtrees (item table, bidirectional encoder, heads)
    onto freshly initialized fine-tune params; subtrees absent from the
    pretrained dict (e.g. the causal encoder) keep their fresh init."""
    out = {}
    for k, v in init_params.items():
        if k in pretrained:
            out[k] = (transfer_pretrained(v, pretrained[k])
                      if isinstance(v, dict) else pretrained[k])
        else:
            out[k] = v
    return out


class S3RecPretrainer:
    """Phase-1 driver: optimize the joint AAP+MIP+MAP+SP objective.

    Usage::

        pre = S3RecPretrainer(model, mask_ratio=0.2)
        params = pre.pretrain(item_seq, seq_len, epochs=..., batch_size=...)
        trainer = Trainer(model, loss, cfg, train_method="full_scores")
        trainer.init(sample_batch)
        trainer.params = transfer_pretrained(trainer.params, params)
        trainer.fit(...)   # fine-tune (SASRec protocol)

    Reference: S3RecTrainer routes train_stage='pretrain' to
    PretrainTrainer.pretrain (`trainer/trainer.py:771-830`).
    """

    def __init__(self, model, learning_rate: float = 1e-3,
                 weights=(0.2, 1.0, 1.0, 0.5), mask_ratio: float = 0.2,
                 attribute_table: Optional[np.ndarray] = None,
                 seed: int = 2024, workdir: Optional[str] = None,
                 rng_impl: str = "rbg"):
        self.model = model
        self.weights = tuple(weights)
        self.mask_ratio = mask_ratio
        self.attribute_table = attribute_table
        self.workdir = workdir
        self.tx = optax.adam(learning_rate)
        self.params = None
        self.opt_state = None
        self._rng = training_key(seed, rng_impl)
        self._np_rng = np.random.default_rng(seed)
        self._step_fn = None

    def _init(self, sample: Dict[str, np.ndarray]) -> None:
        rng, self._rng = jax.random.split(self._rng)
        batch = {k: jnp.asarray(v) for k, v in sample.items()}
        variables = self.model.init(
            {"params": rng, "dropout": rng}, batch,
            method=self.model.pretrain_losses, weights=self.weights)
        import flax
        self.params = flax.linen.meta.unbox(
            flax.core.unfreeze(variables)["params"])
        self.opt_state = self.tx.init(self.params)

    def _build_step(self):
        model, weights, tx = self.model, self.weights, self.tx

        def step(params, opt_state, batch, rng):
            def loss_fn(p):
                return model.apply(
                    {"params": p}, batch, weights=weights, train=True,
                    rngs={"dropout": rng}, method=model.pretrain_losses)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        return jax.jit(step, donate_argnums=(0, 1))

    def pretrain(self, item_seq: np.ndarray, seq_len: np.ndarray,
                 epochs: int = 1, batch_size: int = 256) -> dict:
        """Run the pretrain phase; returns the pretrained params tree."""
        fm = self.model.feature_map
        n_items = fm[fm.corpus_index].vocab_size
        mask_token = n_items
        item_seq = np.asarray(item_seq)
        seq_len = np.asarray(seq_len)
        n = len(item_seq)
        if n == 0:
            raise ValueError("pretrain() needs at least one sequence")
        # full batches only (static shapes for the jitted step); shrink the
        # batch when the dataset is smaller than one batch so training
        # always happens
        batch_size = min(batch_size, n)
        for epoch in range(epochs):
            order = self._np_rng.permutation(n)
            losses = []
            for i in range(0, n - batch_size + 1, batch_size):
                idx = order[i:i + batch_size]
                batch = reconstruct_pretrain_batch(
                    item_seq[idx], seq_len[idx], n_items, mask_token,
                    self._np_rng, self.mask_ratio, self.attribute_table)
                if self.params is None:
                    self._init(batch)
                if self._step_fn is None:
                    self._step_fn = self._build_step()
                rng, self._rng = jax.random.split(self._rng)
                dbatch = {k: jnp.asarray(v) for k, v in batch.items()}
                self.params, self.opt_state, loss = self._step_fn(
                    self.params, self.opt_state, dbatch, rng)
                losses.append(loss)
            mean = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
            logger.info("s3rec pretrain epoch %d: loss %.4f", epoch, mean)
            if self.workdir:
                from recbox_tpu.training.checkpoint import save_checkpoint
                save_checkpoint(f"{self.workdir}/pretrain-{epoch}.ckpt",
                                {"params": self.params, "epoch": epoch})
        return self.params
