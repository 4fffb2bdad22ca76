"""Stage evaluators: callables plugged into Trainer as ``eval_fn``.

* RetrievalEvaluator — the reference matching evaluate() path
  (`match_model.py:205-225` + `core/metrics.py:11-68`) made TPU-native:
  encode all unique queries and the whole corpus through the towers in
  fixed-shape batches, then run the on-device MIPS top-k metric engine.
* CTREvaluator — the ranking evaluate() path (`ranking_model.py:219-241`):
  predict probabilities over the validation loader, compute AUC/logloss
  (exact, host) and grouped gAUC/NDCG.
* RerankEvaluator lives in `evaluation/rerank.py`.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from recbox_tpu.data.loader import MASK_KEY, ArrayLoader
from recbox_tpu.evaluation.ctr import evaluate_ctr
from recbox_tpu.evaluation.retrieval import evaluate_retrieval

__all__ = ["RetrievalEvaluator", "CTREvaluator", "MultiTaskEvaluator"]


class RetrievalEvaluator:
    def __init__(
        self,
        user_arrays: Dict[str, np.ndarray],
        corpus_arrays: Dict[str, np.ndarray],
        query_indices: np.ndarray,
        train_user2items: Mapping[int, Sequence[int]],
        valid_user2items: Mapping[int, Sequence[int]],
        metrics: Sequence[str] = ("Recall(k=20)", "NDCG(k=10)"),
        batch_size: int = 4096,
        beyond_accuracy_metrics: Sequence[str] = (),
        beyond_topk: int = 20,
        item_counts: Optional[np.ndarray] = None,
        item_categories: Optional[np.ndarray] = None,
        protocol: str = "full",
        protocol_seed: int = 2024,
        exclude_items: Sequence[int] = (),
    ):
        self.user_loader = ArrayLoader(user_arrays, batch_size=batch_size,
                                       shuffle=False)
        self.corpus_loader = ArrayLoader(corpus_arrays, batch_size=batch_size,
                                         shuffle=False)
        self.query_indices = np.asarray(query_indices)
        self.train_user2items = train_user2items
        self.valid_user2items = valid_user2items
        self.metrics = list(metrics)
        # evaluation protocol (recbole eval_args mode): 'full' = full-sort
        # over the whole corpus; 'uniN'/'popN' = each positive ranked
        # against N sampled negatives (NegSampleEvalDataLoader,
        # `general_dataloader.py:74-183`). Candidates are sampled ONCE at
        # first evaluation (fixed seed) like the reference's
        # loader-construction-time sampling, so every eval round ranks the
        # same candidate lists.
        self.protocol = protocol
        self.protocol_seed = protocol_seed
        # catalog rows that are not real items (e.g. the PAD/OOV row 0 of
        # a tokenizer-layout corpus): −inf-masked in full-sort, never drawn
        # as sampled-protocol negatives, excluded from beyond-accuracy
        self.exclude_items = tuple(exclude_items)
        self._candidates = None
        if protocol != "full":
            from recbox_tpu.evaluation.candidate import parse_protocol
            parse_protocol(protocol)  # fail fast on bad spellings
        # beyond-accuracy (recbole evaluator parity: ItemCoverage,
        # AveragePopularity, ShannonEntropy, GiniIndex, TailPercentage) over
        # the masked top-`beyond_topk` lists; popularity counts default to
        # train interaction counts
        self.beyond_accuracy_metrics = list(beyond_accuracy_metrics)
        self.beyond_topk = beyond_topk
        self.item_counts = item_counts
        # (num_items, num_categories) 0/1 matrix for the daisy Diversity
        # metric (`daisy/utils/metrics.py:125-148`)
        self.item_categories = item_categories
        self._encode = None

    def _encoders(self, trainer):
        model = trainer.model
        if self._encode is None or self._encode[0] is not model:
            user_fn = jax.jit(lambda v, b: model.apply(
                v, b, method=model.encode_user))
            item_fn = jax.jit(lambda v, b: model.apply(
                v, b, method=model.encode_item))
            self._encode = (model, user_fn, item_fn)
        return self._encode[1], self._encode[2]

    def encode_all(self, trainer):
        user_fn, item_fn = self._encoders(trainer)
        params = trainer.full_params() if hasattr(trainer, "full_params") \
            else trainer.params
        variables = {"params": params, **trainer.model_state}

        def run(loader, fn):
            outs = []
            for batch in loader:
                mask = batch.pop(MASK_KEY)
                emb = np.asarray(fn(variables, trainer._device_batch(batch)))
                outs.append(emb[mask.astype(bool)])
            return np.concatenate(outs, axis=0)

        return run(self.user_loader, user_fn), run(self.corpus_loader, item_fn)

    def _train_item_counts(self, num_items: int) -> np.ndarray:
        all_items = [np.asarray(l, np.int64)
                     for l in self.train_user2items.values() if len(l)]
        return np.bincount(
            np.concatenate(all_items) if all_items
            else np.zeros(0, np.int64), minlength=num_items)

    def __call__(self, trainer) -> Dict[str, float]:
        user_embs, item_embs = self.encode_all(trainer)
        # local shard size for the Trainer's cross-host metric merge
        self.last_sample_count = float(len(self.query_indices))
        if self.protocol == "full":
            out = evaluate_retrieval(
                user_embs, item_embs, self.train_user2items,
                self.valid_user2items, self.query_indices, self.metrics,
                exclude_items=self.exclude_items)
        else:
            from recbox_tpu.evaluation.candidate import (
                evaluate_candidate_retrieval, parse_protocol,
                sample_eval_candidates,
            )
            if self._candidates is None:
                dist, n_neg = parse_protocol(self.protocol)
                counts = self.item_counts
                if counts is None and dist == "popularity":
                    counts = self._train_item_counts(item_embs.shape[0])
                self._candidates = sample_eval_candidates(
                    self.query_indices, self.train_user2items,
                    self.valid_user2items, item_embs.shape[0], n_neg,
                    distribution=dist, item_counts=counts,
                    seed=self.protocol_seed,
                    exclude_items=self.exclude_items)
            cand_ids, cand_valid, true_padded = self._candidates
            out = evaluate_candidate_retrieval(
                user_embs, item_embs, cand_ids, cand_valid, true_padded,
                self.metrics)
        if self.beyond_accuracy_metrics:
            from recbox_tpu.evaluation.beyond_accuracy import (
                evaluate_beyond_accuracy,
            )
            from recbox_tpu.evaluation.retrieval import (
                _pad_lists, full_sort_topk,
            )
            num_items = item_embs.shape[0]
            if self.protocol != "full" and self._candidates is not None:
                # sampled protocols: the recommendation set IS the
                # candidate-ranked list (recbole's NegSample mode derives
                # coverage/Gini/… from the same lists the accuracy metrics
                # rank) — a full-sort basis here would make the metric
                # bundle internally inconsistent
                from recbox_tpu.evaluation.candidate import candidate_topk
                cand_ids, cand_valid, _ = self._candidates
                topk_ids = np.asarray(candidate_topk(
                    jnp.asarray(user_embs), jnp.asarray(item_embs),
                    jnp.asarray(cand_ids), jnp.asarray(cand_valid),
                    self.beyond_topk))
            else:
                excl = list(self.exclude_items)
                train_lists = [list(self.train_user2items.get(q, ())) + excl
                               for q in self.query_indices]
                train_padded = _pad_lists(train_lists, pad=num_items)
                # chunk users — full_sort_topk over everyone at once would
                # materialize the whole (U, I) score matrix on device
                chunks = []
                for s in range(0, len(user_embs), 1024):
                    _, ids = full_sort_topk(
                        user_embs[s:s + 1024], item_embs, self.beyond_topk,
                        train_items=train_padded[s:s + 1024])
                    chunks.append(ids)
                topk_ids = np.concatenate(chunks, axis=0)
            counts = self.item_counts
            if counts is None:
                # popularity from the FULL training mapping (recbole's
                # AveragePopularity counts all train interactions), not just
                # the evaluated queries' lists
                counts = self._train_item_counts(num_items)
            out.update(evaluate_beyond_accuracy(
                topk_ids, num_items, item_counts=counts,
                metrics=self.beyond_accuracy_metrics,
                item_categories=self.item_categories))
        return out


class CTREvaluator:
    def __init__(
        self,
        arrays: Dict[str, np.ndarray],
        label: str,
        metrics: Sequence[str] = ("AUC", "logloss"),
        group_id: Optional[str] = None,
        batch_size: int = 4096,
        from_logits: bool = True,
    ):
        self.arrays = arrays
        self.label = label
        self.metrics = list(metrics)
        self.group_id = group_id
        self.loader = ArrayLoader(arrays, batch_size=batch_size, shuffle=False)
        self.from_logits = from_logits

    def __call__(self, trainer) -> Dict[str, float]:
        self.last_sample_count = float(len(self.arrays[self.label]))
        logits = trainer.predict(self.loader)
        probs = np.asarray(jax.nn.sigmoid(jnp.asarray(logits))) \
            if self.from_logits else logits
        y_true = self.arrays[self.label]
        gid = self.arrays[self.group_id] if self.group_id else None
        return evaluate_ctr(y_true, probs, self.metrics, group_id=gid)


class MultiTaskEvaluator:
    """Per-task AUC/logloss + arithmetic mean over tasks.

    Mirrors the reference MultiTaskModel.evaluate protocol
    (`recbox/ranking/pytorch/models/multitask_model.py:95-130`): metric keys
    are '<label>_<metric>' plus the averaged '<metric>' used for monitoring.
    """

    def __init__(self, arrays, labels, metrics=("AUC", "logloss"),
                 batch_size: int = 4096, from_logits: bool = True):
        self.arrays = arrays
        self.labels = list(labels)
        self.metrics = list(metrics)
        self.loader = ArrayLoader(arrays, batch_size=batch_size, shuffle=False)
        self.from_logits = from_logits

    def __call__(self, trainer):
        self.last_sample_count = float(len(self.arrays[self.labels[0]]))
        outputs = trainer.predict(self.loader)  # (N, T)
        if self.from_logits:
            outputs = np.asarray(jax.nn.sigmoid(jnp.asarray(outputs)))
        results = {}
        for metric in self.metrics:
            vals = []
            for t, label in enumerate(self.labels):
                out = evaluate_ctr(self.arrays[label], outputs[:, t], [metric])
                results[f"{label}_{metric}"] = out[metric]
                vals.append(out[metric])
            results[metric] = float(np.mean(vals))
        return results
