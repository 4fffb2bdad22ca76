"""Retrieval serving: trained towers → queryable top-k index.

The reference's offline serving path is `MatchTrainer.inference_embedding`
(dump user/item embeddings, `rechub/trainers/match_trainer.py:156`) feeding
an Annoy or Milvus index (`rechub/utils/match.py:161-251`) or faiss
(`recbox/utils/ann/faiss.py`). `RetrievalService` is that path as one
object over the framework's own engines:

    svc = RetrievalService.from_trainer(trainer, corpus_arrays)
    scores, ids = svc.query({"user_id": uids}, k=100)
    svc.refresh_items(new_corpus_arrays)      # corpus swap, index rebuilt
    svc.save("serving/v42")                   # durable snapshot (rank-0)
    svc = RetrievalService.load("serving/v42", model)   # no re-encode

Towers come from any MatchingModel (encode_user/encode_item); the index is
`BruteForceMIPS` (method: auto (default — the fused running-top-k Pallas
kernel on TPU when its structural recall fits recall_target, 3.40x the
best XLA formulation at k=500 over 1M items; XLA engines otherwise) |
approx | segmented | pallas | refined | exact, optionally mesh-sharded
over the item axis) — the TPU-native replacement for the external ANN
services. Extra index options pass through, e.g.
``RetrievalService(..., quantize="int8")`` serves from an int8-quantized
corpus (2× MXU rate, 4× less HBM; pair with method='refined' for exact
returned scores). Multi-interest models (MIND/ComiRec) work
unchanged: (B, K, D) towers retrieve per interest, then merge by max
score with per-row dedup (the MIND serving recipe).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from recbox_tpu.data.loader import MASK_KEY, ArrayLoader
from recbox_tpu.retrieval.index import BruteForceMIPS

__all__ = ["RetrievalService"]


def _merge_interests(s: np.ndarray, i: np.ndarray, t: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Merge (B, K*t) per-interest candidates: dedup per row keeping each
    item's max score, return the top-t by merged score."""
    order = np.argsort(-s, axis=1, kind="stable")
    s_d = np.take_along_axis(s, order, axis=1)
    i_d = np.take_along_axis(i, order, axis=1)
    B = s.shape[0]
    out_s = np.full((B, t), -np.inf, np.float32)
    out_i = np.full((B, t), -1, i.dtype)
    for r in range(B):
        # first occurrence in desc-score order == per-id max score
        _, first = np.unique(i_d[r], return_index=True)
        keep = np.sort(first)[:t]
        out_s[r, :len(keep)] = s_d[r, keep]
        out_i[r, :len(keep)] = i_d[r, keep]
    return out_s, out_i


class RetrievalService:
    """Encode-once item index + tower-encoded query path."""

    def __init__(self, model, variables,
                 corpus_arrays: Optional[Dict[str, np.ndarray]] = None,
                 metric: str = "ip", method: str = "auto",
                 batch_size: int = 8192, mesh=None,
                 item_embs: Optional[np.ndarray] = None, **index_kwargs):
        if (corpus_arrays is None) == (item_embs is None):
            raise ValueError(
                "pass exactly one of corpus_arrays (encode now) or "
                "item_embs (pre-encoded, e.g. RetrievalService.load)")
        self.model = model
        self.variables = variables
        self.metric = metric
        self.method = method
        self.batch_size = batch_size
        self.mesh = mesh
        self.index_kwargs = index_kwargs
        self._user_fn = jax.jit(lambda v, b: model.apply(
            v, b, method=model.encode_user))
        self._item_fn = jax.jit(lambda v, b: model.apply(
            v, b, method=model.encode_item))
        if corpus_arrays is not None:
            self.refresh_items(corpus_arrays)
        else:
            self._build_index(np.asarray(item_embs))

    @classmethod
    def from_trainer(cls, trainer, corpus_arrays: Dict[str, np.ndarray],
                     **kwargs) -> "RetrievalService":
        params = trainer.full_params() if hasattr(trainer, "full_params") \
            else trainer.params
        variables = {"params": params, **trainer.model_state}
        return cls(trainer.model, variables, corpus_arrays, **kwargs)

    def _encode(self, fn, arrays: Dict[str, np.ndarray]) -> np.ndarray:
        outs = []
        for batch in ArrayLoader(arrays, batch_size=self.batch_size,
                                 shuffle=False):
            mask = batch.pop(MASK_KEY)
            emb = np.asarray(fn(self.variables, batch))
            outs.append(emb[mask.astype(bool)])
        return np.concatenate(outs, axis=0)

    # -- corpus lifecycle ------------------------------------------------------
    def refresh_items(self, corpus_arrays: Dict[str, np.ndarray]) -> None:
        """Re-encode the corpus and rebuild the index (item catalog swap —
        the Milvus collection-rebuild analog, `match.py:197-219`)."""
        self._build_index(self._encode(self._item_fn, corpus_arrays))

    def _build_index(self, item_embs: np.ndarray) -> None:
        self.item_embs = item_embs
        self.index = BruteForceMIPS(self.item_embs, metric=self.metric,
                                    method=self.method, mesh=self.mesh,
                                    **self.index_kwargs)

    # -- persistence -----------------------------------------------------------
    def save(self, path: str) -> None:
        """Persist the service to a directory: encoded corpus + model
        variables + index config. The faiss-analog of `index.dump()` plus
        the reference's inference_embedding dump
        (`rechub/trainers/match_trainer.py:156`), in one durable unit.

        Rank-0-only under multi-process runs (same discipline as
        `save_checkpoint`). Reload with ``RetrievalService.load(path,
        model)`` — the model definition is code, not data, so the caller
        supplies it (flax's standard split of module vs variables).
        """
        import jax as _jax
        if _jax.process_count() > 1 and _jax.process_index() != 0:
            return
        import json
        import os
        from flax import serialization
        os.makedirs(path, exist_ok=True)
        tmp = os.path.join(path, "item_embs.tmp.npy")  # np.save appends .npy
        np.save(tmp, self.item_embs)
        os.replace(tmp, os.path.join(path, "item_embs.npy"))
        from flax import linen as _nn
        # unbox Partitioned/AxisMetadata leaves: restoring raw state dicts
        # must yield plain arrays, not {"value": ...} stubs apply can't read
        var_bytes = serialization.to_bytes(
            _jax.tree_util.tree_map(np.asarray,
                                    _nn.meta.unbox(self.variables)))
        tmp = os.path.join(path, "variables.msgpack.tmp")
        with open(tmp, "wb") as fh:
            fh.write(var_bytes)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(path, "variables.msgpack"))
        cfg = {"metric": self.metric, "method": self.method,
               "batch_size": self.batch_size,
               "index_kwargs": self.index_kwargs}
        tmp = os.path.join(path, "service.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(cfg, fh)
        os.replace(tmp, os.path.join(path, "service.json"))

    @classmethod
    def load(cls, path: str, model, mesh=None) -> "RetrievalService":
        """Rebuild a saved service: no corpus re-encode (the index is built
        straight from the persisted embeddings), variables restored without
        needing an init batch (msgpack_restore carries the tree)."""
        import json
        import os
        from flax import serialization
        with open(os.path.join(path, "service.json")) as fh:
            cfg = json.load(fh)
        with open(os.path.join(path, "variables.msgpack"), "rb") as fh:
            variables = serialization.msgpack_restore(fh.read())
        item_embs = np.load(os.path.join(path, "item_embs.npy"))
        return cls(model, variables, metric=cfg["metric"],
                   method=cfg["method"], batch_size=cfg["batch_size"],
                   mesh=mesh, item_embs=item_embs, **cfg["index_kwargs"])

    @property
    def num_items(self) -> int:
        return self.item_embs.shape[0]

    # -- queries ---------------------------------------------------------------
    def query(self, user_arrays: Dict[str, np.ndarray], k: int = 100,
              exclude: Optional[Sequence[Sequence[int]]] = None,
              ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores, item_ids) top-k per query row, shapes (Q, min(k, N)).

        Multi-interest towers returning (B, K, D) are retrieved per
        interest and merged by max score with per-row dedup (the MIND
        serving recipe: K ANN lookups, score-merge).

        ``exclude`` gives per-row item-id lists to filter out (seen-items
        masking, `core/metrics.py:56-62`); filtering over-retrieves by the
        longest exclude list. When a row's candidate pool is exhausted
        (catalog smaller than k + excludes), trailing slots pad with
        score=-inf, id=-1 — callers must treat -1 as "no item".
        """
        q = self._encode(self._user_fn, user_arrays)
        k = min(k, self.num_items)
        extra = max((len(e) for e in exclude), default=0) \
            if exclude is not None else 0
        t = min(k + extra, self.num_items)
        if q.ndim == 3:  # (B, K, D) multi-interest: retrieve per interest
            B, K, D = q.shape
            s, i = self.index.search(q.reshape(B * K, D), topk=t)
            s, i = _merge_interests(s.reshape(B, -1), i.reshape(B, -1), t)
        else:
            s, i = self.index.search(q, topk=t)
        if exclude is None:
            return s[:, :k], i[:, :k]
        # vectorized seen-filter: pad banned lists, mask to -inf, re-rank
        banned = np.full((s.shape[0], max(extra, 1)), -1, dtype=np.int64)
        for r, e in enumerate(exclude):
            if len(e):
                banned[r, :len(e)] = np.asarray(e, dtype=np.int64)
        bad = (i[:, :, None] == banned[:, None, :]).any(-1)
        s = np.where(bad, -np.inf, s).astype(np.float32)
        order = np.argsort(-s, axis=1, kind="stable")[:, :k]
        out_s = np.take_along_axis(s, order, axis=1)
        out_i = np.take_along_axis(i, order, axis=1)
        return out_s, np.where(np.isneginf(out_s), -1, out_i)
