"""Retrieval serving: trained towers → queryable top-k index.

The reference's offline serving path is `MatchTrainer.inference_embedding`
(dump user/item embeddings, `rechub/trainers/match_trainer.py:156`) feeding
an Annoy or Milvus index (`rechub/utils/match.py:161-251`) or faiss
(`recbox/utils/ann/faiss.py`). `RetrievalService` is that path as one
object over the framework's own engines:

    svc = RetrievalService.from_trainer(trainer, corpus_arrays,
                                        method="segmented")
    scores, ids = svc.query({"user_id": uids}, k=100)
    svc.refresh_items(new_corpus_arrays)      # corpus swap, index rebuilt

Towers come from any MatchingModel (encode_user/encode_item); the index is
`BruteForceMIPS` (method: approx | segmented | pallas | refined | exact,
optionally mesh-sharded over the item axis) — the TPU-native replacement
for the external ANN services. Multi-interest models (MIND/ComiRec) work
unchanged: (B, K, D) queries score max-over-interests in the engine.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from recbox_tpu.data.loader import MASK_KEY, ArrayLoader
from recbox_tpu.retrieval.index import BruteForceMIPS

__all__ = ["RetrievalService"]


class RetrievalService:
    """Encode-once item index + tower-encoded query path."""

    def __init__(self, model, variables, corpus_arrays: Dict[str, np.ndarray],
                 metric: str = "ip", method: str = "segmented",
                 batch_size: int = 8192, mesh=None, **index_kwargs):
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
        self.refresh_items(corpus_arrays)

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
        self.item_embs = self._encode(self._item_fn, corpus_arrays)
        self.index = BruteForceMIPS(self.item_embs, metric=self.metric,
                                    method=self.method, mesh=self.mesh,
                                    **self.index_kwargs)

    @property
    def num_items(self) -> int:
        return self.item_embs.shape[0]

    # -- queries ---------------------------------------------------------------
    def query(self, user_arrays: Dict[str, np.ndarray], k: int = 100,
              exclude: Optional[Sequence[Sequence[int]]] = None,
              ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores, item_ids) top-k per query row.

        ``exclude`` gives per-row item-id lists to filter out (seen-items
        masking, `core/metrics.py:56-62`); filtering over-retrieves by the
        longest exclude list so every row still returns k items.
        """
        q = self._encode(self._user_fn, user_arrays)
        if exclude is None:
            s, i = self.index.search(q, topk=k)
            return s, i
        extra = max((len(e) for e in exclude), default=0)
        s, i = self.index.search(q, topk=min(k + extra, self.num_items))
        out_s = np.full((len(q), k), -np.inf, np.float32)
        out_i = np.full((len(q), k), -1, np.int32)
        for r in range(len(q)):
            banned = set(int(x) for x in exclude[r]) if r < len(exclude) \
                else set()
            keep = [c for c in range(i.shape[1])
                    if int(i[r, c]) not in banned][:k]
            out_s[r, :len(keep)] = s[r, keep]
            out_i[r, :len(keep)] = i[r, keep]
        return out_s, out_i
