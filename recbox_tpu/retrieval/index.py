"""On-device brute-force MIPS top-k index: the serving-side retrieval engine.

Functional replacement for the reference's ANN stack — faiss `IndexFlatIP`
(`recbox/utils/ann/faiss.py:3-15`), Annoy and Milvus wrappers
(`third_party/rechub/utils/match.py:161-251`) — as exact MIPS on TPU:

* single device: scores stream through a `lax.scan` over item chunks with a
  running top-k merge, so the (Q, N) score matrix never materializes in HBM —
  the matmul tiles onto the MXU, the merge is O(k) per chunk;
* sharded: items are row-sharded over the mesh 'model' axis inside a
  `shard_map`; each shard computes its local top-k, then one `all_gather` of
  (k · shards) candidates and a final merge — the ICI all-gather merge of
  SURVEY §7 step 8. Exactness matches faiss-exact (no approximation).

Supported metrics: 'ip' (MIPS), 'cosine' (L2-normalized at build), matching
the FaissIndex normalize option.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from recbox_tpu.parallel.mesh import MODEL_AXIS

__all__ = ["BruteForceMIPS", "chunked_topk"]


@functools.partial(jax.jit, static_argnames=("topk", "chunk_size"))
def chunked_topk(queries: jnp.ndarray, items: jnp.ndarray, topk: int,
                 chunk_size: int = 8192) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over items without materializing the full score matrix.

    Scans item chunks, keeping a running (Q, topk) best-scores/indices pair;
    each step is one (Q, D)×(D, C) matmul + a top-k merge of 2k candidates.
    """
    Q = queries.shape[0]
    N, D = items.shape
    pad = (-N) % chunk_size
    if pad:
        items = jnp.concatenate(
            [items, jnp.zeros((pad, D), items.dtype)], axis=0)
    num_chunks = items.shape[0] // chunk_size
    chunks = items.reshape(num_chunks, chunk_size, D)

    init_scores = jnp.full((Q, topk), -jnp.inf, jnp.float32)
    init_idx = jnp.zeros((Q, topk), jnp.int32)

    def body(carry, inp):
        best_s, best_i = carry
        chunk, start = inp
        s = jnp.dot(queries, chunk.T, preferred_element_type=jnp.float32)
        # mask padded rows
        valid = (start + jnp.arange(chunk_size)) < N
        s = jnp.where(valid[None, :], s, -jnp.inf)
        cs, ci = jax.lax.top_k(s, min(topk, chunk_size))
        ci = ci + start
        merged_s = jnp.concatenate([best_s, cs], axis=1)
        merged_i = jnp.concatenate([best_i, ci.astype(jnp.int32)], axis=1)
        ns, pos = jax.lax.top_k(merged_s, topk)
        ni = jnp.take_along_axis(merged_i, pos, axis=1)
        return (ns, ni), None

    starts = jnp.arange(num_chunks) * chunk_size
    (scores, indices), _ = jax.lax.scan(body, (init_scores, init_idx),
                                        (chunks, starts))
    return scores, indices


class BruteForceMIPS:
    """Exact MIPS top-k index over an item matrix, optionally mesh-sharded.

    API mirrors FaissIndex (`faiss.py:11-15`): build from (N, D) embeddings,
    `search(queries, topk) -> (scores, indices)`.
    """

    def __init__(self, item_embs: np.ndarray, metric: str = "ip",
                 mesh: Optional[Mesh] = None, chunk_size: int = 8192):
        items = jnp.asarray(item_embs, jnp.float32)
        if metric == "cosine":
            items = items / jnp.maximum(
                jnp.linalg.norm(items, axis=-1, keepdims=True), 1e-12)
        elif metric != "ip":
            raise NotImplementedError(f"metric={metric}")
        self.metric = metric
        self.num_items, self.dim = items.shape
        self.mesh = mesh
        self.chunk_size = chunk_size
        self._search_sharded = None
        if mesh is not None:
            n_shards = mesh.shape[MODEL_AXIS]
            pad = (-self.num_items) % n_shards
            if pad:
                items = jnp.concatenate(
                    [items, jnp.full((pad, self.dim), -jnp.inf, jnp.float32)],
                    axis=0)
            self.padded_items = jax.device_put(
                items, NamedSharding(mesh, P(MODEL_AXIS, None)))
            self.shard_size = items.shape[0] // n_shards
        else:
            self.items = items

    def _build_sharded_search(self, topk: int):
        mesh = self.mesh
        shard_size = self.shard_size
        num_items = self.num_items

        def local_search(queries, items_shard):
            # items_shard: (shard_size, D) local rows; queries replicated
            shard_idx = jax.lax.axis_index(MODEL_AXIS)
            s = jnp.dot(queries, items_shard.T,
                        preferred_element_type=jnp.float32)
            k = min(topk, shard_size)
            cs, ci = jax.lax.top_k(s, k)
            ci = ci + shard_idx * shard_size
            # gather candidates from every shard: (n_shards*k) per query
            all_s = jax.lax.all_gather(cs, MODEL_AXIS, axis=1, tiled=True)
            all_i = jax.lax.all_gather(ci, MODEL_AXIS, axis=1, tiled=True)
            valid = all_i < num_items
            all_s = jnp.where(valid, all_s, -jnp.inf)
            ms, pos = jax.lax.top_k(all_s, topk)
            mi = jnp.take_along_axis(all_i, pos, axis=1)
            return ms, mi.astype(jnp.int32)

        fn = shard_map(
            local_search, mesh=mesh,
            in_specs=(P(), P(MODEL_AXIS, None)),
            out_specs=(P(), P()),
            check_rep=False)
        return jax.jit(fn)

    def search(self, queries: np.ndarray, topk: int = 500) -> Tuple[np.ndarray, np.ndarray]:
        queries = jnp.asarray(queries, jnp.float32)
        if self.metric == "cosine":
            queries = queries / jnp.maximum(
                jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
        topk = min(topk, self.num_items)
        if self.mesh is not None:
            if self._search_sharded is None or self._sharded_topk != topk:
                self._search_sharded = self._build_sharded_search(topk)
                self._sharded_topk = topk
            s, i = self._search_sharded(queries, self.padded_items)
        else:
            s, i = chunked_topk(queries, self.items, topk, self.chunk_size)
        return np.asarray(s), np.asarray(i)
