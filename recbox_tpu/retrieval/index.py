"""On-device brute-force MIPS top-k index: the serving-side retrieval engine.

Functional replacement for the reference's ANN stack — faiss `IndexFlatIP`
(`recbox/utils/ann/faiss.py:3-15`), Annoy and Milvus wrappers
(`third_party/rechub/utils/match.py:161-251`) — as on-device MIPS on TPU.

Engine choices (measured on one v5e chip, 1M×128 corpus, 8192 queries,
k=100):
* ``method='approx'`` (default): query-chunked scoring + TPU-native
  `lax.approx_max_k` (the partial-reduction top-k unit, not a sort) with
  optional bfloat16 scoring — 46 ms (179K qps), recall ≈ 0.98 @ k=100,
  tunable via ``recall_target``. A sort-based `lax.top_k` merge is ~86×
  slower (3.9 s) — lax.top_k lowers to a full per-row sort on TPU.
* ``method='refined'``: two-phase — approx_max_k over-retrieves 4×k
  candidates at recall_target 0.99, then exact fp32 rescoring+sort of just
  those candidates. Near-exact: scores are exact for every returned item,
  but a true top-k item can still be missed at the tail when it falls
  outside the approximate candidate set (measured: worst tail-score gap
  ≈0.2 on N(0,1)·√128-scale scores at 1M items).
* ``method='exact_sort'`` (alias 'exact'): item-chunked scan with a
  sort-based merge — truly exact, ~86× slower at 1M items.
* sharded: items row-sharded over the mesh 'model' axis inside `shard_map`;
  per-shard approx top-k, one `all_gather` of k·shards candidates, exact
  merge — the ICI all-gather merge of SURVEY §7 step 8.

Memory: scoring streams query chunks of ``query_chunk`` (default 1024), so
the peak score buffer is (query_chunk × N) and the corpus is read once per
chunk sweep.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from recbox_tpu.parallel.mesh import MODEL_AXIS

__all__ = ["BruteForceMIPS", "chunked_topk", "approx_mips_topk",
           "segmented_mips_topk", "int8_mips_topk", "quantize_int8"]


def quantize_int8(items: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 quantization: (N, D) f32 → (int8 rows, f32
    row scales). Row-wise max-abs scaling keeps the relative error of every
    item's score ≲ 1/127 regardless of per-item norm spread (a single
    global scale would crush low-norm items to zero)."""
    amax = jnp.max(jnp.abs(items), axis=1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(items / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


def _rescore_exact(queries, items_f32, cand, topk: int):
    """Exact f32 rescore of per-query candidate lists → (scores, indices).

    Shared tail of every two-phase ('refined') path: gather the candidate
    rows, score them exactly, and keep the top-k.
    """
    cand_emb = items_f32[cand]                              # (Q, k1, D)
    exact = jnp.einsum("qd,qkd->qk", queries, cand_emb)
    s, pos = jax.lax.top_k(exact, topk)
    return s, jnp.take_along_axis(cand, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("topk", "query_chunk",
                                             "recall_target", "oversample"))
def int8_mips_topk(queries: jnp.ndarray, q_items: jnp.ndarray,
                   item_scale: jnp.ndarray, topk: int,
                   query_chunk: int = 1024, recall_target: float = 0.95,
                   oversample: int = 0,
                   items_f32: Optional[jnp.ndarray] = None):
    """Quantized MIPS: s8×s8→s32 scoring on the MXU + per-row rescale.

    The int8 matmul runs ~2× the bf16 rate on the MXU (v5e: 394 vs
    197 TOPS) and the corpus costs 4× less HBM than f32 — the quantized
    serving mode faiss exposes as `IndexScalarQuantizer` but the reference
    never wires up (`recbox/utils/ann/faiss.py:3-15` is IndexFlatIP only).
    Queries are quantized per row on the fly; scores are rescaled to f32
    (`s32 · item_scale · query_scale`) before `approx_max_k`, so ranking
    error is bounded by the two rounding steps (≈1% relative).

    With ``oversample > 0`` and ``items_f32`` provided, the int8 sweep
    over-retrieves ``oversample × topk`` candidates and re-scores just
    those in exact f32 (the 'refined' pattern) — returned scores are then
    exact and recall loss from quantization is confined to the candidate
    tail.
    """
    Q, D = queries.shape
    refine = bool(oversample) and items_f32 is not None
    k1 = min(oversample * topk, q_items.shape[0]) if refine else topk
    pad = (-Q) % query_chunk
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.zeros((pad, D), queries.dtype)], axis=0)

    def body(q):
        qq, qs = quantize_int8(q)
        s_int = jax.lax.dot_general(
            qq, q_items, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        s = s_int.astype(jnp.float32) * item_scale[None, :] * qs[:, None]
        return jax.lax.approx_max_k(s, k1, recall_target=recall_target)

    s, i = jax.lax.map(body, queries.reshape(-1, query_chunk, D))
    s = s.reshape(-1, k1)[:Q]
    i = i.reshape(-1, k1)[:Q]
    queries = queries[:Q]
    if refine:
        s, i = _rescore_exact(queries, items_f32, i, topk)
    return s, i.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("topk", "query_chunk",
                                             "recall_target", "bf16"))
def approx_mips_topk(queries: jnp.ndarray, items: jnp.ndarray, topk: int,
                     query_chunk: int = 1024, recall_target: float = 0.95,
                     bf16: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Query-chunked MIPS + approx_max_k. Returns (scores, indices) (Q, k)."""
    Q, D = queries.shape
    it = items.astype(jnp.bfloat16) if bf16 else items
    pad = (-Q) % query_chunk
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.zeros((pad, D), queries.dtype)], axis=0)

    def body(q):
        qq = q.astype(jnp.bfloat16) if bf16 else q
        s = jnp.dot(qq, it.T, preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(s, topk, recall_target=recall_target)

    s, i = jax.lax.map(body, queries.reshape(-1, query_chunk, D))
    s = s.reshape(-1, topk)[:Q]
    i = i.reshape(-1, topk)[:Q]
    return s, i.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("topk", "query_chunk",
                                             "n_segments", "seg_k", "bf16"))
def segmented_mips_topk(queries: jnp.ndarray, items: jnp.ndarray, topk: int,
                        query_chunk: int = 1024, n_segments: int = 8,
                        seg_k: int = 0, bf16: bool = True):
    """Segment-merge top-k for LARGE k: approx_max_k's partial-reduction
    cost grows with k, so for k≳256 it is cheaper to split the corpus into
    `n_segments` column blocks, approx-retrieve `seg_k` per block (a small-k
    reduction), and exactly top-k the n_segments·seg_k merged candidates.
    Measured (v5e, 1M×128, k=500): 318k qps @ recall .956 vs the flat
    approx path's 219k @ .985 (`tools/prof_retrieval_topk.py`,
    `tools/check_segment_recall.py`); matmul-only ceiling 476k qps. Recall
    is bounded by the per-segment budget: raise `seg_k` (or lower
    `n_segments`) for more headroom.

    CAVEAT (round 3, `tools/prof_mips_batched.py`): the 318k figure is a
    SCORE-ONLY sweep — when the returned ids are actually consumed (every
    real serving call), approx_max_k's index-tracking plumbing can no
    longer be DCE'd and this path measures ~84k qps at k=500. It remains
    the best XLA formulation and the CPU fallback; on TPU the
    packed-mantissa Pallas kernel (`ops/pallas/mips_topk.py`) is 1.72x
    faster for (scores, ids) calls and is the 'auto' default.
    """
    Q, D = queries.shape
    N = items.shape[0]
    if not seg_k:
        # ~1.5x the even split, and never fewer merged candidates than topk
        seg_k = max(topk // n_segments + topk // (2 * n_segments), 1,
                    -(-topk // n_segments))
    seg_k = max(seg_k, -(-topk // n_segments))
    pad_n = (-N) % n_segments
    if pad_n:
        items = jnp.concatenate(
            [items, jnp.zeros((pad_n, D), items.dtype)], axis=0)
    seg_len = items.shape[0] // n_segments
    it = items.astype(jnp.bfloat16) if bf16 else items
    pad_q = (-Q) % query_chunk
    if pad_q:
        queries = jnp.concatenate(
            [queries, jnp.zeros((pad_q, D), queries.dtype)], axis=0)
    seg_off = (jnp.arange(n_segments) * seg_len)[None, :, None]

    def body(q):
        qq = q.astype(jnp.bfloat16) if bf16 else q
        s = jnp.dot(qq, it.T, preferred_element_type=jnp.float32)
        if pad_n:
            s = s.at[:, N:].set(-jnp.inf)
        seg = s.reshape(q.shape[0], n_segments, seg_len)
        cs, ci = jax.lax.approx_max_k(seg, seg_k, recall_target=0.95)
        ci = (ci + seg_off).reshape(q.shape[0], -1)
        cs = cs.reshape(q.shape[0], -1)
        ts, pos = jax.lax.top_k(cs, topk)
        return ts, jnp.take_along_axis(ci, pos, axis=1)

    s, i = jax.lax.map(body, queries.reshape(-1, query_chunk, D))
    return (s.reshape(-1, topk)[:Q],
            i.reshape(-1, topk)[:Q].astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("topk", "chunk_size"))
def chunked_topk(queries: jnp.ndarray, items: jnp.ndarray, topk: int,
                 chunk_size: int = 8192) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k via item-chunked scan with a running sort-merge.

    Kept for small corpora and as the exactness oracle; prefer the approx /
    two-phase paths at serving scale (sort-based top_k is ~86× slower at
    1M items).
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


@functools.partial(jax.jit, static_argnames=("topk", "oversample",
                                             "query_chunk"))
def _two_phase_exact(queries, items, topk: int, oversample: int = 4,
                     query_chunk: int = 1024):
    """approx over-retrieval (bf16) + exact fp32 rescore of the candidates."""
    k1 = min(oversample * topk, items.shape[0])
    _, cand = approx_mips_topk(queries, items, k1, query_chunk=query_chunk,
                               recall_target=0.99, bf16=True)
    return _rescore_exact(queries, items, cand, topk)


class BruteForceMIPS:
    """MIPS top-k index over an item matrix, optionally mesh-sharded.

    API mirrors FaissIndex (`faiss.py:11-15`): build from (N, D) embeddings,
    `search(queries, topk) -> (scores, indices)`.

    Args:
      metric: 'ip' | 'cosine' (L2-normalized at build, faiss normalize flag).
      method: 'auto' (default) — the fused running-top-k Pallas kernel
        on TPU for large corpora (`ops/pallas/mips_fused_topk.py`: 285k
        qps bf16 / 291k int8 at k=500 over 1M x 128 = 3.40x the best XLA
        formulation for real (scores, ids) serving calls, v5e
        2026-08-19), falling back to 'segmented' (k>=256)
        or 'approx' off-TPU / at small corpus:k ratios. Explicit:
        'approx' | 'segmented' (best XLA formulation at large k — see
        `segmented_mips_topk`) | 'pallas' | 'refined' (two-phase,
        near-exact) | 'exact'/'exact_sort' (scan merge, truly exact).
        Pad convention (all engines): slots beyond the candidate pool
        return score=-inf, id=-1.
      recall_target: approx_max_k knob for method='approx'.
      quantize: None | 'int8' — per-row symmetric int8 corpus (s8×s8→s32
        MXU scoring, ~2× bf16 rate, 4× less HBM than f32; see
        `int8_mips_topk`). method='auto'/'pallas' route to the fused
        running-top-k kernel over the int8 rows on TPU (291k vs 69k qps
        for the XLA int8 sweep at k=500/1M — 4.2×; quantized approximate
        scores), method='approx' is the XLA pure-int8 sweep, and
        method='refined' over-retrieves int8 + rescores exact f32
        (returned scores exact); any other method raises rather than
        silently ignoring the quantized rows. Unsharded paths only.
      keep_f32: keep the f32 corpus alongside int8 rows. Default (None)
        resolves to True only when the method actually reads it
        (method='refined' rescore); method='approx' drops the f32 corpus
        for the full 4× HBM saving. Explicit keep_f32=False with
        method='refined' is contradictory and raises. Ignored unless
        quantize='int8'.
    """

    def __init__(self, item_embs: np.ndarray, metric: str = "ip",
                 mesh: Optional[Mesh] = None, method: str = "auto",
                 recall_target: float = 0.95, chunk_size: int = 8192,
                 query_chunk: int = 1024, bf16: bool = True,
                 quantize: Optional[str] = None,
                 keep_f32: Optional[bool] = None):
        items = jnp.asarray(item_embs, jnp.float32)
        if metric == "cosine":
            items = items / jnp.maximum(
                jnp.linalg.norm(items, axis=-1, keepdims=True), 1e-12)
        elif metric != "ip":
            raise NotImplementedError(f"metric={metric}")
        self.metric = metric
        self.method = "exact_sort" if method == "exact" else method
        self.recall_target = recall_target
        self.num_items, self.dim = items.shape
        self.mesh = mesh
        self.chunk_size = chunk_size
        self.query_chunk = query_chunk
        self.bf16 = bf16
        if quantize not in (None, "int8"):
            raise NotImplementedError(f"quantize={quantize!r}")
        if quantize and mesh is not None:
            raise NotImplementedError(
                "quantize='int8' is unsharded-only for now")
        if quantize and self.method not in ("approx", "refined", "auto",
                                            "pallas"):
            # silently answering an 'exact' request with quantized
            # approximate scores would violate the method contract
            raise NotImplementedError(
                f"quantize='int8' supports method='auto'/'approx'/"
                f"'refined'/'pallas', got method={method!r}")
        if quantize and self.method == "refined" and keep_f32 is False:
            raise ValueError(
                "method='refined' needs the f32 corpus for the exact "
                "rescore; keep_f32=False contradicts it")
        if keep_f32 is None:
            keep_f32 = self.method == "refined"
        self.quantize = quantize
        self.keep_f32 = keep_f32
        if quantize == "int8":
            self.q_items, self.item_scale = quantize_int8(items)
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
            self.items = None if (quantize == "int8" and not keep_f32) \
                else items

    def _build_sharded_search(self, topk: int):
        mesh = self.mesh
        shard_size = self.shard_size
        num_items = self.num_items
        method = self.method
        recall_target = self.recall_target
        bf16 = self.bf16

        def local_search(queries, items_shard):
            shard_idx = jax.lax.axis_index(MODEL_AXIS)
            k = min(topk, shard_size)
            # 'auto' rides the approx branch here: the packed Pallas
            # kernel is per-chip and would need a Mosaic-capable backend
            # inside shard_map (CPU dryruns compile this path too), and
            # per-shard candidate counts are small enough that
            # approx_max_k's index plumbing is not the bottleneck the
            # unsharded serving path measured.
            if method in ("approx", "auto") and shard_size > 4 * k:
                qq = queries.astype(jnp.bfloat16) if bf16 else queries
                it = items_shard.astype(jnp.bfloat16) if bf16 else items_shard
                s = jnp.dot(qq, it.T, preferred_element_type=jnp.float32)
                cs, ci = jax.lax.approx_max_k(s, k, recall_target=recall_target)
            else:
                s = jnp.dot(queries, items_shard.T,
                            preferred_element_type=jnp.float32)
                cs, ci = jax.lax.top_k(s, k)
            ci = ci + shard_idx * shard_size
            all_s = jax.lax.all_gather(cs, MODEL_AXIS, axis=1, tiled=True)
            all_i = jax.lax.all_gather(ci, MODEL_AXIS, axis=1, tiled=True)
            valid = all_i < num_items
            all_s = jnp.where(valid, all_s, -jnp.inf)
            ms, pos = jax.lax.top_k(all_s, topk)
            mi = jnp.take_along_axis(all_i, pos, axis=1)
            # unified pad convention across every engine (and
            # RetrievalService): exhausted slots are score=-inf, id=-1 —
            # never a padded-row id >= num_items that silently indexes
            # item metadata
            mi = jnp.where(jnp.isfinite(ms), mi, -1)
            return ms, mi.astype(jnp.int32)

        fn = shard_map(
            local_search, mesh=mesh,
            in_specs=(P(), P(MODEL_AXIS, None)),
            out_specs=(P(), P()),
            check_vma=False)
        return jax.jit(fn)

    def _pallas_recall_ok(self, topk: int) -> bool:
        """The packed segment kernel keeps <=1 winner per 128-item segment,
        so its recall loss is STRUCTURAL: expected fraction of the true
        top-k lost to segment collisions ~= k*SEGMENT/(2N). Route to it
        only when that predicted loss fits the index's recall_target —
        verified on-chip at N=300k, k=500: measured recall 0.902 vs the
        0.894 this formula predicts (2026-08-19), below the 0.95 default
        spec, while N=1M measures 0.969. Applies to method='pallas' too:
        recall_target is the stronger contract, so infeasible shapes fall
        through to the XLA engines rather than silently under-recalling.
        """
        return (self.num_items * 2.0 * (1.0 - self.recall_target)
                >= topk * 128.0)

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
        elif self.quantize == "int8":
            refine = self.method == "refined"
            if (not refine and self.method in ("auto", "pallas")
                    and self.num_items > 16 * topk
                    and self._pallas_recall_ok(topk)
                    and jax.default_backend() not in ("cpu",)):
                # fused running-top-k kernel over the int8 rows — same
                # quantized-approximate score contract as int8_mips_topk,
                # measured envelope in `ops/pallas/mips_fused_topk.py`
                from recbox_tpu.ops.pallas.mips_fused_topk import (
                    mips_fused_topk,
                )
                s, i = mips_fused_topk(queries, self.q_items, topk,
                                       valid_items=self.num_items,
                                       row_scale=self.item_scale,
                                       query_tile=self.query_chunk)
            else:
                # refined candidate sweeps run at >=0.99 like
                # _two_phase_exact: the over-retrieve exists to make tail
                # loss negligible
                s, i = int8_mips_topk(
                    queries, self.q_items, self.item_scale, topk,
                    query_chunk=self.query_chunk,
                    recall_target=(max(self.recall_target, 0.99) if refine
                                   else self.recall_target),
                    oversample=4 if refine else 0,
                    items_f32=self.items if refine else None)
        elif self.method in ("pallas", "auto") and self.num_items > 16 * topk \
                and self._pallas_recall_ok(topk) \
                and jax.default_backend() not in ("cpu",):
            # Mosaic kernels need a real TPU; CPU runs fall through to the
            # XLA paths below (interpret mode is test-only). The fused
            # kernel keeps the running top-k in VMEM across the corpus
            # sweep — no XLA merge call at all (measured envelope in
            # `ops/pallas/mips_fused_topk.py`; the candidate+merge
            # variant remains as `ops/pallas/mips_topk.py`).
            from recbox_tpu.ops.pallas.mips_fused_topk import (
                mips_fused_topk,
            )
            it = (self.items.astype(jnp.bfloat16) if self.bf16
                  else self.items)
            q = queries.astype(jnp.bfloat16) if self.bf16 else queries
            s, i = mips_fused_topk(q, it, topk,
                                   valid_items=self.num_items,
                                   query_tile=self.query_chunk)
        elif (self.method == "segmented"
              or (self.method == "auto" and topk >= 256)) \
                and self.num_items > 16 * topk:
            # CPU 'auto' fallback for large k (and the explicit method)
            s, i = segmented_mips_topk(queries, self.items, topk,
                                       query_chunk=self.query_chunk,
                                       bf16=self.bf16)
        elif self.method in ("approx", "segmented", "pallas", "auto") \
                and self.num_items > 4 * topk:
            s, i = approx_mips_topk(queries, self.items, topk,
                                    query_chunk=self.query_chunk,
                                    recall_target=self.recall_target,
                                    bf16=self.bf16)
        elif self.method == "refined" and self.num_items > 8 * topk:
            s, i = _two_phase_exact(queries, self.items, topk,
                                    query_chunk=self.query_chunk)
        else:
            s, i = chunked_topk(queries, self.items, topk, self.chunk_size)
        return np.asarray(s), np.asarray(i)
