"""Fused MIPS scoring + segment-winner candidates: the retrieval kernel.

The serving hot path (`recbox/core/metrics.py:28-68` faiss search /
`recbox/utils/ann/faiss.py`) is, TPU-natively, scores = Q·Cᵀ followed by
top-k. The XLA decomposition materializes the (Q, N) score matrix in HBM
(Q=128, N=1M ⇒ 512 MB written + re-read by the top-k — ~4× the matmul's
own time), and `lax.approx_max_k`'s fused path more than doubles the
matmul-only cost at k=500 (round-1 measurements in
`tools/prof_retrieval_topk.py`: matmul ceiling 476k qps, approx top-500
219k, segmented-merge 318k @ recall .956).

This kernel keeps scores entirely in VMEM: per (query-tile, corpus-block)
grid step it runs the (Qt, Bc) matmul on the MXU and immediately reduces
each 128-item segment to its (max, argmax) winner, writing only
(Qt, Bc/128) candidates — a 128× smaller HBM footprint that the caller
finishes with one exact `lax.top_k` over ~N/128 candidates per query.

Recall semantics match `lax.approx_max_k`'s bucketed strategy (≤1 winner
per 128-item segment): for top-k ≪ N/128 the expected loss is the segment
collision rate ≈ k²·64/N (~3% at k=500, N=1M). Exactness switch: callers
needing exact top-k use this as a candidate generator with k' > k and
verify, or the exact paths in `retrieval/index.py`.

Corpus blocks stream HBM→VMEM via the grid BlockSpec (Pallas
double-buffers automatically), so the kernel runs at
max(matmul, corpus-bandwidth) — amortize the corpus stream by scoring
128-1024 queries per sweep.

MEASURED ENVELOPE (v5e, 1M x 128 bf16 corpus, Q=8192, honest scan-chained
timing; every variant consumes BOTH scores and ids — a real serving call
returns both. Round-2's score-only sweeps let XLA DCE approx_max_k's
index-tracking plumbing, which turns out to DOMINATE the XLA paths:
segmented drops 316k -> 84k qps the moment ids are consumed.
`tools/prof_mips_batched.py`, 2026-08-19):

    xla segmented k=500 (score-only, the round-2 metric)   316k qps
    xla segmented k=500 (scores+ids)                        84k qps
    THIS KERNEL, per-chunk merges, unpacked (round-2 shape) 84k qps
    THIS KERNEL, ONE merge, unpacked                        72k qps
    THIS KERNEL, ONE merge, PACKED-MANTISSA (the default)  144-146k qps
    xla segmented k=100 (scores+ids)                       299k qps
    THIS KERNEL k=100 PACKED                               305k qps
    recall@500: packed 0.969, segmented 0.985 (both above the 0.95
    serving spec; the packed loss is the structural k^2*64/N segment
    collision rate)

Why the packed kernel wins 1.72-1.74x at k=500: the in-segment winner
index rides the low 7 mantissa bits of the score (`_make_packed_kernel`),
so ids cost NOTHING at merge time — no int32 candidate array (half the
candidate HBM traffic), no take_along_axis gather, and no index tracking
inside the final approx_max_k (it reduces packed scores only).

Merge decomposition at k=500 (2026-08-19, /tmp-harness now folded into
`tools/prof_mips_batched.py` numbers): kernel alone runs at 472k qps —
essentially the matmul ceiling; the FINAL merge is ~70% of end-to-end
time (approx_max_k scores ~21 ms/sweep + ~17 ms more when its positions
are consumed for id reconstruction). Measured merge alternatives, all
losers: lax.top_k 61.5 ms/sweep end-to-end (vs 55.4 approx),
aggregate_to_topk=False + exact top_k 113.4, and the in-VMEM bitonic
network over packed candidates + iota ids 89.0 (its 2.84 ms/tile
merge-only microbench does not extrapolate to the (8192, 8192)
recursion). approx_max_k(rt=0.95) stays the merge; the remaining
headroom (~2x) is a fused in-kernel running top-k, not a better
post-hoc merge — BUILT as `ops/pallas/mips_fused_topk.py` (285k qps,
1.97x this path, now the serving default); this module remains the
candidate-generator form for callers that consume raw candidates. The XLA
formulations cannot replicate this without materializing the (Q, N)
score matrix in HBM, which is exactly what the kernel exists to avoid.
`BruteForceMIPS(method='auto')` (the default) uses this kernel on TPU
for large corpora; 'segmented' remains the best XLA formulation and the
CPU fallback. Structurally expensive parts measured one by one: grid-step
overhead ~15 us (fixed by 16K-row blocks), lane-axis reductions (fixed by
strided segmentation), per-chunk top-k/approx_max_k calls (fixed by the
single post-sweep merge).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mips_segment_candidates", "pallas_mips_topk", "SEGMENT"]

SEGMENT = 128          # items per candidate segment (one winner each)

# Finite stand-in for -inf in the PACKED kernel: packing the in-segment
# index into an infinity's mantissa would produce NaN (0xFF800000 | idx),
# which poisons every max it touches. Any score at or below -PACK_FLOOR
# is a masked pad row.
PACK_FLOOR = 3.0e38
_PACK_BITS = 7                      # log2(SEGMENT): index bits packed
_PACK_MASK = (1 << _PACK_BITS) - 1


def _block_plan(corpus_dtype, qt: int, d: int):
    """(sub_rows, subs_per_block): sub_rows sized so the f32 score buffer
    (sub_rows x qt) stays at 4 MB AND one corpus sub-chunk fits the 4 MB
    block budget at the REAL row width (d x itemsize); both 128-multiples
    so segments and tile shapes stay aligned. The grid block is
    sub_rows * subs_per_block rows, capped at the budget (x2 for Pallas
    double buffering), so f32 corpora / small query tiles / wide dims
    cannot blow VMEM."""
    block_budget = 4 * (1 << 20)
    row_bytes = d * jnp.dtype(corpus_dtype).itemsize
    sub_rows = max(SEGMENT, min((1 << 20) // max(qt, 1),
                                block_budget // row_bytes))
    sub_rows = max(SEGMENT, (sub_rows // SEGMENT) * SEGMENT)
    spb = max(1, block_budget // (row_bytes * sub_rows))
    return sub_rows, spb


def _make_packed_kernel(subs_per_block: int, sub_rows: int, valid_rows=None):
    """PACKED variant: one output, one reduce.

    Instead of a max + argmax pair (two VPU sweeps over the score buffer)
    and a separate int32 candidate-id array (double the candidate HBM
    traffic and a take_along_axis gather at merge time), the in-segment
    row index (7 bits, SEGMENT=128) is OR-ed into the low mantissa bits of
    the f32 score. One `max` reduce then yields winner score AND identity;
    the caller reconstructs global ids arithmetically from the candidate
    position plus the packed bits. Score fidelity: low-7-mantissa
    truncation is a 2^-17 (~7.6e-6) relative perturbation — orders below
    any retrieval metric's sensitivity; ties within that band may resolve
    differently than exact argmax. ±inf inputs are clamped to ±PACK_FLOOR
    so the OR can never fabricate a NaN.
    """
    c_block = sub_rows * subs_per_block

    def _kernel(q_ref, c_ref, out_s_ref):
        b = pl.program_id(0)
        q = q_ref[:]                                   # (Qt, D)

        def sub(j, _):
            c = c_ref[pl.ds(j * sub_rows, sub_rows), :]   # (SUB, D)
            s = jax.lax.dot_general(
                c, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # (SUB, Qt)
            qt = s.shape[1]
            s = jnp.clip(s, -PACK_FLOOR, PACK_FLOOR)
            if valid_rows is not None:
                row_g = (b * c_block + j * sub_rows
                         + jax.lax.broadcasted_iota(
                             jnp.int32, (sub_rows, qt), 0))
                s = jnp.where(row_g < valid_rows, s, -PACK_FLOOR)
            n_seg = sub_rows // SEGMENT
            seg = s.reshape(SEGMENT, n_seg, qt)
            idx = jax.lax.broadcasted_iota(jnp.int32, (SEGMENT, n_seg, qt),
                                           0)
            bits = jax.lax.bitcast_convert_type(seg, jnp.int32)
            packed = jax.lax.bitcast_convert_type(
                (bits & ~_PACK_MASK) | idx, jnp.float32)
            out_s_ref[pl.ds(j * n_seg, n_seg), :] = jnp.max(packed, axis=0)
            return 0

        jax.lax.fori_loop(0, subs_per_block, sub, 0)

    return _kernel


def _make_packed_kernel_q8(subs_per_block: int, sub_rows: int,
                           valid_rows=None):
    """Packed-mantissa variant over an int8-quantized corpus.

    s8 x s8 -> s32 scoring runs ~2x the bf16 MXU rate (v5e: 394 vs 197
    TOPS) and the corpus block stream is half the bf16 bytes. The s32
    scores are rescaled to f32 by the per-row corpus scale INSIDE the
    kernel (`quantize_int8` semantics, `retrieval/index.py:48-56`); the
    per-QUERY scale is deliberately NOT applied here — a positive
    per-query factor cannot change that query's ranking, so the caller
    multiplies it into the k winners after the merge (k ops instead of
    N). Index packing identical to `_make_packed_kernel`.
    """
    c_block = sub_rows * subs_per_block

    def _kernel(q_ref, c_ref, scale_ref, out_s_ref):
        b = pl.program_id(0)
        q = q_ref[:]                                   # (Qt, D) int8

        def sub(j, _):
            c = c_ref[pl.ds(j * sub_rows, sub_rows), :]   # (SUB, D) int8
            s32 = jax.lax.dot_general(
                c, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)      # (SUB, Qt)
            scale = scale_ref[pl.ds(j * sub_rows, sub_rows), :]  # (SUB, 1)
            s = s32.astype(jnp.float32) * scale
            qt = s.shape[1]
            s = jnp.clip(s, -PACK_FLOOR, PACK_FLOOR)
            if valid_rows is not None:
                row_g = (b * c_block + j * sub_rows
                         + jax.lax.broadcasted_iota(
                             jnp.int32, (sub_rows, qt), 0))
                s = jnp.where(row_g < valid_rows, s, -PACK_FLOOR)
            n_seg = sub_rows // SEGMENT
            seg = s.reshape(SEGMENT, n_seg, qt)
            idx = jax.lax.broadcasted_iota(jnp.int32, (SEGMENT, n_seg, qt),
                                           0)
            bits = jax.lax.bitcast_convert_type(seg, jnp.int32)
            packed = jax.lax.bitcast_convert_type(
                (bits & ~_PACK_MASK) | idx, jnp.float32)
            out_s_ref[pl.ds(j * n_seg, n_seg), :] = jnp.max(packed, axis=0)
            return 0

        jax.lax.fori_loop(0, subs_per_block, sub, 0)

    return _kernel


def _make_kernel(subs_per_block: int, sub_rows: int, valid_rows=None):
    c_block = sub_rows * subs_per_block

    def _kernel(q_ref, c_ref, out_s_ref, out_i_ref):
        """One grid step: c_block corpus rows → c_block/128 candidates.

        The corpus block is scored in inner sub-chunks so the f32 score
        buffer stays at 4 MB; big grid steps matter — at 2K-row steps the
        ~15 µs/step grid overhead dominated the 1.3 µs matmul. Scores are
        computed CORPUS-major ((rows, Qt), not (Qt, rows)) so the segment
        max/argmax reduce over the sublane-tiled axis and the (n_seg, Qt)
        winners store without any transpose."""
        b = pl.program_id(0)
        q = q_ref[:]                                   # (Qt, D)

        def sub(j, _):
            c = c_ref[pl.ds(j * sub_rows, sub_rows), :]   # (SUB, D)
            # (bf16 score accumulation was tried to halve the reduce
            # bandwidth: Mosaic's argmax reduce is f32-only)
            s = jax.lax.dot_general(
                c, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # (SUB, Qt)
            qt = s.shape[1]
            if valid_rows is not None:
                # Padded corpus rows score 0 (q . 0), which WINS any
                # segment whose valid rows all score negative — masking
                # only after segmentation (the old behavior) silently
                # dropped those segments' true candidates. Mask the pad
                # rows to -inf BEFORE the segment reduce so a pad row can
                # never beat a valid one.
                row_g = (b * c_block + j * sub_rows
                         + jax.lax.broadcasted_iota(
                             jnp.int32, (sub_rows, qt), 0))
                s = jnp.where(row_g < valid_rows, s, -jnp.inf)
            n_seg = sub_rows // SEGMENT
            # STRIDED segmentation: segment g = rows {g, g+n_seg, ...} —
            # the reduce then runs over the MAJOR axis (SEGMENT sequential
            # full-width (n_seg, Qt) vector ops) instead of in-tile
            # sublane shuffles; which rows share a segment is irrelevant
            # to the recall analysis
            seg = s.reshape(SEGMENT, n_seg, qt)
            win = jnp.max(seg, axis=0)                 # (n_seg, Qt)
            arg = jnp.argmax(seg, axis=0).astype(jnp.int32)
            base = (b * c_block + j * sub_rows
                    + jax.lax.broadcasted_iota(jnp.int32, (n_seg, qt), 0))
            out_s_ref[pl.ds(j * n_seg, n_seg), :] = win
            out_i_ref[pl.ds(j * n_seg, n_seg), :] = base + arg * n_seg
            return 0

        jax.lax.fori_loop(0, subs_per_block, sub, 0)

    return _kernel


@functools.partial(jax.jit, static_argnames=("valid_items", "interpret",
                                              "packed"))
def mips_segment_candidates(queries, corpus, valid_items: int = None,
                            interpret: bool = False, packed: bool = False,
                            row_scale=None):
    """(n_segments, Qt) candidate scores + global item ids
    (candidate-major layout; `pallas_mips_topk` transposes back).

    queries (Qt, D), corpus (N, D) with N a multiple of 2048 and D a
    multiple of 128. `valid_items` (static; default = all rows) marks
    rows >= it as padding: they are scored -inf INSIDE the kernel, before
    the segment reduce, so a zero-scored pad row can never win a segment
    whose valid rows all score negative. dtypes are used as given — pass
    bf16 for MXU-rate scoring with f32 accumulation.

    ``packed=True`` returns ONE (n_segments, Qt) f32 array whose low 7
    mantissa bits carry the winner's in-segment row index (see
    `_make_packed_kernel`); pads sit at ~-PACK_FLOOR instead of -inf.
    Global id reconstruction from candidate row r and packed idx:
    ``(r // n_seg) * sub_rows + r % n_seg + idx * n_seg`` with
    (sub_rows, n_seg) from `_block_plan` — `pallas_mips_topk` does this.
    """
    qt, d = queries.shape
    n, d2 = corpus.shape
    assert d == d2, (queries.shape, corpus.shape)
    sub_rows, spb = _block_plan(corpus.dtype, qt, d)
    c_block = sub_rows * spb
    assert n % c_block == 0, f"pad corpus to a multiple of {c_block}"
    assert d % 128 == 0, "pad embedding dim to a multiple of 128"
    n_blocks = n // c_block
    n_seg = c_block // SEGMENT      # candidate rows per grid step
    grid = (n_blocks,)
    mask_from = None if (valid_items is None or valid_items >= n) \
        else int(valid_items)
    score_shape = jax.ShapeDtypeStruct((n_blocks * n_seg, qt), jnp.float32)
    cand_spec = pl.BlockSpec((n_seg, qt), lambda b: (b, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((qt, d), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c_block, d), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
    ]
    if row_scale is not None:
        # int8 corpus + (N, 1) f32 per-row scales -> packed kernel only
        assert packed, "row_scale (int8 corpus) implies the packed kernel"
        assert corpus.dtype == jnp.int8 and queries.dtype == jnp.int8, \
            (queries.dtype, corpus.dtype)
        assert row_scale.shape == (n, 1), row_scale.shape
        return pl.pallas_call(
            _make_packed_kernel_q8(spb, sub_rows, mask_from),
            grid=grid,
            in_specs=in_specs + [
                pl.BlockSpec((c_block, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=cand_spec,
            out_shape=score_shape,
            # the s32->f32 dequant chain keeps ~10 (SUB, Qt) temporaries
            # live (measured on-chip: 40M scoped-vmem request vs the 16M
            # default that the bf16 kernel fits under)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20),
            interpret=interpret,
        )(queries, corpus, row_scale)
    if packed:
        return pl.pallas_call(
            _make_packed_kernel(spb, sub_rows, mask_from),
            grid=grid,
            in_specs=in_specs,
            out_specs=cand_spec,
            out_shape=score_shape,
            interpret=interpret,
        )(queries, corpus)
    return pl.pallas_call(
        _make_kernel(spb, sub_rows, mask_from),
        grid=grid,
        in_specs=in_specs,
        out_specs=(cand_spec, cand_spec),
        out_shape=(score_shape,
                   jax.ShapeDtypeStruct((n_blocks * n_seg, qt), jnp.int32)),
        interpret=interpret,
    )(queries, corpus)


def pallas_mips_topk(queries, corpus, k: int, valid_items: int = None,
                     exact_merge: bool = False, interpret: bool = False,
                     merge: str = None, packed: bool = None,
                     query_tile: int = 1024, row_scale=None):
    """Top-k (scores, ids) over the corpus via the fused candidate kernel.

    Pads corpus rows/dims as needed; `valid_items` (default = corpus rows
    before padding) masks padded rows out of the result. Queries beyond
    ``query_tile`` are swept tile-by-tile through the kernel and merged in
    ONE final top-k call — never one merge per tile: lax.top_k/
    approx_max_k carry a multi-ms per-call cost at serving shapes (round-2
    measurement, `bitonic_topk.py` docstring), so per-chunk merging was
    the round-2 envelope's dominant loss.

    ``packed`` (default: on, except under merge='bitonic' which needs the
    explicit id array) selects the packed-mantissa kernel: the in-segment
    winner index rides the low 7 mantissa bits of the score, so the kernel
    runs ONE max reduce (no argmax sweep), writes HALF the candidate
    bytes, and the merge needs no id gather. Returned scores are truncated
    to 2^-17 relative (see `_make_packed_kernel`).

    ``merge`` selects the final candidate reduction: None = the measured
    default (exact `lax.top_k` when candidates are few, else
    `approx_max_k`); 'bitonic' = the in-VMEM Pallas sorting network
    (`bitonic_topk.py`) consuming the kernel's candidate-major layout
    directly — EXACT over the candidates, no transpose. Measured on v5e
    (2026-08-18): the bitonic merge is SLOWER than lax.top_k (2.84 vs
    2.32 ms at (7812, 1024) k=500 — the sort network's ~133 VPU stages
    cost more than XLA's selection), so None stays the default; 'bitonic'
    remains for exactness on candidate-major layouts without an XLA
    top-k call.
    """
    queries = jnp.asarray(queries)
    corpus = jnp.asarray(corpus)
    int8_corpus = corpus.dtype == jnp.int8
    if int8_corpus:
        # s8 corpus (quantize_int8 rows + per-row scales): packed kernel
        # only; queries are quantized per row below and the per-query
        # scale is applied to the k winners post-merge (ranking-invariant)
        if row_scale is None:
            raise ValueError("int8 corpus requires row_scale (the "
                             "quantize_int8 per-row scales)")
        if packed is False or merge == "bitonic":
            raise ValueError("the int8 corpus path is packed-only")
        packed = True
        row_scale = jnp.asarray(row_scale, jnp.float32).reshape(-1, 1)
    elif row_scale is not None:
        raise ValueError("row_scale is only meaningful for an int8 corpus")
    if packed is None:
        packed = merge != "bitonic"
    if packed and merge == "bitonic":
        raise ValueError("merge='bitonic' consumes the explicit-id "
                         "candidate layout; pass packed=False")
    n_items = corpus.shape[0] if valid_items is None else valid_items
    nq = queries.shape[0]
    qt = int(min(query_tile, max(nq, 1)))
    # pad corpus rows to the block multiple, dims to the lane multiple
    sub_rows0, spb0 = _block_plan(corpus.dtype, qt,
                                  corpus.shape[1] + (-corpus.shape[1]) % 128)
    n_pad = (-corpus.shape[0]) % (sub_rows0 * spb0)
    d_pad = (-corpus.shape[1]) % 128
    if n_pad or d_pad:
        corpus = jnp.pad(corpus, ((0, n_pad), (0, d_pad)))
        if int8_corpus and n_pad:
            row_scale = jnp.pad(row_scale, ((0, n_pad), (0, 0)),
                                constant_values=1.0)
    if d_pad:
        queries = jnp.pad(queries, ((0, 0), (0, d_pad)))
    q_pad = (-nq) % qt
    if q_pad:
        queries = jnp.pad(queries, ((0, q_pad), (0, 0)))
    q_scale = None
    if int8_corpus:
        # per-row symmetric query quantization (quantize_int8 semantics);
        # pad-row amax is 0 -> tiny scale, all-zero rows, masked anyway
        q_amax = jnp.max(jnp.abs(queries), axis=1)
        q_scale = jnp.maximum(q_amax, 1e-12) / 127.0
        queries = jnp.clip(jnp.round(queries / q_scale[:, None]),
                           -127, 127).astype(jnp.int8)
    n_seg_sub = sub_rows0 // SEGMENT   # segments per sub-chunk (id layout)

    tile_starts = range(0, queries.shape[0], qt)

    if packed:
        parts = [mips_segment_candidates(queries[s:s + qt], corpus,
                                         valid_items=int(n_items),
                                         interpret=interpret, packed=True,
                                         row_scale=row_scale)
                 for s in tile_starts]
        cs = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        cs = cs.T[:nq]                       # (nq, n_candidates)
        if k > cs.shape[1]:
            raise ValueError(
                f"pallas_mips_topk: k={k} exceeds the {cs.shape[1]} segment "
                f"candidates for a {corpus.shape[0]}-row corpus; use the "
                "'segmented'/'approx' XLA paths for k this large")
        if exact_merge or cs.shape[1] <= 2 * k:
            vals, pos = jax.lax.top_k(cs, k)
        else:
            vals, pos = jax.lax.approx_max_k(cs, k, recall_target=0.95)
        bits = jax.lax.bitcast_convert_type(vals, jnp.int32)
        idx = bits & _PACK_MASK
        clean = jax.lax.bitcast_convert_type(bits & ~_PACK_MASK,
                                             jnp.float32)
        ids = ((pos // n_seg_sub) * sub_rows0 + pos % n_seg_sub
               + idx * n_seg_sub)
        # pads sit at ~-PACK_FLOOR (finite): restore the engines' shared
        # pad convention (score=-inf, id=-1)
        alive = clean > -PACK_FLOOR / 2
        if q_scale is not None:
            # per-query dequant scale, deferred from the kernel to the k
            # winners (positive factor: ranking-invariant)
            clean = clean * q_scale[:nq, None]
        return (jnp.where(alive, clean, -jnp.inf),
                jnp.where(alive, ids, -1).astype(jnp.int32))

    parts = [mips_segment_candidates(queries[s:s + qt], corpus,
                                     valid_items=int(n_items),
                                     interpret=interpret)
             for s in tile_starts]
    if len(parts) == 1:
        cs, ci = parts[0]
    else:
        cs = jnp.concatenate([p[0] for p in parts], axis=1)
        ci = jnp.concatenate([p[1] for p in parts], axis=1)
    if merge == "bitonic":
        from recbox_tpu.ops.pallas.bitonic_topk import (
            pallas_bitonic_topk_cmajor,
        )
        if k > cs.shape[0]:
            raise ValueError(
                f"pallas_mips_topk: k={k} exceeds the {cs.shape[0]} segment "
                f"candidates for a {corpus.shape[0]}-row corpus")
        # candidate-major throughout: no transpose, no XLA top-k call.
        # pad rows were already scored -inf in-kernel; all-pad segment
        # winners still carry pad ids — normalize to -1 like below.
        ts, ti = pallas_bitonic_topk_cmajor(cs, ci, k=k, interpret=interpret)
        ts, ti = ts.T[:nq], ti.T[:nq]
        return ts, jnp.where(jnp.isfinite(ts), ti, -1)
    cs, ci = cs.T[:nq], ci.T[:nq]             # back to (nq, n_candidates)
    # pad rows were scored -inf inside the kernel; this where only
    # normalizes the all-pad segments' winners (score already -inf)
    cs = jnp.where(ci < n_items, cs, -jnp.inf)
    if k > cs.shape[1]:
        # only ~N/128 candidates survive segmentation; top_k beyond that
        # would crash (k > last dim) — fail fast with the actual bound
        raise ValueError(
            f"pallas_mips_topk: k={k} exceeds the {cs.shape[1]} segment "
            f"candidates for a {corpus.shape[0]}-row corpus; use the "
            "'segmented'/'approx' XLA paths for k this large")
    if exact_merge or cs.shape[1] <= 2 * k:
        top_s, pos = jax.lax.top_k(cs, k)
    else:
        # the candidate set is already ~N/128 small; the approx merge
        # shaves the final-sort cost with negligible recall impact
        # rt=0.95 matches the other serving paths; higher targets
        # trigger a pathological reduction at small k (measured 10.3 ms
        # vs 3.2 ms at k=100 on (1024, 7936))
        top_s, pos = jax.lax.approx_max_k(cs, k, recall_target=0.95)
    top_i = jnp.take_along_axis(ci, pos, axis=1)
    # -inf slots (k between valid and padded candidate counts) carry
    # padded-row ids >= n_items: return -1 like the other engines' pads
    return top_s, jnp.where(jnp.isfinite(top_s), top_i, -1)
