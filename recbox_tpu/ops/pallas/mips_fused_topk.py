"""Fused MIPS scoring + IN-KERNEL running top-k: zero XLA merge calls.

The packed-mantissa candidate kernel (`mips_topk.py`) generates
candidates at the matmul ceiling (472k qps measured), but its FINAL
XLA merge is ~70% of end-to-end time (approx_max_k ~21 ms/sweep for
scores + ~17 ms of index tracking; every measured post-hoc alternative
is slower — see `mips_topk.py` docstring). This kernel removes the merge
entirely: a (kp, Qt) running top-k lives in the OUTPUT block (constant
index_map ⇒ VMEM-resident across the sequential TPU grid), and each
corpus block folds its 128 segment winners into it with a small bitonic
merge — so the only HBM the reduction ever touches is the final
(kp, Qt) result. Per grid step:

  1. segment winners exactly as the packed kernel (max over packed
     scores; explicit global ids recovered from the 7 packed bits at
     (n_seg, Qt) winner scale — 128x smaller than an argmax sweep);
  2. bitonic-sort the block's w_len=128 winners ASCENDING
     (sum(1..log2 w) = 28 compare-exchange stages on (128, Qt));
  3. prepend -inf pads to kp and concatenate after the descending
     running list: [R desc | pads, W asc] is a bitonic sequence, so one
     log2(2kp)-substage merge phase fully sorts it descending; keep the
     top kp rows.

The compare-exchange stages reuse the int32-direction-mask formulation
Mosaic accepts (`bitonic_topk.py:74-101`, proven bit-exact on-chip).
Semantics: recall identical to the packed candidate kernel's structural
segment-collision bound (<=1 winner per 128-item segment, expected loss
k*128/2N) — and slightly BETTER than the approx_max_k merge path, since
the in-kernel merge is exact over the candidates. Scores carry the same
2^-17 mantissa truncation.

Reference behavior replaced: faiss-style top-k serving
(`recbox/core/metrics.py:28-68`, `recbox/utils/ann/faiss.py`) — the
whole score->select pipeline as one kernel.

MEASURED ENVELOPE (v5e, 1M x 128 corpus, Q=8192, scores AND ids
consumed, honest scan-chained timing — `tools/prof_mips_batched.py`,
2026-08-19):

    THIS KERNEL bf16 k=500      285-314k qps @ recall .969
                                (block_mult=2 auto-default at large k:
                                +13% same-run, 314k vs 278k)
    THIS KERNEL int8 k=500      287-300k qps @ recall .966   (corpus 4x
                                less HBM than f32)
    packed candidates + approx_max_k merge (mips_topk.py)  144k
    best XLA formulation (segmented)                        84k
    -> 3.40-3.47x XLA, 1.97x the round-3 packed+merge path
    THIS KERNEL bf16 k=100      359k qps   (XLA approx k=100: 299k)
    kernel-only candidate floor (no merge at all)          472k

The in-kernel merge costs ~11 ms/sweep vs ~38 ms for the best post-hoc
XLA merge — and recall is a hair BETTER than the approx-merge path
(.9692 vs .9689) because the candidate reduction is exact.
`BruteForceMIPS(method='auto')` serves through this kernel on TPU
(recall-gated); `pallas_mips_topk` remains the candidate-generator
form for callers that consume raw candidates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recbox_tpu.ops.pallas.bitonic_topk import _stages
from recbox_tpu.ops.pallas.mips_topk import (
    PACK_FLOOR,
    SEGMENT,
    _PACK_MASK,
    _block_plan,
)

__all__ = ["mips_fused_topk"]


def _cmp_stage(s, ids, k_, j, c, qt, ascending):
    """One bitonic compare-exchange stage on (c, qt) scores+ids.

    Same int32 direction-mask trick as `bitonic_topk.py:86-101` (bool
    mask vectors fail Mosaic's i8->i1 truncation lowering)."""
    s3 = s.reshape(c // (2 * j), 2, j, qt)
    i3 = ids.reshape(c // (2 * j), 2, j, qt)
    a, b = s3[:, 0], s3[:, 1]
    ia, ib = i3[:, 0], i3[:, 1]
    p = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    dir_bit = ((p * (2 * j)) & k_) >> int(k_.bit_length() - 1)
    flag = dir_bit if ascending else 1 - dir_bit
    a_first = (a >= b).astype(jnp.int32) == flag
    new_s = jnp.stack([jnp.where(a_first, a, b),
                       jnp.where(a_first, b, a)], axis=1).reshape(c, qt)
    new_i = jnp.stack([jnp.where(a_first, ia, ib),
                       jnp.where(a_first, ib, ia)], axis=1).reshape(c, qt)
    return new_s, new_i


def _make_fused_kernel(spb: int, sub_rows: int, kp: int, qt: int,
                       valid_rows=None, quantized: bool = False):
    c_block = sub_rows * spb
    n_seg = sub_rows // SEGMENT
    w_len = c_block // SEGMENT
    assert w_len <= kp, (w_len, kp)
    w_stages = _stages(w_len)

    def _kernel(q_ref, c_ref, *rest):
        if quantized:
            scale_ref, out_s_ref, out_i_ref, ws_ref, wi_ref = rest
        else:
            out_s_ref, out_i_ref, ws_ref, wi_ref = rest
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _init():
            out_s_ref[:] = jnp.full((kp, qt), -PACK_FLOOR, jnp.float32)
            out_i_ref[:] = jnp.full((kp, qt), -1, jnp.int32)

        q = q_ref[:]                                   # (Qt, D)

        def sub(j, _):
            c = c_ref[pl.ds(j * sub_rows, sub_rows), :]
            if quantized:
                # s8 x s8 -> s32 at 2x the bf16 MXU rate; per-row corpus
                # scale applied here, per-QUERY scale deferred to the k
                # winners by the caller (ranking-invariant)
                s32 = jax.lax.dot_general(
                    c, q, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                scale = scale_ref[pl.ds(j * sub_rows, sub_rows), :]
                s = s32.astype(jnp.float32) * scale
            else:
                s = jax.lax.dot_general(
                    c, q, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (SUB, Qt)
            s = jnp.clip(s, -PACK_FLOOR, PACK_FLOOR)
            if valid_rows is not None:
                row_g = (b * c_block + j * sub_rows
                         + jax.lax.broadcasted_iota(
                             jnp.int32, (sub_rows, qt), 0))
                s = jnp.where(row_g < valid_rows, s, -PACK_FLOOR)
            seg = s.reshape(SEGMENT, n_seg, qt)
            idx = jax.lax.broadcasted_iota(jnp.int32, (SEGMENT, n_seg, qt),
                                           0)
            bits = jax.lax.bitcast_convert_type(seg, jnp.int32)
            packed = jax.lax.bitcast_convert_type(
                (bits & ~_PACK_MASK) | idx, jnp.float32)
            win = jnp.max(packed, axis=0)              # (n_seg, Qt)
            wbits = jax.lax.bitcast_convert_type(win, jnp.int32)
            widx = wbits & _PACK_MASK
            wclean = jax.lax.bitcast_convert_type(wbits & ~_PACK_MASK,
                                                  jnp.float32)
            base = (b * c_block + j * sub_rows
                    + jax.lax.broadcasted_iota(jnp.int32, (n_seg, qt), 0))
            wid = base + widx * n_seg
            # all-pad segments: mark id -1 now, score stays ~-PACK_FLOOR
            wid = jnp.where(wclean > -PACK_FLOOR / 2, wid, -1)
            ws_ref[pl.ds(j * n_seg, n_seg), :] = wclean
            wi_ref[pl.ds(j * n_seg, n_seg), :] = wid
            return 0

        jax.lax.fori_loop(0, spb, sub, 0)

        # (2) sort this block's winners ASCENDING
        # NB: lax.optimization_barrier is NOT lowerable inside Pallas TPU
        # kernels (NotImplementedError, observed on-chip 2026-08-19) —
        # liveness of the unrolled stages is bounded by the 100M
        # vmem_limit instead (38 stages here vs bitonic_topk's 91).
        w, wi = ws_ref[:], wi_ref[:]
        for k_, j in w_stages:
            w, wi = _cmp_stage(w, wi, k_, j, w_len, qt, ascending=True)
        # (3) [R desc | pads, W asc] -> one bitonic merge phase, keep kp
        if w_len < kp:
            w = jnp.concatenate(
                [jnp.full((kp - w_len, qt), -PACK_FLOOR, jnp.float32), w],
                axis=0)
            wi = jnp.concatenate(
                [jnp.full((kp - w_len, qt), -1, jnp.int32), wi], axis=0)
        s_all = jnp.concatenate([out_s_ref[:], w], axis=0)   # (2kp, Qt)
        i_all = jnp.concatenate([out_i_ref[:], wi], axis=0)
        c2 = 2 * kp
        jm = kp
        while jm >= 1:
            s_all, i_all = _cmp_stage(s_all, i_all, c2, jm, c2, qt,
                                      ascending=False)
            jm //= 2
        out_s_ref[:] = s_all[:kp]
        out_i_ref[:] = i_all[:kp]

    return _kernel


@functools.partial(jax.jit, static_argnames=("k", "valid_items",
                                             "interpret", "query_tile",
                                             "block_mult"))
def mips_fused_topk(queries, corpus, k: int, valid_items: int = None,
                    interpret: bool = False, query_tile: int = 1024,
                    row_scale=None, block_mult: int = None):
    """Top-k (scores, ids) over `corpus`, merge fused into the kernel.

    queries (Q, D) f32/bf16, corpus (N, D) — bf16 recommended (MXU-rate
    scoring, f32 accumulation). Pads rows/dims/queries as needed;
    `valid_items` marks rows >= it as padding. Returns ((Q, k), (Q, k))
    with the shared pad convention (score=-inf, id=-1). Exhausted-slot
    and recall semantics match `pallas_mips_topk(packed=True)` except the
    candidate merge is EXACT (no approx_max_k recall target).

    An int8 corpus (quantize_int8 rows) with ``row_scale`` (N,) scores at
    2x the bf16 MXU rate with 4x-less-than-f32 HBM; queries are quantized
    per row on the fly and returned scores are quantized-approximate
    (~1% relative, `int8_mips_topk` contract).
    """
    queries = jnp.asarray(queries)
    corpus = jnp.asarray(corpus)
    quantized = corpus.dtype == jnp.int8
    if quantized and row_scale is None:
        raise ValueError("int8 corpus requires row_scale (the "
                         "quantize_int8 per-row scales)")
    if not quantized and row_scale is not None:
        raise ValueError("row_scale is only meaningful for an int8 corpus")
    if quantized:
        row_scale = jnp.asarray(row_scale, jnp.float32).reshape(-1, 1)
    n_items = corpus.shape[0] if valid_items is None else int(valid_items)
    nq = queries.shape[0]
    qt = int(min(query_tile, max(nq, 1)))
    d_pad = (-corpus.shape[1]) % 128
    sub_rows, spb = _block_plan(corpus.dtype, qt, corpus.shape[1] + d_pad)
    # block_mult > 1 doubles/quadruples the corpus rows per grid step:
    # fewer running-top-k merges (one per grid step) at the cost of a
    # bigger per-step winner sort and corpus block VMEM. Measured (v5e
    # 2026-08-19, k=500/1M): x2 is +13% (314k vs 278k qps same-run), x4
    # regresses. Default: x2 only when kp >= the doubled winner count —
    # at small k, x2 would FORCE kp up (w_len <= kp invariant), inflating
    # every merge (measured regression at k=100).
    if block_mult is None:
        kp_natural = 1 << int(np.ceil(np.log2(max(k, 2))))
        block_mult = 2 if kp_natural >= 2 * spb * sub_rows // SEGMENT \
            else 1
    spb *= int(block_mult)
    c_block = sub_rows * spb
    n_pad = (-corpus.shape[0]) % c_block
    if n_pad or d_pad:
        corpus = jnp.pad(corpus, ((0, n_pad), (0, d_pad)))
        if quantized and n_pad:
            row_scale = jnp.pad(row_scale, ((0, n_pad), (0, 0)),
                                constant_values=1.0)
    if d_pad:
        queries = jnp.pad(queries, ((0, 0), (0, d_pad)))
    q_pad = (-nq) % qt
    if q_pad:
        queries = jnp.pad(queries, ((0, q_pad), (0, 0)))
    q_scale = None
    if quantized:
        q_amax = jnp.max(jnp.abs(queries), axis=1)
        q_scale = jnp.maximum(q_amax, 1e-12) / 127.0
        queries = jnp.clip(jnp.round(queries / q_scale[:, None]),
                           -127, 127).astype(jnp.int8)
    n, d = corpus.shape
    w_len = c_block // SEGMENT
    n_cand = n // SEGMENT
    if k > n_cand:
        raise ValueError(
            f"mips_fused_topk: k={k} exceeds the {n_cand} segment "
            f"candidates for a {n}-row corpus")
    kp = max(w_len, 1 << int(np.ceil(np.log2(max(k, 2)))))
    mask_from = None if n_items >= n else n_items
    grid = (n // c_block,)
    kernel = _make_fused_kernel(spb, sub_rows, kp, qt, mask_from,
                                quantized=quantized)
    in_specs = [
        pl.BlockSpec((qt, d), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c_block, d), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [corpus]
    if quantized:
        in_specs.append(pl.BlockSpec((c_block, 1), lambda b: (b, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(row_scale)

    def one_tile(q_tile_arr):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                # constant index_map: the running top-k stays VMEM-resident
                # across the sequential grid — the accumulator pattern
                pl.BlockSpec((kp, qt), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kp, qt), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((kp, qt), jnp.float32),
                jax.ShapeDtypeStruct((kp, qt), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((w_len, qt), jnp.float32),
                pltpu.VMEM((w_len, qt), jnp.int32),
            ],
            # the merge phase keeps a few (2kp, Qt) temporaries live
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
            interpret=interpret,
        )(q_tile_arr, *operands)

    parts = [one_tile(queries[s:s + qt])
             for s in range(0, queries.shape[0], qt)]
    if len(parts) == 1:
        ts, ti = parts[0]
    else:
        ts = jnp.concatenate([p[0] for p in parts], axis=1)
        ti = jnp.concatenate([p[1] for p in parts], axis=1)
    ts, ti = ts[:k].T[:nq], ti[:k].T[:nq]          # (nq, k), sorted desc
    alive = ts > -PACK_FLOOR / 2
    if q_scale is not None:
        ts = ts * q_scale[:nq, None]
    return jnp.where(alive, ts, -jnp.inf), jnp.where(alive, ti, -1)
