"""Pallas row-wise top-k via an in-VMEM bitonic sorting network.

Why: `lax.top_k` / `lax.approx_max_k` cost ~2.6 ms PER CALL on this
hardware regardless of shape (measured round 2, `tools/prof_retrieval_topk
.py` — a fixed structural cost, not bandwidth: the (1024, 8192) f32 merge
the MIPS paths need reads only 32 MB). That fixed cost is why the serving
paths merge once per sweep and why the segmented XLA formulation beats the
fused Pallas candidate kernel (`ops/pallas/mips_topk.py` envelope). This
kernel removes the separate top-k call entirely: each query tile's
candidate row is sorted DESCENDING by a bitonic network running on VMEM
(log²C compare-exchange stages of axis-aligned reshapes + selects — no
lane gathers), and only the first k columns are written back.

Scope: C (the sorted axis) padded to a power of two with -inf; scores and
ids move together. Exact (a full sort, not a recall-target approximation).
Correctness is pinned to `jax.lax.top_k` in `tests/test_pallas_kernels.py`
in interpret mode, through the `merge='bitonic'` MIPS path, and verified
bit-exact on a real v5e chip (2026-08-18).

MEASURED ENVELOPE (v5e, 2026-08-18, tools/prof_retrieval_topk.py): this
kernel LOSES to lax.top_k and stays opt-in. Merge-only at (7812, 1024)
k=500: bitonic 2.84 ms vs lax.top_k 2.32 ms (the sorting network does
~133 stages of VPU compare-exchange ≈ its 2.3-2.8 ms compute bound, while
XLA's sort unit needs only selection). End-to-end 1M×128 MIPS sweeps:
segments+lax 338k qps, pallas mips + bitonic merge 87k qps. The ~2.6 ms
"fixed" top-k cost round 2 measured is, at these shapes, real selection
work — not dispatch overhead a kernel can dodge. Kept for the exactness
path on candidate-major layouts and as the measured-negative record.

Reference behavior replaced: the final merge of faiss-style top-k serving
(`recbox/core/metrics.py:28-68`, `recbox/utils/ann/faiss.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_bitonic_topk", "pallas_bitonic_topk_cmajor"]


def _stages(c: int):
    """(k_, j) schedule of the bitonic network for length c."""
    out = []
    m = 1
    while (1 << m) <= c:
        k_ = 1 << m
        j = k_ >> 1
        while j >= 1:
            out.append((k_, j))
            j >>= 1
        m += 1
    return out


def _make_kernel(c: int, k: int):
    stages = _stages(c)

    def _kernel(s_ref, i_ref, out_s_ref, out_i_ref):
        # optimization_barrier between stages: the 91-stage (C=8192)
        # unrolled network otherwise lets the scheduler keep every stage's
        # temporaries live at once (observed on-chip: 120.84M scoped-vmem
        # stack request; a scratch-ref read-modify-write variant bounded
        # liveness but pushed Mosaic compile past 9 minutes) — the barrier
        # pins stage order so buffers can be reused
        s = s_ref[:]                               # (C, Qt) candidate-major
        ids = i_ref[:]
        qt = s.shape[1]
        for k_, j in stages:
            # direction of the compare-exchange at block k_, stride j:
            # position i = p*(2j) + side*j + r, and (i & k_) depends only
            # on p — built from iota IN-KERNEL (Pallas forbids captured
            # constants). Directions are inverted vs the classic ascending
            # network → final order DESCENDING. The direction is carried as
            # INT32 0/1 at full pair shape, never as a stored bool vector:
            # Mosaic cannot lower the i8→i1 truncation a broadcast bool
            # mask generates (observed on-chip: `arith.trunci vector<...xi8>
            # -> vector<...xi1>` compile failure); int iota arithmetic plus
            # one i32 comparison keeps every mask a native cmp result.
            n_pairs = c // (2 * j)
            s3 = s.reshape(c // (2 * j), 2, j, qt)
            i3 = ids.reshape(c // (2 * j), 2, j, qt)
            a, b = s3[:, 0], s3[:, 1]              # (C/2j, j, Qt)
            ia, ib = i3[:, 0], i3[:, 1]
            p = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
            # ((p*2j) & k_) is 0 or k_; shift by log2(k_) → 0/1 int32
            desc_i = 1 - (((p * (2 * j)) & k_) >> int(k_.bit_length() - 1))
            ge_i = (a >= b).astype(jnp.int32)
            # a_first = desc ? (a>=b) : (a<b)  ⇔  (a>=b) == desc
            a_first = ge_i == desc_i
            new_a = jnp.where(a_first, a, b)
            new_b = jnp.where(a_first, b, a)
            new_ia = jnp.where(a_first, ia, ib)
            new_ib = jnp.where(a_first, ib, ia)
            s = jnp.stack([new_a, new_b], axis=1).reshape(c, qt)
            ids = jnp.stack([new_ia, new_ib], axis=1).reshape(c, qt)
        out_s_ref[:] = s[:k]
        out_i_ref[:] = ids[:k]

    return _kernel


# Largest single-shot sorted block. Mosaic's stack allocator keeps ~3
# stages of the unrolled network's temporaries live (measured on-chip:
# 120.84M scoped-vmem request at C=8192·q_tile=128, i.e. ~60M at C=4096),
# so blocks above 4096 candidates are handled by exact block-top-k +
# recursive merge below instead of one giant network. Shrinking q_tile
# does NOT help: q_tile is the lane dimension and Mosaic pads lanes to 128.
_MAX_SORT_BLOCK = 4096


def _block_topk_call(s, i, k: int, cb: int, q_tile: int, interpret: bool):
    """One pallas_call: per (cb candidates × q_tile queries) block, bitonic
    sort and emit the block's top-k rows. Grid covers (queries, c-blocks);
    output is (nb·k, Q) candidate-major. cb and Q must already be padded."""
    c, qp = s.shape
    nb = c // cb
    out_s, out_i = pl.pallas_call(
        _make_kernel(cb, k),
        grid=(qp // q_tile, nb),
        in_specs=[
            pl.BlockSpec((cb, q_tile), lambda qb, bb: (bb, qb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, q_tile), lambda qb, bb: (bb, qb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((k, q_tile), lambda qb, bb: (bb, qb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, q_tile), lambda qb, bb: (bb, qb),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb * k, qp), s.dtype),
            jax.ShapeDtypeStruct((nb * k, qp), jnp.int32),
        ),
        # the 16 MB default scoped-vmem limit trips already at
        # cb=1024·q_tile=128 (7.54M request); grant a flat budget sized for
        # the cb=4096 worst case, under the 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=80 * 2**20),
        interpret=interpret,
    )(s, i)
    return out_s, out_i


@functools.partial(jax.jit, static_argnames=("k", "q_tile", "interpret"))
def pallas_bitonic_topk_cmajor(scores_cm, ids_cm, k: int,
                               q_tile: int = 128, interpret: bool = False):
    """Candidate-major variant: (C, Q) scores/ids → ((k, Q), (k, Q)).

    The layout `mips_segment_candidates` already emits — using it directly
    skips BOTH transposes the row-major API would pay. C pads to a power
    of two with -inf/-1, Q to the tile multiple. C above _MAX_SORT_BLOCK
    is reduced EXACTLY by per-4096-block top-k (the global top-k is a
    subset of the union of per-block top-ks) and recursing on the nb·k
    survivors until one block sorts them all."""
    scores_cm = jnp.asarray(scores_cm)
    ids_cm = jnp.asarray(ids_cm, jnp.int32)
    c0, q = scores_cm.shape
    if k > c0:
        raise ValueError(f"k={k} > {c0} candidates")
    kp = 1 << int(np.ceil(np.log2(max(k, 2))))  # pow2 so merge blocks stay pow2
    if c0 > _MAX_SORT_BLOCK and kp >= _MAX_SORT_BLOCK:
        raise ValueError(
            f"k={k} keeps every row of a {_MAX_SORT_BLOCK}-candidate merge "
            f"block — the block-top-k reduction cannot make progress; use "
            f"k < {_MAX_SORT_BLOCK // 2} or lax.top_k for near-full sorts")
    q_pad = (-q) % q_tile
    s, i = scores_cm, ids_cm
    while True:
        c0 = s.shape[0]
        cb = min(1 << int(np.ceil(np.log2(max(c0, 2)))), _MAX_SORT_BLOCK)
        c = -(-c0 // cb) * cb
        s = jnp.pad(s, ((0, c - c0), (0, q_pad)), constant_values=-jnp.inf)
        i = jnp.pad(i, ((0, c - c0), (0, q_pad)), constant_values=-1)
        q_pad = 0                      # only pad queries on the first pass
        if c == cb:                    # one block sorts everything: done
            out_s, out_i = _block_topk_call(s, i, k, cb, q_tile, interpret)
            return out_s[:, :q], out_i[:, :q]
        s, i = _block_topk_call(s, i, kp, cb, q_tile, interpret)


@functools.partial(jax.jit, static_argnames=("k", "q_tile", "interpret"))
def pallas_bitonic_topk(scores, ids=None, k: int = 100, q_tile: int = 128,
                        interpret: bool = False):
    """Row-wise exact top-k, descending: (Q, C) → ((Q, k), (Q, k)).

    ``ids`` defaults to column indices. C is padded to the next power of
    two with -inf scores / -1 ids; Q pads to the tile multiple (padded
    rows are dropped). The sorted axis lives on SUBLANES in-kernel
    (candidate-major), so every compare-exchange is an axis-aligned
    reshape+select — no lane shuffles. VMEM per grid step is
    ~2·C·q_tile·4 B plus stage temporaries — at C=8192 the default
    q_tile=128 budgets ~8 MB resident; drop q_tile if Mosaic reports
    VMEM pressure at larger C.
    """
    scores = jnp.asarray(scores)
    q, c0 = scores.shape
    if ids is None:
        ids = jnp.broadcast_to(jnp.arange(c0, dtype=jnp.int32)[None, :],
                               scores.shape)
    ids = jnp.asarray(ids, jnp.int32)
    out_s, out_i = pallas_bitonic_topk_cmajor(scores.T, ids.T, k=k,
                                              q_tile=q_tile,
                                              interpret=interpret)
    return out_s.T, out_i.T
