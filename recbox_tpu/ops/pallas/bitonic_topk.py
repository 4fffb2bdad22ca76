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
Measured envelope to be filled in on chip (tunnel outage at build time);
correctness is pinned to `jax.lax.top_k` in `tests/test_pallas_kernels.py`
both in interpret mode and through the `merge='bitonic'` MIPS path.

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
        s = s_ref[:]                               # (C, Qt) candidate-major
        ids = i_ref[:]
        qt = s.shape[1]
        for k_, j in stages:
            # direction of the compare-exchange at block k_, stride j:
            # position i = p*(2j) + side*j + r, and (i & k_) depends only
            # on p — one bool per pair group, built from iota IN-KERNEL
            # (Pallas forbids captured constants). Directions are inverted
            # vs the classic ascending network → final order DESCENDING.
            n_pairs = c // (2 * j)
            p = jax.lax.broadcasted_iota(jnp.int32, (n_pairs, 1, 1), 0)
            desc = ((p * (2 * j)) & k_) == 0       # (C/2j, 1, 1)
            s3 = s.reshape(c // (2 * j), 2, j, qt)
            i3 = ids.reshape(c // (2 * j), 2, j, qt)
            a, b = s3[:, 0], s3[:, 1]              # (C/2j, j, Qt)
            ia, ib = i3[:, 0], i3[:, 1]
            a_first = jnp.where(desc, a >= b, a < b)
            new_a = jnp.where(a_first, a, b)
            new_b = jnp.where(a_first, b, a)
            new_ia = jnp.where(a_first, ia, ib)
            new_ib = jnp.where(a_first, ib, ia)
            s = jnp.stack([new_a, new_b], axis=1).reshape(c, qt)
            ids = jnp.stack([new_ia, new_ib], axis=1).reshape(c, qt)
        out_s_ref[:] = s[:k]
        out_i_ref[:] = ids[:k]

    return _kernel


@functools.partial(jax.jit, static_argnames=("k", "q_tile", "interpret"))
def pallas_bitonic_topk_cmajor(scores_cm, ids_cm, k: int,
                               q_tile: int = 128, interpret: bool = False):
    """Candidate-major variant: (C, Q) scores/ids → ((k, Q), (k, Q)).

    The layout `mips_segment_candidates` already emits — using it directly
    skips BOTH transposes the row-major API would pay. C pads to a power
    of two with -inf/-1, Q to the tile multiple."""
    scores_cm = jnp.asarray(scores_cm)
    ids_cm = jnp.asarray(ids_cm, jnp.int32)
    c0, q = scores_cm.shape
    c = 1 << int(np.ceil(np.log2(max(c0, 2))))
    if k > c0:
        raise ValueError(f"k={k} > {c0} candidates")
    q_pad = (-q) % q_tile
    s = jnp.pad(scores_cm, ((0, c - c0), (0, q_pad)),
                constant_values=-jnp.inf)
    i = jnp.pad(ids_cm, ((0, c - c0), (0, q_pad)), constant_values=-1)
    qp = q + q_pad
    out_s, out_i = pl.pallas_call(
        _make_kernel(c, k),
        grid=(qp // q_tile,),
        in_specs=[
            pl.BlockSpec((c, q_tile), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, q_tile), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((k, q_tile), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, q_tile), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, qp), scores_cm.dtype),
            jax.ShapeDtypeStruct((k, qp), jnp.int32),
        ),
        interpret=interpret,
    )(s, i)
    return out_s[:, :q], out_i[:, :q]


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
