"""Decompose approx-MIPS serving cost at 1M x 128, q=8192, k=500.

Variants (each a 5-iteration scan with query perturbation, float() sync):
  matmul_only      bf16 scoring matmul, sum-consumed (the FLOP floor)
  approx_500       current path: approx_max_k(k=500, rt=.95)
  approx_noagg     approx_max_k(aggregate_to_topk=False) + exact top_k of l
  approx_100       k=100 reference point
  segments         score (q, 8, 125k) segments, approx k=64 each, merge 512
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N, D, Q, K = 1_000_000, 128, 8192, 500
CHUNK = 1024
ITERS = 5



def _vary(args, rep):
    """Content-vary the SMALLEST array argument per repetition: identical
    execute requests (same executable + same buffers) can be served from
    the tunnel cache (bench.py measurement note). Floats scale by
    (1+1e-7·rep); int id arrays roll by rep. The smallest array keeps the
    perturbation cost negligible next to the op under test."""
    arrs = [(i, a) for i, a in enumerate(args)
            if hasattr(a, "dtype") and hasattr(a, "size") and a.ndim >= 1]
    if not arrs or rep == 0:
        return tuple(args)
    i, a = min(arrs, key=lambda ia: ia[1].size)
    if jnp.issubdtype(a.dtype, jnp.floating):
        a = a * (1.0 + 1e-7 * rep)
    else:
        a = jnp.roll(a, rep)
    out = list(args)
    out[i] = a
    return tuple(out)

def timed(name, fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out))
    best = float("inf")
    for rep in range(1, 4):
        vargs = _vary(args, rep)
        t0 = time.perf_counter()
        out = fn(*vargs)
        _ = float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    print(f"{name:14s} {per*1e3:8.1f} ms/sweep  {Q/per:10,.0f} qps",
          flush=True)


def chunked(fn_chunk, queries, items):
    def body(q):
        return fn_chunk(q, items)
    return jax.lax.map(body, queries.reshape(-1, CHUNK, D))


def main():
    rng = np.random.default_rng(0)
    items = jnp.asarray(rng.normal(size=(N, D)), jnp.bfloat16)
    queries = jnp.asarray(rng.normal(size=(Q, D)), jnp.float32)

    def sweep(per_chunk_consume):
        @jax.jit
        def run(queries, items):
            def body(c, i):
                q = queries * (1.0 + 1e-6 * i)   # iteration-dependent
                out = chunked(per_chunk_consume, q.astype(jnp.bfloat16),
                              items)
                return c + jnp.sum(out.astype(jnp.float32)), ()
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
            return c
        return run

    def mm_only(q, it):
        s = jnp.dot(q, it.T, preferred_element_type=jnp.float32)
        return jnp.sum(s, axis=-1)

    def approx_k(k, rt):
        def f(q, it):
            s = jnp.dot(q, it.T, preferred_element_type=jnp.float32)
            cs, _ = jax.lax.approx_max_k(s, k, recall_target=rt)
            return jnp.sum(cs, axis=-1)
        return f

    def approx_noagg(q, it):
        s = jnp.dot(q, it.T, preferred_element_type=jnp.float32)
        cs, ci = jax.lax.approx_max_k(s, K, recall_target=0.95,
                                      aggregate_to_topk=False)
        ts, _ = jax.lax.top_k(cs, K)
        return jnp.sum(ts, axis=-1)

    def segments(q, it):
        s = jnp.dot(q, it.T, preferred_element_type=jnp.float32)
        seg = s.reshape(s.shape[0], 8, N // 8)
        cs, _ = jax.lax.approx_max_k(seg, 64, recall_target=0.95)
        merged = cs.reshape(s.shape[0], -1)
        ts, _ = jax.lax.top_k(merged, min(K, merged.shape[-1]))
        return jnp.sum(ts, axis=-1)

    def pallas_fused(k, merge=None):
        from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk

        def f(q, it):
            ts, _ = pallas_mips_topk(q, it, k, valid_items=N, merge=merge)
            return jnp.sum(ts, axis=-1)
        return f

    def merge_sweep(merge_fn):
        """ITERS-iteration scan with iteration-dependent inputs — the same
        honest-timing shell as `sweep`, for merge-only microbenches.
        (The qps column is per ONE CHUNK of queries here, not Q.)"""
        @jax.jit
        def run(cand_s, cand_i):
            def body(c, i):
                s = cand_s * (1.0 + 1e-6 * i)
                return c + merge_fn(s, cand_i), ()
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
            return c
        return run

    def bitonic_merge_only(k):
        """Isolate the merge: lax.top_k vs the in-VMEM bitonic network on a
        candidate-major (n_cand, CHUNK) block — the ~2.6 ms fixed-cost
        question, directly."""
        from recbox_tpu.ops.pallas.bitonic_topk import (
            pallas_bitonic_topk_cmajor,
        )

        def f(cand_scores, cand_ids):
            ts, _ = pallas_bitonic_topk_cmajor(cand_scores, cand_ids, k=k)
            return jnp.sum(ts)
        return f

    def lax_merge_only(k):
        def f(cand_scores, cand_ids):
            ts, _ = jax.lax.top_k(cand_scores.T, k)
            return jnp.sum(ts)
        return f

    print(f"devices: {jax.devices()}", flush=True)
    timed("matmul_only", sweep(mm_only), queries, items)
    timed("approx_500", sweep(approx_k(K, 0.95)), queries, items)
    timed("approx_noagg", sweep(approx_noagg), queries, items)
    timed("approx_100", sweep(approx_k(100, 0.95)), queries, items)
    timed("segments", sweep(segments), queries, items)
    timed("pallas_500", sweep(pallas_fused(K)), queries, items)
    timed("pallas_100", sweep(pallas_fused(100)), queries, items)
    timed("pallas_500_bitonic", sweep(pallas_fused(K, "bitonic")),
          queries, items)
    timed("pallas_100_bitonic", sweep(pallas_fused(100, "bitonic")),
          queries, items)
    # merge-only microbench (candidate block shaped like one chunk's
    # output: N/128 candidates x CHUNK queries)
    rngm = np.random.default_rng(7)
    cand_s = jnp.asarray(rngm.normal(size=(N // 128, CHUNK))
                         .astype(np.float32))
    cand_i = jnp.asarray(rngm.integers(0, N, size=(N // 128, CHUNK))
                         .astype(np.int32))
    timed("merge_lax_top500", merge_sweep(lax_merge_only(K)),
          cand_s, cand_i)
    timed("merge_bitonic_500", merge_sweep(bitonic_merge_only(K)),
          cand_s, cand_i)
    timed("merge_lax_top100", merge_sweep(lax_merge_only(100)),
          cand_s, cand_i)
    timed("merge_bitonic_100", merge_sweep(bitonic_merge_only(100)),
          cand_s, cand_i)


if __name__ == "__main__":
    main()
