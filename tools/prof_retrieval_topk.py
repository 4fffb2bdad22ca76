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

    def pallas_fused(k):
        from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk

        def f(q, it):
            ts, _ = pallas_mips_topk(q, it, k, valid_items=N)
            return jnp.sum(ts, axis=-1)
        return f

    print(f"devices: {jax.devices()}", flush=True)
    timed("matmul_only", sweep(mm_only), queries, items)
    timed("approx_500", sweep(approx_k(K, 0.95)), queries, items)
    timed("approx_noagg", sweep(approx_noagg), queries, items)
    timed("approx_100", sweep(approx_k(100, 0.95)), queries, items)
    timed("segments", sweep(segments), queries, items)
    timed("pallas_500", sweep(pallas_fused(K)), queries, items)
    timed("pallas_100", sweep(pallas_fused(100)), queries, items)


if __name__ == "__main__":
    main()
