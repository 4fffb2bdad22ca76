"""int8 vs bf16 MIPS serving at 1M x 128, q=8192: rate and recall.

Protocol matches `tools/prof_retrieval_topk.py`: each variant is an
ITERS-iteration lax.scan with iteration-perturbed queries inside ONE jit
call, float() synced (the honest axon timing — see bench.py's measurement
note), best of 3 sweeps. Recall is measured against the exact fp32 oracle
on the unperturbed queries.

Variants:
  matmul_bf16     bf16 scoring matmul, sum-consumed (FLOP floor, 197 TOPS)
  matmul_int8     s8xs8->s32 matmul + per-row rescale, sum-consumed
                  (the 394 TOPS MXU mode the int8 path buys)
  approx_bf16_k100   current default serving path
  int8_k100          int8_mips_topk, no refine
  int8_refined_k100  int8 over-retrieve 4x + exact f32 rescore

Run on TPU: python tools/prof_int8_mips.py
(CPU run works but the int8 advantage is TPU-only.)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("N", 1_000_000))
D = int(os.environ.get("DIM", 128))
Q = int(os.environ.get("Q", 8192))
K = int(os.environ.get("K", 100))
CHUNK = int(os.environ.get("CHUNK", 1024))
ITERS = 5


def timed(name, run, *args):
    out = run(*args)
    _ = float(out)
    best = float("inf")
    for rep in range(1, 4):
        # vary the queries per repetition: identical execute requests can
        # be served from the tunnel cache (bench.py measurement note)
        vargs = (args[0] * (1.0 + 1e-7 * rep),) + args[1:]
        t0 = time.perf_counter()
        _ = float(run(*vargs))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    print(f"{name:18s} {per*1e3:8.1f} ms/sweep  {Q/per:10,.0f} qps",
          flush=True)


def sweep(consume_chunk, *extra):
    """ITERS scans over query chunks; consume_chunk(q_chunk, *extra) -> array."""

    @jax.jit
    def run(queries, *extra):
        def body(c, i):
            q = queries * (1.0 + 1e-6 * i)

            def chunk_body(qc):
                return jnp.sum(consume_chunk(qc, *extra).astype(jnp.float32))

            s = jax.lax.map(chunk_body, q.reshape(-1, CHUNK, D))
            return c + jnp.sum(s), ()

        c, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        return c

    return run


def recall_vs_oracle(idx, oracle_idx):
    idx, oracle_idx = np.asarray(idx), np.asarray(oracle_idx)
    return np.mean([len(set(idx[r]) & set(oracle_idx[r])) / oracle_idx.shape[1]
                    for r in range(len(idx))])


def main():
    from recbox_tpu.retrieval.index import (
        approx_mips_topk, chunked_topk, int8_mips_topk, quantize_int8)

    rng = np.random.default_rng(0)
    items = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    queries = jnp.asarray(rng.normal(size=(Q, D)), jnp.float32)
    q_items, scale = quantize_int8(items)
    items_bf16 = items.astype(jnp.bfloat16)

    # --- rate floors ------------------------------------------------------
    def mm_bf16(qc, it):
        return jnp.dot(qc.astype(jnp.bfloat16), it.T,
                       preferred_element_type=jnp.float32)

    def mm_int8(qc, qit, sc):
        qa = jnp.max(jnp.abs(qc), axis=1)
        qs = jnp.maximum(qa, 1e-12) / 127.0
        qq = jnp.clip(jnp.round(qc / qs[:, None]), -127, 127).astype(jnp.int8)
        s_int = jax.lax.dot_general(qq, qit, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        return s_int.astype(jnp.float32) * sc[None, :] * qs[:, None]

    timed("matmul_bf16", sweep(mm_bf16), queries, items_bf16)
    timed("matmul_int8", sweep(mm_int8), queries, q_items, scale)

    # --- end-to-end top-k paths (jit'd API calls, scanned the same way) ---
    def run_api(fn, *args, iters=ITERS):
        # API fns are jit'd; chain calls via a query perturbation dependent
        # on the previous result to defeat caching, sync at the end.
        best = float("inf")
        s, i = fn(queries, *args)          # compile + warmup
        _ = float(jnp.sum(s))
        for rep in range(1, 4):
            t0 = time.perf_counter()
            for it in range(iters):
                # every call content-distinct ACROSS reps too (the old
                # bump = float(s)*0.0 was always 0 — reps replayed the
                # identical perturbation sequence)
                s, _ = fn(queries * (1.0 + 1e-6 * (it + 10 * rep)), *args)
            _ = float(s[0, 0])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    b = run_api(lambda q: approx_mips_topk(q, items, K, query_chunk=CHUNK,
                                           recall_target=0.95))
    print(f"{'approx_bf16_k100':18s} {b*1e3:8.1f} ms/call  {Q/b:10,.0f} qps")
    b = run_api(lambda q: int8_mips_topk(q, q_items, scale, K,
                                         query_chunk=CHUNK,
                                         recall_target=0.95))
    print(f"{'int8_k100':18s} {b*1e3:8.1f} ms/call  {Q/b:10,.0f} qps")
    b = run_api(lambda q: int8_mips_topk(q, q_items, scale, K,
                                         query_chunk=CHUNK,
                                         recall_target=0.95, oversample=4,
                                         items_f32=items))
    print(f"{'int8_refined_k100':18s} {b*1e3:8.1f} ms/call  {Q/b:10,.0f} qps")

    # --- recall on a query subset vs the exact oracle ---------------------
    sub = queries[:512]
    _, oracle = chunked_topk(sub, items, K)
    _, ia = approx_mips_topk(sub, items, K, query_chunk=512,
                             recall_target=0.95)
    _, i8 = int8_mips_topk(sub, q_items, scale, K, query_chunk=512,
                           recall_target=0.95)
    _, i8r = int8_mips_topk(sub, q_items, scale, K, query_chunk=512,
                            recall_target=0.95, oversample=4, items_f32=items)
    print(f"recall@{K} vs exact: approx_bf16 {recall_vs_oracle(ia, oracle):.4f}"
          f"  int8 {recall_vs_oracle(i8, oracle):.4f}"
          f"  int8_refined {recall_vs_oracle(i8r, oracle):.4f}")


if __name__ == "__main__":
    main()
