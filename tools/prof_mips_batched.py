"""Round-3 MIPS shootout: single-merge + packed-mantissa Pallas kernel
vs the segmented XLA champion, at serving shapes (1M x 128, Q=8192).

Round-2 envelope (tools/prof_retrieval_topk.py): pallas per-chunk 262k qps
< segmented XLA 325k. Hypothesis: the loss is the PER-CHUNK merge (8x a
multi-ms lax.top_k/approx_max_k call), not the kernel. Round-3 variants:
  segmented_500     library segmented_mips_topk (the XLA-formulation champ)
  pallas_old_500    round-2 shape: one merge per 1024-query chunk
  pallas_batch_500  ONE merge for all 8192 queries (packed=False)
  pallas_pack_500   packed-mantissa kernel + one merge (half the candidate
                    bytes, max-only reduce, no id gather)
  *_100             k=100 points
All variants consume BOTH scores and ids (a real serving call returns
both; consuming only scores lets XLA DCE the id plumbing).
Honest-timing shell per .claude/skills/verify/SKILL.md: ITERS-scan inside
one jit, iteration-dependent queries, float() sync, best-of-3 with
content-varied inputs.

FULL RUN RECORD (v5e via axon, 2026-08-19, this exact tool):

    segmented_500          97.7 ms/sweep      83,844 qps
    pallas_old_500         97.5 ms/sweep      84,030 qps
    pallas_batch_500      113.2 ms/sweep      72,373 qps
    pallas_pack_500        56.1 ms/sweep     145,960 qps
    segmented_100          27.8 ms/sweep     294,339 qps
    pallas_pack_100        27.1 ms/sweep     302,144 qps
    kernel_only_bf16       17.0 ms/sweep     481,608 qps
    pallas_int8_500        57.2 ms/sweep     143,231 qps
    fused_500              28.6 ms/sweep     286,008 qps
    fused_100              23.0 ms/sweep     356,589 qps
    fused_int8_500         27.3 ms/sweep     300,128 qps
    fused/segmented @500: 3.411x
    recall@500: segmented .9849, pallas_pack .9689, fused .9689
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N, D, Q = 1_000_000, 128, 8192
ITERS = 5
CHUNK = 1024


def timed(name, fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out))
    best = float("inf")
    for rep in range(1, 4):
        a0 = args[0] * (1.0 + 1e-7 * rep)
        t0 = time.perf_counter()
        out = fn(a0, *args[1:])
        _ = float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    print(f"{name:18s} {per*1e3:8.1f} ms/sweep  {Q/per:10,.0f} qps",
          flush=True)
    return Q / per


def sweep(per_call):
    @jax.jit
    def run(queries, items):
        def body(c, i):
            q = (queries * (1.0 + 1e-6 * i)).astype(jnp.bfloat16)
            s, ids = per_call(q, items)
            return (c + jnp.sum(s.astype(jnp.float32))
                    + jnp.sum(ids.astype(jnp.float32)), ())
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        return c
    return run


def main():
    from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
    from recbox_tpu.retrieval.index import segmented_mips_topk

    rng = np.random.default_rng(0)
    items = jnp.asarray(rng.normal(size=(N, D)), jnp.bfloat16)
    queries = jnp.asarray(rng.normal(size=(Q, D)), jnp.float32)
    print(f"devices: {jax.devices()}", flush=True)

    def seg(k):
        return lambda q, it: segmented_mips_topk(q, it, k)

    def pallas_old(k):
        def f(q, it):
            parts = [pallas_mips_topk(q[s:s + CHUNK], it, k, valid_items=N,
                                      packed=False)
                     for s in range(0, Q, CHUNK)]
            return (jnp.concatenate([p[0] for p in parts]),
                    jnp.concatenate([p[1] for p in parts]))
        return f

    def pallas_new(k, packed):
        return lambda q, it: pallas_mips_topk(q, it, k, valid_items=N,
                                              packed=packed)

    def sweep_int8(k):
        """int8 sweep with (q_items, iscale) as jit ARGUMENTS (a closure
        capture would ship the 128 MB corpus as a compile-request
        constant — the HTTP 413 trap in the verify skill)."""
        @jax.jit
        def run(queries, q_items, iscale):
            def body(c, i):
                q = queries * (1.0 + 1e-6 * i)
                s, ids = pallas_mips_topk(q, q_items, k, valid_items=N,
                                          row_scale=iscale)
                return (c + jnp.sum(s.astype(jnp.float32))
                        + jnp.sum(ids.astype(jnp.float32)), ())
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
            return c
        return run

    def kernel_only(q, it):
        """Packed kernel WITHOUT the merge: the candidate-generation
        floor (measured 472k qps 2026-08-19 — at the matmul ceiling; the
        merge is ~70% of end-to-end time). `it` must be pre-padded to the
        kernel block multiple."""
        from recbox_tpu.ops.pallas.mips_topk import mips_segment_candidates
        parts = [mips_segment_candidates(q[s:s + CHUNK], it, valid_items=N,
                                         packed=True)
                 for s in range(0, Q, CHUNK)]
        cs = jnp.concatenate(parts, axis=1)
        return cs, jnp.zeros((), jnp.int32)

    results = {}
    results["segmented_500"] = timed("segmented_500", sweep(seg(500)),
                                     queries, items)
    results["pallas_old_500"] = timed("pallas_old_500",
                                      sweep(pallas_old(500)), queries, items)
    results["pallas_batch_500"] = timed(
        "pallas_batch_500", sweep(pallas_new(500, False)), queries, items)
    results["pallas_pack_500"] = timed(
        "pallas_pack_500", sweep(pallas_new(500, True)), queries, items)
    results["segmented_100"] = timed("segmented_100", sweep(seg(100)),
                                     queries, items)
    results["pallas_pack_100"] = timed(
        "pallas_pack_100", sweep(pallas_new(100, True)), queries, items)
    # decomposition + int8 corpus points
    from recbox_tpu.ops.pallas.mips_topk import _block_plan
    from recbox_tpu.retrieval.index import quantize_int8
    sub_rows, spb = _block_plan(jnp.bfloat16, CHUNK, D)
    pad = (-N) % (sub_rows * spb)
    items_p = jnp.pad(items, ((0, pad), (0, 0)))
    results["kernel_only_bf16"] = timed(
        "kernel_only_bf16", sweep(kernel_only), queries, items_p)
    q_items, iscale = quantize_int8(items.astype(jnp.float32))
    results["pallas_int8_500"] = timed(
        "pallas_int8_500", sweep_int8(500), queries, q_items, iscale)
    # fused running-top-k kernel (the serving default on TPU)
    from recbox_tpu.ops.pallas.mips_fused_topk import mips_fused_topk
    results["fused_500"] = timed(
        "fused_500",
        sweep(lambda q, it: mips_fused_topk(q, it, 500, valid_items=N)),
        queries, items)
    results["fused_100"] = timed(
        "fused_100",
        sweep(lambda q, it: mips_fused_topk(q, it, 100, valid_items=N)),
        queries, items)

    def sweep_fused_int8(k):
        @jax.jit
        def run(queries, q_items, iscale):
            def body(c, i):
                q = queries * (1.0 + 1e-6 * i)
                s, ids = mips_fused_topk(q, q_items, k, valid_items=N,
                                         row_scale=iscale)
                return (c + jnp.sum(s.astype(jnp.float32))
                        + jnp.sum(ids.astype(jnp.float32)), ())
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
            return c
        return run

    results["fused_int8_500"] = timed(
        "fused_int8_500", sweep_fused_int8(500), queries, q_items, iscale)
    r = results["fused_500"] / results["segmented_500"]
    print(f"\nfused/segmented @500: {r:.3f}x", flush=True)

    # ---- recall (untimed): 512 queries vs exact top-500 ----
    qs = queries[:512]
    s_ex = jnp.dot(qs.astype(jnp.bfloat16), items.T,
                   preferred_element_type=jnp.float32)
    _, i_ex = jax.lax.top_k(s_ex, 500)
    i_ex = np.asarray(i_ex)
    for name, fn in [("segmented", seg(500)),
                     ("pallas_pack", pallas_new(500, True)),
                     ("fused", lambda q, it: mips_fused_topk(
                         q, it, 500, valid_items=N))]:
        _, ids = jax.jit(fn)(qs.astype(jnp.bfloat16), items)
        ids = np.asarray(ids)
        rec = np.mean([len(set(ids[i].tolist()) & set(i_ex[i].tolist()))
                       / 500 for i in range(512)])
        print(f"recall@500 {name:12s} {rec:.4f}", flush=True)


if __name__ == "__main__":
    main()
