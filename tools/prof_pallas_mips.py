"""Pallas fused MIPS kernel vs the XLA retrieval paths at serving shapes.

Corpus 1M x 128 bf16, query tiles of 512, k in {100, 500}. Honest timing:
K-iteration lax.scan with iteration-varied queries + float() host sync
(block_until_ready acks early through this sandbox's TPU tunnel).

Round-1 baselines (tools/prof_retrieval_topk.py, same discipline):
matmul-only ceiling 476k qps; approx_max_k top-500 219k qps @ recall .985;
segmented merge 318k @ .956. The win bar (VERDICT item 8) is >=1.3x over
the best comparable path at comparable recall.

Run: cd /root/repo && python tools/prof_pallas_mips.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N, D, QT, K_ITER = 1_000_000, 128, 512, 10



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
    _ = float(jnp.sum(out[-1].astype(jnp.float32)) if isinstance(out, tuple)
              else jnp.sum(out))
    best = float("inf")
    for rep in range(1, 4):
        vargs = _vary(args, rep)
        t0 = time.perf_counter()
        out = fn(*vargs)
        _ = float(jnp.sum(out[-1].astype(jnp.float32))
                  if isinstance(out, tuple) else jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    per_tile = best / K_ITER
    print(f"{name:28s} {per_tile*1e3:8.2f} ms/tile  "
          f"{QT/per_tile/1e3:8.1f}k qps", flush=True)
    return QT / per_tile


def main():
    from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.normal(size=(N, D)) * 0.1, jnp.bfloat16)
    q0 = jnp.asarray(rng.normal(size=(QT, D)) * 0.1, jnp.bfloat16)

    def vary(q, i):
        return q * (1.0 + 0.001 * i.astype(jnp.bfloat16))

    for k in (100, 500):
        @jax.jit
        def pallas_scan(q0, corpus):
            def body(c, i):
                s, ids = pallas_mips_topk(vary(q0, i), corpus, k)
                return c + jnp.sum(s) + jnp.sum(ids), ()
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(K_ITER))
            return c

        @jax.jit
        def xla_exact_scan(q0, corpus):
            def body(c, i):
                scores = jnp.dot(vary(q0, i), corpus.T,
                                 preferred_element_type=jnp.float32)
                s, ids = jax.lax.top_k(scores, k)
                return c + jnp.sum(s) + jnp.sum(ids), ()
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(K_ITER))
            return c

        @jax.jit
        def xla_approx_scan(q0, corpus):
            def body(c, i):
                scores = jnp.dot(vary(q0, i), corpus.T,
                                 preferred_element_type=jnp.float32)
                s, ids = jax.lax.approx_max_k(scores, k)
                return c + jnp.sum(s) + jnp.sum(ids), ()
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(K_ITER))
            return c

        print(f"--- k={k} ---")
        qps_pallas = timed(f"pallas fused top-{k}", pallas_scan, q0, corpus)
        qps_approx = timed(f"xla approx_max_k top-{k}", xla_approx_scan,
                           q0, corpus)
        qps_exact = timed(f"xla matmul+top_k top-{k}", xla_exact_scan,
                          q0, corpus)
        print(f"pallas vs approx: {qps_pallas/qps_approx:.2f}x   "
              f"vs exact: {qps_pallas/qps_exact:.2f}x")

    # recall spot-check at k=500 on a small exact reference
    s, ids = pallas_mips_topk(q0[:32].astype(jnp.float32),
                              corpus.astype(jnp.float32), 500)
    exact = np.asarray(jnp.dot(q0[:32].astype(jnp.float32),
                               corpus.astype(jnp.float32).T))
    exact_ids = np.argsort(-exact, axis=1)[:, :500]
    rec = np.mean([len(set(np.asarray(ids)[i].tolist())
                       & set(exact_ids[i].tolist())) / 500
                   for i in range(32)])
    print(f"recall@500 vs exact: {rec:.4f}")


if __name__ == "__main__":
    main()
