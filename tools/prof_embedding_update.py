"""Decompose the DeepFM train-step cost: where do the non-fwd/bwd ~45 ms go?

Measures, each as a K-iteration lax.scan inside ONE jit (iteration-dependent
ids so XLA cannot hoist; float() host sync — see
.claude/skills/verify/SKILL.md "micro-benchmark trap"):

  gather26        26 separate (32768,)-id gathers from 26 (100k,64) tables
  gather1         one (851968,)-id gather from a (2.6M,64) combined table
  scatter26       26 separate scatter-adds into the 26 tables
  scatter1        one combined scatter-add into the (2.6M,64) table
  scatter1_sorted one combined scatter-add with pre-sorted ids
  adagrad1        combined row-wise AdaGrad (v scatter + gather + row scatter)
  adam_dense      dense Adam over the 2.6M×64 table (the round-1 default path)

Run on TPU:  cd /root/repo && python tools/prof_embedding_update.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

NUM_TABLES, VOCAB, DIM, BATCH = 26, 100_000, 64, 32_768
K = 20



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
    _ = float(jnp.sum(out[-1]) if isinstance(out, tuple) else jnp.sum(out))
    best = float("inf")
    for rep in range(1, 4):
        vargs = _vary(args, rep)
        t0 = time.perf_counter()
        out = fn(*vargs)
        _ = float(jnp.sum(out[-1]) if isinstance(out, tuple) else jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1e3
    print(f"{name:18s} {ms:8.2f} ms/step")
    return ms


def main():
    rng = np.random.default_rng(0)
    ids = rng.integers(0, VOCAB, size=(NUM_TABLES, BATCH)).astype(np.int32)
    offsets = (np.arange(NUM_TABLES) * VOCAB).astype(np.int32)
    ids_flat = (ids + offsets[:, None]).reshape(-1)          # (851968,)
    tables = jnp.asarray(rng.normal(size=(NUM_TABLES, VOCAB, DIM)) * 0.01,
                         jnp.float32)
    big = tables.reshape(NUM_TABLES * VOCAB, DIM)
    g = jnp.asarray(rng.normal(size=(NUM_TABLES, BATCH, DIM)) * 0.01,
                    jnp.float32)
    g_flat = g.reshape(-1, DIM)
    ids = jnp.asarray(ids)
    ids_flat = jnp.asarray(ids_flat)

    def vary(i, idv):  # iteration-dependent ids, same distribution
        return (idv + i * 7919) % VOCAB if idv.ndim == 2 else \
            (idv + i * 7919) % (NUM_TABLES * VOCAB)

    @jax.jit
    def gather26(tables, ids):
        def body(c, i):
            idv = vary(i, ids)
            s = 0.
            for t in range(NUM_TABLES):
                s = s + jnp.sum(jnp.take(tables[t], idv[t], axis=0))
            return c + s, ()
        c, _ = jax.lax.scan(body, 0., jnp.arange(K))
        return c

    @jax.jit
    def gather1(big, ids_flat):
        def body(c, i):
            return c + jnp.sum(jnp.take(big, vary(i, ids_flat), axis=0)), ()
        c, _ = jax.lax.scan(body, 0., jnp.arange(K))
        return c

    @jax.jit
    def scatter26(tables, ids, g):
        def body(tabs, i):
            idv = vary(i, ids)
            new = [tabs[t].at[idv[t]].add(g[t]) for t in range(NUM_TABLES)]
            return jnp.stack(new), ()
        tabs, _ = jax.lax.scan(body, tables, jnp.arange(K))
        return tabs

    @jax.jit
    def scatter1(big, ids_flat, g_flat):
        def body(b, i):
            return b.at[vary(i, ids_flat)].add(g_flat), ()
        b, _ = jax.lax.scan(body, big, jnp.arange(K))
        return b

    @jax.jit
    def scatter1_sorted(big, ids_flat, g_flat):
        def body(b, i):
            idv = jnp.sort(vary(i, ids_flat))
            return b.at[idv].add(g_flat), ()
        b, _ = jax.lax.scan(body, big, jnp.arange(K))
        return b

    @jax.jit
    def adagrad1(big, v, ids_flat, g_flat):
        def body(carry, i):
            b, v = carry
            idv = vary(i, ids_flat)
            g2 = jnp.mean(jnp.square(g_flat), axis=-1)
            v = v.at[idv].add(g2)
            scale = 1e-3 / (jnp.sqrt(v[idv]) + 1e-8)
            b = b.at[idv].add(-scale[:, None] * g_flat)
            return (b, v), ()
        (b, v), _ = jax.lax.scan(body, (big, v), jnp.arange(K))
        return b

    @jax.jit
    def adam_dense(big, m, v, ids_flat, g_flat):
        def body(carry, i):
            b, m, v = carry
            idv = vary(i, ids_flat)
            dense_g = jnp.zeros_like(b).at[idv].add(g_flat)
            m = 0.9 * m + 0.1 * dense_g
            v = 0.999 * v + 0.001 * jnp.square(dense_g)
            b = b - 1e-3 * m / (jnp.sqrt(v) + 1e-8)
            return (b, m, v), ()
        (b, m, v), _ = jax.lax.scan(body, (big, m, v), jnp.arange(K))
        return b

    print(f"devices: {jax.devices()}")
    timed("gather26", gather26, tables, ids)
    timed("gather1", gather1, big, ids_flat)
    timed("scatter26", scatter26, tables, ids, g)
    timed("scatter1", scatter1, big, ids_flat, g_flat)
    timed("scatter1_sorted", scatter1_sorted, big, ids_flat, g_flat)
    timed("adagrad1", adagrad1, big, jnp.zeros(big.shape[0]), ids_flat, g_flat)
    timed("adam_dense", adam_dense, big, jnp.zeros_like(big),
          jnp.zeros_like(big), ids_flat, g_flat)


if __name__ == "__main__":
    main()
