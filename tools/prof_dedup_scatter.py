"""Is sort+segment-dedup before the row scatter worth it on Zipfian ids?

At bench shapes the packed step scatters 851,968 rows; with Zipf-skewed ids
most are duplicates. Dedup pipeline: argsort ids, permute update rows,
segment-sum into unique slots, scatter N rows where only U are distinct...
the scatter still has N slots unless we compact. TPU scatter cost is per
ROW WRITTEN, so what matters is whether scattering N rows where N-U are
zero-delta at repeated positions is cheaper than N distinct — probe:

  sortcost       argsort(851k int32) + take rows (the dedup overhead)
  scatter_unif   scatter-add 851k rows, uniform ids (baseline)
  scatter_zipf   scatter-add 851k rows, zipf ids (hardware dup behavior)
  scatter_dedup  argsort + segment-sum + scatter of the same 851k slots
                 (duplicates collapsed to zero rows at repeated ids)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS, V, W = 851_968, 2_600_000, 128
K = 10



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
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = float("inf")
    for rep in range(1, 4):
        vargs = _vary(args, rep)
        t0 = time.perf_counter()
        out = fn(*vargs)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:14s} {best/K*1e3:8.2f} ms/step", flush=True)


def main():
    rng = np.random.default_rng(0)
    ids_u = rng.integers(0, V, N_ROWS).astype(np.int32)
    zipf = np.minimum(rng.zipf(1.2, N_ROWS), V).astype(np.int32) - 1
    print("zipf unique fraction:",
          round(len(np.unique(zipf)) / N_ROWS, 3), flush=True)
    g = jnp.asarray(rng.normal(size=(N_ROWS, W)) * 1e-3, jnp.float32)
    table = jnp.zeros((V, W), jnp.float32)

    def vary(i, ids):
        return (ids + i * 7919) % V

    @jax.jit
    def sortcost(ids, g):
        def body(c, i):
            idv = vary(i, ids)
            order = jnp.argsort(idv)
            return c + jnp.sum(g[order]), ()
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(K))
        return c

    def scatter(name):
        @jax.jit
        def run(table, ids, g):
            def body(t, i):
                return t.at[vary(i, ids)].add(g), ()
            t, _ = jax.lax.scan(body, table, jnp.arange(K))
            return t
        return run

    @jax.jit
    def scatter_dedup(table, ids, g):
        def body(t, i):
            idv = vary(i, ids)
            order = jnp.argsort(idv)
            sid = idv[order]
            gs = g[order]
            first = jnp.concatenate(
                [jnp.ones((1,), bool), sid[1:] != sid[:-1]])
            seg = jnp.cumsum(first) - 1
            summed = jax.ops.segment_sum(gs, seg, num_segments=N_ROWS)
            uids = jnp.where(
                jnp.arange(N_ROWS) <= seg[-1],
                jnp.zeros((N_ROWS,), sid.dtype).at[seg].max(sid), V)
            # scatter N slots; tail slots hit the padded row V (dropped)
            padded = jnp.concatenate([t, jnp.zeros((1, W), t.dtype)])
            padded = padded.at[uids].add(summed)
            return padded[:V], ()
        t, _ = jax.lax.scan(body, table, jnp.arange(K))
        return t

    print(f"devices: {jax.devices()}", flush=True)
    timed("sortcost", sortcost, jnp.asarray(ids_u), g)
    timed("scatter_unif", scatter("u"), table, jnp.asarray(ids_u), g)
    timed("scatter_zipf", scatter("z"), table, jnp.asarray(zipf), g)
    timed("scatter_dedup", scatter_dedup, table, jnp.asarray(zipf), g)


if __name__ == "__main__":
    main()
