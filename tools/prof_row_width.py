"""Is the packed-row gather/scatter cost per-ROW or per-BYTE?

The round-1 headline step spends ~30 of 34 ms in ONE row gather + ONE row
scatter over 851,968 rows of a (2.6M, 128) f32 pack (~16 ns/row,
`tools/prof_embedding_update.py`). Whether that cost scales with row BYTES
(then bf16 rows halve it) or is flat per ROW (then narrower rows buy
nothing) decides the round-2 perf attack, so measure it directly:

  gather/scatter-add of 851,968 uniform ids into (2.6M, W) tables for
  W in {128, 256} lanes x dtype in {float32, bfloat16}  (plus a 512-lane
  f32 point to see the wide/bandwidth end).

Timing: K-step lax.scan in one jit with iteration-varied ids (XLA cannot
hoist), float() host sync (block_until_ready lies through this sandbox's
TPU tunnel). Run: cd /root/repo && python tools/prof_row_width.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ROWS = 2_600_000
N_IDS = 851_968
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

def timed(fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out[-1]) if isinstance(out, tuple) else jnp.sum(out))
    best = float("inf")
    for rep in range(1, 4):
        vargs = _vary(args, rep)
        t0 = time.perf_counter()
        out = fn(*vargs)
        _ = float(jnp.sum(out[-1]) if isinstance(out, tuple) else jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, ROWS, size=N_IDS).astype(np.int32))

    def vary(i, idv):
        return (idv + i * 7919) % ROWS

    print(f"devices: {jax.devices()}")
    print(f"{'case':24s} {'ms/step':>8s} {'ns/row':>7s} {'GB/s':>7s}")
    for width, dtype in [(128, jnp.float32), (256, jnp.float32),
                         (128, jnp.bfloat16), (256, jnp.bfloat16),
                         (128, jnp.int8)]:
        itemsize = jnp.dtype(dtype).itemsize
        table = jnp.zeros((ROWS, width), dtype)
        g = jnp.ones((N_IDS, width), dtype)

        @jax.jit
        def gather(table, ids):
            def body(c, i):
                rows = jnp.take(table, vary(i, ids), axis=0)
                return c + jnp.sum(rows.astype(jnp.float32)), ()
            c, _ = jax.lax.scan(body, 0., jnp.arange(K))
            return c

        @jax.jit
        def scatter(table, ids, g):
            def body(t, i):
                return t.at[vary(i, ids)].add(g), ()
            t, _ = jax.lax.scan(body, table, jnp.arange(K))
            return t

        for name, ms in [("gather", timed(gather, table, ids)),
                         ("scatter", timed(scatter, table, ids, g))]:
            ns_row = ms * 1e6 / N_IDS
            bytes_moved = N_IDS * width * itemsize * (2 if name == "scatter"
                                                      else 1)
            gbs = bytes_moved / (ms * 1e-3) / 1e9
            print(f"{name}_{width}x{jnp.dtype(dtype).name:9s} "
                  f"{ms:8.2f} {ns_row:7.1f} {gbs:7.1f}")
        del table, g


if __name__ == "__main__":
    main()
