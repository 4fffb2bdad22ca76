"""First-layer / layout formulation shootout for the bench DeepFM fwd/bwd.

Context (v5e, 2026-08-19): tools/prof_fwdbwd.py measures the full model
fwd/bwd at 6.56 ms/step while its same-math 26-field ideal runs 4.60 —
and the ideal's K=64 feature-major einsum BEATS the flat K=2496 matmul
(4.60 vs 5.00), so MXU K-underfill is NOT the bottleneck; the gap is the
model's per-feature slice/stack plumbing plus the 39-vs-26 field delta.

This tool isolates candidate formulations at the TRUE 39-field shapes,
honoring the real differentiation boundary: the trainer hands the model
bf16 row VIEWS as grad leaves (the G->rows slice-cast has no backward),
so each variant is (prep: G -> leaves, loss: (params, leaves) -> scalar)
with value_and_grad over the leaves only; prep runs inside the timed jit.

Variants:
  fm       feature-major slab: x (39,B,64) leaf, K=64 einsum (current
           ideal formulation, one slab instead of per-feature stack)
  paired   repack inside loss to (19,B,128)+(1,B,64), K=128 einsum
  quad     repack to (9,B,256)+(3,B,64), K=256 einsum
  flat     transpose inside loss to (B, 39*64), K=2496 matmul
  bm       BATCH-MAJOR ids order: prep yields (B,39,64) directly from a
           (B*F,128)-interpreted G (no transpose anywhere), flat matmul
  modelish current protocol estimate: 26 separate per-feature (B,64)
           leaves sliced from G + per-feature stack + dim-1 linear path
           (what the flax model actually does today)

`fm` doubles as the proposed SLAB protocol: ONE (26,B,64) cat slab + ONE
(26,B,1) lin slab as leaves + fused numeric einsum — the hypothesis was
modelish − fm = what a slab protocol would save.

MEASURED (v5e 2026-08-19, 20-step scans, best-of-3):
    fm            7.53 ms/step     (slab protocol: LOSES)
    paired       14.21 ms/step     (K=128 repack: disastrous)
    quad         14.62 ms/step     (K=256 repack: disastrous)
    flat          7.53 ms/step     (transpose + K=2496 matmul: loses)
    bm            8.30 ms/step     (batch-major ids order: loses)
    modelish      6.89 ms/step     (current per-feature protocol: WINS)
The real model measures 6.56 ms (tools/prof_fwdbwd.py model_fm), i.e.
even better than this harness's modelish estimate. Conclusions: (1) MXU
K-underfill in the K=64 feature-major einsum is NOT a bottleneck — every
higher-K repack pays more in layout copies than it recovers; (2) XLA
fuses the 26 per-feature lane-slices better than one big slab slice (the
(N,64)-of-(N,128) bf16 retiling is the expensive part, and per-feature
pieces fuse into their consumers); (3) the id-order/layout design space
for the XLA formulation is EXHAUSTED — fwd/bwd is at its practical XLA
floor, and with the row-op wall (27.15 ms skeleton + 1.85 assembly) even
a hypothetical perfect 4.3 ms MXU-floor fwd/bwd could not reach 1.0M
ex/s (33.3 ms > the 32.77 ms budget). See BASELINE.md round-4 note.

All full variants compute the complete DeepFM math (first-order linear +
FM + MLP 1024/512/256 + BCE) so the deltas are directly the model
fwd/bwd deltas. Run: python tools/prof_first_layer.py  (TPU)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

FC, FN = 26, 13            # categorical / numeric fields
F = FC + FN
B, D = 32768, 64
H = (1024, 512, 256)
K = 20
N = FC * B                 # gathered rows (categoricals only, real regime)


def main():
    kx = jax.random.PRNGKey(0)
    G = jax.random.normal(kx, (N, 128), jnp.float32) * 0.01
    nums = jax.random.normal(jax.random.fold_in(kx, 1), (B, FN), jnp.float32)
    ks = jax.random.split(kx, 8)
    params = {
        "w1": jax.random.normal(ks[0], (F, D, H[0]), jnp.float32) * 0.01,
        "b1": jnp.zeros((H[0],), jnp.float32),
        "w2": jax.random.normal(ks[1], (H[0], H[1]), jnp.float32) * 0.01,
        "b2": jnp.zeros((H[1],), jnp.float32),
        "w3": jax.random.normal(ks[2], (H[1], H[2]), jnp.float32) * 0.01,
        "b3": jnp.zeros((H[2],), jnp.float32),
        "wo": jax.random.normal(ks[3], (H[2], 1), jnp.float32) * 0.01,
        "wn": jax.random.normal(ks[4], (FN, D), jnp.float32) * 0.01,
        "wnl": jax.random.normal(ks[5], (FN,), jnp.float32) * 0.01,
    }
    rng = np.random.default_rng(0)
    y = jnp.asarray((rng.random(B) > 0.5).astype(np.float32))

    def tail(p, h):
        h = jnp.maximum(h + p["b1"].astype(h.dtype), 0)
        h = jnp.maximum(h @ p["w2"].astype(h.dtype) + p["b2"].astype(h.dtype), 0)
        h = jnp.maximum(h @ p["w3"].astype(h.dtype) + p["b3"].astype(h.dtype), 0)
        return (h @ p["wo"].astype(h.dtype)).reshape(-1)

    def bce(logit):
        pr = jax.nn.sigmoid(logit.astype(jnp.float32))
        return -jnp.mean(y * jnp.log(pr + 1e-7)
                         + (1 - y) * jnp.log(1 - pr + 1e-7))

    def numeric_fm_block(p, nb):
        # fused numeric embeddings: xn[f,b,d] = nums[b,f] * wn[f,d]
        return (nb.T[:, :, None] * p["wn"][:, None, :]).astype(jnp.bfloat16)

    # ---------- preps (G -> grad leaves) ---------------------------------
    def prep_fm(G, nb):
        x = G[:, :D].astype(jnp.bfloat16).reshape(FC, B, D)
        xn = numeric_fm_block(params, nb)
        xcat = jnp.concatenate([x, xn], axis=0)          # (39, B, D)
        lin = G[:, D:D + 1].astype(jnp.bfloat16).reshape(FC, B, 1)
        return (xcat, lin)

    def prep_bm(G, nb):
        # G's rows in batch-major ids order: row b*FC+f
        x = G.reshape(B, FC, 128)[:, :, :D].astype(jnp.bfloat16)
        xn = numeric_fm_block(params, nb).transpose(1, 0, 2)   # (B, FN, D)
        xcat = jnp.concatenate([x, xn], axis=1)          # (B, 39, D)
        lin = G.reshape(B, FC, 128)[:, :, D:D + 1].astype(jnp.bfloat16)
        return (xcat, lin)

    def prep_modelish(G, nb):
        xs = tuple(G[i * B:(i + 1) * B, :D].astype(jnp.bfloat16)
                   for i in range(FC))
        lins = tuple(G[i * B:(i + 1) * B, D:D + 1].astype(jnp.bfloat16)
                     for i in range(FC))
        return (xs, lins)

    # ---------- losses over feature-major leaves -------------------------
    def first_order(p, lin, nb):
        # lin: (FC, B, 1); numeric first-order fused
        return (jnp.sum(lin.astype(jnp.float32), axis=(0, 2))
                + nb @ p["wnl"])

    def fm_term(x):                                       # x (F, B, D)
        s = jnp.sum(x, axis=0)
        return 0.5 * jnp.sum(jnp.square(s) - jnp.sum(jnp.square(x), axis=0),
                             axis=-1)

    def loss_fm(p, leaves, nb):
        x, lin = leaves
        h = jnp.einsum("fbd,fdh->bh", x, p["w1"].astype(x.dtype))
        return bce(tail(p, h).astype(jnp.float32)
                   + fm_term(x).astype(jnp.float32)
                   + first_order(p, lin, nb))

    def loss_paired(p, leaves, nb):
        x, lin = leaves
        F2 = F // 2
        w = p["w1"].astype(x.dtype)
        xp = jnp.concatenate([x[0:2 * F2:2], x[1:2 * F2:2]], axis=-1)
        wp = jnp.concatenate([w[0:2 * F2:2], w[1:2 * F2:2]], axis=1)
        h = jnp.einsum("gbk,gkh->bh", xp, wp)
        if 2 * F2 < F:
            h = h + jnp.einsum("fbd,fdh->bh", x[2 * F2:], w[2 * F2:])
        return bce(tail(p, h).astype(jnp.float32)
                   + fm_term(x).astype(jnp.float32)
                   + first_order(p, lin, nb))

    def loss_quad(p, leaves, nb):
        x, lin = leaves
        F4 = (F // 4) * 4
        w = p["w1"].astype(x.dtype)
        xq = jnp.concatenate([x[0:F4:4], x[1:F4:4], x[2:F4:4], x[3:F4:4]],
                             axis=-1)
        wq = jnp.concatenate([w[0:F4:4], w[1:F4:4], w[2:F4:4], w[3:F4:4]],
                             axis=1)
        h = jnp.einsum("gbk,gkh->bh", xq, wq)
        if F4 < F:
            h = h + jnp.einsum("fbd,fdh->bh", x[F4:], w[F4:])
        return bce(tail(p, h).astype(jnp.float32)
                   + fm_term(x).astype(jnp.float32)
                   + first_order(p, lin, nb))

    def loss_flat(p, leaves, nb):
        x, lin = leaves
        xf = x.transpose(1, 0, 2).reshape(B, F * D)
        h = xf @ p["w1"].astype(x.dtype).reshape(F * D, H[0])
        return bce(tail(p, h).astype(jnp.float32)
                   + fm_term(x).astype(jnp.float32)
                   + first_order(p, lin, nb))

    # ---------- batch-major loss -----------------------------------------
    def loss_bm(p, leaves, nb):
        x, lin = leaves                                   # (B, F, D)
        xf = x.reshape(B, F * D)
        h = xf @ p["w1"].astype(x.dtype).reshape(F * D, H[0])
        s = jnp.sum(x, axis=1)
        fm = 0.5 * jnp.sum(jnp.square(s) - jnp.sum(jnp.square(x), axis=1),
                           axis=-1)
        first = (jnp.sum(lin.astype(jnp.float32), axis=(1, 2))
                 + nb @ p["wnl"])
        return bce(tail(p, h).astype(jnp.float32) + fm.astype(jnp.float32)
                   + first)

    # ---------- per-feature (current model protocol) ---------------------
    def loss_modelish(p, leaves, nb):
        xs, lins = leaves
        xn = numeric_fm_block(p, nb)
        x = jnp.concatenate([jnp.stack(xs, axis=0), xn], axis=0)
        lin = jnp.stack(lins, axis=0)
        h = jnp.einsum("fbd,fdh->bh", x, p["w1"].astype(x.dtype))
        return bce(tail(p, h).astype(jnp.float32)
                   + fm_term(x).astype(jnp.float32)
                   + first_order(p, lin, nb))

    def timed(name, prep, loss):
        @jax.jit
        def run(G, nb, p):
            def body(c, i):
                G2 = G * (1.0 + 1e-6 * i)
                leaves = prep(G2, nb)
                l, (dw, dx) = jax.value_and_grad(
                    lambda pp, lv: loss(pp, lv, nb), argnums=(0, 1))(
                        p, leaves)
                aux = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                          for g in jax.tree_util.tree_leaves((dw, dx)))
                return c + l + aux * 1e-12, ()
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
            return c

        c = run(G, nums, params)
        _ = float(c)
        best = float("inf")
        for rep in range(1, 4):
            G2 = (G * (1.0 + 1e-6 * rep)).astype(G.dtype)
            t0 = time.perf_counter()
            c = run(G2, nums, params)
            _ = float(c)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:10s} {best/K*1e3:7.2f} ms/step", flush=True)

    print(f"devices: {jax.devices()}", flush=True)
    timed("fm", prep_fm, loss_fm)
    timed("paired", prep_fm, loss_paired)
    timed("quad", prep_fm, loss_quad)
    timed("flat", prep_fm, loss_flat)
    timed("bm", prep_bm, loss_bm)
    timed("modelish", prep_modelish, loss_modelish)


if __name__ == "__main__":
    main()
