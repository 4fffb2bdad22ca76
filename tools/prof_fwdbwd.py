"""Decompose the bench model's fwd/bwd: 8.12 ms measured standalone
(prof_packed_step fwdbwd_only, 2026-08-18) vs a ~2.4 ms MXU FLOP floor.

Variants (20-iter scan, iteration-varied inputs, grads consumed):
  model_bf       DeepFM batch-major (bench default), value_and_grad
  model_fm       DeepFM feature_major_compute=True
  ideal          hand-written FM+DNN on a device-resident (F,B,D) bf16
                 block: einsum first layer + 2 dense layers + FM trick,
                 value_and_grad wrt params AND x (the row-grad analog)
  ideal_flat     same but first layer as (B, F*D) @ (F*D, H) on a
                 batch-major (B, F*D) input (the layout MXU wants)

Run: python tools/prof_fwdbwd.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

F, B, D = 26, 32768, 64
H = (1024, 512, 256)
K = 20


def main():
    from bench import criteo_workload, BATCH_SIZE
    from recbox_tpu.ops import binary_crossentropy

    rng = np.random.default_rng(0)
    y = jnp.asarray((rng.random(B) > 0.5).astype(np.float32))

    def timed(name, run, *args):
        c = run(*args)
        _ = float(c if not isinstance(c, tuple) else c[0])
        best = float("inf")
        for rep in range(1, 4):
            if args and hasattr(args[0], "dtype"):
                a0 = (args[0] * (1.0 + 1e-6 * rep)).astype(args[0].dtype)
                vargs = (a0,) + args[1:]
            else:
                vargs = args
            t0 = time.perf_counter()
            c = run(*vargs)
            _ = float(c if not isinstance(c, tuple) else c[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{name:12s} {best/K*1e3:7.2f} ms/step", flush=True)

    # --- model paths ------------------------------------------------------
    def model_run(feature_major):
        model, batch = criteo_workload(BATCH_SIZE,
                                       feature_major=feature_major)
        from recbox_tpu.training import TrainerConfig
        from recbox_tpu.training.packed import PackedEmbeddingTrainer
        tr = PackedEmbeddingTrainer(
            model, lambda o, b: binary_crossentropy(o, b["click"]),
            TrainerConfig(learning_rate=1e-3, epochs=1, monitor="AUC"))
        tr.init(batch)

        @jax.jit
        def run(dense, packs, accs, b):
            rows, _ = tr._gather_rows(packs, accs, b)

            def loss_fn(dp, rows):
                out = model.apply({"params": dp}, {**b, **rows}, train=True,
                                  rngs={"dropout": jax.random.PRNGKey(0)})
                return binary_crossentropy(out, b["click"])

            def body(c, i):
                r2 = {k: v * (1.0 + 1e-6 * i) for k, v in rows.items()}
                l, (dg, rg) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                    dense, r2)
                aux = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                          for g in jax.tree_util.tree_leaves((dg, rg)))
                return c + l + aux * 1e-12, ()
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
            return c
        db = {k: jnp.asarray(v) for k, v in
              criteo_workload(BATCH_SIZE)[1].items()}
        return lambda *a: run(tr.params, dict(tr.packs), dict(tr.accs), db)

    # --- ideal ------------------------------------------------------------
    kx = jax.random.PRNGKey(0)
    x_fm = jax.random.normal(kx, (F, B, D), jnp.bfloat16)
    x_flat = jax.random.normal(kx, (B, F * D), jnp.bfloat16)
    ks = jax.random.split(kx, 8)
    params = {
        "w1": jax.random.normal(ks[0], (F, D, H[0]), jnp.float32) * 0.01,
        "b1": jnp.zeros((H[0],), jnp.float32),
        "w2": jax.random.normal(ks[1], (H[0], H[1]), jnp.float32) * 0.01,
        "b2": jnp.zeros((H[1],), jnp.float32),
        "w3": jax.random.normal(ks[2], (H[1], H[2]), jnp.float32) * 0.01,
        "b3": jnp.zeros((H[2],), jnp.float32),
        "wo": jax.random.normal(ks[3], (H[2], 1), jnp.float32) * 0.01,
    }

    def mlp_tail(p, h):
        h = jnp.maximum(h @ p["w2"].astype(h.dtype) + p["b2"].astype(h.dtype), 0)
        h = jnp.maximum(h @ p["w3"].astype(h.dtype) + p["b3"].astype(h.dtype), 0)
        return (h @ p["wo"].astype(h.dtype)).reshape(-1)

    def ideal_loss(p, x):
        s = jnp.sum(x, axis=0)
        fm = 0.5 * jnp.sum(jnp.square(s) - jnp.sum(jnp.square(x), axis=0),
                           axis=-1)
        h = jnp.einsum("fbd,fdh->bh", x, p["w1"].astype(x.dtype)) \
            + p["b1"].astype(x.dtype)
        h = jnp.maximum(h, 0)
        logit = mlp_tail(p, h).astype(jnp.float32) + fm.astype(jnp.float32)
        pr = jax.nn.sigmoid(logit)
        return -jnp.mean(y * jnp.log(pr + 1e-7)
                         + (1 - y) * jnp.log(1 - pr + 1e-7))

    def flat_loss(p, x):
        xf = x.reshape(B, F, D)
        fm = 0.5 * jnp.sum(
            jnp.square(jnp.sum(xf, axis=1))
            - jnp.sum(jnp.square(xf), axis=1), axis=-1)
        w1 = p["w1"].reshape(F * D, H[0])
        h = jnp.maximum(x @ w1.astype(x.dtype) + p["b1"].astype(x.dtype), 0)
        logit = mlp_tail(p, h).astype(jnp.float32) + fm.astype(jnp.float32)
        pr = jax.nn.sigmoid(logit)
        return -jnp.mean(y * jnp.log(pr + 1e-7)
                         + (1 - y) * jnp.log(1 - pr + 1e-7))

    def make_ideal(loss):
        @jax.jit
        def run(x, p):
            def body(c, i):
                x2 = x * (1.0 + 1e-6 * i).astype(x.dtype)
                l, (dg, dx) = jax.value_and_grad(loss, argnums=(0, 1))(p, x2)
                aux = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                          for g in jax.tree_util.tree_leaves((dg, dx)))
                return c + l + aux * 1e-12, ()
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
            return c
        return run

    print(f"devices: {jax.devices()}", flush=True)
    timed("model_bf", model_run(False))
    timed("model_fm", model_run(True))
    timed("ideal", make_ideal(ideal_loss), x_fm, params)
    timed("ideal_flat", make_ideal(flat_loss), x_flat, params)


if __name__ == "__main__":
    main()
