"""Pin the packed-step structural floor on chip: what does a step cost
with ZERO optimizer math, and what does each real ingredient add?

Variants (20-step donated scan, content-varied ids, float() sync):

  passthrough    gather 851,968 rows -> scatter-add G*0.0 back (the pure
                 2-row-op skeleton: index plumbing, no math, no grads)
  concat_op      gather -> scatter-add of concat([2e-4*G values slice,
                 g2-like cols, zeros]) (operand ASSEMBLY cost, no bwd)
  adagrad_rows   gather -> trivial-loss bwd -> real AdaGrad delta ->
                 scatter (= prof_packed_step's rows_only)
  full           the real bench step (prof_packed_step's full)

floor claim: passthrough is the hard structural minimum of the
one-gather/one-scatter design; (full - adagrad_rows) is the exposed
fwd/bwd+dense-opt; (concat_op - passthrough) prices operand assembly.

Run: python tools/prof_step_floor.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import criteo_workload, BATCH_SIZE
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import TrainerConfig
    from recbox_tpu.training.packed import PackedEmbeddingTrainer

    model, batch = criteo_workload(BATCH_SIZE)
    cfg = TrainerConfig(learning_rate=1e-3, grad_clip_norm=10.0, epochs=1,
                        monitor="AUC")
    tr = PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]), cfg)
    tr.init(batch)
    (pname, pack), = tr.packs.items()
    slots = tr._slots[pname]
    w_val = tr._value_width[pname]
    n_slots = len(slots)
    used = w_val + n_slots
    store_w = tr._pack_store_width[pname]
    K = 20

    def ids_of(b):
        parts = []
        for bu in tr._bundles[pname]:
            for fname in bu.features:
                parts.append(b[fname].reshape(-1).astype(jnp.int32)
                             + bu.row_offset)
        return jnp.concatenate(parts)

    def passthrough(pk, b):
        ids = ids_of(b)
        G = jnp.take(pk, ids, axis=0)
        return pk.at[ids].add(G * 0.0), jnp.sum(G[:, :1])

    def concat_op(pk, b):
        ids = ids_of(b)
        G = jnp.take(pk, ids, axis=0)
        n = ids.shape[0]
        parts = [G[:, :w_val] * 2e-4,
                 jnp.full((n, n_slots), 1e-6, jnp.float32),
                 jnp.zeros((n, store_w - used), jnp.float32)]
        return pk.at[ids].add(jnp.concatenate(parts, axis=1)), \
            jnp.sum(G[:, :1])

    def timed(name, step):
        @jax.jit
        def run(pk, b):
            def body(c, i):
                pk, acc = c
                b2 = dict(b)
                for k2, v in b.items():
                    if v.dtype == jnp.int32:
                        b2[k2] = (v + i) % 100_000
                pk, s = step(pk, b2)
                return (pk, acc + s), ()
            c, _ = jax.lax.scan(body, (pk, 0.0), jnp.arange(K))
            return c
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        pk = pack
        c = run(pk, db)
        _ = float(c[1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            c = run(c[0], db)
            _ = float(c[1])
            best = min(best, time.perf_counter() - t0)
        print(f"{name:14s} {best/K*1e3:7.2f} ms/step", flush=True)

    print(f"devices: {jax.devices()}", flush=True)
    timed("passthrough", passthrough)
    timed("concat_op", concat_op)


if __name__ == "__main__":
    main()
