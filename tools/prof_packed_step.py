"""Decompose PackedEmbeddingTrainer's step at bench shapes: where do the
~46 ms go? Variants, each a 20-step lax.scan, float() synced:

  rows_only     gather + trivial rows-consuming loss + row update (no MLP)
  fwdbwd_only   gather + real model fwd/bwd (no updates at all)
  no_dense_opt  full step minus the dense optax update
  full          the real step

deltas give: fwd/bwd cost, row-update cost, dense-Adam cost.
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import DeepFM
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import TrainerConfig
    from recbox_tpu.training.packed import PackedEmbeddingTrainer

    num_cat, num_num = 26, 13
    import os
    vocab = int(os.environ.get("VOCAB", 100_000))
    dim = int(os.environ.get("DIM", 64))
    batch_size = int(os.environ.get("BATCH", 32768))
    feats = tuple(
        FeatureSpec(f"c{i}", "categorical", vocab_size=vocab, embedding_dim=dim)
        for i in range(num_cat)
    ) + tuple(
        FeatureSpec(f"n{i}", "numeric", embedding_dim=dim) for i in range(num_num)
    )
    fm = FeatureMap("criteo_bench", feats, labels=("click",))
    rng = np.random.default_rng(0)
    batch = {f"c{i}": rng.integers(0, vocab, size=batch_size).astype(np.int32)
             for i in range(num_cat)}
    batch.update({f"n{i}": rng.normal(size=batch_size).astype(np.float32)
                  for i in range(num_num)})
    batch["click"] = (rng.random(batch_size) > 0.5).astype(np.float32)

    model = DeepFM(feature_map=fm, embedding_dim=dim,
                   hidden_units=(1024, 512, 256), compute_dtype="bfloat16")
    cfg = TrainerConfig(learning_rate=1e-3, grad_clip_norm=10.0, epochs=1,
                        monitor="AUC")
    tr = PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]), cfg)
    tr.init(batch)

    mutable_keys = list(tr.model_state.keys())
    loss_adapter = tr.loss_fn
    emb_lr = cfg.learning_rate

    def model_loss(dp, rows, b, rng):
        variables = {"params": dp, **tr.model_state}
        full_batch = {**b, **rows}
        outputs = model.apply(variables, full_batch, train=True,
                              rngs={"dropout": rng})
        return loss_adapter(outputs, b)

    def make_step(do_model, do_row_update, do_dense_update):
        def step(dense, packs, accs, opt_state, b, rng):
            rows, ctx = tr._gather_rows(packs, accs, b)
            if do_model:
                (loss), (dgrads, row_grads) = jax.value_and_grad(
                    model_loss, argnums=(0, 1))(dense, rows, b, rng)
            else:
                def trivial(rows):
                    return sum(jnp.sum(r.astype(jnp.float32) ** 2)
                               for r in rows.values())
                loss, row_grads = jax.value_and_grad(trivial)(rows)
                dgrads = None
            if do_dense_update and dgrads is not None:
                updates, opt_state = tr.tx.update(dgrads, opt_state, dense)
                import optax
                dense = optax.apply_updates(dense, updates)
            if do_row_update:
                packs, accs = tr._apply_row_updates(packs, accs, row_grads,
                                                    ctx, emb_lr,
                                                    jnp.int32(1))
            # variants that skip an update must still CONSUME the grads —
            # otherwise XLA dead-code-eliminates the very bwd pass being
            # measured (the bench.py measurement-note trap)
            if dgrads is not None and not do_dense_update:
                loss = loss + sum(jnp.sum(jnp.abs(g)) for g in
                                  jax.tree_util.tree_leaves(dgrads)) * 1e-12
            if not do_row_update:
                loss = loss + sum(jnp.sum(jnp.abs(g))
                                  for g in row_grads.values()) * 1e-12
            return dense, packs, accs, opt_state, loss
        return step

    K = 20

    def timed(name, step):
        # no donation: state is reused across variants; the one-time input
        # copy amortizes to ~0.1 ms/step over the 20-step scan
        @jax.jit
        def run(dense, packs, accs, opt_state, b, rng):
            rngs = jax.random.split(rng, K)
            steps_i = jnp.arange(K, dtype=jnp.float32)

            def body(carry, inp):
                r, i = inp
                dense, packs, accs, opt_state = carry
                # iteration-dependent inputs: variants whose carry passes
                # through unchanged (fwdbwd_only) would otherwise let XLA
                # hoist the gather/fwd/bwd out of the timed scan entirely
                b2 = dict(b)
                for k, v in b.items():
                    if v.dtype == jnp.float32:
                        b2[k] = v * (1.0 + 1e-6 * i)
                        break
                dense, packs, accs, opt_state, loss = step(
                    dense, packs, accs, opt_state, b2, r)
                return (dense, packs, accs, opt_state), loss
            carry, losses = jax.lax.scan(
                body, (dense, packs, accs, opt_state), (rngs, steps_i))
            return carry, losses

        db = {k: jnp.asarray(v) for k, v in batch.items()}
        state = (tr.params, dict(tr.packs), dict(tr.accs), tr.opt_state)
        carry, losses = run(*state, db, jax.random.PRNGKey(0))
        _ = float(losses[-1])
        best = float("inf")
        for _ in range(3):
            state = (carry[0], carry[1], carry[2], carry[3])
            t0 = time.perf_counter()
            carry, losses = run(*state, db, jax.random.PRNGKey(1))
            _ = float(losses[-1])
            best = min(best, time.perf_counter() - t0)
        print(f"{name:14s} {best/K*1e3:7.2f} ms/step", flush=True)

    timed("rows_only", make_step(False, True, False))
    timed("fwdbwd_only", make_step(True, False, False))
    timed("no_dense_opt", make_step(True, True, False))
    timed("full", make_step(True, True, True))


if __name__ == "__main__":
    main()
