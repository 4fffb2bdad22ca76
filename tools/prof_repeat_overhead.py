"""Why does PackedEmbeddingTrainer.train_steps_repeat time ~46 ms/step when
the identical step in a no-donation harness times ~34 ms/step?
Measure the trainer path at several K and with donation on/off."""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def main():
    import jax.numpy as jnp

    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import DeepFM
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import TrainerConfig
    from recbox_tpu.training.packed import PackedEmbeddingTrainer

    import os
    num_cat, num_num = 26, 13
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
    if tr._train_step is None:
        tr._train_step = tr._build_train_step()
    inner = tr._train_step

    def harness(donate):
        deco = partial(jax.jit, static_argnames=("n",),
                       donate_argnums=(0, 1, 2, 3)) if donate else \
            partial(jax.jit, static_argnames=("n",))

        @deco
        def repeat(dense, packs, accs, opt_state, batch, rng, n):
            rngs = jax.random.split(rng, n)
            steps = jnp.arange(1, n + 1, dtype=jnp.int32)

            def body(carry, inp):
                step_rng, step = inp
                dense, packs, accs, opt_state = carry
                dense, packs, accs, _, opt_state, loss = inner(
                    dense, packs, accs, {}, opt_state, batch, step_rng,
                    step, jnp.float32(5e-2))
                return (dense, packs, accs, opt_state), loss

            carry, losses = jax.lax.scan(
                body, (dense, packs, accs, opt_state), (rngs, steps))
            return carry + (losses,)
        return repeat

    db = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(0)

    for donate in (False, True):
        rep = harness(donate)
        for K in (20, 30):
            state = (tr.params, dict(tr.packs), dict(tr.accs), tr.opt_state)
            if donate:  # keep originals alive: deep-copy the donated leaves
                state = jax.tree_util.tree_map(
                    lambda x: jnp.array(x), state)
            out = rep(*state, db, key, K)
            _ = float(out[-1][-1])
            best = float("inf")
            for _ in range(3):
                carry = out[:4]
                t0 = time.perf_counter()
                out = rep(*carry, db, key, K)
                _ = float(out[-1][-1])
                best = min(best, time.perf_counter() - t0)
            print(f"donate={donate} K={K:3d}: {best/K*1e3:7.2f} ms/step "
                  f"(call {best*1e3:7.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
