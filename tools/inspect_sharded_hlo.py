"""Dump the collective pattern of the sharded train step (comm-volume table).

Compiles the real Trainer/PackedEmbeddingTrainer train steps over an
8-virtual-device CPU mesh (data×model) and prints every communication op
XLA emitted, with byte sizes, at two vocab sizes — making the VERDICT
round-1 gap ("sharded-embedding comm is asserted, never inspected")
directly observable. The pass/fail criterion: collective bytes must be
batch-scaled (id/row exchange), NOT vocab-scaled (full-table all-gather).

Run: cd /root/repo && JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/inspect_sharded_hlo.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

# the axon TPU plugin ignores JAX_PLATFORMS; these config knobs force the
# virtual CPU mesh reliably (see .claude/skills/verify/SKILL.md)
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np

from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.ctr import DeepFM
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.parallel import make_mesh
from recbox_tpu.parallel.inspect import collective_stats, collective_summary
from recbox_tpu.training import Trainer, TrainerConfig
from recbox_tpu.training.packed import PackedEmbeddingTrainer


def build(vocab, batch_size, trainer_cls, mesh):
    fm = FeatureMap("hlo", (
        FeatureSpec("cat_a", "categorical", vocab_size=vocab,
                    embedding_dim=16),
        FeatureSpec("cat_b", "categorical", vocab_size=vocab,
                    embedding_dim=16),
    ), labels=("click",))
    rng = np.random.default_rng(0)
    batch = {
        "cat_a": rng.integers(0, vocab, batch_size).astype(np.int32),
        "cat_b": rng.integers(0, vocab, batch_size).astype(np.int32),
        "click": (rng.random(batch_size) > 0.5).astype(np.float32),
    }
    model = DeepFM(feature_map=fm, embedding_dim=16, hidden_units=(32,))
    t = trainer_cls(model, lambda o, b: binary_crossentropy(o, b["click"]),
                    TrainerConfig(learning_rate=1e-2, monitor="AUC"),
                    mesh=mesh)
    t.init(batch)
    return t, batch


def step_collectives(trainer, batch):
    step = trainer._build_train_step()
    rng = jax.random.PRNGKey(0)
    dbatch = trainer._device_batch(batch)
    if isinstance(trainer, PackedEmbeddingTrainer) and trainer.packs:
        import jax.numpy as jnp
        args = (trainer.params, trainer.packs, trainer.accs,
                trainer.model_state, trainer.opt_state, dbatch, rng,
                jnp.int32(1), jnp.float32(trainer._emb_lr))
    else:
        args = (trainer.params, trainer.model_state, trainer.opt_state,
                dbatch, rng)
    return collective_stats(step, *args)


def main():
    mesh = make_mesh(num_model_shards=4)
    batch_size = 256
    for name, cls in [("dense Trainer", Trainer),
                      ("PackedEmbeddingTrainer", PackedEmbeddingTrainer)]:
        print(f"\n=== {name} over mesh {dict(mesh.shape)} "
              f"(batch {batch_size}) ===")
        totals = {}
        for vocab in (512, 4096):
            t, batch = build(vocab, batch_size, cls, mesh)
            ops = step_collectives(t, batch)
            summary = collective_summary(ops)
            total = sum(d["bytes"] for d in summary.values())
            totals[vocab] = total
            print(f"vocab={vocab}: total collective bytes/step = {total:,}")
            for kind, d in sorted(summary.items()):
                print(f"  {kind:24s} x{d['count']:<3d} {d['bytes']:>12,} B")
            table_bytes = 2 * vocab * 16 * 4
            biggest = max((op.bytes for op in ops), default=0)
            print(f"  (full-table size {table_bytes:,} B; "
                  f"largest single op {biggest:,} B)")
        ratio = totals[4096] / max(totals[512], 1)
        verdict = "BATCH-scaled (id/row exchange) ✓" if ratio < 1.5 else \
            "VOCAB-scaled — full-table gather! ✗"
        print(f"8x vocab -> {ratio:.2f}x collective bytes: {verdict}")


if __name__ == "__main__":
    main()
