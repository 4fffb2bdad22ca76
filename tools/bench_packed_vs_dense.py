"""Head-to-head: dense Adam vs SparseEmbeddingTrainer vs PackedEmbeddingTrainer
at the bench.py Criteo shapes, on the real TPU chip (honest fused-scan timing)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import DeepFM
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import Trainer, TrainerConfig
    from recbox_tpu.training.packed import PackedEmbeddingTrainer
    from recbox_tpu.training.sparse import SparseEmbeddingTrainer

    num_cat, num_num = 26, 13
    vocab, dim, batch_size = 100_000, 64, 32768
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

    steps = 30
    import functools
    for name, cls in [
            ("packed", PackedEmbeddingTrainer),
            ("packed_adam", functools.partial(PackedEmbeddingTrainer,
                                              embedding_optimizer="adam")),
            ("dense", Trainer),
            ("sparse", SparseEmbeddingTrainer)]:
        model = DeepFM(feature_map=fm, embedding_dim=dim,
                       hidden_units=(1024, 512, 256),
                       compute_dtype="bfloat16")
        cfg = TrainerConfig(learning_rate=1e-3, grad_clip_norm=10.0,
                            epochs=1, monitor="AUC")
        tr = cls(model, lambda o, b: binary_crossentropy(o, b["click"]), cfg)
        losses = tr.train_steps_repeat(batch, steps)
        _ = float(losses[-1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            losses = tr.train_steps_repeat(batch, steps)
            _ = float(losses[-1])
            best = min(best, time.perf_counter() - t0)
        eps = steps * batch_size / best
        print(f"{name:8s} {best/steps*1e3:7.2f} ms/step  "
              f"{eps:12,.0f} examples/s", flush=True)
        del tr, model


if __name__ == "__main__":
    main()
