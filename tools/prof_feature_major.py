"""A/B: DeepFM standard (B,F,D)-interleave vs feature-major (F,B,D) path.

The round-2 wall analysis (bench.py) attributes ~6 ms/step at bench shapes
to slice/concat machinery around the one-gather/one-scatter core — the
(B, F, D) interleave XLA materializes forward and mirrors through the
row-grad pipeline. `DeepFM(feature_major_compute=True)` removes the
interleave algebraically (axis-0 stack of adjacent row blocks + feature-
axis contractions; proven numerically identical in
tests/test_feature_major.py). This harness measures whether XLA actually
cashes the layout win on chip.

Run on TPU: python tools/prof_feature_major.py
Honest timing: K-step fused scan through PackedEmbeddingTrainer.
train_steps_repeat + float() sync (bench.py protocol), best-of-4.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(feature_major, steps=30, reps=4):
    import bench
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import TrainerConfig
    from recbox_tpu.training.packed import PackedEmbeddingTrainer

    model, batch = bench.criteo_workload(feature_major=feature_major)
    cfg = TrainerConfig(learning_rate=1e-3, grad_clip_norm=10.0, epochs=1,
                        monitor="AUC")
    tr = PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]), cfg)
    losses = tr.train_steps_repeat(batch, steps)   # compile + warmup
    _ = float(losses[-1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        losses = tr.train_steps_repeat(batch, steps)
        _ = float(losses[-1])
        best = min(best, time.perf_counter() - t0)
    ms = best / steps * 1e3
    return ms, steps * bench.BATCH_SIZE / best


def main():
    for fmj in (False, True):
        ms, eps = run_one(fmj)
        print(f"feature_major={fmj}: {ms:7.2f} ms/step  {eps:,.0f} ex/s")


if __name__ == "__main__":
    main()
