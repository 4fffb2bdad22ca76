"""Throughput vs batch size for the headline packed DeepFM step.

Tests whether the bench's 1.0M ex/s self-target is reachable by batch
scaling alone: per-row gather/scatter cost is linear in rows (latency-bound,
`tools/prof_row_width.py`), so larger batches only amortize the per-step
FIXED costs (scan bookkeeping, dense-MLP optimizer, dispatch). If the
0.86M -> 1.13M gap were fixed-cost, batch 2x would close most of it; if the
~6 ms machinery overhead scales with rows (slice/concat/delta passes over
(N, W) buffers), throughput stays flat.

Run on TPU: python tools/prof_batch_scaling.py
Same model/shapes as bench.py, K-step fused scan + float() sync (the honest
timing protocol — see bench.py's measurement note).

Measured (v5e via tunnel, round 2, one contended run):
  batch  8192: 23.10 ms/step  354,703 ex/s
  batch 16384: 23.10 ms/step  709,359 ex/s   <- ~23 ms latency floor below here
  batch 32768: 42.18 ms/step  776,793 ex/s
  batch 65536: 77.16 ms/step  849,388 ex/s
  batch 131072: 148.17 ms/step 884,625 ex/s  <- 41.7 ns/row marginal regime
Saturates at ~920k ex/s marginal: overhead scales with rows, so batch
scaling cannot close the gap to 1.0M — see bench.py's docstring.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

VOCAB, DIM, NUM_CAT, NUM_NUM = 100_000, 64, 26, 13


def run_one(batch_size, steps=30, reps=4):
    import jax
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import DeepFM
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import TrainerConfig
    from recbox_tpu.training.packed import PackedEmbeddingTrainer

    feats = tuple(
        FeatureSpec(f"c{i}", "categorical", vocab_size=VOCAB,
                    embedding_dim=DIM) for i in range(NUM_CAT)
    ) + tuple(
        FeatureSpec(f"n{i}", "numeric", embedding_dim=DIM)
        for i in range(NUM_NUM))
    fm = FeatureMap("criteo_bench", feats, labels=("click",))
    rng = np.random.default_rng(0)
    batch = {f"c{i}": rng.integers(0, VOCAB, batch_size).astype(np.int32)
             for i in range(NUM_CAT)}
    batch.update({f"n{i}": rng.normal(size=batch_size).astype(np.float32)
                  for i in range(NUM_NUM)})
    batch["click"] = (rng.random(batch_size) > 0.5).astype(np.float32)

    model = DeepFM(feature_map=fm, embedding_dim=DIM,
                   hidden_units=(1024, 512, 256), compute_dtype="bfloat16")
    cfg = TrainerConfig(learning_rate=1e-3, grad_clip_norm=10.0, epochs=1,
                        monitor="AUC")
    trainer = PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]), cfg)
    losses = trainer.train_steps_repeat(batch, steps)   # compile + warmup
    _ = float(losses[-1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        losses = trainer.train_steps_repeat(batch, steps)
        _ = float(losses[-1])
        best = min(best, time.perf_counter() - t0)
    ms_step = best / steps * 1e3
    exps = steps * batch_size / best
    print(f"batch {batch_size:>7}: {ms_step:7.2f} ms/step  "
          f"{exps:12,.0f} ex/s  ({NUM_CAT * batch_size:>9} rows/step)",
          flush=True)
    del trainer
    return exps


def main():
    for bs in (8192, 16384, 32768, 65536, 131072):
        run_one(bs)


if __name__ == "__main__":
    main()
