"""SASRec train throughput on one TPU chip (the sequential-stage bench).

Amazon-Beauty-regime shapes: vocab 60k items, L=50 history, d=64,
2-layer/2-head transformer, full-softmax CE (recbole loss_type='CE'),
batch 1024. Honest timing: K-step lax.scan over a device-resident batch
with float() host sync (same discipline as bench.py).

Run: cd /root/repo && python tools/prof_sasrec_train.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

VOCAB, L, B, D, K = 60_000, 50, 1024, 64, 30


def main():
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.sequential.models import SASRec
    from recbox_tpu.ops import full_softmax_loss
    from recbox_tpu.training import Trainer, TrainerConfig

    fm = FeatureMap(
        "sasbench", (FeatureSpec("item_id", "categorical",
                                 vocab_size=VOCAB, embedding_dim=D),),
        corpus_index="item_id", num_items=VOCAB)
    model = SASRec(feature_map=fm, embedding_dim=D, max_seq_len=L,
                   n_layers=2, n_heads=2, dropout=0.1)
    rng = np.random.default_rng(0)
    batch = {
        "item_seq": rng.integers(1, VOCAB, (B, L)).astype(np.int32),
        "seq_len": np.full(B, L, np.int32),
        "item_id": rng.integers(1, VOCAB, B).astype(np.int32),
    }
    t = Trainer(model,
                lambda o, b: full_softmax_loss(o, b["item_id"]),
                TrainerConfig(learning_rate=1e-3, monitor="AUC"),
                train_method="full_scores")
    losses = t.train_steps_repeat(batch, K)      # compile + warmup
    _ = float(losses[-1])
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        losses = t.train_steps_repeat(batch, K)
        _ = float(losses[-1])
        best = min(best, time.perf_counter() - t0)
    per_step = best / K
    print(f"SASRec (V={VOCAB}, L={L}, d={D}, B={B}, full-softmax CE): "
          f"{per_step*1e3:.2f} ms/step = {B/per_step/1e3:.1f}k examples/s "
          f"= {B*L/per_step/1e6:.2f}M tokens/s")


if __name__ == "__main__":
    main()
