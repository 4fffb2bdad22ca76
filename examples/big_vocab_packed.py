"""Production-scale embeddings on one chip: PackedEmbeddingTrainer.

direct_init builds the packed [values | optimizer-state] rows straight on
device without ever materializing dense tables or dense-Adam moments, so
the single-chip capacity is the packed bytes alone: 26 x 1M x 64-dim
tables + AdaGrad state = 12.4 GB on a 16 GB v5e (~56 ms/step fused —
`tools/prof_bigvocab_packed.py` runs the real thing on TPU). This example
runs the same code path at toy scale so it works anywhere.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.ctr import DeepFM
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.training import TrainerConfig
from recbox_tpu.training.packed import PackedEmbeddingTrainer

num_cat, vocab, dim, batch = 6, 10_000, 16, 512
feats = tuple(FeatureSpec(f"c{i}", "categorical", vocab_size=vocab,
                          embedding_dim=dim) for i in range(num_cat))
fm = FeatureMap("demo_big", feats, labels=("click",))
rng = np.random.default_rng(0)
batch_data = {f"c{i}": rng.integers(0, vocab, batch).astype(np.int32)
              for i in range(num_cat)}
batch_data["click"] = (batch_data["c0"] % 2).astype(np.float32)

trainer = PackedEmbeddingTrainer(
    DeepFM(feature_map=fm, embedding_dim=dim, hidden_units=(64, 32)),
    lambda o, b: binary_crossentropy(o, b["click"]),
    TrainerConfig(learning_rate=1e-3, monitor="AUC"),
    direct_init=True)          # tables are born packed, never dense
losses = [float(trainer.train_step(dict(batch_data))) for _ in range(8)]
pack = next(iter(trainer.packs.values()))
print(f"pack shape {pack.shape} "
      f"({pack.nbytes / 2**20:.1f} MiB incl. optimizer state)")
print(f"losses: {losses[0]:.4f} -> {losses[-1]:.4f}")
assert losses[-1] < losses[0]
