"""Disk-resident training data: save npz shards, stream with prefetch."""
import sys, os, tempfile
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from recbox_tpu.data import ShardLoader, save_shards
from recbox_tpu.evaluation import CTREvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.ctr import DeepFM
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.training import Trainer, TrainerConfig

rng = np.random.default_rng(0)
n = 50_000
a = rng.integers(1, 100, n).astype(np.int32)
y = ((a % 2) == 0).astype(np.float32)
shard_dir = tempfile.mkdtemp(prefix="recbox_shards_")
save_shards(shard_dir, {"a": a, "click": y}, rows_per_shard=8192)
print(f"wrote shards to {shard_dir}")

fm = FeatureMap("demo_shards", (
    FeatureSpec("a", "categorical", vocab_size=100, embedding_dim=8),),
    labels=("click",))
trainer = Trainer(
    DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,)),
    lambda o, b: binary_crossentropy(o, b["click"]),
    TrainerConfig(learning_rate=1e-2, epochs=3, patience=4, monitor="AUC",
                  lr_decay_factor=1.0, reload_best_on_plateau=False),
    eval_fn=CTREvaluator({"a": a[:2000], "click": y[:2000]}, label="click",
                         metrics=["AUC"]))
metrics = trainer.fit(ShardLoader(shard_dir, batch_size=1024,
                                  drop_last=True, seed=1))
print("streamed fit:", metrics)
assert metrics["AUC"] > 0.95, metrics
