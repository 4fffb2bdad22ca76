import sys; sys.path.insert(0, "/root/repo")
import os
import jax
_PLAT = os.environ.get("OURS_PLATFORM", "cpu")
if _PLAT:  # empty string = let JAX pick the default backend (TPU when present)
    jax.config.update("jax_platform_name", _PLAT)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
from recbox_tpu.data.atomic import load_atomic_dataset
from recbox_tpu.data import ArrayLoader
from recbox_tpu.evaluation import CTREvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.ctr import DeepFM
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.training import Trainer, TrainerConfig

ds = load_atomic_dataset("/tmp/parity/synthctr", "synthctr")
arrays = {"user_id": ds.inter["user_id"].astype(np.int32),
          "item_id": ds.inter["item_id"].astype(np.int32),
          "label": ds.inter["label"].astype(np.float32)}
n = len(arrays["label"])
rng = np.random.default_rng(2024)
idx = rng.permutation(n)
n_va = int(0.1 * n)
n_tr = n - 2 * n_va
tr, va, te = np.split(idx, [n_tr, n_tr + n_va])
train = {k: v[tr] for k, v in arrays.items()}
valid = {k: v[va] for k, v in arrays.items()}
test = {k: v[te] for k, v in arrays.items()}
fm = FeatureMap("sctr", (
    FeatureSpec("user_id", "categorical", vocab_size=ds.num_users,
                embedding_dim=16),
    FeatureSpec("item_id", "categorical", vocab_size=ds.num_items,
                embedding_dim=16)), labels=("label",))
model = DeepFM(feature_map=fm, embedding_dim=16, hidden_units=(64, 32),
               dropout=0.1)
cfg = TrainerConfig(rng_impl="threefry",  # pre-round-5 stream: the recorded parity numbers
        # (docs/QUALITY_PARITY.md) were measured under it
        learning_rate=1e-3, epochs=30, patience=10,
                    monitor="AUC", lr_decay_factor=1.0,
                    reload_best_on_plateau=False)
ev = CTREvaluator(valid, label="label", metrics=["AUC", "logloss"])
trainer = Trainer(model, lambda o, b: binary_crossentropy(o, b["label"]),
                  cfg, eval_fn=ev)
loader = ArrayLoader(train, batch_size=512, drop_last=True, seed=2024)
valid_metrics = trainer.fit(loader)
test_ev = CTREvaluator(test, label="label", metrics=["AUC", "logloss"])
print("OURS DeepFM valid:", valid_metrics)
print("OURS DeepFM test:", test_ev(trainer))
