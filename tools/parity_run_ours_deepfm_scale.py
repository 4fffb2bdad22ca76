"""Ours-side DeepFM on the 1M-row ctr_scale dataset (8 token fields).

Mirrors the reference recbole context-aware DeepFM protocol: RS
[0.8, 0.1, 0.1] random split, labeled eval, AUC/LogLoss, Adam 1e-3,
embedding 16, MLP (64, 32), 10 epochs. OURS_EPOCHS overrides.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np

from recbox_tpu.data import ArrayLoader
from recbox_tpu.data.atomic import load_atomic_dataset
from recbox_tpu.evaluation import CTREvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.ctr import DeepFM
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.training import Trainer, TrainerConfig

ds = load_atomic_dataset("/tmp/parity/ctr_scale", "ctr_scale")
fields = ["user_id", "item_id"] + [f"c{i}" for i in range(2, 8)]
arrays = {f: ds.inter[f].astype(np.int32) for f in fields}
arrays["label"] = ds.inter["label"].astype(np.float32)
n = len(arrays["label"])
SEED = int(os.environ.get("OURS_SEED", 2024))
rng = np.random.default_rng(SEED)
idx = rng.permutation(n)
n_va = int(0.1 * n)
tr, va, te = np.split(idx, [n - 2 * n_va, n - n_va])
train = {k: v[tr] for k, v in arrays.items()}
valid = {k: v[va] for k, v in arrays.items()}
test = {k: v[te] for k, v in arrays.items()}
vocabs = {f: int(arrays[f].max()) + 1 for f in fields}
fm = FeatureMap("ctrscale", tuple(
    FeatureSpec(f, "categorical", vocab_size=vocabs[f], embedding_dim=16)
    for f in fields), labels=("label",))
model = DeepFM(feature_map=fm, embedding_dim=16, hidden_units=(64, 32),
               dropout=float(os.environ.get("OURS_DROPOUT", 0.1)),
               emb_init_scheme="xavier_normal")
ev = CTREvaluator(valid, label="label", metrics=["AUC", "logloss"])
cfg = TrainerConfig(rng_impl="threefry",  # pre-round-5 stream: the recorded parity numbers
        # (docs/QUALITY_PARITY.md) were measured under it
        learning_rate=1e-3, seed=SEED,
                    epochs=int(os.environ.get("OURS_EPOCHS", 10)),
                    patience=10, monitor="AUC", lr_decay_factor=1.0,
                    reload_best_on_plateau=False)
t = Trainer(model, lambda o, b: binary_crossentropy(o, b["label"]), cfg,
            eval_fn=ev)
# NOTE: the recorded round-2 head-to-head used batch 2048 while the
# reference runner trains at 512 (4x fewer Adam updates/epoch for ours) —
# and ours still matched the reference AUC within the 3-seed spread.
# OURS_BATCH aligns the schedules for a strict comparison.
m = t.fit(ArrayLoader(train,
                      batch_size=int(os.environ.get("OURS_BATCH", 2048)),
                      drop_last=True, seed=SEED))
print("OURS last-valid:", m)
print("OURS best-valid monitor:", t.monitor.best_value)
test_ev = CTREvaluator(test, label="label", metrics=["AUC", "logloss"])
print("OURS test:", test_ev(t))
