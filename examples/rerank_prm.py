"""Reranking: PRM listwise refinement over ranked candidate lists."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from recbox_tpu.quick_start import run_rerank_experiment

rng = np.random.default_rng(0)
B, N, D = 512, 10, 8
feats = rng.normal(size=(B, N, D)).astype(np.float32)
# clicks driven by a feature interaction the pointwise ranker missed
labels = ((feats[..., 0] + 0.5 * feats[..., 1]) > 0).astype(np.float32)
mask = np.ones((B, N), bool)
lists = {"item_feats": feats, "labels": labels, "mask": mask}
valid = {k: a[:128] for k, a in lists.items()}
train = {k: a[128:] for k, a in lists.items()}
metrics = run_rerank_experiment(
    {"model": "PRM", "d_model": 32, "n_layers": 1, "n_heads": 2,
     "max_list_len": N, "learning_rate": 1e-2, "epochs": 10,
     "batch_size": 64, "monitor": "MAP@5", "lr_decay_factor": 1.0,
     "reload_best_on_plateau": False}, train, valid)
print("PRM rerank:", metrics)
assert metrics["MAP@5"] > 0.8, metrics
