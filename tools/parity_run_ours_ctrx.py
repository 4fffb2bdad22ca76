"""Ours-side runner for the extended-CTR head-to-head (FiGNN / EulerNet).

Same data (`parity_gen_ctr.py` → /tmp/parity/synthctr), same protocol
(RS 0.8/0.1/0.1 shuffled rows, AUC/logloss, Adam 1e-3, batch 512, 30
epochs, patience 10) as `parity_run_reference.py` with REF_MODEL set to
the same name. Select with OURS_MODEL=FiGNN|EulerNet.
"""
import sys; sys.path.insert(0, "/root/repo")
import os
import jax
_PLAT = os.environ.get("OURS_PLATFORM", "cpu")
if _PLAT:
    jax.config.update("jax_platform_name", _PLAT)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
from recbox_tpu.data.atomic import load_atomic_dataset
from recbox_tpu.data import ArrayLoader
from recbox_tpu.evaluation import CTREvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.ctr_extended import EulerNet, FiGNN
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

name = os.environ.get("OURS_MODEL", "FiGNN")
# recbole xavier-normal-inits its embedding tables (`eulernet.py`
# _init_other_weights / `fignn.py` _init_weights); our CTR default is
# normal(1e-4), which starves multiplicative models at this budget — match
# the reference's init for the head-to-head (round-2 LightGCN lesson:
# compare SEMANTICS, then hyper-sensitivity)
init = os.environ.get("OURS_EMB_INIT", "xavier_normal")
if name == "FiGNN":
    model = FiGNN(feature_map=fm, embedding_dim=16, gnn_steps=2,
                  att_dim=16, num_heads=2, dropout=0.1,
                  emb_init_scheme=init)
elif name == "EulerNet":
    model = EulerNet(feature_map=fm, embedding_dim=16, order_layers=(16,),
                     dropout=0.1, apply_norm=False, emb_init_scheme=init)
elif name == "DCNV2":
    # recbole DCNV2 'stacked', mixed=False (`dcnv2.py:201-247`): CrossNetV2
    # then MLP, no first-order linear — structurally EXACT match to ours
    from recbox_tpu.models.ranking.ctr import DCNv2
    model = DCNv2(feature_map=fm, embedding_dim=16, num_cross_layers=2,
                  hidden_units=(64, 32), dropout=0.1,
                  model_structure="stacked", emb_init_scheme=init)
elif name == "xDeepFM":
    # recbole xDeepFM with direct=True (`xdeepfm.py:120-199`) matches our
    # CIN topology (full map forwarded + all layers pooled). One documented
    # variant difference remains: recbole applies ReLU per CIN layer; ours
    # keeps the recbox/fuxictr identity CIN
    # (`recbox/ranking/pytorch/layers/interactions/compressed_interaction_net.py`)
    from recbox_tpu.models.ranking.ctr import xDeepFM
    model = xDeepFM(feature_map=fm, embedding_dim=16,
                    cin_layer_sizes=(16, 16), hidden_units=(64, 32),
                    dropout=0.1, emb_init_scheme=init,
                    cin_activation=os.environ.get("OURS_CIN_ACT",
                                                  "identity"))
else:
    raise SystemExit(f"unknown OURS_MODEL={name}")

cfg = TrainerConfig(rng_impl="threefry",  # pre-round-5 stream: the recorded parity numbers
        # (docs/QUALITY_PARITY.md) were measured under it
        learning_rate=1e-3, epochs=30, patience=10,
                    monitor="AUC", lr_decay_factor=1.0,
                    reload_best_on_plateau=False,
                    seed=int(os.environ.get("OURS_SEED", 2024)))
ev = CTREvaluator(valid, label="label", metrics=["AUC", "logloss"])
trainer = Trainer(model, lambda o, b: binary_crossentropy(o, b["label"]),
                  cfg, eval_fn=ev)
loader = ArrayLoader(train, batch_size=512, drop_last=True, seed=2024)
valid_metrics = trainer.fit(loader)
test_ev = CTREvaluator(test, label="label", metrics=["AUC", "logloss"])
print(f"OURS {name} valid:", valid_metrics)
print(f"OURS {name} test:", test_ev(trainer))
