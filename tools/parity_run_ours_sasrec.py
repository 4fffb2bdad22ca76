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
from recbox_tpu.data.sequential import group_user_sequences, leave_one_out_split
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.sequential.models import SASRec
from recbox_tpu.ops import full_softmax_loss
from recbox_tpu.training import Trainer, TrainerConfig

_DS = os.environ.get("OURS_DATASET", "synthseq")
ds = load_atomic_dataset(f"/tmp/parity/{_DS}", _DS)
inter = ds.to_interactions(rating_field="rating", time_field="timestamp")
seqs = group_user_sequences(inter.user_ids, inter.item_ids, inter.timestamps)
train, valid, test = leave_one_out_split(seqs, max_len=20)
n_items = ds.num_items  # ids 1..N-1, 0=PAD
fm = FeatureMap("sseq", (FeatureSpec("item_id", "categorical", source="item",
                                     vocab_size=n_items, embedding_dim=32),),
                query_index="user_id", corpus_index="item_id",
                num_items=n_items)
_MODEL = os.environ.get("OURS_MODEL", "SASRec")
if _MODEL == "GRU4Rec":
    # matched-knob head-to-head vs recbole GRU4Rec (`gru4rec.py`):
    # embedding 32, one GRU layer hidden 64, dropout 0.2, CE over catalog
    from recbox_tpu.models.sequential.models import GRU4Rec
    model = GRU4Rec(feature_map=fm, embedding_dim=32, max_seq_len=20,
                    hidden_size=64, n_layers=1, dropout=0.2)
else:
    model = SASRec(feature_map=fm, embedding_dim=32, max_seq_len=20,
                   n_layers=1, n_heads=2, dropout=0.2)
cfg = TrainerConfig(rng_impl="threefry",  # pre-round-5 stream: the recorded parity numbers
        # (docs/QUALITY_PARITY.md) were measured under it
        learning_rate=1e-3,
                    epochs=int(os.environ.get("OURS_EPOCHS", 30)), patience=10,
                    monitor="NDCG10", lr_decay_factor=1.0,
                    reload_best_on_plateau=False)

def eval_split(trainer, split):
    scores = np.asarray(trainer.apply(
        {"item_seq": split["item_seq"], "seq_len": split["seq_len"]},
        method=trainer.model.full_scores))
    order = np.argsort(-scores, axis=1)[:, :10]
    tgt = split["item_id"][:, None]
    hits = order == tgt
    recall = hits.any(1).mean()
    pos = np.where(hits.any(1), hits.argmax(1), -1)
    ndcg = np.where(pos >= 0, 1.0 / np.log2(np.maximum(pos, 0) + 2.0), 0.0).mean()
    return {"Recall10": float(recall), "NDCG10": float(ndcg)}

trainer = Trainer(model, lambda o, b: full_softmax_loss(o, b["item_id"]),
                  cfg, eval_fn=lambda tr: eval_split(tr, valid),
                  train_method="full_scores")
loader = ArrayLoader(train, batch_size=512, drop_last=True, seed=2024)
valid_metrics = trainer.fit(loader)
print(f"OURS {_MODEL} valid:", valid_metrics)
print(f"OURS {_MODEL} test:", eval_split(trainer, test))
