"""Drive: the three new public flows end-to-end on CPU.

1. PackedEmbeddingTrainer.fit through ArrayLoader + CTREvaluator (quality
   must match the dense path's ballpark).
2. S3RecPretrainer.pretrain -> transfer_pretrained -> fine-tune Trainer step.
3. RecVAETrainer.fit (alternating) -> scores() for retrieval.
(The packed trainer's TPU path is driven separately by
tools/bench_packed_vs_dense.py on the real chip.)
"""

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
from recbox_tpu.training import TrainerConfig
from recbox_tpu.training.packed import PackedEmbeddingTrainer

# -- 1. packed CTR fit ------------------------------------------------------
rng = np.random.default_rng(5)
n = 6000
a = rng.integers(1, 60, n).astype(np.int32)
b = rng.integers(1, 40, n).astype(np.int32)
y = ((a % 3 == 0) ^ (b % 2 == 0)).astype(np.float32)
arrays = {"a": a, "b": b, "click": y}
fm = FeatureMap("drv", (
    FeatureSpec("a", "categorical", vocab_size=60, embedding_dim=8),
    FeatureSpec("b", "categorical", vocab_size=40, embedding_dim=8)),
    labels=("click",))
split = int(0.8 * n)
train = {k: v[:split] for k, v in arrays.items()}
valid = {k: v[split:] for k, v in arrays.items()}
tr = PackedEmbeddingTrainer(
    DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(32,)),
    lambda o, bt: binary_crossentropy(o, bt["click"]),
    TrainerConfig(learning_rate=1e-2, epochs=6, patience=8, monitor="AUC",
                  lr_decay_factor=1.0, reload_best_on_plateau=False),
    eval_fn=CTREvaluator(valid, label="click", metrics=["AUC"]))
m = tr.fit(ArrayLoader(train, batch_size=256, drop_last=True, seed=1))
assert m["AUC"] > 0.9, m
print("1. packed fit OK, AUC %.4f" % m["AUC"])

# -- 2. S3Rec pretrain -> finetune -------------------------------------------
from recbox_tpu.models.sequential.pretrain import S3Rec
from recbox_tpu.training import Trainer
from recbox_tpu.training.pretrain import S3RecPretrainer, transfer_pretrained

N_ITEMS, L = 30, 8
sfm = FeatureMap(
    "s3drv", (FeatureSpec("item_id", "categorical", source="item",
                          vocab_size=N_ITEMS + 1, embedding_dim=16),),
    query_index="user_id", corpus_index="item_id", num_items=N_ITEMS + 1)
seq_len = rng.integers(3, L + 1, 64).astype(np.int32)
seqs = rng.integers(1, N_ITEMS, size=(64, L)).astype(np.int32)
seqs[np.arange(L)[None, :] >= seq_len[:, None]] = 0
model = S3Rec(feature_map=sfm, embedding_dim=16, max_seq_len=L,
              n_layers=1, n_heads=2, dropout=0.0)
pre = S3RecPretrainer(model, learning_rate=1e-2, mask_ratio=0.3, seed=0)
pre.pretrain(seqs, seq_len, epochs=2, batch_size=32)


def ce(scores, batch):
    import jax.numpy as jnp
    return -jnp.mean(jax.nn.log_softmax(scores)[
        jnp.arange(scores.shape[0]), batch["target"]])


ft = Trainer(model, ce, TrainerConfig(learning_rate=1e-3, monitor="AUC"),
             train_method="full_scores")
batch = {"item_seq": seqs[:16], "seq_len": seq_len[:16],
         "target": seqs[:16, -1].astype(np.int32)}
ft.init(batch)
ft.params = transfer_pretrained(ft.params, pre.params)
loss = float(ft.train_step(batch))
assert np.isfinite(loss)
print("2. s3rec pretrain->finetune OK, ft loss %.4f" % loss)

# -- 3. RecVAE alternating fit ------------------------------------------------
from recbox_tpu.models.matching.autoencoder import RecVAE
from recbox_tpu.training.recvae import RecVAETrainer

X = (rng.random((300, 50)) < 0.15).astype(np.float32)
X[X.sum(1) == 0, 0] = 1.0
vt = RecVAETrainer(RecVAE(num_items=50, hidden_dim=32, latent_dim=8,
                          n_enc_layers=2, dropout=0.1),
                   learning_rate=5e-3, seed=0)
vt.fit(X, epochs=4, batch_size=64)
scores = vt.scores(X[:5])
assert scores.shape == (5, 50) and np.isfinite(scores).all()
print("3. recvae alternating fit OK")
print("ALL DRIVES PASSED")
