"""Sparse embedding training: correctness vs dense, dupes, checkpointing."""

import jax.numpy as jnp
import numpy as np
import pytest

from recbox_tpu.data import ArrayLoader
from recbox_tpu.evaluation import CTREvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.ctr import DeepFM
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.training import Trainer, TrainerConfig
from recbox_tpu.training.sparse import SparseEmbeddingTrainer, split_sparse_params


def _fixture(rng, n=4000, vocab=64):
    a = rng.integers(1, vocab, n).astype(np.int32)
    b = rng.integers(1, vocab, n).astype(np.int32)
    y = (((a % 2) == (b % 2))).astype(np.float32)
    arrays = {"cat_a": a, "cat_b": b, "click": y}
    fm = FeatureMap("sp", (
        FeatureSpec("cat_a", "categorical", vocab_size=vocab, embedding_dim=8),
        FeatureSpec("cat_b", "categorical", vocab_size=vocab, embedding_dim=8),
    ), labels=("click",))
    return fm, arrays


def test_split_params():
    params = {"embedding": {"emb_cat_a": np.zeros((4, 2)),
                            "num_x": np.zeros((1, 2))},
              "dnn": {"Dense_0": {"kernel": np.zeros((2, 2))}}}
    dense, tables, paths = split_sparse_params(params)
    assert "embedding/emb_cat_a" in tables
    assert "emb_cat_a" not in dense.get("embedding", {})
    assert dense["embedding"]["num_x"] is not None
    assert dense["dnn"]["Dense_0"]["kernel"] is not None


def test_sparse_only_touched_rows_change(rng):
    fm, arrays = _fixture(rng)
    model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,))
    t = SparseEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]),
        TrainerConfig(learning_rate=1e-2, monitor="AUC"))
    batch = {"cat_a": np.array([3, 3, 5], np.int32),
             "cat_b": np.array([7, 8, 9], np.int32),
             "click": np.array([1, 0, 1], np.float32)}
    t.init(batch)
    table_key = [k for k in t.tables if "emb_cat_a" in k][0]
    before = np.asarray(t.tables[table_key]).copy()
    t.train_step(dict(batch))
    after = np.asarray(t.tables[table_key])
    changed = np.where(np.abs(after - before).sum(-1) > 0)[0]
    assert set(changed) <= {3, 5}
    assert 3 in changed  # duplicated id updated once, accumulated grads
    # accumulator touched only at those rows
    acc = np.asarray(t.accumulators[table_key])
    assert (acc[changed] > 0).all()
    untouched = np.setdiff1d(np.arange(len(acc)), changed)
    assert (acc[untouched] == 0).all()


def test_sparse_learns_like_dense(rng):
    fm, arrays = _fixture(rng)
    split = int(len(arrays["click"]) * 0.8)
    train = {k: v[:split] for k, v in arrays.items()}
    valid = {k: v[split:] for k, v in arrays.items()}
    ev = CTREvaluator(valid, label="click", metrics=["AUC"])
    cfg = TrainerConfig(learning_rate=1e-2, epochs=10, patience=12,
                        monitor="AUC", lr_decay_factor=1.0,
                        reload_best_on_plateau=False)

    def make(cls):
        return cls(DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,)),
                   lambda o, b: binary_crossentropy(o, b["click"]), cfg,
                   eval_fn=ev)

    m_sparse = make(SparseEmbeddingTrainer).fit(
        ArrayLoader(train, batch_size=256, drop_last=True, seed=0))
    m_dense = make(Trainer).fit(
        ArrayLoader(train, batch_size=256, drop_last=True, seed=0))
    assert m_sparse["AUC"] > 0.95, m_sparse
    assert m_dense["AUC"] > 0.95, m_dense


def test_sparse_checkpoint_roundtrip(rng, tmp_path):
    fm, arrays = _fixture(rng, n=600)
    model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,))
    cfg = TrainerConfig(learning_rate=1e-2, monitor="AUC")
    t1 = SparseEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]), cfg)
    loader = ArrayLoader(arrays, batch_size=128, drop_last=True)
    for batch in loader:
        batch.pop("__mask__", None)
        t1.train_step(batch)
    path = str(tmp_path / "sparse.ckpt")
    t1.save(path)

    t2 = SparseEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]), cfg)
    t2.init(next(iter(loader)))
    t2.load(path)
    k = list(t1.tables)[0]
    np.testing.assert_allclose(np.asarray(t1.tables[k]),
                               np.asarray(t2.tables[k]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t1.accumulators[k]),
                               np.asarray(t2.accumulators[k]), rtol=1e-6)


def test_sparse_with_sequence_features(rng):
    vocab, L, n = 32, 4, 800
    hist = rng.integers(1, vocab, size=(n, L)).astype(np.int32)
    target = rng.integers(1, vocab, n).astype(np.int32)
    y = (target % 2).astype(np.float32)
    fm = FeatureMap("seqsp", (
        FeatureSpec("item_id", "categorical", vocab_size=vocab + 1,
                    embedding_dim=8),
        FeatureSpec("hist", "sequence", vocab_size=vocab + 1, embedding_dim=8,
                    max_len=L, padding_idx=vocab, share_embedding="item_id"),
    ), labels=("click",))
    model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,))
    t = SparseEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]),
        TrainerConfig(learning_rate=1e-2, monitor="AUC"))
    arrays = {"item_id": target, "hist": hist, "click": y}
    for batch in ArrayLoader(arrays, batch_size=128, drop_last=True):
        batch.pop("__mask__", None)
        loss = t.train_step(batch)
    assert np.isfinite(float(loss))
    # shared table: hist and item_id both route to embedding/emb_item_id
    # (plus DeepFM's separate dim-1 linear table)
    emb_tables = [k for k in t.tables if k.startswith("embedding/")]
    assert emb_tables == ["embedding/emb_item_id"]


def test_fused_train_steps_match_sequential():
    """train_steps_repeat must advance training like N separate steps."""
    import numpy as np
    import jax.numpy as jnp
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import DeepFM
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    fm = FeatureMap("fused", (
        FeatureSpec("c0", "categorical", vocab_size=50, embedding_dim=8),
        FeatureSpec("n0", "numeric", embedding_dim=8)), labels=("y",))
    batch = {"c0": rng.integers(0, 50, 128).astype(np.int32),
             "n0": rng.normal(size=128).astype(np.float32),
             "y": (rng.random(128) > 0.5).astype(np.float32)}
    cfg = TrainerConfig(learning_rate=1e-2, monitor="AUC", seed=7)

    t1 = Trainer(DeepFM(feature_map=fm, embedding_dim=8,
                        hidden_units=(16,)),
                 lambda o, b: binary_crossentropy(o, b["y"]), cfg)
    losses_fused = np.asarray(t1.train_steps_repeat(batch, 5))
    assert losses_fused.shape == (5,)
    # monotone-ish improvement on a fixed batch
    assert losses_fused[-1] < losses_fused[0]
    assert t1.step == 5

    # stacked-batches variant
    t2 = Trainer(DeepFM(feature_map=fm, embedding_dim=8,
                        hidden_units=(16,)),
                 lambda o, b: binary_crossentropy(o, b["y"]), cfg)
    batches = {k: np.broadcast_to(v, (5,) + v.shape) for k, v in batch.items()}
    losses2 = np.asarray(t2.train_steps_fused(batches))
    assert losses2.shape == (5,)
    assert losses2[-1] < losses2[0]


def test_sparse_fused_train_steps():
    import numpy as np
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import DeepFM
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import TrainerConfig
    from recbox_tpu.training.sparse import SparseEmbeddingTrainer

    rng = np.random.default_rng(0)
    fm = FeatureMap("sfused", (
        FeatureSpec("c0", "categorical", vocab_size=50, embedding_dim=8),),
        labels=("y",))
    batch = {"c0": rng.integers(0, 50, 128).astype(np.int32),
             "y": (rng.random(128) > 0.5).astype(np.float32)}
    cfg = TrainerConfig(learning_rate=5e-2, monitor="AUC", seed=7)
    tr = SparseEmbeddingTrainer(
        DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,)),
        lambda o, b: binary_crossentropy(o, b["y"]), cfg)
    losses = np.asarray(tr.train_steps_repeat(batch, 6))
    assert losses.shape == (6,)
    assert losses[-1] < losses[0]


def test_fit_with_fused_steps_matches_quality():
    """fit(fused_steps=4) reaches the same quality as per-step fit."""
    import numpy as np
    from recbox_tpu.data import ArrayLoader
    from recbox_tpu.evaluation import CTREvaluator
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import DeepFM
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import Trainer, TrainerConfig
    from tests.test_ranking_e2e import make_ctr_data

    rng = np.random.default_rng(11)
    fm, arrays = make_ctr_data(rng, n=6000)
    split = int(0.8 * len(arrays["click"]))
    train = {k: v[:split] for k, v in arrays.items()}
    valid = {k: v[split:] for k, v in arrays.items()}

    def fit(fused):
        model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(32,))
        cfg = TrainerConfig(learning_rate=1e-2, epochs=6, patience=8,
                            monitor="AUC", lr_decay_factor=1.0,
                            reload_best_on_plateau=False, fused_steps=fused,
                            seed=3)
        ev = CTREvaluator(valid, label="click", metrics=["AUC"])
        tr = Trainer(model, lambda o, b: binary_crossentropy(o, b["click"]),
                     cfg, eval_fn=ev)
        loader = ArrayLoader(train, batch_size=256, drop_last=True, seed=1)
        return tr.fit(loader)

    auc1 = fit(1)["AUC"]
    auc4 = fit(4)["AUC"]
    assert auc4 > 0.75 and abs(auc4 - auc1) < 0.06, (auc1, auc4)


def test_fused_steps_eval_cadence_crosses_multiples():
    """eval_steps must fire on counter CROSSINGS when fused_steps > 1."""
    import numpy as np
    from recbox_tpu.data import ArrayLoader
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import DeepFM
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    n = 1536   # 24 batches of 64 per epoch
    arrays = {"c": rng.integers(0, 20, n).astype(np.int32),
              "click": (rng.random(n) > 0.5).astype(np.float32)}
    fm = FeatureMap("ev", (FeatureSpec("c", "categorical", vocab_size=20,
                                       embedding_dim=4),), labels=("click",))
    calls = []

    def eval_fn(tr):
        calls.append(tr.step)
        return {"AUC": 0.5 + 0.001 * len(calls)}

    cfg = TrainerConfig(learning_rate=1e-2, epochs=1, patience=50,
                        monitor="AUC", fused_steps=5, eval_steps=7,
                        lr_decay_factor=1.0, reload_best_on_plateau=False)
    tr = Trainer(DeepFM(feature_map=fm, embedding_dim=4, hidden_units=(8,)),
                 lambda o, b: binary_crossentropy(o, b["click"]), cfg,
                 eval_fn=eval_fn)
    tr.fit(ArrayLoader(arrays, batch_size=64, drop_last=True, seed=0))
    # steps advance by 5; evals must fire near every multiple of 7
    # (10, 15, 25, 30, 40, ... — i.e. whenever step//7 increases)
    assert len(calls) >= 3, calls
    markers = [s // 7 for s in calls]
    assert len(set(markers)) == len(markers), calls


def test_sparse_fused_steps_and_batch_stats(rng):
    """SparseEmbeddingTrainer.train_steps_fused threads tables/accums/
    model_state through the scan (the base 5-arg fused scan used to
    TypeError at trace time with the 7-arg sparse step), and BatchNorm
    batch_stats accumulate instead of being baked in at trace time."""
    import jax
    from recbox_tpu.models.ranking.ctr import DeepFM
    n, vocab = 1024, 64
    a = rng.integers(1, vocab, n).astype(np.int32)
    b = rng.integers(1, vocab, n).astype(np.int32)
    y = (((a % 2) == (b % 2))).astype(np.float32)
    fm = FeatureMap("spf", (
        FeatureSpec("cat_a", "categorical", vocab_size=vocab, embedding_dim=8),
        FeatureSpec("cat_b", "categorical", vocab_size=vocab, embedding_dim=8),
    ), labels=("click",))
    model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,),
                   batch_norm=True)
    t = SparseEmbeddingTrainer(
        model, lambda o, b_: binary_crossentropy(o, b_["click"]),
        TrainerConfig(learning_rate=1e-2, monitor="AUC", seed=3,
                      fused_steps=4))
    arrays = {"cat_a": a, "cat_b": b, "click": y}
    stacked = {k: np.stack([v[i * 128:(i + 1) * 128] for i in range(4)])
               for k, v in arrays.items()}
    first = {k: v[0] for k, v in stacked.items()}
    t.init(first)
    def movement():
        leaves = jax.tree_util.tree_leaves(t.model_state)
        return sum(float(np.abs(np.asarray(l)).sum()) for l in leaves
                   if l.dtype.kind == "f")
    m0 = movement()
    losses = t.train_steps_fused(stacked)
    assert losses.shape == (4,)
    assert t.step == 4
    m1 = movement()
    assert m1 != m0
    # repeat scan also threads state
    t.train_steps_repeat(first, 3)
    assert movement() != m1
