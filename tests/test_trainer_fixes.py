"""Regression tests for the round-2 training/nn review findings:

sparse-trainer regularizers, plateau lr reaching the embedding tables,
the public state_dict contract carrying sparse/packed table state,
best-weights seeding on resume, pretrained/frozen embedding tables, the
apply(method, train=True) guard, and the direct-init scheme clash.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.training import TrainerConfig
from recbox_tpu.training.packed import PackedEmbeddingTrainer
from recbox_tpu.training.sparse import SparseEmbeddingTrainer


def _fm(vocab=32, dim=8):
    return FeatureMap("trf", (
        FeatureSpec("a", "categorical", vocab_size=vocab, embedding_dim=dim),
        FeatureSpec("b", "categorical", vocab_size=vocab, embedding_dim=dim),
    ), labels=("y",))


def _batch(n=64, vocab=32, seed=0):
    rng = np.random.default_rng(seed)
    return {"a": rng.integers(0, vocab, n).astype(np.int32),
            "b": rng.integers(0, vocab, n).astype(np.int32),
            "y": (rng.random(n) > 0.5).astype(np.float32)}


def _make(trainer_cls, **cfg_kwargs):
    from recbox_tpu.models.ranking.ctr import DeepFM
    model = DeepFM(feature_map=_fm(), embedding_dim=8, hidden_units=(16,))
    cfg = TrainerConfig(learning_rate=1e-2, epochs=1, monitor="AUC",
                        **cfg_kwargs)
    return trainer_cls(model, lambda o, b: binary_crossentropy(o, b["y"]),
                       cfg)


def test_sparse_trainer_applies_embedding_regularizer():
    b = _batch()
    t_reg = _make(SparseEmbeddingTrainer, embedding_regularizer=10.0)
    t_noreg = _make(SparseEmbeddingTrainer)
    t_reg.init(b)
    t_noreg.init(b)
    for _ in range(20):
        t_reg.train_step(b)
        t_noreg.train_step(b)
    norm_reg = sum(float(jnp.sum(jnp.square(v)))
                   for v in t_reg.tables.values())
    norm_noreg = sum(float(jnp.sum(jnp.square(v)))
                     for v in t_noreg.tables.values())
    # a strong p2 penalty must visibly shrink the touched rows
    assert norm_reg < 0.5 * norm_noreg, (norm_reg, norm_noreg)


@pytest.mark.parametrize("cls", [SparseEmbeddingTrainer,
                                 PackedEmbeddingTrainer])
def test_plateau_lr_reaches_embedding_tables(cls):
    b = _batch()
    t = _make(cls)
    t.init(b)
    t.train_step(b)                     # builds the step, resolves _emb_lr
    before = t._emb_lr
    assert before is not None
    t._set_learning_rate(t.learning_rate * 0.1)
    assert t._emb_lr == pytest.approx(before * 0.1, rel=1e-6)
    # the decayed rate shrinks the actual row update
    tab_before = {k: np.asarray(v) for k, v in t.tables.items()}
    t.train_step(b)
    delta_small = sum(float(np.abs(np.asarray(v) - tab_before[k]).sum())
                      for k, v in t.tables.items())
    assert delta_small > 0              # still training, just slower


@pytest.mark.parametrize("cls", [SparseEmbeddingTrainer,
                                 PackedEmbeddingTrainer])
def test_state_dict_carries_table_state(cls):
    b = _batch()
    t = _make(cls)
    t.init(b)
    t.train_step(b)
    state = t.state_dict()
    if cls is SparseEmbeddingTrainer:
        assert "tables" in state and "accumulators" in state
        assert set(state["tables"]) == set(t.tables)
    else:
        assert "packs" in state and "accs" in state
        assert set(state["packs"]) == set(t.packs)


def test_load_seeds_best_weights(tmp_path):
    b = _batch()
    t = _make(SparseEmbeddingTrainer)
    t.init(b)
    for _ in range(5):
        t.train_step(b)
    path = str(tmp_path / "ck.msgpack")
    t.save(path)
    saved_tables = {k: np.asarray(v) for k, v in t.tables.items()}

    t2 = _make(SparseEmbeddingTrainer)
    t2.init(b)
    t2.load(path)
    # drift past the checkpoint, then restore best: must return to the
    # loaded (best-so-far) weights, not stay on the drifted ones
    for _ in range(5):
        t2.train_step(b)
    t2._restore_best()
    for k, v in t2.tables.items():
        np.testing.assert_allclose(np.asarray(v), saved_tables[k],
                                   rtol=1e-6)


def test_pretrained_table_loaded_and_frozen(tmp_path):
    from recbox_tpu.nn.embedding import FeatureEmbedding
    path = str(tmp_path / "vecs.npz")
    vecs = np.arange(40, dtype=np.float32).reshape(10, 4)
    np.savez(path, embeddings=vecs)
    fm = FeatureMap("pt", (
        FeatureSpec("item", "categorical", vocab_size=10, embedding_dim=4,
                    pretrain_path=path, freeze_emb=True),))
    mod = FeatureEmbedding(fm)
    v = mod.init(jax.random.PRNGKey(0), {"item": jnp.arange(4)})
    table = np.asarray(nn.meta.unbox(v["params"])["emb_item"])
    np.testing.assert_allclose(table, vecs)

    def loss(p):
        out = mod.apply({"params": p}, {"item": jnp.arange(4)})
        return jnp.sum(out["item"] ** 2)

    g = jax.grad(loss)(nn.meta.unbox(v["params"]))
    assert float(jnp.abs(g["emb_item"]).max()) == 0.0   # frozen

    # without freeze: pretrained load still happens, gradients flow
    fm2 = FeatureMap("pt2", (
        FeatureSpec("item", "categorical", vocab_size=10, embedding_dim=4,
                    pretrain_path=path),))
    mod2 = FeatureEmbedding(fm2)
    v2 = mod2.init(jax.random.PRNGKey(0), {"item": jnp.arange(4)})

    def loss2(p):
        out = mod2.apply({"params": p}, {"item": jnp.arange(4)})
        return jnp.sum(out["item"] ** 2)

    g2 = jax.grad(loss2)(nn.meta.unbox(v2["params"]))
    assert float(jnp.abs(g2["emb_item"]).max()) > 0.0


def test_pretrained_shape_mismatch_raises(tmp_path):
    from recbox_tpu.nn.embedding import FeatureEmbedding
    path = str(tmp_path / "bad.npz")
    np.savez(path, embeddings=np.zeros((10, 7), np.float32))  # wrong dim
    fm = FeatureMap("ptb", (
        FeatureSpec("item", "categorical", vocab_size=10, embedding_dim=4,
                    pretrain_path=path),))
    mod = FeatureEmbedding(fm)
    with pytest.raises(ValueError, match="shape"):
        mod.init(jax.random.PRNGKey(0), {"item": jnp.arange(4)})


def test_apply_method_with_train_raises():
    b = _batch()
    t = _make(SparseEmbeddingTrainer)
    t.init(b)
    with pytest.raises(NotImplementedError, match="train=True"):
        t.apply(b, method=t.model.__call__, train=True)


def test_direct_init_rejects_scheme_clash():
    from recbox_tpu.models.ranking.ctr import DeepFM

    class XavierDeepFM(DeepFM):
        emb_init_scheme: str = "xavier_normal"

    model = XavierDeepFM(feature_map=_fm(), embedding_dim=8,
                         hidden_units=(16,))
    cfg = TrainerConfig(learning_rate=1e-2, epochs=1, monitor="AUC")
    t = PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["y"]), cfg,
        direct_init=True)
    with pytest.raises(ValueError, match="emb_init_scheme"):
        t.init(_batch())
    # supplying a matching initializer clears the guard
    t2 = PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["y"]), cfg,
        direct_init=True,
        table_initializer=nn.initializers.xavier_normal())
    t2.init(_batch())
    assert t2.packs
