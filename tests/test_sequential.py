"""Sequential models: data utilities, shapes, and SASRec learning a Markov
chain (next item = current + 1 mod n) that memoryless models can't beat."""

import jax
import numpy as np
import pytest

from recbox_tpu.data import ArrayLoader
from recbox_tpu.data.sequential import (
    build_sliding_windows, group_user_sequences, leave_one_out_split,
)
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.sequential.models import (
    Caser, GRU4Rec, NARM, NextItNet, SASRec, STAMP, right_align_to_left,
)
from recbox_tpu.ops import full_softmax_loss
from recbox_tpu.training import Trainer, TrainerConfig


def seq_feature_map(n_items, max_len=10):
    return FeatureMap(
        "seq", (FeatureSpec("item_id", "categorical", source="item",
                            vocab_size=n_items + 1, embedding_dim=32),),
        query_index="user_id", corpus_index="item_id", num_items=n_items + 1)


class TestSequentialData:
    def test_group_sequences_time_order(self):
        u = np.array([1, 2, 1, 2, 1])
        i = np.array([10, 20, 11, 21, 12])
        t = np.array([3, 1, 1, 2, 2])
        seqs = group_user_sequences(u, i, t)
        np.testing.assert_array_equal(seqs[1], [11, 12, 10])  # sorted by time
        np.testing.assert_array_equal(seqs[2], [20, 21])

    def test_sliding_windows(self):
        seqs = {7: np.array([1, 2, 3, 4])}
        out = build_sliding_windows(seqs, max_len=3)
        # samples: [1]->2, [1,2]->3, [1,2,3]->4
        assert out["item_seq"].shape == (3, 3)
        np.testing.assert_array_equal(out["item_id"], [2, 3, 4])
        np.testing.assert_array_equal(out["item_seq"][0], [0, 0, 1])
        np.testing.assert_array_equal(out["item_seq"][2], [1, 2, 3])
        np.testing.assert_array_equal(out["seq_len"], [1, 2, 3])

    def test_max_len_truncation_keeps_recent(self):
        seqs = {1: np.array([1, 2, 3, 4, 5])}
        out = build_sliding_windows(seqs, max_len=2)
        np.testing.assert_array_equal(out["item_seq"][-1], [3, 4])
        assert out["item_id"][-1] == 5

    def test_leave_one_out(self):
        seqs = {1: np.array([1, 2, 3, 4, 5]), 2: np.array([7, 8])}
        train, valid, test = leave_one_out_split(seqs, max_len=4)
        assert valid["item_id"].tolist() == [4]
        assert test["item_id"].tolist() == [5]
        # user 2 too short: train only
        assert 2 not in valid["user_id"]
        # train windows only over items[:-2] of user 1 plus user 2's pair
        assert set(train["item_id"].tolist()) == {2, 3, 8}

    def test_right_align(self):
        import jax.numpy as jnp
        seq = jnp.array([[0, 0, 1, 2], [1, 2, 3, 4]])
        ln = jnp.array([2, 4])
        out = right_align_to_left(seq, ln)
        np.testing.assert_array_equal(out, [[1, 2, 0, 0], [1, 2, 3, 4]])


def _markov_dataset(rng, n_items=40, n_users=200, seq_len=12):
    """next item = (current + 1) mod n — pure sequence signal."""
    seqs = {}
    for u in range(n_users):
        start = rng.integers(1, n_items + 1)
        items = [(start + k - 1) % n_items + 1 for k in range(seq_len)]
        seqs[u] = np.array(items)
    return seqs


@pytest.fixture(scope="module")
def markov():
    rng = np.random.default_rng(3)
    n_items = 40
    seqs = _markov_dataset(rng, n_items=n_items)
    train, valid, _ = leave_one_out_split(seqs, max_len=8)
    fm = seq_feature_map(n_items, max_len=8)
    return fm, train, valid, n_items


def _hit_at_1(trainer, valid, n_items):
    scores = trainer.apply(
        {"item_seq": valid["item_seq"], "seq_len": valid["seq_len"]},
        method=trainer.model.full_scores)
    pred = np.asarray(scores).argmax(-1)
    return float(np.mean(pred == valid["item_id"]))


@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_sasrec_learns_markov(markov, compute_dtype):
    # bfloat16 runs the encoder + logits matmuls in the MXU-native dtype
    # (the bench configuration since round 5) — same mechanism bar
    fm, train, valid, n_items = markov
    model = SASRec(feature_map=fm, embedding_dim=32, max_seq_len=8,
                   n_layers=1, n_heads=2, dropout=0.0,
                   compute_dtype=compute_dtype)
    cfg = TrainerConfig(learning_rate=5e-3, epochs=6, monitor="hit",
                        lr_decay_factor=1.0, reload_best_on_plateau=False)
    trainer = Trainer(
        model, lambda out, b: full_softmax_loss(out, b["item_id"]), cfg,
        train_method="full_scores")
    loader = ArrayLoader(train, batch_size=256, drop_last=True, seed=0)
    for _ in range(6):
        for batch in loader:
            batch.pop("__mask__", None)
            trainer.train_step(batch)
    hit = _hit_at_1(trainer, valid, n_items)
    assert hit > 0.8, f"SASRec hit@1={hit}"


@pytest.mark.parametrize("model_cls,kwargs", [
    (GRU4Rec, {"hidden_size": 32}),
    (NARM, {"hidden_size": 32}),
    (STAMP, {}),
    (Caser, {"n_h": 2, "n_v": 2, "heights": (2, 3)}),
    (NextItNet, {"dilations": (1, 2)}),
])
def test_encoder_smoke(markov, model_cls, kwargs):
    fm, train, valid, n_items = markov
    model = model_cls(feature_map=fm, embedding_dim=32, max_seq_len=8,
                      dropout=0.0, **kwargs)
    batch = {k: train[k][:16] for k in ("item_seq", "seq_len", "item_id")}
    import jax.numpy as jnp
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, db, train=True,
                           method=model.full_scores)
    from flax import linen as nn
    params = nn.meta.unbox(variables["params"])
    scores = model.apply({"params": params}, db, method=model.full_scores)
    assert scores.shape == (16, n_items + 1)
    assert np.isfinite(np.asarray(scores)).all()


def test_sasrec_learns_markov_fused_ce(markov):
    """Same markov bar through `train_method='fused_ce_loss'` (the flash-CE
    pallas path, `ops/pallas/fused_ce.py`): the whole train loop runs with
    the loss computed IN the kernel — no (B, vocab) logits tensor — and
    must reach the same mechanism threshold as the XLA-CE variants above."""
    fm, train, valid, n_items = markov
    model = SASRec(feature_map=fm, embedding_dim=32, max_seq_len=8,
                   n_layers=1, n_heads=2, dropout=0.0,
                   compute_dtype="bfloat16")
    cfg = TrainerConfig(learning_rate=5e-3, epochs=6, monitor="hit",
                        lr_decay_factor=1.0, reload_best_on_plateau=False)
    trainer = Trainer(model, lambda out, b: out, cfg,
                      train_method="fused_ce_loss")
    loader = ArrayLoader(train, batch_size=256, drop_last=True, seed=0)
    for _ in range(6):
        for batch in loader:
            batch.pop("__mask__", None)
            trainer.train_step(batch)
    hit = _hit_at_1(trainer, valid, n_items)
    assert hit > 0.8, f"SASRec fused-CE hit@1={hit}"
