"""DIN/BST: sequence-aware CTR — click iff target item is in the history."""

import numpy as np
import pytest

from recbox_tpu.data import ArrayLoader
from recbox_tpu.evaluation import CTREvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.sequence_ctr import BST, DIN
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.training import Trainer, TrainerConfig


def make_din_data(rng, n=5000, vocab=64, L=8):
    """click = 1 iff target ∈ history (pure attention signal); PAD = vocab."""
    hist = rng.integers(1, vocab, size=(n, L)).astype(np.int32)
    n_pad = rng.integers(0, L // 2, size=n)
    for r, k in enumerate(n_pad):
        hist[r, :k] = vocab  # left padding with PAD id
    in_hist = rng.random(n) < 0.5
    target = np.where(
        in_hist,
        hist[np.arange(n), rng.integers(L // 2, L, size=n)],
        rng.integers(1, vocab, size=n)).astype(np.int32)
    click = np.array([t in h[k:] for t, h, k in zip(target, hist, n_pad)],
                     dtype=np.float32)
    arrays = {"hist": hist, "item_id": target, "click": click}
    fm = FeatureMap("din", (
        FeatureSpec("item_id", "categorical", vocab_size=vocab + 1,
                    embedding_dim=16),
        FeatureSpec("hist", "sequence", vocab_size=vocab + 1, embedding_dim=16,
                    max_len=L, padding_idx=vocab, share_embedding="item_id"),
    ), labels=("click",))
    return fm, arrays


@pytest.fixture(scope="module")
def din_data():
    rng = np.random.default_rng(9)
    fm, arrays = make_din_data(rng)
    split = int(len(arrays["click"]) * 0.85)
    return fm, {k: v[:split] for k, v in arrays.items()}, \
        {k: v[split:] for k, v in arrays.items()}


def _fit(model, train, valid, epochs=6):
    loader = ArrayLoader(train, batch_size=256, drop_last=True, seed=2)
    ev = CTREvaluator(valid, label="click", metrics=["AUC"])
    cfg = TrainerConfig(learning_rate=1e-2, epochs=epochs, patience=12,
                        monitor="AUC", lr_decay_factor=1.0,
                        reload_best_on_plateau=False)
    tr = Trainer(model, lambda o, b: binary_crossentropy(o, b["click"]),
                 cfg, eval_fn=ev)
    return tr.fit(loader)


def test_din_learns_membership(din_data):
    fm, train, valid = din_data
    model = DIN(feature_map=fm, embedding_dim=16,
                attention_hidden_units=(32,), attention_activation="relu",
                hidden_units=(64, 32))
    metrics = _fit(model, train, valid, epochs=10)
    assert metrics["AUC"] > 0.9, metrics


def test_bst_smoke(din_data):
    fm, train, valid = din_data
    model = BST(feature_map=fm, embedding_dim=16, n_layers=1, n_heads=2,
                hidden_units=(32,))
    small = {k: v[:1024] for k, v in train.items()}
    metrics = _fit(model, small, valid, epochs=1)
    assert np.isfinite(metrics["AUC"])
