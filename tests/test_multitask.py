"""Multi-task models: shapes, ESMM probability semantics, MMOE learning."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recbox_tpu.data import ArrayLoader
from recbox_tpu.evaluation.evaluators import MultiTaskEvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.multitask.models import (
    AITM, ESMM, MMOE, PLE, SharedBottom, multitask_loss,
)
from recbox_tpu.training import Trainer, TrainerConfig


def make_mtl_data(rng, n=4000, vocab=16):
    a = rng.integers(1, vocab, n)
    b = rng.integers(1, vocab, n)
    ctr_logit = 1.5 * ((a % 3 == 0).astype(np.float32) * 2 - 1)
    click = (rng.random(n) < 1 / (1 + np.exp(-ctr_logit))).astype(np.float32)
    cvr_logit = 1.5 * ((b % 2 == 0).astype(np.float32) * 2 - 1)
    conv = click * (rng.random(n) < 1 / (1 + np.exp(-cvr_logit)))
    arrays = {"cat_a": a.astype(np.int32), "cat_b": b.astype(np.int32),
              "click": click, "conversion": conv.astype(np.float32)}
    fm = FeatureMap("mtl", (
        FeatureSpec("cat_a", "categorical", vocab_size=vocab, embedding_dim=8),
        FeatureSpec("cat_b", "categorical", vocab_size=vocab, embedding_dim=8),
    ), labels=("click", "conversion"))
    return fm, arrays


@pytest.fixture(scope="module")
def mtl_data():
    rng = np.random.default_rng(5)
    fm, arrays = make_mtl_data(rng)
    split = int(len(arrays["click"]) * 0.8)
    return fm, {k: v[:split] for k, v in arrays.items()}, \
        {k: v[split:] for k, v in arrays.items()}


def _loss_fn(fm, from_logits=True):
    labels = list(fm.labels)

    def fn(outputs, batch):
        y = jnp.stack([batch[l] for l in labels], axis=1)
        return multitask_loss(outputs, y, from_logits=from_logits)
    return fn


def test_multitask_loss_matches_bce():
    out = jnp.array([[0.5, -0.2]])
    y = jnp.array([[1.0, 0.0]])
    expected = (np.log1p(np.exp(-0.5)) + np.log1p(np.exp(-0.2)))
    np.testing.assert_allclose(multitask_loss(out, y), expected, rtol=1e-5)


def test_mmoe_learns(mtl_data):
    fm, train, valid = mtl_data
    model = MMOE(feature_map=fm, embedding_dim=8, num_experts=3,
                 expert_units=(32,), tower_units=(16,))
    cfg = TrainerConfig(learning_rate=1e-2, epochs=6, patience=6,
                        monitor="AUC", lr_decay_factor=1.0,
                        reload_best_on_plateau=False)
    ev = MultiTaskEvaluator(valid, fm.labels)
    trainer = Trainer(model, _loss_fn(fm), cfg, eval_fn=ev)
    metrics = trainer.fit(ArrayLoader(train, batch_size=256, drop_last=True))
    assert metrics["click_AUC"] > 0.7, metrics
    assert metrics["conversion_AUC"] > 0.6, metrics
    assert "AUC" in metrics


def test_esmm_probability_monotonicity(mtl_data):
    fm, train, valid = mtl_data
    model = ESMM(feature_map=fm, embedding_dim=8, tower_units=(16,))
    cfg = TrainerConfig(learning_rate=1e-2, epochs=1, monitor="AUC")
    ev = MultiTaskEvaluator(valid, fm.labels, from_logits=False)
    trainer = Trainer(model, _loss_fn(fm, from_logits=False), cfg, eval_fn=ev)
    trainer.fit(ArrayLoader(train, batch_size=256, drop_last=True))
    out = trainer.predict(ArrayLoader(valid, batch_size=256, shuffle=False))
    # pCTCVR = pCTR * pCVR ≤ pCTR, all in (0, 1)
    assert (out[:, 1] <= out[:, 0] + 1e-6).all()
    assert (out > 0).all() and (out < 1).all()


@pytest.mark.parametrize("model_cls,kwargs", [
    (SharedBottom, {"bottom_units": (32,), "tower_units": (16,)}),
    (PLE, {"num_levels": 2, "specific_experts": 2, "shared_experts": 1,
           "expert_units": (16,), "tower_units": (8,)}),
    (AITM, {"tower_units": (16,), "transfer_dim": 8}),
])
def test_mtl_smoke(mtl_data, model_cls, kwargs):
    fm, train, valid = mtl_data
    model = model_cls(feature_map=fm, embedding_dim=8, **kwargs)
    cfg = TrainerConfig(learning_rate=1e-2, epochs=1, monitor="AUC")
    trainer = Trainer(model, _loss_fn(fm), cfg)
    loader = ArrayLoader({k: v[:512] for k, v in train.items()},
                         batch_size=128, drop_last=True)
    for batch in loader:
        batch.pop("__mask__", None)
        loss = trainer.train_step(batch)
    assert np.isfinite(float(loss))
    out = trainer.predict(ArrayLoader({k: v[:100] for k, v in valid.items()},
                                      batch_size=64, shuffle=False))
    assert out.shape == (100, 2)
