"""CTR ranking end-to-end: models must learn a planted interaction signal."""

import numpy as np
import pytest

from recbox_tpu.data import ArrayLoader
from recbox_tpu.evaluation import CTREvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.ctr import (
    AFM, AutoInt, DCN, DCNv2, DNN, DeepFM, FM, FiBiNET, LR, NFM, PNN,
    WideDeep, xDeepFM,
)
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.training import Trainer, TrainerConfig


def make_ctr_data(rng, n=6000, vocab=32):
    """Click depends on an XOR-ish interaction of two categorical features —
    linear models can't fit it; interaction models can."""
    a = rng.integers(0, vocab, size=n)
    b = rng.integers(0, vocab, size=n)
    price = rng.normal(size=n).astype(np.float32)
    logit = 2.0 * (((a % 2) == (b % 2)).astype(np.float32) * 2 - 1) + 0.5 * price
    y = (rng.random(n) < 1 / (1 + np.exp(-logit))).astype(np.float32)
    arrays = {"cat_a": (a + 1).astype(np.int32), "cat_b": (b + 1).astype(np.int32),
              "price": price, "click": y}
    fm = FeatureMap("ctr_synth", (
        FeatureSpec("cat_a", "categorical", vocab_size=vocab + 1, embedding_dim=8),
        FeatureSpec("cat_b", "categorical", vocab_size=vocab + 1, embedding_dim=8),
        FeatureSpec("price", "numeric", embedding_dim=8),
    ), labels=("click",))
    return fm, arrays


@pytest.fixture(scope="module")
def ctr_data():
    rng = np.random.default_rng(11)
    fm, arrays = make_ctr_data(rng)
    n = len(arrays["click"])
    split = int(n * 0.8)
    train = {k: v[:split] for k, v in arrays.items()}
    valid = {k: v[split:] for k, v in arrays.items()}
    return fm, train, valid


def _fit(model, fm, train, valid, epochs=3, lr=5e-3):
    loader = ArrayLoader(train, batch_size=256, drop_last=True, seed=1)
    evaluator = CTREvaluator(valid, label="click", metrics=["AUC", "logloss"])
    # plateau-reload (the reference default) is counterproductive on this
    # synthetic task's slow takeoff; disable it and rely on patience only
    cfg = TrainerConfig(learning_rate=lr, epochs=epochs, patience=8,
                        monitor={"AUC": 1}, monitor_mode="max",
                        lr_decay_factor=1.0, reload_best_on_plateau=False)
    trainer = Trainer(model,
                      lambda out, batch: binary_crossentropy(out, batch["click"]),
                      cfg, eval_fn=evaluator)
    return trainer.fit(loader)


def test_deepfm_learns_interaction(ctr_data):
    fm, train, valid = ctr_data
    metrics = _fit(DeepFM(feature_map=fm, embedding_dim=8,
                          hidden_units=(32, 16)), fm, train, valid,
                   epochs=25, lr=2e-2)
    assert metrics["AUC"] > 0.75, metrics


def test_lr_cannot_fit_xor(ctr_data):
    fm, train, valid = ctr_data
    metrics = _fit(LR(feature_map=fm), fm, train, valid, epochs=2)
    assert metrics["AUC"] < 0.70  # linear can only use the price signal


@pytest.mark.parametrize("model_cls,kwargs", [
    (FM, {}),
    (DNN, {"hidden_units": (32, 16)}),
    (WideDeep, {"hidden_units": (32, 16)}),
    (NFM, {"hidden_units": (16,)}),
    (AFM, {"attention_dim": 8}),
    (DCN, {"num_cross_layers": 2, "hidden_units": (32,)}),
    (DCNv2, {"num_cross_layers": 2, "hidden_units": (32,)}),
    (DCNv2, {"num_cross_layers": 2, "use_low_rank_mixture": True,
             "low_rank": 4, "num_experts": 2}),
    (xDeepFM, {"cin_layer_sizes": (4, 4), "hidden_units": (16,)}),
    (AutoInt, {"num_attention_layers": 1, "attention_dim": 8}),
    (PNN, {"hidden_units": (32,)}),
    (FiBiNET, {"hidden_units": (16,), "reduction_ratio": 2}),
])
def test_model_smoke(ctr_data, model_cls, kwargs):
    fm, train, valid = ctr_data
    small_train = {k: v[:1024] for k, v in train.items()}
    metrics = _fit(model_cls(feature_map=fm, embedding_dim=8, **kwargs),
                   fm, small_train, valid, epochs=1)
    assert np.isfinite(metrics["AUC"]) and np.isfinite(metrics["logloss"])


def test_predict_rejects_shuffled_loader():
    """A shuffled loader misaligns predictions with caller-side labels —
    predict() must fail loudly instead of returning chance-level scores."""
    import numpy as np
    import pytest
    from recbox_tpu.data import ArrayLoader
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import LR
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import Trainer, TrainerConfig

    fm = FeatureMap("t", (FeatureSpec("a", "categorical", vocab_size=4,
                                      embedding_dim=4),), labels=("y",))
    arrays = {"a": np.array([1, 2, 3, 1], dtype=np.int32),
              "y": np.array([0, 1, 0, 1], dtype=np.float32)}
    t = Trainer(LR(feature_map=fm),
                lambda o, b: binary_crossentropy(o, b["y"]),
                TrainerConfig(learning_rate=1e-2, epochs=1, monitor="AUC"))
    t.fit(ArrayLoader(arrays, batch_size=4, seed=0))
    with pytest.raises(ValueError, match="shuffle=False"):
        t.predict(ArrayLoader(arrays, batch_size=4))  # shuffle defaults True
    out = t.predict(ArrayLoader(arrays, batch_size=4, shuffle=False))
    assert out.shape == (4,)
