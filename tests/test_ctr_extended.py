"""Extended CTR zoo: every model fits the planted XOR interaction signal
(AUC well above chance) or at least runs finite; interaction-capable models
must beat the linear-model ceiling."""

import numpy as np
import pytest

from recbox_tpu.data import ArrayLoader
from recbox_tpu.evaluation import CTREvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.ctr_extended import (
    CCPM, DCNMix, DeepFEFM, DeepIM, DIFM, EDCN, EulerNet, FEFM, FFM, FGCNN,
    FiGNN, FLEN, FmFM, FNN, FwFM, HFM, IFM, MLR, ONN,
)
from recbox_tpu.models.ranking.sequence_ctr import DIEN, DSIN
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.training import Trainer, TrainerConfig
from tests.test_ranking_e2e import make_ctr_data


@pytest.fixture(scope="module")
def ctr_data():
    rng = np.random.default_rng(11)
    fm, arrays = make_ctr_data(rng, n=6000)
    n = len(arrays["click"])
    split = int(n * 0.8)
    train = {k: v[:split] for k, v in arrays.items()}
    valid = {k: v[split:] for k, v in arrays.items()}
    return fm, train, valid


def _fit(model, train, valid, epochs=6, lr=1e-2, rng_impl="rbg"):
    loader = ArrayLoader(train, batch_size=256, drop_last=True, seed=1)
    evaluator = CTREvaluator(valid, label="click", metrics=["AUC", "logloss"])
    cfg = TrainerConfig(learning_rate=lr, epochs=epochs, patience=8,
                        monitor={"AUC": 1}, monitor_mode="max",
                        lr_decay_factor=1.0, reload_best_on_plateau=False,
                        rng_impl=rng_impl)
    trainer = Trainer(model,
                      lambda out, batch: binary_crossentropy(out, batch["click"]),
                      cfg, eval_fn=evaluator)
    return trainer.fit(loader)


# interaction-capable models must crack the XOR signal; pure-factorization
# models (no xavier'd DNN path) need more steps to grow the 1e-4-init
# embedding products, so they run longer at higher lr
PURE_FACTORIZATION = [
    (FFM, {}),
    (FwFM, {}),
    (FmFM, {}),
    (FEFM, {}),
]

INTERACTION_MODELS = [
    (DeepFEFM, {"hidden_units": (64, 32)}),
    (ONN, {"hidden_units": (64, 32)}),
    (FGCNN, {"conv_filters": (4,), "conv_kernel_widths": (3,),
             "new_maps": (2,), "pooling_widths": (2,),
             "hidden_units": (64, 32)}),
    (FLEN, {"hidden_units": (64, 32)}),
    (IFM, {"fen_hidden_units": (32,)}),
    (DIFM, {"fen_hidden_units": (32,)}),
    (FiGNN, {"gnn_steps": 2}),
    (DeepIM, {"hidden_units": (64, 32)}),
    (DCNMix, {"hidden_units": (64, 32)}),
    (FNN, {"hidden_units": (64, 32)}),
]

# mostly-multiplicative paths: need longer to grow tiny-init products
SLOW_INTERACTION_MODELS = [
    (EulerNet, {"order_layers": (8,)}),
    (HFM, {"deep": True, "hidden_units": (64, 32)}),
]


@pytest.mark.parametrize("model_cls,kwargs", INTERACTION_MODELS,
                         ids=[c.__name__ for c, _ in INTERACTION_MODELS])
def test_learns_interaction(ctr_data, model_cls, kwargs):
    fm, train, valid = ctr_data
    model = model_cls(feature_map=fm, embedding_dim=8, **kwargs)
    metrics = _fit(model, train, valid)
    assert metrics["AUC"] > 0.75, metrics


@pytest.mark.parametrize("model_cls,kwargs", SLOW_INTERACTION_MODELS,
                         ids=[c.__name__ for c, _ in SLOW_INTERACTION_MODELS])
def test_slow_interaction_models(ctr_data, model_cls, kwargs):
    fm, train, valid = ctr_data
    model = model_cls(feature_map=fm, embedding_dim=8, **kwargs)
    # tiny-init multiplicative paths have a slow warmup that can outlast
    # the early-stop patience at lr 2e-2 — the higher lr escapes quickly
    metrics = _fit(model, train, valid, epochs=18, lr=5e-2)
    assert metrics["AUC"] > 0.75, metrics


@pytest.mark.parametrize("model_cls,kwargs", PURE_FACTORIZATION,
                         ids=[c.__name__ for c, _ in PURE_FACTORIZATION])
def test_pure_factorization_learns_interaction(ctr_data, model_cls, kwargs):
    fm, train, valid = ctr_data
    model = model_cls(feature_map=fm, embedding_dim=8, **kwargs)
    metrics = _fit(model, train, valid, epochs=14, lr=2e-2)
    assert metrics["AUC"] > 0.75, metrics


@pytest.mark.parametrize("model_cls,kwargs,epochs", [
    (CCPM, {"conv_kernel_widths": (3,), "conv_filters": (3,),
            "hidden_units": (32,)}, 4),
    (MLR, {"num_regions": 4}, 10),     # MLR converges slower on 2 fields
    # the reference-parity first-order linear path (round-3 fix) dominates
    # EDCN's early gradients: 0.55 AUC at 6 epochs, 0.91 at 12 (measured)
    (EDCN, {"num_layers": 2}, 12),
], ids=["CCPM", "MLR", "EDCN"])
def test_weaker_models_run_and_learn_something(ctr_data, model_cls, kwargs,
                                               epochs):
    """Both reach ~0.91 AUC at these budgets (measured); the 0.8 bar sits
    far above chance AND above the ~0.6 a bare linear price term gives,
    so a dead conv stack / region gating cannot pass."""
    fm, train, valid = ctr_data
    model = model_cls(feature_map=fm, embedding_dim=8, **kwargs)
    metrics = _fit(model, train, valid, epochs=epochs)
    assert metrics["AUC"] > 0.8, metrics


@pytest.fixture(scope="module")
def din_data():
    from tests.test_sequence_ctr import make_din_data
    rng = np.random.default_rng(9)
    fm, arrays = make_din_data(rng)
    split = int(len(arrays["click"]) * 0.85)
    return fm, {k: v[:split] for k, v in arrays.items()}, \
        {k: v[split:] for k, v in arrays.items()}


def test_dien_learns_membership(din_data):
    """Balanced target-in-history task (same as the DIN test). DIEN routes
    the membership signal through GRU states + a scalar attention gate, so
    its bar is lower than DIN's direct target attention."""
    fm, train, valid = din_data
    model = DIEN(feature_map=fm, embedding_dim=16, gru_hidden=16,
                 hidden_units=(64, 32))
    metrics = _fit(model, train, valid, epochs=10, lr=1e-2)
    assert metrics["AUC"] > 0.7, metrics


def test_dsin_learns_membership(din_data):
    """DSIN dilutes membership further through session pooling + Bi-GRU;
    require clear learning above chance."""
    fm, train, valid = din_data
    model = DSIN(feature_map=fm, embedding_dim=16, session_count=2,
                 hidden_units=(64, 32))
    metrics = _fit(model, train, valid, epochs=15, lr=2e-2)
    assert metrics["AUC"] > 0.6, metrics


def test_dien_auxiliary_logits_shape(din_data):
    import jax
    import jax.numpy as jnp
    fm, train, _ = din_data
    model = DIEN(feature_map=fm, embedding_dim=16, gru_hidden=16)
    db = {k: jnp.asarray(v[:32]) for k, v in train.items()}
    variables = model.init({"params": jax.random.PRNGKey(0)}, db,
                           method=model.auxiliary_logits)
    out = model.apply(variables, db, method=model.auxiliary_logits)
    assert out.shape == (32, 7, 2)
    assert np.isfinite(np.asarray(out)).all()


class TestReferenceParityDetails:
    """Round-3 closure of the three documented reference deviations
    (`ctr_extended.py` module docstring): one structural parity probe per
    model, asserting the mechanism the reference prescribes is present."""

    def _init(self, model, fm, train):
        import jax
        batch = {k: v[:8] for k, v in train.items()}
        return model.init({"params": jax.random.PRNGKey(0)}, batch), batch

    @pytest.mark.parametrize("model_cls,kwargs", [
        (ONN, {"hidden_units": (16,)}),
        (CCPM, {"conv_kernel_widths": (3,), "conv_filters": (3,),
                "hidden_units": (16,)}),
        (FGCNN, {"conv_filters": (4,), "conv_kernel_widths": (3,),
                 "new_maps": (2,), "pooling_widths": (2,),
                 "hidden_units": (16,)}),
        (EDCN, {"num_layers": 2}),
    ], ids=["ONN", "CCPM", "FGCNN", "EDCN"])
    def test_first_order_linear_logit_present(self, ctr_data, model_cls,
                                              kwargs):
        """deepctr adds get_linear_logit to these models
        (`feature_column.py:141-170`; e.g. `models/ccpm.py:61` ->
        `models/edcn.py:61,89`): the dim-1 'linear' embedding table must
        exist AND move the output."""
        import jax
        import jax.numpy as jnp
        fm, train, _ = ctr_data
        model = model_cls(feature_map=fm, embedding_dim=8, **kwargs)
        variables, batch = self._init(model, fm, train)
        params = variables["params"]
        assert "linear" in params, list(params)
        out0 = model.apply(variables, batch)
        # perturbing the first-order table must change the logit (the
        # linear path is live, not dead weight; tables init near zero so
        # shift rather than zero them)
        p3 = dict(params)
        p3["linear"] = jax.tree_util.tree_map(lambda x: x + 1.0,
                                              params["linear"])
        out1 = model.apply({"params": p3}, batch)
        assert not np.allclose(np.asarray(out0), np.asarray(out1))

    def test_fignn_gate_reads_flattened_state(self, ctr_data):
        """recbole AttentionalPrediction (`fignn.py:95-143`): mlp2 is
        Linear(F*D -> F, bias=False) over the FLATTENED state and its raw
        (un-sigmoided) output multiplies the per-field scores."""
        fm, train, _ = ctr_data
        model = FiGNN(feature_map=fm, embedding_dim=8, gnn_steps=1)
        variables, batch = self._init(model, fm, train)
        F = fm.num_fields
        D = 8
        k = variables["params"]["mlp2"]["kernel"]
        assert k.shape == (F * D, F), k.shape
        # raw gate (no sigmoid): negating mlp2 must negate its contribution
        # asymmetrically vs a sigmoid gate — check output changes sign
        # structure by comparing against negated-mlp2 params
        import jax.numpy as jnp
        out0 = np.asarray(model.apply(variables, batch))
        p2 = {**variables["params"],
              "mlp2": {"kernel": -variables["params"]["mlp2"]["kernel"]}}
        out1 = np.asarray(model.apply({"params": p2}, batch))
        np.testing.assert_allclose(out1, -out0, rtol=1e-4, atol=1e-5)

    def test_eulernet_bias_inside_rotation(self, ctr_data):
        """recbole EulerInteractionLayer (`eulernet.py:115-145`): bias_lam/
        bias_theta of shape (1, D, F_out) are added INSIDE the log-modulus/
        phase mix (pre-exp), the implicit linear is SHARED between real and
        imag parts, and the initial lift uses the embedding as the PHASE
        (r = mu*cos(e), `eulernet.py:64-67`)."""
        import jax.numpy as jnp
        fm, train, _ = ctr_data
        model = EulerNet(feature_map=fm, embedding_dim=8, order_layers=(4,))
        variables, batch = self._init(model, fm, train)
        p = variables["params"]
        layer = p["euler0"]
        assert layer["bias_lam"].shape == (1, 8, 4), layer["bias_lam"].shape
        assert layer["bias_theta"].shape == (1, 8, 4)
        assert "im" in layer and "re_lin0" not in p      # shared implicit
        assert p["mu"].shape == (1, fm.num_fields, 1)
        # inter_orders columns are softmax-normalized at init
        np.testing.assert_allclose(
            np.asarray(layer["inter_orders"]).sum(axis=0), 1.0, rtol=1e-5)
        # bias_theta pre-exp placement: shifting it by pi flips the
        # explicit stream's rotation (cos(th+pi) = -cos th); with the
        # implicit stream zeroed the real output must negate
        l2 = dict(layer)
        l2["bias_theta"] = layer["bias_theta"] + jnp.pi
        l2["im"] = {"kernel": jnp.zeros_like(layer["im"]["kernel"]),
                    "bias": jnp.zeros_like(layer["im"]["bias"])}
        l0 = dict(layer)
        l0["im"] = l2["im"]
        out_shift = np.asarray(model.apply(
            {"params": {**p, "euler0": l2}}, batch))
        out_base = np.asarray(model.apply(
            {"params": {**p, "euler0": l0}}, batch))
        np.testing.assert_allclose(out_shift, -out_base, rtol=1e-4,
                                   atol=1e-5)
