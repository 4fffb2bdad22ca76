"""Exercise the exlib wrappers' SUCCESS paths against vendorable stubs.

xgboost/lightgbm are not baked into this image, so
tests/test_mechanisms_batch22.py's booster tests skip and only
`models/exlib.py`'s ImportError path ever executed in CI (VERDICT
round-4 weak #6). These fakes implement just enough of each package's
training surface (DMatrix/Dataset, train(), Booster.predict) to run the
wrappers' fit/predict plumbing — argument assembly, eval-set wiring,
round propagation, prediction passthrough — deterministically. The
real-dependency tests in test_mechanisms_batch22.py are untouched and
still run wherever the packages exist.

Reference surface being wrapped:
`third_party/recbole/model/exlib_recommender/{xgboost,lightgbm}.py` +
DecisionTreeTrainer (`trainer/trainer.py`).
"""

import sys
import types

import numpy as np
import pytest


def _sigmoid(z):
    return 1.0 / (1.0 + np.exp(-z))


def _fake_xgboost():
    mod = types.ModuleType("xgboost")

    class DMatrix:
        def __init__(self, data, label=None):
            self.data = np.asarray(data)
            self.label = None if label is None else np.asarray(label)

    class Booster:
        def __init__(self, params, dtrain, num_rounds, evals):
            self.params = params
            self.num_rounds = num_rounds
            self.eval_names = [name for _, name in evals]
            # deterministic "model": least-squares weights on the
            # training matrix, squashed to (0, 1) like binary:logistic
            X, y = dtrain.data, dtrain.label
            self.w, *_ = np.linalg.lstsq(X, y - 0.5, rcond=None)

        def predict(self, dmat):
            return _sigmoid(dmat.data @ self.w)

    def train(params, dtrain, num_boost_round=10, evals=(),
              verbose_eval=True, early_stopping_rounds=None):
        assert not verbose_eval, "wrapper must silence eval logging"
        b = Booster(params, dtrain, num_boost_round, list(evals))
        b.early_stopping_rounds = early_stopping_rounds
        return b

    mod.DMatrix, mod.Booster, mod.train = DMatrix, Booster, train
    return mod


def _fake_lightgbm():
    mod = types.ModuleType("lightgbm")

    class Dataset:
        def __init__(self, data, label=None):
            self.data = np.asarray(data)
            self.label = None if label is None else np.asarray(label)

    class Booster:
        def __init__(self, params, dtrain, num_rounds, valid_sets):
            self.params = params
            self.num_rounds = num_rounds
            self.n_valid_sets = len(valid_sets)
            X, y = dtrain.data, dtrain.label
            self.w, *_ = np.linalg.lstsq(X, y - 0.5, rcond=None)

        def predict(self, X):
            return _sigmoid(np.asarray(X) @ self.w)

    def early_stopping(rounds):
        return ("early_stopping", rounds)

    def train(params, train_set, num_boost_round=10, valid_sets=None,
              callbacks=None):
        b = Booster(params, train_set, num_boost_round, valid_sets or [])
        b.callbacks = callbacks or []
        return b

    mod.Dataset, mod.Booster = Dataset, Booster
    mod.train, mod.early_stopping = train, early_stopping
    return mod


@pytest.fixture
def fake_boosters(monkeypatch):
    monkeypatch.setitem(sys.modules, "xgboost", _fake_xgboost())
    monkeypatch.setitem(sys.modules, "lightgbm", _fake_lightgbm())


def _linear_ctr(n, seed):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 4))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(np.float64)
    return X, y


class TestExlibSuccessPaths:
    def test_xgboost_fit_predict_and_eval_wiring(self, fake_boosters):
        from recbox_tpu.models.exlib import XGBoostRecommender

        m = XGBoostRecommender(max_depth=3)
        # defaults merged with overrides (reference param contract)
        assert m.params["objective"] == "binary:logistic"
        assert m.params["eval_metric"] == "auc"
        assert m.params["max_depth"] == 3
        X, y = _linear_ctr(400, 0)
        Xv, yv = _linear_ctr(100, 1)
        out = m.fit(X, y, num_rounds=7, valid=(Xv, yv))
        assert out is m                                   # chainable
        assert m.booster.num_rounds == 7
        assert m.booster.eval_names == ["train", "valid"]
        p = m.predict(Xv)
        assert p.shape == (100,) and (0 < p).all() and (p < 1).all()
        # the deterministic linear stub separates a linear concept
        assert np.mean((p > 0.5) == (yv == 1)) > 0.9
        # early-stop plumbing (reference trainer.py:1117): propagated to
        # xgb.train, and rejected without a valid set to monitor
        m.fit(X, y, num_rounds=7, valid=(Xv, yv), early_stopping_rounds=3)
        assert m.booster.early_stopping_rounds == 3
        with pytest.raises(ValueError, match="valid"):
            m.fit(X, y, early_stopping_rounds=3)

    def test_lightgbm_fit_predict_and_valid_sets(self, fake_boosters):
        from recbox_tpu.models.exlib import LightGBMRecommender

        m = LightGBMRecommender(num_leaves=15)
        assert m.params["objective"] == "binary"
        assert m.params["num_leaves"] == 15
        X, y = _linear_ctr(400, 2)
        Xv, yv = _linear_ctr(100, 3)
        m.fit(X, y, num_rounds=5, valid=(Xv, yv))
        assert m.booster.num_rounds == 5
        assert m.booster.n_valid_sets == 2              # train + valid
        p = m.predict(Xv)
        assert p.shape == (100,)
        assert np.mean((p > 0.5) == (yv == 1)) > 0.9
        # early-stop plumbing: modern lightgbm takes a callback
        # (reference trainer.py:1194 used the legacy kwarg)
        m.fit(X, y, num_rounds=5, valid=(Xv, yv), early_stopping_rounds=2)
        assert ("early_stopping", 2) in m.booster.callbacks

    def test_import_error_path_unchanged(self, monkeypatch):
        """Without the package the wrapper still raises the actionable
        ImportError pointing at the native LambdaMART."""
        import builtins

        real_import = builtins.__import__

        def no_xgb(name, *a, **k):
            if name == "xgboost":
                raise ImportError("nope")
            return real_import(name, *a, **k)

        monkeypatch.setitem(sys.modules, "xgboost", None)
        monkeypatch.setattr(builtins, "__import__", no_xgb)
        from recbox_tpu.models.exlib import XGBoostRecommender
        with pytest.raises(ImportError, match="LambdaMART"):
            XGBoostRecommender()
