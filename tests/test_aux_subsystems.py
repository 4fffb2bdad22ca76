"""Aux subsystems: HyperTuning (random/bayes/exhaustive + early stop),
atomic dataset loading (typed TSVs, remap, filters, KG bridge), model/env
introspection, WandbLogger no-op."""

import os

import numpy as np
import pytest

from recbox_tpu.config.hyper_tuning import HyperTuning
from recbox_tpu.data.atomic import (
    filter_by_value, label_by_threshold, load_atomic_dataset,
    load_atomic_file, remap_tokens,
)
from recbox_tpu.utils.introspection import (
    count_params, estimate_cost, get_environment,
)
from recbox_tpu.utils.logging import WandbLogger


def _quadratic(params):
    # optimum at x=0.3, y='b'
    score = -(params["x"] - 0.3) ** 2 - (0.0 if params["y"] == "b" else 0.5)
    return {"metric": score}


class TestHyperTuning:
    def test_random_finds_good_region(self):
        ht = HyperTuning(_quadratic,
                         {"x": ("uniform", 0.0, 1.0),
                          "y": ("choice", ["a", "b", "c"])},
                         algo="random", max_evals=60, early_stop=60, seed=1)
        res = ht.run()
        assert res["best_score"] > -0.05
        assert res["best_params"]["y"] == "b"

    def test_bayes_concentrates_near_optimum(self):
        ht = HyperTuning(_quadratic,
                         {"x": ("uniform", 0.0, 1.0),
                          "y": ("choice", ["a", "b", "c"])},
                         algo="bayes", max_evals=30, early_stop=30,
                         seed=2, n_startup=8)
        res = ht.run()
        assert res["best_score"] > -0.05
        # TPE proposals after startup should sit closer to x*=0.3 than the
        # uniform startup samples on average
        xs = [t["params"]["x"] for t in ht.trials]
        startup = np.abs(np.array(xs[:8]) - 0.3).mean()
        guided = np.abs(np.array(xs[8:]) - 0.3).mean()
        assert guided < startup, (startup, guided)

    def test_exhaustive_covers_grid(self):
        ht = HyperTuning(_quadratic,
                         {"x": ("choice", [0.1, 0.3, 0.5]),
                          "y": ("choice", ["a", "b"])},
                         algo="exhaustive", max_evals=100, early_stop=100)
        res = ht.run()
        assert res["n_trials"] == 6
        assert res["best_params"] == {"x": 0.3, "y": "b"}

    def test_exhaustive_rejects_continuous(self):
        ht = HyperTuning(_quadratic, {"x": ("uniform", 0, 1)},
                         algo="exhaustive")
        with pytest.raises(ValueError):
            ht.run()

    def test_early_stop(self):
        calls = []

        def obj(p):
            calls.append(p)
            return {"metric": 0.0}   # never improves after the first

        ht = HyperTuning(obj, {"x": ("uniform", 0, 1)}, algo="random",
                         max_evals=100, early_stop=5)
        ht.run()
        assert len(calls) == 6   # first + 5 non-improving

    def test_loguniform_and_quniform(self):
        ht = HyperTuning(lambda p: {"metric": 0.0},
                         {"lr": ("loguniform", 1e-5, 1e-1),
                          "bs": ("quniform", 32, 256, 32)},
                         algo="random", max_evals=10, early_stop=100)
        ht.run()
        for t in ht.trials:
            assert 1e-5 <= t["params"]["lr"] <= 1e-1
            assert t["params"]["bs"] % 32 == 0

    def test_export(self, tmp_path):
        ht = HyperTuning(lambda p: {"metric": -p["x"] ** 2},
                         {"x": ("uniform", 0, 1)},
                         algo="random", max_evals=3, early_stop=10)
        ht.run()
        p = str(tmp_path / "trials.jsonl")
        ht.export_result(p)
        assert len(open(p).readlines()) == 3


@pytest.fixture()
def atomic_dir(tmp_path):
    d = tmp_path
    (d / "toy.inter").write_text(
        "user_id:token\titem_id:token\trating:float\ttimestamp:float\n"
        "u1\ti1\t5\t100\nu1\ti2\t2\t101\nu2\ti1\t4\t102\nu2\ti3\t1\t103\n")
    (d / "toy.item").write_text(
        "item_id:token\tgenres:token_seq\n"
        "i1\taction comedy\ni2\tdrama\ni3\taction\n")
    (d / "toy.kg").write_text(
        "head_id:token\trelation_id:token\ttail_id:token\n"
        "e1\tdirected_by\te9\ne2\tdirected_by\te9\n")
    (d / "toy.link").write_text(
        "item_id:token\tentity_id:token\ni1\te1\ni2\te2\ni3\te3\n")
    return str(d)


class TestAtomic:
    def test_typed_parsing(self, atomic_dir):
        cols = load_atomic_file(os.path.join(atomic_dir, "toy.inter"))
        assert cols["rating"].dtype == np.float32
        assert cols["user_id"][0] == "u1"
        item = load_atomic_file(os.path.join(atomic_dir, "toy.item"))
        assert list(item["genres"][0]) == ["action", "comedy"]

    def test_bad_header_raises(self, tmp_path):
        p = tmp_path / "x.inter"
        p.write_text("user_id:token\tbad_col\nu1\t3\n")
        with pytest.raises(ValueError):
            load_atomic_file(str(p))

    def test_remap_contiguous_from_one(self):
        (a, b), vocab = remap_tokens([np.array(["x", "y", "x"], object),
                                      np.array(["y", "z"], object)])
        assert a.tolist() == [1, 2, 1]
        assert b.tolist() == [2, 3]
        assert vocab == {"x": 1, "y": 2, "z": 3}

    def test_full_load_and_bridges(self, atomic_dir):
        ds = load_atomic_dataset(atomic_dir, "toy")
        assert ds.num_users == 3 and ds.num_items == 4
        inter = ds.to_interactions(rating_field="rating",
                                   time_field="timestamp")
        assert len(inter) == 4
        kg = ds.to_knowledge_graph()
        # linked entities e1/e2 inherit item ids of i1/i2
        assert kg.heads.tolist() == [ds.item_vocab["i1"],
                                     ds.item_vocab["i2"]]
        assert kg.n_items == 4

    def test_filters_and_label(self, atomic_dir):
        cols = load_atomic_file(os.path.join(atomic_dir, "toy.inter"))
        kept = filter_by_value(cols, {"rating": (2, None)})
        assert len(kept["rating"]) == 3
        lab = label_by_threshold(kept, "rating", 4.0)
        assert lab["label"].tolist() == [1.0, 0.0, 1.0]


class TestIntrospection:
    def test_cost_and_params(self):
        import jax.numpy as jnp

        def f(x, w):
            return jnp.dot(x, w)

        x = jnp.ones((8, 16))
        w = jnp.ones((16, 4))
        cost = estimate_cost(f, x, w)
        assert cost["flops"] >= 2 * 8 * 16 * 4 * 0.5  # ≥ one MAC per output
        assert count_params({"a": x, "b": {"c": w}}) == 8 * 16 + 16 * 4

    def test_environment(self):
        env = get_environment()
        assert env["backend"] in ("cpu", "tpu", "axon")
        assert int(env["num_devices"]) >= 1


def test_wandb_logger_noop():
    wl = WandbLogger(enabled=False)
    wl.log_metrics({"a": 1.0}, step=0)   # must not raise
    wl.finish()
    wl2 = WandbLogger(enabled=True)      # wandb not installed → disabled
    wl2.log_metrics({"a": 1.0})
    wl2.finish()


def test_device_memory_stats():
    from recbox_tpu.utils.introspection import get_device_memory
    out = get_device_memory()
    assert isinstance(out, dict)   # CPU may report nothing; must not raise
    for v in out.values():
        assert v >= 0


def test_fit_resumes_from_checkpoint(tmp_path):
    """recbole resume_checkpoint semantics (`trainer.py:312-340`): load()
    restores params/opt/epoch/monitor and fit() continues from there."""
    import numpy as np
    from recbox_tpu.data import ArrayLoader
    from recbox_tpu.evaluation import CTREvaluator
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import DeepFM
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    n = 2000
    arrays = {"c": rng.integers(1, 30, n).astype(np.int32)}
    arrays["click"] = (arrays["c"] % 2).astype(np.float32)
    fm = FeatureMap("res", (
        FeatureSpec("c", "categorical", vocab_size=30, embedding_dim=8),),
        labels=("click",))
    ev = CTREvaluator({k: v[:400] for k, v in arrays.items()},
                      label="click", metrics=["AUC"])

    def make():
        return Trainer(
            DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,)),
            lambda o, b: binary_crossentropy(o, b["click"]),
            TrainerConfig(learning_rate=1e-2, epochs=3, patience=10,
                          monitor="AUC", lr_decay_factor=1.0,
                          reload_best_on_plateau=False, seed=5), eval_fn=ev)

    loader = ArrayLoader(arrays, batch_size=256, drop_last=True, seed=1)
    t1 = make()
    t1.fit(loader)                      # 3 epochs
    ckpt = str(tmp_path / "state.ckpt")
    t1.save(ckpt)
    steps_after_3 = t1.step

    t2 = make()
    t2.init(next(iter(loader)))
    t2.load(ckpt)
    assert t2.epoch == t1.epoch and t2.step == steps_after_3
    m = t2.fit(loader, epochs=5)        # continues: epochs 3..4 only
    assert t2.step == steps_after_3 + 2 * len(loader)
    assert m["AUC"] > 0.95


def test_fit_rejects_raw_valid_loader():
    import numpy as np
    import pytest
    from recbox_tpu.data import ArrayLoader
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import DeepFM
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import Trainer, TrainerConfig

    fm = FeatureMap("vl", (FeatureSpec("c", "categorical", vocab_size=5,
                                       embedding_dim=4),), labels=("click",))
    t = Trainer(DeepFM(feature_map=fm, embedding_dim=4, hidden_units=(8,)),
                lambda o, b: binary_crossentropy(o, b["click"]),
                TrainerConfig(monitor="AUC"))
    arrays = {"c": np.array([1, 2], np.int32),
              "click": np.array([1., 0.], np.float32)}
    loader = ArrayLoader(arrays, batch_size=2)
    with pytest.raises(TypeError, match="eval_fn"):
        t.fit(loader, valid_loader=loader)


def test_fit_resets_stopped_flag():
    """A second fit() after an early stop must train again."""
    import numpy as np
    from recbox_tpu.data import ArrayLoader
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import DeepFM
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    arrays = {"c": rng.integers(1, 20, 512).astype(np.int32)}
    arrays["click"] = (arrays["c"] % 2).astype(np.float32)
    fm = FeatureMap("st", (FeatureSpec("c", "categorical", vocab_size=20,
                                       embedding_dim=4),), labels=("click",))
    # constant metric -> never improves after the first eval -> early stop
    t = Trainer(DeepFM(feature_map=fm, embedding_dim=4, hidden_units=(8,)),
                lambda o, b: binary_crossentropy(o, b["click"]),
                TrainerConfig(learning_rate=1e-2, epochs=10, patience=1,
                              monitor="AUC", lr_decay_factor=1.0,
                              reload_best_on_plateau=False),
                eval_fn=lambda tr: {"AUC": 0.5})
    loader = ArrayLoader(arrays, batch_size=128, drop_last=True, seed=1)
    t.fit(loader)
    assert t._stopped
    steps = t.step
    t.fit(loader, epochs=t.epoch + 2)
    assert t.step > steps   # trained again despite the earlier stop


def test_peek_batch_has_no_epoch_side_effects():
    import numpy as np
    from recbox_tpu.data import ArrayLoader

    rng = np.random.default_rng(0)
    arrays = {"a": rng.integers(0, 9, 300).astype(np.int32)}
    l1 = ArrayLoader(arrays, batch_size=64, seed=3)
    l2 = ArrayLoader(arrays, batch_size=64, seed=3)
    _ = l1.peek_batch()
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1["a"], b2["a"])   # RNG untouched
    assert l1.peek_batch()["a"].shape == (64,)


class TestOrbaxCheckpointer:
    """Async sharded checkpointing (SURVEY §5.4 orbax upgrade)."""

    def test_roundtrip_with_trainer_state(self, tmp_path):
        import jax.numpy as jnp
        import numpy as np
        from recbox_tpu.training.checkpoint import OrbaxCheckpointer
        state = {
            "params": {"dense": {"w": jnp.arange(6.0).reshape(2, 3)}},
            "opt_state": {"m": jnp.ones(4)},
            "step": 7,
            "epoch": 2,
        }
        ckpt = OrbaxCheckpointer()
        ckpt.save(str(tmp_path / "ck"), state)
        ckpt.wait()       # async save barrier
        template = {
            "params": {"dense": {"w": jnp.zeros((2, 3))}},
            "opt_state": {"m": jnp.zeros(4)},
            "step": 0,
            "epoch": 0,
        }
        restored = ckpt.load(str(tmp_path / "ck"), template)
        np.testing.assert_allclose(
            np.asarray(restored["params"]["dense"]["w"]),
            np.arange(6.0).reshape(2, 3))
        assert restored["step"] == 7 and restored["epoch"] == 2
        ckpt.close()

    def test_meta_commits_only_after_wait(self, tmp_path):
        """Regression (round-2 ADVICE): the step/epoch meta JSON must not
        commit while the async array save may still be in flight — a crash
        would pair NEW meta with the PREVIOUS arrays. save() stages the
        meta; wait()/close()/the next save() commit it."""
        import os
        import jax.numpy as jnp
        from recbox_tpu.training.checkpoint import OrbaxCheckpointer
        ckpt = OrbaxCheckpointer()
        d = str(tmp_path / "ck")
        ckpt.save(d, {"w": jnp.ones(3), "step": 5})
        assert not os.path.exists(d + ".meta/state.json")   # staged only
        assert os.path.exists(d + ".meta/state.json.tmp")
        ckpt.wait()
        assert os.path.exists(d + ".meta/state.json")       # now durable
        restored = ckpt.load(d, {"w": jnp.zeros(3), "step": 0})
        assert restored["step"] == 5
        # save -> load with NO explicit wait(): load must flush the
        # in-flight save + staged meta itself (review finding round 3)
        ckpt.save(d, {"w": jnp.full(3, 2.0), "step": 9})
        restored = ckpt.load(d, {"w": jnp.zeros(3), "step": 0})
        assert restored["step"] == 9
        assert float(restored["w"][0]) == 2.0
        ckpt.close()

    def test_trainer_state_dict_contract(self, rng):
        """Trainer.state_dict() is orbax-saveable and restores into a
        fresh trainer via the same template."""
        import numpy as np
        from recbox_tpu.features import FeatureMap, FeatureSpec
        from recbox_tpu.models.ranking.ctr import LR
        from recbox_tpu.ops import binary_crossentropy
        from recbox_tpu.training import Trainer, TrainerConfig
        from recbox_tpu.training.checkpoint import OrbaxCheckpointer
        import tempfile
        fm = FeatureMap("ock", (
            FeatureSpec("a", "categorical", vocab_size=16, embedding_dim=4),),
            labels=("click",))
        batch = {"a": np.array([1, 2, 3], np.int32),
                 "click": np.array([1., 0., 1.], np.float32)}

        def make():
            return Trainer(LR(feature_map=fm),
                           lambda o, b: binary_crossentropy(o, b["click"]),
                           TrainerConfig(learning_rate=1e-2, monitor="AUC"))
        t1 = make()
        t1.init(batch)
        t1.train_step(dict(batch))
        ckpt = OrbaxCheckpointer()
        with tempfile.TemporaryDirectory() as td:
            ckpt.save(td + "/ck", t1.state_dict())
            ckpt.wait()
            t2 = make()
            t2.init(batch)
            restored = ckpt.load(td + "/ck", t2.state_dict())
            a = np.asarray(restored["params"]["linear"]["emb_a"])
            b = np.asarray(t1.params["linear"]["emb_a"])
            np.testing.assert_allclose(a, b)
            assert restored["step"] == 1
        ckpt.close()
