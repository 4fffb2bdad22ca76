"""Config system, autotuner expansion, and quick_start pipelines."""

import os

import numpy as np
import pytest
import yaml

from recbox_tpu.config import (
    Config, expand_tuner_space, grid_search, hash_expid, load_config,
    parse_cli_overrides, save_tuner_configs,
)
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models import get_model, list_models
from recbox_tpu.quick_start import (
    build_model, run_matching_experiment, run_ranking_experiment,
)


@pytest.fixture
def config_dir(tmp_path):
    model_cfg = {
        "Base": {"model": "DeepFM", "learning_rate": 1e-3, "batch_size": 512,
                 "embedding_dim": 8},
        "DeepFM_test": {"dataset_id": "synth", "hidden_units": [32, 16]},
        "LR_test": {"model": "LR", "dataset_id": "synth"},
    }
    dataset_cfg = {"synth": {"data_root": "./data", "metrics": ["AUC"]}}
    with open(tmp_path / "model_config.yaml", "w") as fh:
        yaml.safe_dump(model_cfg, fh)
    with open(tmp_path / "dataset_config.yaml", "w") as fh:
        yaml.safe_dump(dataset_cfg, fh)
    return str(tmp_path)


class TestConfig:
    def test_base_inheritance(self, config_dir):
        cfg = load_config(config_dir, "DeepFM_test")
        assert cfg.model == "DeepFM"            # from Base
        assert cfg.hidden_units == [32, 16]     # from section
        assert cfg.metrics == ["AUC"]           # from dataset
        assert cfg.experiment_id == "DeepFM_test"

    def test_section_overrides_base(self, config_dir):
        cfg = load_config(config_dir, "LR_test")
        assert cfg.model == "LR"

    def test_missing_expid(self, config_dir):
        with pytest.raises(KeyError):
            load_config(config_dir, "nope")

    def test_overrides_priority(self, config_dir):
        cfg = load_config(config_dir, "DeepFM_test",
                          overrides={"learning_rate": 0.5})
        assert cfg.learning_rate == 0.5

    def test_cli_parse_types(self):
        out = parse_cli_overrides(["--lr=0.01", "--units=[1,2]", "--name=abc"])
        assert out == {"lr": 0.01, "units": [1, 2], "name": "abc"}

    def test_hash_expid_deterministic(self):
        a = hash_expid({"lr": 0.1, "dim": 8}, "base")
        b = hash_expid({"dim": 8, "lr": 0.1}, "base")
        assert a == b and a.startswith("base_")


class TestTuner:
    def test_expansion(self):
        combos = expand_tuner_space(
            {"tuner_space": {"lr": [0.1, 0.01], "dim": [8, 16], "model": "LR"}})
        assert len(combos) == 4
        assert len({c["experiment_id"] for c in combos}) == 4

    def test_save_tuner_configs_loadable(self, tmp_path):
        expids = save_tuner_configs(
            {"base_expid": "t", "tuner_space": {"model": "LR", "learning_rate": [0.1, 0.2]}},
            str(tmp_path))
        assert len(expids) == 2
        cfg = load_config(str(tmp_path), expids[0])
        assert cfg.model == "LR"

    def test_grid_search_sorts_and_survives_failure(self):
        calls = []

        def run(params):
            calls.append(params)
            if params["lr"] == 0.2:
                raise RuntimeError("boom")
            return {"AUC": params["lr"]}

        results = grid_search({"tuner_space": {"lr": [0.1, 0.2, 0.3]}}, run)
        assert len(results) == 2  # failed combo skipped
        assert results[0]["metrics"]["AUC"] == 0.3  # best first


class TestRegistry:
    def test_registry_covers_stages(self):
        assert len(list_models()) >= 30
        for stage in ("matching", "ranking", "multitask", "sequential", "reranking"):
            assert list_models(stage)

    def test_get_model_case_insensitive(self):
        cls, stage = get_model("deepfm")
        assert stage == "ranking"
        with pytest.raises(KeyError):
            get_model("unknown_model")


class TestQuickStart:
    def _ctr_fixture(self):
        rng = np.random.default_rng(0)
        n, vocab = 2000, 16
        a = rng.integers(1, vocab, n).astype(np.int32)
        y = ((a % 2) == 0).astype(np.float32)
        arrays = {"cat_a": a, "click": y}
        fm = FeatureMap("qs", (
            FeatureSpec("cat_a", "categorical", vocab_size=vocab, embedding_dim=8),
        ), labels=("click",))
        return fm, arrays

    def test_run_ranking_experiment(self):
        fm, arrays = self._ctr_fixture()
        cfg = {"model": "FM", "embedding_dim": 8, "learning_rate": 0.05,
               "epochs": 3, "batch_size": 256, "monitor": "AUC",
               "lr_decay_factor": 1.0, "reload_best_on_plateau": False,
               "patience": 5}
        result = run_ranking_experiment(cfg, fm, arrays, arrays,
                                        test_arrays=arrays)
        assert result["AUC"] > 0.9           # separable signal
        assert result["test_AUC"] > 0.9

    def test_build_model_passes_dataclass_fields(self):
        fm, _ = self._ctr_fixture()
        model, stage = build_model(
            {"model": "DeepFM", "embedding_dim": 4, "hidden_units": [8, 4],
             "irrelevant_key": 1}, fm)
        assert stage == "ranking"
        assert model.hidden_units == (8, 4)

    def test_run_matching_experiment(self):
        rng = np.random.default_rng(1)
        n_users, n_items, n = 32, 64, 800
        users = rng.integers(0, n_users, n).astype(np.int32)
        items = ((users % 4) * 16 + rng.integers(0, 16, n)).astype(np.int32)
        fm = FeatureMap("m", (
            FeatureSpec("user_id", "categorical", "user", vocab_size=n_users,
                        embedding_dim=16),
            FeatureSpec("item_id", "categorical", "item", vocab_size=n_items,
                        embedding_dim=16)),
            query_index="user_id", corpus_index="item_id", num_items=n_items)
        t_u2i = {}
        for u, i in zip(users, items):
            t_u2i.setdefault(int(u), []).append(int(i))
        v_u2i = {u: [((u % 4) * 16 + 7)] for u in range(n_users)}
        uu = np.arange(n_users, dtype=np.int32)
        cfg = {"model": "MF", "embedding_dim": 16, "learning_rate": 0.05,
               "epochs": 2, "batch_size": 256, "num_negs": 5,
               "monitor": "Recall(k=20)", "lr_decay_factor": 1.0,
               "reload_best_on_plateau": False}
        result = run_matching_experiment(
            cfg, fm, {"user_id": users, "item_id": items},
            {"item_id": np.arange(n_items, dtype=np.int32)},
            {"user_id": uu}, uu, t_u2i, v_u2i)
        assert "Recall(k=20)" in result


def test_run_sequential_experiment():
    import numpy as np
    from recbox_tpu.data.sequential import leave_one_out_split
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.quick_start import run_sequential_experiment

    rng = np.random.default_rng(3)
    n_items = 30
    seqs = {}
    for u in range(200):
        start = rng.integers(1, n_items + 1)
        seqs[u] = np.array([(start + k - 1) % n_items + 1 for k in range(10)])
    train, valid, test = leave_one_out_split(seqs, max_len=8)
    fm = FeatureMap(
        "qseq", (FeatureSpec("item_id", "categorical", source="item",
                             vocab_size=n_items + 1, embedding_dim=16),),
        query_index="user_id", corpus_index="item_id", num_items=n_items + 1)
    cfg = {"model": "SASRec", "embedding_dim": 32, "max_seq_len": 8,
           "n_layers": 1, "n_heads": 2, "dropout": 0.0,
           "learning_rate": 5e-3, "epochs": 8, "batch_size": 256,
           "monitor": "NDCG(k=10)", "lr_decay_factor": 1.0,
           "reload_best_on_plateau": False, "patience": 8}
    result = run_sequential_experiment(cfg, fm, train, valid, test)
    assert result["test_Recall(k=10)"] > 0.7, result


def test_run_rerank_experiment():
    import numpy as np
    from recbox_tpu.quick_start import run_rerank_experiment

    rng = np.random.default_rng(0)
    B, N, D = 128, 8, 6
    feats = rng.normal(size=(B, N, D)).astype(np.float32)
    labels = (feats[..., 0] > 0).astype(np.float32)
    mask = np.ones((B, N), bool)
    lists = {"item_feats": feats, "labels": labels, "mask": mask}
    v = {k: a[:32] for k, a in lists.items()}
    t = {k: a[32:] for k, a in lists.items()}
    cfg = {"model": "PRM", "d_model": 16, "n_layers": 1, "n_heads": 2,
           "max_list_len": N, "learning_rate": 1e-2, "epochs": 8,
           "batch_size": 32, "monitor": "MAP@5", "lr_decay_factor": 1.0,
           "reload_best_on_plateau": False}
    result = run_rerank_experiment(cfg, t, v)
    assert result["MAP@5"] > 0.8, result


def test_model_config_yaml_roundtrip(tmp_path):
    """Generated per-model defaults (properties/model/*.yaml analog) feed
    straight back into build_model."""
    import yaml
    from tools.dump_model_configs import main as dump
    from recbox_tpu.quick_start import build_model
    from recbox_tpu.features import FeatureMap, FeatureSpec

    n = dump(str(tmp_path))
    assert n > 100
    cfg = yaml.safe_load(open(tmp_path / "deepfm.yaml"))
    fm = FeatureMap("t", (FeatureSpec("c0", "categorical", vocab_size=10,
                                      embedding_dim=8),), labels=("y",))
    model, stage = build_model(cfg, fm)
    assert stage == "ranking"
    assert model.hidden_units == (400, 400, 400)


def test_run_kg_experiment():
    """One-call KG pipeline: alternating CF + kg_loss phases (KGTrainer)."""
    import numpy as np
    from recbox_tpu.data.knowledge import KnowledgeGraph
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.quick_start import run_kg_experiment

    rng = np.random.default_rng(4)
    n_users, n_items, n_blocks = 60, 48, 4
    ub = rng.integers(0, n_blocks, size=n_users)
    ib = np.arange(n_items) % n_blocks
    users, items = [], []
    for u in range(n_users):
        block = np.flatnonzero(ib == ub[u])
        chosen = rng.choice(block, size=8, replace=False)
        users += [u] * 6
        items += list(chosen[:6])
    users, items = np.array(users, np.int32), np.array(items, np.int32)
    # hold out one item per user for eval
    train_u2i, valid_u2i = {}, {}
    for u in range(n_users):
        mine = items[users == u]
        train_u2i[u] = [int(i) for i in mine[:-1]]
        valid_u2i[u] = [int(mine[-1])]
    tr_users = np.concatenate([[u] * len(v) for u, v in train_u2i.items()])
    tr_items = np.concatenate([v for v in train_u2i.values()])

    kg = KnowledgeGraph(heads=np.arange(n_items),
                        relations=np.full(n_items, 1),
                        tails=n_items + ib,
                        n_entities=n_items + n_blocks, n_relations=2,
                        n_items=n_items)
    fm = FeatureMap(
        "kgq", (FeatureSpec("user_id", "categorical", source="user",
                            vocab_size=n_users, embedding_dim=16),
                FeatureSpec("item_id", "categorical", source="item",
                            vocab_size=n_items, embedding_dim=16)),
        query_index="user_id", corpus_index="item_id", num_items=n_items)

    cfg = {"model": "CKE", "embedding_dim": 16, "kg_dim": 8,
           "num_users": n_users, "num_items": n_items,
           "n_entities": n_items + n_blocks, "n_relations": 2,
           "learning_rate": 5e-2, "epochs": 8, "patience": 6,
           "batch_size": 128, "num_negs": 2, "kg_batch_size": 64,
           "monitor": "Recall(k=20)", "lr_decay_factor": 1.0,
           "reload_best_on_plateau": False}
    uu = np.arange(n_users)
    result = run_kg_experiment(
        cfg, fm, {"user_id": tr_users.astype(np.int32),
                  "item_id": tr_items.astype(np.int32)},
        {"item_id": np.arange(n_items, dtype=np.int32)}, kg,
        {"user_id": uu.astype(np.int32)}, uu, train_u2i, valid_u2i)
    assert result["Recall(k=20)"] > 0.5, result


def test_sequential_uni_protocol(rng):
    """run_sequential_experiment(eval_protocol='uni20') ranks the target
    against sampled negatives; uni metrics >= full-sort metrics."""
    from recbox_tpu.quick_start import run_sequential_experiment
    from recbox_tpu.features import FeatureMap, FeatureSpec
    V, L, n = 30, 6, 600
    seqs = rng.integers(1, V, size=(n, L)).astype(np.int32)
    targets = ((seqs[:, -1] + 1) % (V - 1) + 1).astype(np.int32)
    fm = FeatureMap(
        "sq", (FeatureSpec("item_id", "categorical", vocab_size=V,
                           embedding_dim=8),),
        corpus_index="item_id", num_items=V)
    base = dict(model="GRU4Rec", embedding_dim=8, hidden_size=8,
                learning_rate=1e-2, epochs=3, batch_size=128,
                monitor="Recall(k=10)", patience=5, max_seq_len=L)
    arrays = {"item_seq": seqs, "seq_len": np.full(n, L, np.int32),
              "item_id": targets, "user_id": np.arange(n, dtype=np.int32)}
    out_full = run_sequential_experiment({**base}, fm, arrays, arrays)
    out_uni = run_sequential_experiment(
        {**base, "eval_protocol": "uni20"}, fm, arrays, arrays)
    assert out_uni["Recall(k=10)"] >= out_full["Recall(k=10)"] - 1e-9
    assert 0 <= out_uni["NDCG(k=10)"] <= 1
