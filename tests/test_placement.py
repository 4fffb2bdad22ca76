"""Table-placement planner tests (replicate vs row-shard per table).

RecShard/DreamShard-style static planning over the framework's measured
cost constants: small hot tables replicate (their tiny grad all-reduce
beats putting lookups on the id/row exchange path); large tables shard.
"""

import flax.linen as nn
import jax
import numpy as np
import pytest

from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.nn.embedding import FeatureEmbedding
from recbox_tpu.parallel import (
    apply_placement, plan_table_placement,
)


def test_planner_replicates_small_hot_and_shards_large():
    plans = plan_table_placement(
        {"gender": (4, 16), "country": (256, 16), "item_id": (2_000_000, 64)},
        n_devices=8, batch_size=8192)
    assert plans["gender"].replicate            # 256 B table, hot
    assert plans["country"].replicate           # 16 KB table
    assert not plans["item_id"].replicate       # 512 MB: exchange wins
    assert plans["gender"].step_saving_s > 0


def test_planner_respects_hbm_budget():
    # two medium tables, budget fits only one replicated copy
    shapes = {"a": (100_000, 64), "b": (100_000, 64)}
    full = 100_000 * 64 * 4
    plans = plan_table_placement(shapes, n_devices=8,
                                 hbm_budget_bytes=full,
                                 touches_per_step={"a": 1e9, "b": 1e9})
    n_repl = sum(p.replicate for p in plans.values())
    assert n_repl == 1                          # budget admits exactly one


def test_planner_never_replicates_when_saving_negative():
    # cold huge table: exchange cost tiny, all-reduce enormous
    plans = plan_table_placement({"cold": (5_000_000, 64)},
                                 touches_per_step={"cold": 10.0},
                                 n_devices=8)
    assert not plans["cold"].replicate


def test_apply_placement_writes_shard_table():
    fm = FeatureMap("pl", (
        FeatureSpec("gender", "categorical", vocab_size=4, embedding_dim=8),
        FeatureSpec("item_id", "categorical", vocab_size=2_000_000,
                    embedding_dim=64),
    ), labels=("y",))
    plans = plan_table_placement({"gender": (4, 8),
                                  "item_id": (2_000_000, 64)}, n_devices=8)
    fm2 = apply_placement(fm, plans)
    assert fm2["gender"].shard_table is False
    assert fm2["item_id"].shard_table is True
    assert fm["gender"].shard_table is None     # original untouched


def test_feature_embedding_honors_shard_table_flag():
    fm = FeatureMap("plc", (
        FeatureSpec("small", "categorical", vocab_size=8, embedding_dim=8,
                    shard_table=False),
        FeatureSpec("big", "categorical", vocab_size=64, embedding_dim=8),
    ), labels=("y",))
    mod = FeatureEmbedding(fm)
    v = mod.init(jax.random.PRNGKey(0),
                 {"small": np.arange(4), "big": np.arange(4)})
    specs = nn.get_partition_spec(v["params"])
    # replicated table: no partitioning metadata (empty spec)
    assert specs["emb_small"] == jax.sharding.PartitionSpec()
    # default table keeps the combined-grid row sharding
    assert specs["emb_big"] == jax.sharding.PartitionSpec(
        ("data", "model"), None)


def test_mixed_placement_trains_on_mesh():
    """One step of sharded training with a REPLICATED small table next to
    the default row-sharded table: compiles, runs, finite loss."""
    from recbox_tpu.data import ArrayLoader
    from recbox_tpu.models.ranking.ctr import DeepFM
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.parallel import make_mesh
    from recbox_tpu.training import Trainer, TrainerConfig

    fm = FeatureMap("plm", (
        FeatureSpec("gender", "categorical", vocab_size=4, embedding_dim=8,
                    shard_table=False),
        FeatureSpec("item_id", "categorical", vocab_size=64,
                    embedding_dim=8),
    ), labels=("y",))
    rng = np.random.default_rng(0)
    batch = {"gender": rng.integers(0, 4, 64).astype(np.int32),
             "item_id": rng.integers(0, 64, 64).astype(np.int32),
             "y": (rng.random(64) > 0.5).astype(np.float32)}
    mesh = make_mesh(num_model_shards=4)
    model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,))
    t = Trainer(model, lambda o, b: binary_crossentropy(o, b["y"]),
                TrainerConfig(learning_rate=1e-2, epochs=1, monitor="AUC"),
                mesh=mesh)
    t.init(batch)
    loss = float(t.train_step(batch))
    assert np.isfinite(loss)


def test_shard_table_false_survives_feature_map_roundtrip(tmp_path):
    fm = FeatureMap("plrt", (
        FeatureSpec("g", "categorical", vocab_size=4, embedding_dim=8,
                    shard_table=False),
        FeatureSpec("i", "categorical", vocab_size=64, embedding_dim=8),
    ), labels=("y",))
    path = str(tmp_path / "fm.json")
    fm.save(path)
    fm2 = FeatureMap.load(path)
    assert fm2["g"].shard_table is False          # the planner's decision
    assert fm2["i"].shard_table is None           # unset stays unset
