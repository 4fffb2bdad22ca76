"""Sharded training over a virtual 8-device CPU mesh.

The multi-host 'fake backend' (SURVEY §4): Mesh(('data','model')) over 8
forced host-platform devices; asserts (a) embedding tables are actually
row-sharded, (b) a sharded train step runs and matches the unsharded result.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from recbox_tpu.data import ArrayLoader
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.ctr import DeepFM
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.parallel import make_mesh, param_partition_specs
from recbox_tpu.training import Trainer, TrainerConfig


def _make_data(rng, n=512, vocab=64):
    arrays = {
        "cat_a": rng.integers(1, vocab, size=n).astype(np.int32),
        "cat_b": rng.integers(1, vocab, size=n).astype(np.int32),
        "click": (rng.random(n) > 0.5).astype(np.float32),
    }
    fm = FeatureMap("p", (
        FeatureSpec("cat_a", "categorical", vocab_size=vocab, embedding_dim=16),
        FeatureSpec("cat_b", "categorical", vocab_size=vocab, embedding_dim=16),
    ), labels=("click",))
    return fm, arrays


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = make_mesh(num_model_shards=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(num_model_shards=8)
    assert mesh.shape == {"data": 1, "model": 8}


def test_embedding_tables_row_sharded():
    rng = np.random.default_rng(0)
    fm, arrays = _make_data(rng)
    mesh = make_mesh(num_model_shards=4)
    model = DeepFM(feature_map=fm, embedding_dim=16, hidden_units=(16,))
    cfg = TrainerConfig(learning_rate=1e-3, epochs=1, monitor="AUC")
    trainer = Trainer(model, lambda o, b: binary_crossentropy(o, b["click"]),
                      cfg, mesh=mesh)
    loader = ArrayLoader(arrays, batch_size=64, drop_last=True)
    trainer.init(next(iter(loader)))
    # the partition metadata row-shards tables over the COMBINED grid
    specs = trainer.param_specs
    emb_spec = specs["embedding"]["emb_cat_a"]
    assert tuple(emb_spec) == (("data", "model"), None)
    # and the live array is actually sharded over all 8 devices
    table = trainer.params["embedding"]["emb_cat_a"]
    shard_shapes = {s.data.shape for s in table.addressable_shards}
    assert shard_shapes == {(64 // 8, 16)}


def test_sharded_step_matches_unsharded():
    rng = np.random.default_rng(1)
    fm, arrays = _make_data(rng)
    loader = ArrayLoader(arrays, batch_size=64, drop_last=True, shuffle=False)
    batch = next(iter(loader))
    batch.pop("__mask__", None)

    def make_trainer(mesh):
        model = DeepFM(feature_map=fm, embedding_dim=16, hidden_units=(16,))
        cfg = TrainerConfig(learning_rate=1e-2, epochs=1, monitor="AUC", seed=5)
        return Trainer(model, lambda o, b: binary_crossentropy(o, b["click"]),
                       cfg, mesh=mesh)

    t_plain = make_trainer(None)
    t_plain.init(batch)
    t_shard = make_trainer(make_mesh(num_model_shards=2))
    t_shard.init(batch)

    for _ in range(3):
        l_plain = t_plain.train_step(dict(batch))
        l_shard = t_shard.train_step(dict(batch))
    np.testing.assert_allclose(float(l_plain), float(l_shard), rtol=1e-4)
    a = np.asarray(t_plain.params["embedding"]["emb_cat_a"])
    b = np.asarray(t_shard.params["embedding"]["emb_cat_a"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_data_parallel_fit():
    rng = np.random.default_rng(2)
    fm, arrays = _make_data(rng, n=1024)
    mesh = make_mesh(num_model_shards=1)  # pure dp over 8 devices
    model = DeepFM(feature_map=fm, embedding_dim=16, hidden_units=(16,))
    cfg = TrainerConfig(learning_rate=1e-2, epochs=1, monitor="AUC")
    trainer = Trainer(model, lambda o, b: binary_crossentropy(o, b["click"]),
                      cfg, mesh=mesh)
    loader = ArrayLoader(arrays, batch_size=128, drop_last=True)
    for batch in loader:
        batch.pop("__mask__", None)
        loss = trainer.train_step(batch)
    assert np.isfinite(float(loss))


def test_packed_trainer_sharded_matches_unsharded():
    """PackedEmbeddingTrainer under a Mesh: packs row-shard over 'model',
    GSPMD partitions the gather/scatter, results match the no-mesh run."""
    from recbox_tpu.training.packed import PackedEmbeddingTrainer

    rng = np.random.default_rng(3)
    fm, arrays = _make_data(rng)
    loader = ArrayLoader(arrays, batch_size=64, drop_last=True, shuffle=False)
    batch = next(iter(loader))
    batch.pop("__mask__", None)

    def make_trainer(mesh):
        model = DeepFM(feature_map=fm, embedding_dim=16, hidden_units=(16,))
        cfg = TrainerConfig(learning_rate=1e-2, epochs=1, monitor="AUC",
                            seed=5)
        return PackedEmbeddingTrainer(
            model, lambda o, b: binary_crossentropy(o, b["click"]), cfg,
            mesh=mesh)

    t_plain = make_trainer(None)
    t_plain.init(batch)
    t_shard = make_trainer(make_mesh(num_model_shards=2))
    t_shard.init(batch)
    pack = next(iter(t_shard.packs.values()))
    assert len(pack.sharding.device_set) >= 2

    for _ in range(3):
        l_plain = t_plain.train_step(dict(batch))
        l_shard = t_shard.train_step(dict(batch))
    np.testing.assert_allclose(float(l_plain), float(l_shard), rtol=1e-4)
    a = np.asarray(t_plain.tables["embedding/emb_cat_a"])
    b = np.asarray(t_shard.tables["embedding/emb_cat_a"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_host_shard_loader_partitions_by_process(tmp_path):
    """Single-process run: host_shard_loader reads ALL shards; the
    partition args come from the live jax runtime."""
    import numpy as np
    from recbox_tpu.data import save_shards
    from recbox_tpu.parallel.distributed import host_shard_loader, process_info

    rng = np.random.default_rng(0)
    arrays = {"a": rng.integers(0, 9, 600).astype(np.int32)}
    save_shards(str(tmp_path), arrays, rows_per_shard=200)
    info = process_info()
    assert info["process_count"] == 1
    loader = host_shard_loader(str(tmp_path), batch_size=100, shuffle=False)
    rows = sum(int(b["__mask__"].sum()) for b in loader)
    assert rows == 600


def test_fused_steps_shard_over_data_axis():
    """train_steps_fused under a mesh must shard the stacked batches'
    batch dim over 'data' (previously replicated everywhere)."""
    rng = np.random.default_rng(5)
    fm, arrays = _make_data(rng, n=512)
    mesh = make_mesh(num_model_shards=2)
    model = DeepFM(feature_map=fm, embedding_dim=16, hidden_units=(16,))
    cfg = TrainerConfig(learning_rate=1e-2, epochs=1, monitor="AUC",
                        fused_steps=2)
    trainer = Trainer(model, lambda o, b: binary_crossentropy(o, b["click"]),
                      cfg, mesh=mesh)
    batch = {k: v[:64] for k, v in arrays.items()}
    batches = {k: np.stack([v, v]) for k, v in batch.items()}
    trainer.init(batch)
    losses = trainer.train_steps_fused(batches)
    assert losses.shape == (2,)
    assert np.isfinite(np.asarray(losses)).all()


def test_collective_bytes_scale_with_batch_not_vocab():
    """The sharded-embedding comm pattern must be id/row-exchange-shaped:
    growing the vocab 8x must NOT grow per-step collective bytes (a
    full-table all-gather / dense-grad all-reduce would). Guards the
    (('data','model'), None) combined-grid table sharding."""
    from recbox_tpu.parallel.inspect import collective_stats

    rng = np.random.default_rng(7)
    mesh = make_mesh(num_model_shards=4)

    def total_bytes(vocab):
        fm, arrays = _make_data(rng, n=256, vocab=vocab)
        model = DeepFM(feature_map=fm, embedding_dim=16, hidden_units=(16,))
        cfg = TrainerConfig(learning_rate=1e-3, monitor="AUC")
        t = Trainer(model, lambda o, b: binary_crossentropy(o, b["click"]),
                    cfg, mesh=mesh)
        loader = ArrayLoader(arrays, batch_size=64, drop_last=True)
        batch = next(iter(loader))
        batch.pop("__mask__", None)
        t.init(batch)
        step = t._build_train_step()
        dbatch = t._device_batch(batch)
        ops = collective_stats(step, t.params, t.model_state, t.opt_state,
                               dbatch, jax.random.PRNGKey(0))
        assert ops, "sharded step emitted no collectives at all?"
        return sum(o.bytes for o in ops)

    small, big = total_bytes(512), total_bytes(4096)
    assert big <= small * 1.25, (
        f"collective bytes grew with vocab: {small:,} -> {big:,}")


def test_bench_multichip_smoke_emits_json():
    """bench_multichip.py (hardware-ready mesh bench, VERDICT round-3
    item 4) must run its CPU smoke mode end-to-end and emit one JSON line
    with the mesh/scaling fields."""
    import json
    import os
    import subprocess
    import sys
    env = {**os.environ, "PYTHONPATH": "", "JAX_PLATFORMS": "cpu"}
    proc = subprocess.run(
        [sys.executable, "bench_multichip.py", "--smoke"],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["mesh"] == {"data": 4, "model": 2, "devices": 8}
    assert d["smoke"] is True and d["value"] > 0
    assert d["global_batch"] == 64 * 4      # per-chip batch x data shards
