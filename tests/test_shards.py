"""Shard IO + streaming ShardLoader semantics."""

import numpy as np
import pytest

from recbox_tpu.data import ShardLoader, load_shards, save_shards
from recbox_tpu.data.shards import shard_meta


def _arrays(rng, n=1000):
    return {"a": rng.integers(0, 50, n).astype(np.int32),
            "x": rng.normal(size=(n, 3)).astype(np.float32),
            "y": (rng.random(n) > 0.5).astype(np.float32)}


def test_save_load_roundtrip(rng, tmp_path):
    arrays = _arrays(rng)
    files = save_shards(str(tmp_path), arrays, rows_per_shard=300)
    assert len(files) == 4
    meta = shard_meta(str(tmp_path))
    assert meta["num_samples"] == 1000
    assert meta["columns"]["x"]["shape"] == [3]
    back = load_shards(str(tmp_path))
    for k in arrays:
        np.testing.assert_array_equal(arrays[k], back[k])


def test_loader_covers_every_row_once_with_static_shapes(rng, tmp_path):
    arrays = _arrays(rng, n=1001)
    save_shards(str(tmp_path), arrays, rows_per_shard=300)
    loader = ShardLoader(str(tmp_path), batch_size=128, shuffle=True, seed=0)
    assert loader.num_samples == 1001
    assert len(loader) == 8
    seen = []
    for batch in loader:
        assert batch["a"].shape == (128,)
        assert batch["x"].shape == (128, 3)
        mask = batch.pop("__mask__").astype(bool)
        seen.append(batch["a"][mask])
    got = np.sort(np.concatenate(seen))
    np.testing.assert_array_equal(got, np.sort(arrays["a"]))


def test_loader_drop_last_and_cross_shard_carry(rng, tmp_path):
    arrays = _arrays(rng, n=950)
    save_shards(str(tmp_path), arrays, rows_per_shard=300)  # 300*3 + 50
    loader = ShardLoader(str(tmp_path), batch_size=256, shuffle=False,
                         drop_last=True)
    batches = list(loader)
    # batches must chain ACROSS shard boundaries: 950 // 256 = 3 batches
    assert len(batches) == 3
    flat = np.concatenate([b["a"] for b in batches])
    np.testing.assert_array_equal(flat, arrays["a"][:768])


def test_loader_epoch_reshuffles(rng, tmp_path):
    arrays = _arrays(rng, n=600)
    save_shards(str(tmp_path), arrays, rows_per_shard=200)
    loader = ShardLoader(str(tmp_path), batch_size=100, seed=3)
    e1 = np.concatenate([b["a"] for b in loader])
    e2 = np.concatenate([b["a"] for b in loader])
    assert not np.array_equal(e1, e2)
    np.testing.assert_array_equal(np.sort(e1), np.sort(e2))


def test_multi_reader_partition(rng, tmp_path):
    arrays = _arrays(rng, n=900)
    save_shards(str(tmp_path), arrays, rows_per_shard=300)
    parts = []
    for i in range(3):
        loader = ShardLoader(str(tmp_path), batch_size=100, shuffle=False,
                             shard_index=i, num_shard_readers=3)
        assert loader.num_samples == 300
        parts.append(np.concatenate(
            [b["a"][b["__mask__"].astype(bool)] for b in loader]))
    got = np.sort(np.concatenate(parts))
    np.testing.assert_array_equal(got, np.sort(arrays["a"]))


def test_loader_feeds_trainer_fit(rng, tmp_path):
    from recbox_tpu.evaluation import CTREvaluator
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import DeepFM
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import Trainer, TrainerConfig

    n = 2000
    a = rng.integers(1, 40, n).astype(np.int32)
    y = (a % 2).astype(np.float32)
    save_shards(str(tmp_path), {"a": a, "click": y}, rows_per_shard=512)
    fm = FeatureMap("sh", (
        FeatureSpec("a", "categorical", vocab_size=40, embedding_dim=8),),
        labels=("click",))
    tr = Trainer(DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,)),
                 lambda o, b: binary_crossentropy(o, b["click"]),
                 TrainerConfig(learning_rate=1e-2, epochs=4, patience=6,
                               monitor="AUC", lr_decay_factor=1.0,
                               reload_best_on_plateau=False),
                 eval_fn=CTREvaluator({"a": a[:300], "click": y[:300]},
                                      label="click", metrics=["AUC"]))
    loader = ShardLoader(str(tmp_path), batch_size=256, drop_last=True,
                         seed=1)
    metrics = tr.fit(loader)
    assert metrics["AUC"] > 0.95, metrics


def test_save_shards_removes_stale_parts(rng, tmp_path):
    big = _arrays(rng, n=1000)
    save_shards(str(tmp_path), big, rows_per_shard=100)   # 10 parts
    small = _arrays(rng, n=250)
    save_shards(str(tmp_path), small, rows_per_shard=100)  # 3 parts
    back = load_shards(str(tmp_path))
    assert len(back["a"]) == 250
    loader = ShardLoader(str(tmp_path), batch_size=100, shuffle=False)
    rows = sum(int(b["__mask__"].sum()) for b in loader)
    assert rows == 250


def test_multi_reader_counts_from_meta_with_uneven_tail(rng, tmp_path):
    arrays = _arrays(rng, n=950)                 # shards: 300,300,300,50
    save_shards(str(tmp_path), arrays, rows_per_shard=300)
    counts = []
    for i in range(3):
        loader = ShardLoader(str(tmp_path), batch_size=64, shuffle=False,
                             shard_index=i, num_shard_readers=3)
        got = sum(int(b["__mask__"].sum()) for b in loader)
        assert got == loader.num_samples, (i, got, loader.num_samples)
        counts.append(got)
    assert sum(counts) == 950


def test_abandoned_iterator_does_not_block_producer(rng, tmp_path):
    import gc
    import threading
    import time
    arrays = _arrays(rng, n=3000)
    save_shards(str(tmp_path), arrays, rows_per_shard=200)  # 15 shards
    loader = ShardLoader(str(tmp_path), batch_size=100, prefetch=1)
    before = threading.active_count()
    for _ in range(5):
        it = iter(loader)
        next(it)                      # peek one batch, then abandon
        del it
        gc.collect()
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, (
        "producer threads leaked after abandoned iteration")


class TestNativeShardReader:
    """C++ decoder pool (`native/shard_reader.cpp`) == numpy path,
    bit-for-bit."""

    def test_available(self):
        from recbox_tpu.data.native_shards import native_reader_available
        assert native_reader_available()   # g++ is baked into this image

    def test_stream_decodes_identically(self, tmp_path):
        from recbox_tpu.data.native_shards import NativeShardStream
        from recbox_tpu.data import save_shards
        rng = np.random.default_rng(0)
        arrays = {
            "f32": rng.normal(size=(700, 3)).astype(np.float32),
            "i64": rng.integers(0, 9, 700).astype(np.int64),
            "i32": rng.integers(0, 9, (700, 2)).astype(np.int32),
            "f64": rng.normal(size=700),
            "b": (rng.random(700) > 0.5),
        }
        files = save_shards(str(tmp_path), arrays, rows_per_shard=256)
        parts = list(NativeShardStream(files, prefetch=2, n_threads=3))
        assert len(parts) == len(files)
        for f, part in zip(files, parts):
            ref = dict(np.load(f))
            assert set(part) == set(ref)
            for k in ref:
                assert part[k].dtype == ref[k].dtype, k
                np.testing.assert_array_equal(part[k], ref[k])

    def test_loader_backends_bitwise_equal(self, tmp_path):
        from recbox_tpu.data.shards import ShardLoader
        from recbox_tpu.data import save_shards
        rng = np.random.default_rng(1)
        arrays = {"x": rng.normal(size=(1000, 4)).astype(np.float32),
                  "y": rng.integers(0, 5, 1000).astype(np.int32)}
        save_shards(str(tmp_path), arrays, rows_per_shard=300)

        def batches(backend):
            loader = ShardLoader(str(tmp_path), batch_size=128, seed=7,
                                 reader_backend=backend)
            return list(loader)

        a = batches("numpy")
        b = batches("native")
        assert len(a) == len(b)
        for ba, bb in zip(a, b):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k])

    def test_error_surfaces(self, tmp_path):
        from recbox_tpu.data.native_shards import NativeShardStream
        bad = tmp_path / "part-000.npz"
        bad.write_bytes(b"not a zip file at all")
        with pytest.raises(IOError, match="native shard reader"):
            list(NativeShardStream([str(bad)]))
