"""Regression tests for the round-2 native/quick_start review findings."""

import numpy as np
import pytest


def test_exact_topk_rejects_dim_mismatch():
    from recbox_tpu.retrieval.native import exact_topk
    q = np.random.default_rng(0).normal(size=(4, 64)).astype(np.float32)
    items = np.random.default_rng(1).normal(size=(32, 32)).astype(np.float32)
    with pytest.raises(ValueError, match="dim mismatch"):
        exact_topk(q, items, k=5)


def test_ivf_rejects_zero_kmeans_iters():
    from recbox_tpu.retrieval.native import IVFFlatIndex
    with pytest.raises(ValueError, match="kmeans_iters"):
        IVFFlatIndex(kmeans_iters=0)


def test_truncated_shard_surfaces_error(tmp_path):
    from recbox_tpu.data.native_shards import (
        NativeShardStream, native_reader_available)
    if not native_reader_available():
        pytest.skip("native reader unavailable")
    good = tmp_path / "good.npz"
    np.savez(str(good), a=np.arange(8, dtype=np.float32))
    raw = good.read_bytes()
    bad = tmp_path / "bad.npz"
    bad.write_bytes(raw[: len(raw) // 3])       # truncated partial write
    stream = NativeShardStream([str(bad)], prefetch=1)
    with pytest.raises(Exception):              # per-shard error, no abort
        for _ in stream:
            pass


def test_native_reader_roundtrips_scalar_members(tmp_path):
    from recbox_tpu.data.native_shards import (
        NativeShardStream, native_reader_available)
    if not native_reader_available():
        pytest.skip("native reader unavailable")
    path = tmp_path / "s.npz"
    np.savez(str(path), rows=np.arange(6, dtype=np.int64),
             n_rows=np.int64(1234))
    parts = list(NativeShardStream([str(path)], prefetch=1))
    assert len(parts) == 1
    part = parts[0]
    ref = np.load(str(path))
    assert part["n_rows"].shape == ref["n_rows"].shape == ()
    assert int(part["n_rows"]) == 1234
    np.testing.assert_array_equal(part["rows"], ref["rows"])


def test_itemknn_keeps_topk_per_target_column():
    from recbox_tpu.models.matching.traditional import ItemKNN
    # 3 users, 4 items; item 3 co-occurs mostly with item 0
    users = np.array([0, 0, 1, 1, 2, 2, 2])
    items = np.array([0, 3, 0, 1, 0, 2, 3])
    m = ItemKNN(topk=1).fit(users, items, 3, 4)
    S = np.asarray(m.S)
    # each COLUMN keeps exactly its single best neighbor (plus ties)
    nonzero_per_col = (S > 0).sum(axis=0)
    assert np.all(nonzero_per_col >= 1)
    for j in range(4):
        col = S[:, j]
        kept = col[col > 0]
        # every kept entry is the column max (topk=1 semantics)
        assert np.allclose(kept, col.max())


def test_rerank_pipeline_evaluates_per_epoch():
    """run_rerank_experiment now wires eval_fn: the monitor sees per-epoch
    metrics (best epoch recorded, early stop live) instead of silently
    never evaluating."""
    from recbox_tpu.quick_start import run_rerank_experiment
    rng = np.random.default_rng(0)
    n, N, D = 256, 8, 4
    def lists(m):
        feats = rng.normal(size=(m, N, D)).astype(np.float32)
        labels = (feats[:, :, 0] > 0.5).astype(np.float32)
        return {"item_feats": feats, "labels": labels,
                "mask": np.ones((m, N), np.float32)}
    out = run_rerank_experiment(
        {"model": "PRM", "d_model": 16, "n_layers": 1, "n_heads": 2,
         "max_list_len": N, "epochs": 2, "patience": 5,
         "monitor": "NDCG@5", "learning_rate": 3e-3},
        lists(n), lists(64))
    assert "NDCG@5" in out and np.isfinite(out["NDCG@5"])
