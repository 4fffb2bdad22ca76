"""Native C++ retrieval kernels: exact-vs-numpy agreement, IVF recall,
negative-sampler exclusion, and fallback behavior."""

import numpy as np
import pytest

from recbox_tpu.retrieval.native import (
    IVFFlatIndex, exact_topk, load_native, native_available,
    sample_negatives_native,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    items = rng.normal(size=(2000, 32)).astype(np.float32)
    queries = rng.normal(size=(64, 32)).astype(np.float32)
    return queries, items


def test_native_builds_and_loads():
    assert native_available(), "g++ toolchain is baked in; build must work"


def test_exact_topk_matches_numpy(data):
    queries, items = data
    scores, ids = exact_topk(queries, items, k=10)
    full = queries @ items.T
    ref_ids = np.argsort(-full, axis=1)[:, :10]
    ref_scores = np.take_along_axis(full, ref_ids, axis=1)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-5)
    # ids may differ only on exact ties; scores are the contract
    agree = (ids == ref_ids).mean()
    assert agree > 0.99


def test_exact_topk_k_larger_than_corpus():
    rng = np.random.default_rng(1)
    items = rng.normal(size=(5, 8)).astype(np.float32)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    scores, ids = exact_topk(q, items, k=10)
    assert scores.shape == (3, 5) and ids.shape == (3, 5)


def test_ivf_recall_vs_exact(data):
    queries, items = data
    _, exact_ids = exact_topk(queries, items, k=10)
    # isotropic gaussian corpora are IVF's worst case (no cluster structure)
    # — probe half the lists and expect solid-but-not-exact recall
    index = IVFFlatIndex(nlist=32, nprobe=16, kmeans_iters=8).fit(items)
    _, ivf_ids = index.search(queries, k=10)
    recall = np.mean([
        len(set(ivf_ids[q]) & set(exact_ids[q])) / 10
        for q in range(len(queries))])
    assert recall > 0.75, recall
    # full probe = exact
    index_full = IVFFlatIndex(nlist=16, nprobe=16, kmeans_iters=5).fit(items)
    _, full_ids = index_full.search(queries, k=10)
    recall_full = np.mean([
        len(set(full_ids[q]) & set(exact_ids[q])) / 10
        for q in range(len(queries))])
    assert recall_full > 0.999


def test_ivf_lists_partition_items(data):
    _, items = data
    index = IVFFlatIndex(nlist=16, kmeans_iters=3).fit(items)
    assert sorted(index.list_ids.tolist()) == list(range(len(items)))
    assert index.list_offsets[-1] == len(items)


def test_negative_sampler_excludes_positives():
    pos = np.arange(500, dtype=np.int32) % 37
    out = sample_negatives_native(pos, n_items=37, num_negs=16, seed=3)
    assert out.shape == (500, 16)
    assert (out != pos[:, None]).all()
    assert out.min() >= 0 and out.max() < 37
    # roughly uniform over the remaining ids
    counts = np.bincount(out.reshape(-1), minlength=37)
    assert counts.max() < counts[counts > 0].mean() * 1.5


def test_numpy_fallback_paths(monkeypatch, data):
    import recbox_tpu.retrieval.native as nat
    monkeypatch.setattr(nat, "load_native", lambda rebuild=False: None)
    queries, items = data
    s1, i1 = nat.exact_topk(queries, items, k=5)
    full = queries @ items.T
    ref = np.sort(full, axis=1)[:, ::-1][:, :5]
    np.testing.assert_allclose(s1, ref, rtol=1e-5)
    idx = nat.IVFFlatIndex(nlist=8, nprobe=8, kmeans_iters=3).fit(items)
    s2, i2 = idx.search(queries, k=5)
    assert np.isfinite(s2).all()
    out = nat.sample_negatives_native(np.zeros(10, np.int32), 5, 4)
    assert (out != 0).all()


def test_vocab_encode_native_matches_dict():
    import numpy as np
    from recbox_tpu.retrieval.native import native_available, vocab_encode_native
    if not native_available():
        import pytest
        pytest.skip("no native lib")
    rng = np.random.default_rng(0)
    vocab = {str(v): i + 1 for i, v in enumerate(rng.permutation(5000))}
    vals = rng.integers(0, 8000, 50_000).astype(str)   # ~37% OOV
    out = vocab_encode_native(vals, vocab, oov=0)
    want = np.asarray([vocab.get(v, 0) for v in vals], np.int32)
    np.testing.assert_array_equal(out, want)
    # raw bytes ('S') input declines the fast path: str(b'x') == "b'x'"
    # would diverge from the Tokenizer's dict semantics
    assert vocab_encode_native(vals.astype("S"), vocab, oov=0) is None
    # unicode tokens fall back to utf-8 encoding and still resolve
    uvocab = {"héllo": 1, "wörld": 2, "plain": 3}
    uvals = np.asarray(["héllo", "nope", "plain", "wörld"])
    got = vocab_encode_native(uvals, uvocab, oov=0)
    np.testing.assert_array_equal(got, [1, 0, 3, 2])


def test_tokenizer_encode_uses_native_above_threshold():
    import numpy as np
    from recbox_tpu.features.tokenizer import Tokenizer
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 3000, 10_000).astype(str)
    t = Tokenizer()
    t.fit(vals[:5000])
    got = t.encode_category(vals)              # len >= 4096 -> native
    get = t.vocab.get
    want = np.asarray([get(v, t.oov_token) for v in vals], np.int32)
    np.testing.assert_array_equal(got, want)
    # nulls in object arrays still map to OOV
    obj = np.asarray(list(vals[:5000]) + [None, np.nan], object)
    got2 = t.encode_category(obj)
    assert got2[-1] == t.oov_token and got2[-2] == t.oov_token
