"""BruteForceMIPS: exactness vs numpy argsort, sharded merge, cosine metric."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recbox_tpu.parallel import make_mesh
from recbox_tpu.retrieval import BruteForceMIPS, chunked_topk


@pytest.fixture
def data(rng):
    items = rng.normal(size=(1000, 16)).astype(np.float32)
    queries = rng.normal(size=(37, 16)).astype(np.float32)
    return items, queries


def _oracle(queries, items, topk):
    scores = queries @ items.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :topk]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_single_device_exact(data):
    items, queries = data
    index = BruteForceMIPS(items, chunk_size=128, method="exact_sort")
    s, i = index.search(queries, topk=25)
    es, ei = _oracle(queries, items, 25)
    np.testing.assert_allclose(s, es, rtol=1e-4)
    # indices may differ on exact ties; scores must match — verify by score
    np.testing.assert_allclose(
        np.take_along_axis(queries @ items.T, i, axis=1), es, rtol=1e-4)


def test_topk_larger_than_chunk(data):
    items, queries = data
    index = BruteForceMIPS(items, chunk_size=64, method="exact_sort")
    s, i = index.search(queries, topk=100)
    es, _ = _oracle(queries, items, 100)
    np.testing.assert_allclose(s, es, rtol=1e-4)


def test_sharded_matches_oracle(data):
    items, queries = data
    mesh = make_mesh(num_model_shards=8)
    index = BruteForceMIPS(items, mesh=mesh, method="exact_sort")
    s, i = index.search(queries, topk=25)
    es, _ = _oracle(queries, items, 25)
    np.testing.assert_allclose(s, es, rtol=1e-4)


def test_sharded_uneven_items(rng):
    # 1003 items over 8 shards → padding rows must never be returned
    items = rng.normal(size=(1003, 8)).astype(np.float32)
    queries = rng.normal(size=(5, 8)).astype(np.float32)
    mesh = make_mesh(num_model_shards=8)
    index = BruteForceMIPS(items, mesh=mesh, method="exact_sort")
    s, i = index.search(queries, topk=50)
    assert (i < 1003).all()
    es, _ = _oracle(queries, items, 50)
    np.testing.assert_allclose(s, es, rtol=1e-4)


def test_cosine_metric(rng):
    items = rng.normal(size=(100, 8)).astype(np.float32)
    queries = rng.normal(size=(4, 8)).astype(np.float32)
    index = BruteForceMIPS(items, metric="cosine", method="exact_sort")
    s, i = index.search(queries, topk=10)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    inn = items / np.linalg.norm(items, axis=1, keepdims=True)
    es, _ = _oracle(qn, inn, 10)
    np.testing.assert_allclose(s, es, rtol=1e-4)
    assert np.all(s <= 1 + 1e-5)


def test_topk_capped_to_corpus(rng):
    items = rng.normal(size=(10, 4)).astype(np.float32)
    index = BruteForceMIPS(items)
    s, i = index.search(rng.normal(size=(2, 4)).astype(np.float32), topk=500)
    assert s.shape == (2, 10)


def test_refined_two_phase_matches_oracle(rng):
    items = rng.normal(size=(5000, 16)).astype(np.float32)
    queries = rng.normal(size=(64, 16)).astype(np.float32)
    index = BruteForceMIPS(items, method="refined")
    s, i = index.search(queries, topk=20)
    es, _ = _oracle(queries, items, 20)
    np.testing.assert_allclose(s, es, rtol=1e-4)


def test_approx_high_recall(rng):
    items = rng.normal(size=(20000, 16)).astype(np.float32)
    queries = rng.normal(size=(64, 16)).astype(np.float32)
    index = BruteForceMIPS(items, method="approx", recall_target=0.95)
    s, i = index.search(queries, topk=50)
    _, ei = _oracle(queries, items, 50)
    recall = np.mean([len(set(i[r]) & set(ei[r])) / 50 for r in range(64)])
    assert recall > 0.85, recall


def test_sharded_approx_mode(rng):
    items = rng.normal(size=(4096, 16)).astype(np.float32)
    queries = rng.normal(size=(32, 16)).astype(np.float32)
    mesh = make_mesh(num_model_shards=8)
    index = BruteForceMIPS(items, mesh=mesh, method="approx", bf16=False)
    s, i = index.search(queries, topk=20)
    _, ei = _oracle(queries, items, 20)
    recall = np.mean([len(set(i[r]) & set(ei[r])) / 20 for r in range(32)])
    assert recall > 0.85, recall


def test_segmented_mips_topk_recall():
    """Segment-merge path: high overlap with the exact oracle."""
    import numpy as np
    from recbox_tpu.retrieval.index import (
        BruteForceMIPS, chunked_topk, segmented_mips_topk,
    )
    rng = np.random.default_rng(0)
    items = rng.normal(size=(20_000, 32)).astype(np.float32)
    queries = rng.normal(size=(64, 32)).astype(np.float32)
    k = 100
    _, exact = chunked_topk(queries, items, k, chunk_size=4096)
    s, ids = segmented_mips_topk(queries, items, k, query_chunk=64,
                                 n_segments=8)
    assert ids.shape == (64, k)
    exact = np.asarray(exact)
    ids = np.asarray(ids)
    recall = np.mean([len(set(a.tolist()) & set(b.tolist())) / k
                      for a, b in zip(ids, exact)])
    assert recall > 0.9, recall
    # scores are the true inner products of the returned items
    np.testing.assert_allclose(
        np.asarray(s)[0], (queries[0] @ items[np.asarray(ids)[0]].T),
        rtol=2e-2, atol=2e-2)   # bf16 scoring

    idx = BruteForceMIPS(items, method="segmented", query_chunk=64)
    s2, i2 = idx.search(queries, topk=k)
    assert i2.shape == (64, k)
    r2 = np.mean([len(set(a.tolist()) & set(b.tolist())) / k
                  for a, b in zip(i2, exact)])
    assert r2 > 0.9, r2


def test_segmented_falls_back_for_small_corpora():
    import numpy as np
    from recbox_tpu.retrieval.index import BruteForceMIPS
    rng = np.random.default_rng(1)
    items = rng.normal(size=(300, 16)).astype(np.float32)
    idx = BruteForceMIPS(items, method="segmented")
    q = rng.normal(size=(8, 16)).astype(np.float32)
    s, i = idx.search(q, topk=50)
    assert i.shape == (8, 50)
    # tiny corpus routes to the exact scan path: perfect agreement
    exact = np.argsort(-(q @ items.T), axis=1)[:, :50]
    assert all(set(a.tolist()) == set(b.tolist())
               for a, b in zip(i, exact))


def test_segmented_small_topk_no_crash():
    """Auto seg_k must never yield fewer merged candidates than topk
    (topk=10 with 8 segments used to crash lax.top_k)."""
    import numpy as np
    from recbox_tpu.retrieval.index import BruteForceMIPS, segmented_mips_topk
    rng = np.random.default_rng(0)
    items = rng.normal(size=(400, 16)).astype(np.float32)
    q = rng.normal(size=(8, 16)).astype(np.float32)
    for k in (1, 9, 10, 13, 15):
        s, i = segmented_mips_topk(q, items, k, query_chunk=8, n_segments=8)
        assert i.shape == (8, k)
    idx = BruteForceMIPS(items, method="segmented", query_chunk=8)
    s, i = idx.search(q, topk=10)
    assert i.shape == (8, 10)


class TestRetrievalService:
    """Tower -> index serving wrapper (inference_embedding + ANN analog)."""

    def _trainer(self, rng, n_users=30, n_items=40):
        from recbox_tpu.data import MatchingLoader
        from recbox_tpu.features import FeatureMap, FeatureSpec
        from recbox_tpu.models.matching.two_tower import MF
        from recbox_tpu.ops import get_matching_loss
        from recbox_tpu.training import Trainer, TrainerConfig
        fm = FeatureMap(
            "svc", (FeatureSpec("user_id", "categorical", source="user",
                                vocab_size=n_users, embedding_dim=8),
                    FeatureSpec("item_id", "categorical", source="item",
                                vocab_size=n_items, embedding_dim=8)),
            query_index="user_id", corpus_index="item_id", num_items=n_items)
        users = rng.integers(0, n_users, 600).astype(np.int32)
        items = ((users * 3) % n_items).astype(np.int32)
        t = Trainer(MF(feature_map=fm, embedding_dim=8),
                    lambda o, b: get_matching_loss("PairwiseLogisticLoss")(o),
                    TrainerConfig(learning_rate=0.05, epochs=5,
                                  monitor="AUC"))
        loader = MatchingLoader(fm, {"user_id": users, "item_id": items},
                                {"item_id": np.arange(n_items,
                                                      dtype=np.int32)},
                                batch_size=128, num_negs=4, seed=0)
        for _ in range(3):
            for b in loader:
                t.train_step(b)
        return t, n_users, n_items

    def test_query_matches_manual_towers(self, rng):
        from recbox_tpu.retrieval.service import RetrievalService
        t, n_users, n_items = self._trainer(rng)
        corpus = {"item_id": np.arange(n_items, dtype=np.int32)}
        svc = RetrievalService.from_trainer(t, corpus, method="exact")
        uids = np.arange(8, dtype=np.int32)
        s, ids = svc.query({"user_id": uids}, k=5)
        u = np.asarray(t.apply({"user_id": uids}, method=t.model.encode_user))
        it = np.asarray(t.apply(corpus, method=t.model.encode_item))
        exact = np.argsort(-(u @ it.T), axis=1)[:, :5]
        np.testing.assert_array_equal(ids, exact)

    def test_exclude_filters_seen(self, rng):
        from recbox_tpu.retrieval.service import RetrievalService
        t, n_users, n_items = self._trainer(rng)
        corpus = {"item_id": np.arange(n_items, dtype=np.int32)}
        svc = RetrievalService.from_trainer(t, corpus, method="exact")
        uids = np.arange(4, dtype=np.int32)
        _, base = svc.query({"user_id": uids}, k=3)
        exclude = [list(base[r, :1]) for r in range(4)]   # ban the top hit
        _, ids = svc.query({"user_id": uids}, k=3, exclude=exclude)
        for r in range(4):
            assert base[r, 0] not in ids[r]

    def test_refresh_items_rebuilds(self, rng):
        from recbox_tpu.retrieval.service import RetrievalService
        t, n_users, n_items = self._trainer(rng)
        corpus = {"item_id": np.arange(n_items, dtype=np.int32)}
        svc = RetrievalService.from_trainer(t, corpus, method="exact")
        assert svc.num_items == n_items
        svc.refresh_items({"item_id": np.arange(10, dtype=np.int32)})
        assert svc.num_items == 10
        _, ids = svc.query({"user_id": np.arange(2, dtype=np.int32)}, k=4)
        assert int(ids.max()) < 10


class TestRetrievalServiceMultiInterest:
    """(B, K, D) towers: per-interest retrieval + max-score dedup merge."""

    def _mind_service(self, n_items=40, method="exact"):
        import jax
        from recbox_tpu.features import FeatureMap, FeatureSpec
        from recbox_tpu.models.matching.multi_interest import MIND
        from recbox_tpu.retrieval.service import RetrievalService
        fm = FeatureMap(
            "svc_mi",
            (FeatureSpec("item_seq", "sequence", source="user",
                         vocab_size=n_items, embedding_dim=16, max_len=6,
                         share_embedding="item_id"),
             FeatureSpec("item_id", "categorical", source="item",
                         vocab_size=n_items, embedding_dim=16)),
            query_index="item_seq", corpus_index="item_id", num_items=n_items)
        model = MIND(feature_map=fm, embedding_dim=16, interest_num=3,
                     max_seq_len=6)
        hist = np.arange(1, 9, dtype=np.int32).reshape(2, 4)
        hist = np.pad(hist, ((0, 0), (0, 2)))
        variables = model.init(jax.random.PRNGKey(0), {"item_seq": hist},
                               method=model.encode_user)
        corpus = {"item_id": np.arange(n_items, dtype=np.int32)}
        svc = RetrievalService(model, variables, corpus, method=method)
        return svc, model, variables, corpus, hist

    def test_multi_interest_query_merges_interests(self):
        svc, model, variables, corpus, hist = self._mind_service()
        s, ids = svc.query({"item_seq": hist}, k=7)
        assert s.shape == (2, 7) and ids.shape == (2, 7)
        # dedup: no item may appear twice in a row
        for r in range(2):
            got = ids[r][ids[r] >= 0]
            assert len(set(got.tolist())) == len(got)
        # ground truth: max over interests of the exact scores
        u = np.asarray(model.apply(variables, {"item_seq": hist},
                                   method=model.encode_user))  # (2, K, D)
        it = np.asarray(model.apply(variables, corpus,
                                    method=model.encode_item))
        merged = np.einsum("bkd,nd->bkn", u, it).max(1)
        expect = np.argsort(-merged, axis=1, kind="stable")[:, :7]
        for r in range(2):
            assert set(ids[r].tolist()) == set(expect[r].tolist()), r
        np.testing.assert_allclose(
            s, np.take_along_axis(merged, ids, axis=1), rtol=1e-5)

    def test_multi_interest_query_with_exclude(self):
        svc, model, variables, corpus, hist = self._mind_service()
        _, base = svc.query({"item_seq": hist}, k=3)
        exclude = [base[0, :2].tolist(), []]
        s, ids = svc.query({"item_seq": hist}, k=3, exclude=exclude)
        assert not set(exclude[0]) & set(ids[0].tolist())
        assert ids[1].tolist() == base[1, :3].tolist()

    def test_exclude_pool_exhaustion_pads(self):
        """k + excludes > catalog: trailing slots pad (-inf, -1), and the
        no-exclude path clamps k to the catalog size consistently."""
        from recbox_tpu.retrieval.service import RetrievalService
        rng = np.random.default_rng(1)
        helper = TestRetrievalService()
        t, n_users, n_items = helper._trainer(rng, n_items=12)
        corpus = {"item_id": np.arange(12, dtype=np.int32)}
        svc = RetrievalService.from_trainer(t, corpus, method="exact")
        uids = np.arange(2, dtype=np.int32)
        s0, i0 = svc.query({"user_id": uids}, k=100)      # k > catalog
        assert i0.shape == (2, 12)
        banned = list(range(8))
        s, ids = svc.query({"user_id": uids}, k=100, exclude=[banned, banned])
        assert ids.shape == (2, 12)
        # only 4 items remain eligible; the rest must be -1 padding
        for r in range(2):
            valid = ids[r][ids[r] >= 0]
            assert len(valid) == 4 and not set(valid.tolist()) & set(banned)
            assert np.all(np.isneginf(s[r][ids[r] < 0]))


class TestInt8Quantized:
    """int8 corpus scoring: s8xs8->s32 + per-row rescale (`int8_mips_topk`)."""

    def _data(self, n=4096, d=32, q=64, seed=3):
        r = np.random.default_rng(seed)
        items = r.normal(size=(n, d)).astype(np.float32)
        # heterogeneous norms: per-row scaling must keep low-norm items alive
        items *= r.uniform(0.1, 10.0, size=(n, 1))
        queries = r.normal(size=(q, d)).astype(np.float32)
        return items, queries

    def test_quantize_roundtrip_error_bounded(self):
        from recbox_tpu.retrieval.index import quantize_int8
        items, _ = self._data()
        qi, scale = quantize_int8(jnp.asarray(items))
        assert qi.dtype == jnp.int8
        deq = np.asarray(qi, np.float32) * np.asarray(scale)[:, None]
        rel = np.abs(deq - items).max(axis=1) / np.abs(items).max(axis=1)
        assert rel.max() < 1.0 / 127 + 1e-6

    def test_int8_recall_vs_exact(self):
        from recbox_tpu.retrieval.index import chunked_topk, int8_mips_topk, quantize_int8
        items, queries = self._data()
        k = 10
        _, exact_i = chunked_topk(jnp.asarray(queries), jnp.asarray(items), k)
        qi, scale = quantize_int8(jnp.asarray(items))
        _, i8 = int8_mips_topk(jnp.asarray(queries), qi, scale, k,
                               query_chunk=64, recall_target=0.99)
        exact_i, i8 = np.asarray(exact_i), np.asarray(i8)
        recall = np.mean([len(set(exact_i[r]) & set(i8[r])) / k
                          for r in range(len(exact_i))])
        assert recall > 0.85, recall

    def test_int8_refined_exact_scores(self):
        from recbox_tpu.retrieval.index import chunked_topk, int8_mips_topk, quantize_int8
        items, queries = self._data()
        k = 10
        es, ei = chunked_topk(jnp.asarray(queries), jnp.asarray(items), k)
        qi, scale = quantize_int8(jnp.asarray(items))
        rs, ri = int8_mips_topk(jnp.asarray(queries), qi, scale, k,
                                query_chunk=64, recall_target=0.99,
                                oversample=4, items_f32=jnp.asarray(items))
        rs, ri = np.asarray(rs), np.asarray(ri)
        es, ei = np.asarray(es), np.asarray(ei)
        # refined scores are exact f32 for every returned item
        manual = np.einsum("qd,qkd->qk", queries, items[ri])
        np.testing.assert_allclose(rs, manual, rtol=1e-5, atol=1e-4)
        recall = np.mean([len(set(ei[r]) & set(ri[r])) / k
                          for r in range(len(ei))])
        assert recall > 0.95, recall

    def test_index_dispatch_and_pure_int8(self):
        from recbox_tpu.retrieval.index import BruteForceMIPS
        items, queries = self._data(n=2048)
        idx = BruteForceMIPS(items, method="refined", quantize="int8")
        s, i = idx.search(queries, topk=5)
        assert s.shape == (len(queries), 5) and i.shape == (len(queries), 5)
        # pure int8 (f32 corpus dropped): no refine, still works
        idx2 = BruteForceMIPS(items, method="approx", quantize="int8",
                              keep_f32=False)
        assert idx2.items is None
        s2, i2 = idx2.search(queries, topk=5)
        assert s2.shape == (len(queries), 5)
        # top-1 agreement between refined and pure int8 is high
        agree = np.mean(i[:, 0] == i2[:, 0])
        assert agree > 0.8, agree

    def test_int8_rejects_unsupported_method_and_contradictory_config(self):
        import pytest
        from recbox_tpu.retrieval.index import BruteForceMIPS
        items, _ = self._data(n=256)
        # 'exact' must not silently answer with quantized approx scores
        with pytest.raises(NotImplementedError, match="method"):
            BruteForceMIPS(items, method="exact", quantize="int8")
        with pytest.raises(NotImplementedError, match="method"):
            BruteForceMIPS(items, method="segmented", quantize="int8")
        # refined needs the f32 corpus for the rescore
        with pytest.raises(ValueError, match="keep_f32"):
            BruteForceMIPS(items, method="refined", quantize="int8",
                           keep_f32=False)

    def test_int8_approx_drops_f32_by_default(self):
        from recbox_tpu.retrieval.index import BruteForceMIPS
        items, queries = self._data(n=512)
        idx = BruteForceMIPS(items, method="approx", quantize="int8")
        assert idx.items is None           # full 4x HBM saving by default
        s, i = idx.search(queries, topk=5)
        assert s.shape == (len(queries), 5)
        # refined keeps it (needed for the rescore)
        idx2 = BruteForceMIPS(items, method="refined", quantize="int8")
        assert idx2.items is not None

    def test_int8_rejects_sharded(self):
        import pytest
        from jax.sharding import Mesh
        from recbox_tpu.retrieval.index import BruteForceMIPS
        items, _ = self._data(n=256)
        devs = np.array(jax.devices()[:2]).reshape(1, 2)
        mesh = Mesh(devs, ("data", "model"))
        with pytest.raises(NotImplementedError, match="unsharded"):
            BruteForceMIPS(items, mesh=mesh, quantize="int8")


def test_service_int8_passthrough():
    """quantize='int8' flows through RetrievalService to the index."""
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.matching.two_tower import MF
    from recbox_tpu.retrieval import RetrievalService

    n_items, dim = 512, 16
    fm = FeatureMap(
        "svc8", (FeatureSpec("user_id", "categorical", source="user",
                             vocab_size=64, embedding_dim=dim),
                 FeatureSpec("item_id", "categorical", source="item",
                             vocab_size=n_items, embedding_dim=dim)),
        query_index="user_id", corpus_index="item_id", num_items=n_items)
    model = MF(feature_map=fm, embedding_dim=dim)
    vu = model.init(jax.random.PRNGKey(0),
                    {"user_id": np.arange(2, dtype=np.int32)},
                    method=model.encode_user)
    vi = model.init(jax.random.PRNGKey(1),
                    {"item_id": np.arange(2, dtype=np.int32)},
                    method=model.encode_item)
    variables = {"params": {**vu["params"], **vi["params"]}}
    corpus = {"item_id": np.arange(n_items, dtype=np.int32)}
    svc = RetrievalService(model, variables, corpus, method="refined",
                           quantize="int8")
    assert svc.index.quantize == "int8"
    scores, ids = svc.query({"user_id": np.arange(8, dtype=np.int32)}, k=5)
    assert scores.shape == (8, 5) and ids.shape == (8, 5)


def test_service_save_load_roundtrip(tmp_path):
    """save() → load() reproduces identical query results without
    re-encoding the corpus, and preserves index config (incl. quantize)."""
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.matching.two_tower import MF
    from recbox_tpu.retrieval import RetrievalService

    n_items, dim = 256, 16
    fm = FeatureMap(
        "svcsl", (FeatureSpec("user_id", "categorical", source="user",
                              vocab_size=64, embedding_dim=dim),
                  FeatureSpec("item_id", "categorical", source="item",
                              vocab_size=n_items, embedding_dim=dim)),
        query_index="user_id", corpus_index="item_id", num_items=n_items)
    model = MF(feature_map=fm, embedding_dim=dim)
    vu = model.init(jax.random.PRNGKey(0),
                    {"user_id": np.arange(2, dtype=np.int32)},
                    method=model.encode_user)
    vi = model.init(jax.random.PRNGKey(1),
                    {"item_id": np.arange(2, dtype=np.int32)},
                    method=model.encode_item)
    variables = {"params": {**vu["params"], **vi["params"]}}
    corpus = {"item_id": np.arange(n_items, dtype=np.int32)}
    svc = RetrievalService(model, variables, corpus, method="refined",
                           quantize="int8")
    users = {"user_id": np.arange(8, dtype=np.int32)}
    s0, i0 = svc.query(users, k=5)
    svc.save(str(tmp_path / "svc"))
    svc2 = RetrievalService.load(str(tmp_path / "svc"), model)
    assert svc2.index.quantize == "int8" and svc2.method == "refined"
    assert svc2.num_items == n_items
    s1, i1 = svc2.query(users, k=5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)
    # loaded service still supports catalog swap (towers restored)
    svc2.refresh_items({"item_id": np.arange(128, dtype=np.int32)})
    assert svc2.num_items == 128


def test_service_rejects_both_or_neither_corpus_inputs():
    import pytest
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.matching.two_tower import MF
    from recbox_tpu.retrieval import RetrievalService

    fm = FeatureMap(
        "svcx", (FeatureSpec("user_id", "categorical", source="user",
                             vocab_size=8, embedding_dim=8),
                 FeatureSpec("item_id", "categorical", source="item",
                             vocab_size=8, embedding_dim=8)),
        query_index="user_id", corpus_index="item_id", num_items=8)
    model = MF(feature_map=fm, embedding_dim=8)
    with pytest.raises(ValueError, match="exactly one"):
        RetrievalService(model, {"params": {}})
    with pytest.raises(ValueError, match="exactly one"):
        RetrievalService(model, {"params": {}},
                         {"item_id": np.arange(8, dtype=np.int32)},
                         item_embs=np.zeros((8, 8), np.float32))
