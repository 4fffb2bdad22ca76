"""Tokenizer / Normalizer / FeatureEncoder unit tests (hand-computed values)."""

import numpy as np
import pytest

from recbox_tpu.features import (
    FeatureEncoder, FeatureMap, FeatureSpec, Normalizer, Tokenizer,
    pad_sequences,
)


class TestTokenizer:
    def test_vocab_order_deterministic(self):
        # freq desc, then token asc — reference preprocess.py:46-47
        tok = Tokenizer()
        tok.fit(["b", "a", "b", "c", "a", "b"])
        assert tok.vocab["b"] == 1       # freq 3
        assert tok.vocab["a"] == 2       # freq 2
        assert tok.vocab["c"] == 3       # freq 1
        assert tok.vocab["__OOV__"] == 0
        assert tok.vocab_size == 4       # 3 tokens + OOV

    def test_oov_encoding(self):
        tok = Tokenizer().fit(["a", "b"])
        enc = tok.encode_category(["a", "zzz", "b", None])
        np.testing.assert_array_equal(enc, [tok.vocab["a"], 0, tok.vocab["b"], 0])

    def test_min_freq_filter(self):
        tok = Tokenizer(min_freq=2)
        tok.fit(["a", "a", "b"])
        assert "b" not in tok.vocab
        assert tok.vocab_size == 2

    def test_sequence_padding_pre(self):
        tok = Tokenizer(splitter="^", max_len=4)
        tok.fit(["a^b^c", "b^c"], use_padding=True)
        pad_idx = tok.padding_idx
        assert pad_idx == tok.vocab_size - 1
        enc = tok.encode_sequence(["a^b"])
        # pre-padding: pads on the left
        assert list(enc[0][:2]) == [pad_idx, pad_idx]
        assert enc[0][2] == tok.vocab["a"]

    def test_sequence_truncation(self):
        tok = Tokenizer(splitter="^", max_len=2, padding="post")
        tok.fit(["a^b^c^d"], use_padding=True)
        enc = tok.encode_sequence(["a^b^c^d"])
        # post truncating keeps the first max_len tokens
        assert list(enc[0]) == [tok.vocab["a"], tok.vocab["b"]]

    def test_roundtrip_state(self):
        tok = Tokenizer(splitter="^", max_len=3).fit(["a^b", "b"], use_padding=True)
        tok2 = Tokenizer.from_state(tok.state())
        np.testing.assert_array_equal(
            tok.encode_sequence(["a^b"]), tok2.encode_sequence(["a^b"]))


class TestPadSequences:
    def test_shapes_and_values(self):
        out = pad_sequences([[1, 2], [3]], maxlen=3, value=9, padding="post")
        np.testing.assert_array_equal(out, [[1, 2, 9], [3, 9, 9]])

    def test_pre_truncate_keeps_tail(self):
        out = pad_sequences([[1, 2, 3, 4]], maxlen=2, value=0, truncating="pre")
        np.testing.assert_array_equal(out, [[3, 4]])


class TestNormalizer:
    def test_standard(self):
        x = np.array([1.0, 2.0, 3.0, np.nan])
        n = Normalizer("StandardScaler").fit(x)
        out = n.transform(np.array([2.0]))
        assert abs(out[0]) < 1e-6

    def test_minmax(self):
        n = Normalizer("MinMaxScaler").fit(np.array([0.0, 10.0]))
        np.testing.assert_allclose(n.transform(np.array([5.0])), [0.5])

    def test_unknown_raises(self):
        with pytest.raises(NotImplementedError):
            Normalizer("RobustScaler")


class TestFeatureEncoder:
    def _tables(self):
        train = {
            "user_id": np.array(["u1", "u2", "u1", "u3"]),
            "item_id": np.array([0, 1, 2, 1]),
            "age": np.array([10.0, 20.0, 30.0, 40.0]),
            "click": np.array([1, 0, 1, 1]),
        }
        corpus = {
            "item_id": np.arange(3),
            "category": np.array(["x", "y", "x"]),
        }
        return train, corpus

    def test_fit_transform(self):
        train, corpus = self._tables()
        enc = FeatureEncoder(
            feature_cols=[
                {"name": "user_id", "type": "categorical", "source": "user"},
                {"name": "age", "type": "numeric", "source": "user"},
                {"name": "category", "type": "categorical", "source": "item"},
            ],
            label_cols=["click"],
            dataset_id="t", query_index="user_id", corpus_index="item_id",
        )
        fm = enc.fit(train, item_corpus=corpus)
        assert fm.num_items == 3
        assert fm["user_id"].vocab_size == 4  # 3 users + OOV
        arrays = enc.transform(train)
        assert arrays["user_id"].shape == (4,)
        assert arrays["click"].dtype == np.float32
        item_arrays = enc.transform(corpus)
        assert item_arrays["category"].shape == (3,)

    def test_save_load(self, tmp_path):
        train, corpus = self._tables()
        enc = FeatureEncoder(
            [{"name": "user_id", "type": "categorical", "source": "user"}],
            dataset_id="t")
        enc.fit(train)
        enc.save(str(tmp_path))
        enc2 = FeatureEncoder.load(str(tmp_path))
        np.testing.assert_array_equal(
            enc.transform(train)["user_id"], enc2.transform(train)["user_id"])


class TestFeatureMap:
    def test_json_roundtrip(self, tmp_path):
        fm = FeatureMap(
            dataset_id="d",
            features=(
                FeatureSpec("uid", "categorical", "user", vocab_size=10, embedding_dim=8),
                FeatureSpec("hist", "sequence", "user", vocab_size=5,
                            embedding_dim=8, max_len=4, padding_idx=4),
            ),
            labels=("y",), query_index="uid", num_items=5,
        )
        p = str(tmp_path / "fm.json")
        fm.save(p)
        fm2 = FeatureMap.load(p)
        assert fm2 == fm

    def test_duplicate_names_rejected(self):
        with pytest.raises(ValueError):
            FeatureMap("d", (FeatureSpec("a"), FeatureSpec("a")))

    def test_sum_emb_out_dim(self):
        fm = FeatureMap("d", (
            FeatureSpec("a", "categorical", vocab_size=3, embedding_dim=8),
            FeatureSpec("s", "sequence", vocab_size=3, embedding_dim=4,
                        max_len=5, pooling="concat"),
        ))
        assert fm.sum_emb_out_dim() == 8 + 4 * 5


def test_lower_folds_case_end_to_end():
    from recbox_tpu.features.tokenizer import Tokenizer
    t = Tokenizer(lower=True)
    t.fit(["Apple", "apple", "Pear"])
    # case-folded counting: one vocab entry per folded token, no index gaps
    assert t.vocab_size == max(t.vocab.values()) + 1
    got = t.encode_category(["APPLE", "pear", "unknown"])
    assert got[0] == t.vocab["apple"]
    assert got[1] == t.vocab["pear"]
    assert got[2] == t.oov_token


def test_normalizer_imputes_nan_on_transform():
    import numpy as np
    from recbox_tpu.features.tokenizer import Normalizer
    n = Normalizer("StandardScaler").fit(np.array([1.0, 3.0, np.nan]))
    out = n.transform(np.array([np.nan, 2.0]))
    assert np.isfinite(out).all()
    assert out[0] == 0.0          # mean-imputed after standardization


def test_share_embedding_order_independent():
    """A share column listed BEFORE its base must still share the vocab."""
    import numpy as np
    from recbox_tpu.features.encoder import FeatureEncoder
    table = {"hist": np.asarray(["a^b", "c^a", "b"]),
             "item_id": np.asarray(["a", "b", "c"])}
    enc = FeatureEncoder(
        feature_cols=[
            {"name": "hist", "type": "sequence", "splitter": "^",
             "share_embedding": "item_id", "max_len": 3},
            {"name": "item_id", "type": "categorical"},
        ], dataset_id="share_order")
    fm = enc.fit(table)
    # ids must resolve through the base vocab
    hist_tok = enc.tokenizers["hist"]
    base_tok = enc.tokenizers["item_id"]
    for tok in ("a", "b", "c"):
        assert hist_tok.vocab[tok] == base_tok.vocab[tok]
    # unknown share target fails loudly
    import pytest
    with pytest.raises(ValueError, match="unknown"):
        FeatureEncoder(feature_cols=[
            {"name": "x", "type": "categorical",
             "share_embedding": "nope"}], dataset_id="bad").fit(
            {"x": np.asarray(["a"])})


class TestBucketEncoders:
    """category_encoder='quantile_bucket'/'hash_bucket' on categorical cols.

    The reference fits these (`recbox/matching/features.py:219-237`) but its
    transform raises NotImplementedError (`features.py:292-298`); here both
    directions are exercised.
    """

    def test_quantile_bucket_balanced(self):
        rng = np.random.default_rng(0)
        vals = rng.normal(size=2000)
        enc = FeatureEncoder(
            [{"name": "price", "type": "categorical",
              "category_encoder": "quantile_bucket", "num_buckets": 4}],
            dataset_id="qb")
        fm = enc.fit({"price": vals})
        assert fm["price"].vocab_size == 4
        out = enc.transform({"price": vals})["price"]
        assert out.dtype == np.int32
        assert out.min() == 0 and out.max() == 3
        counts = np.bincount(out, minlength=4)
        # quantile cuts ⇒ near-equal occupancy
        assert counts.min() > 0.8 * len(vals) / 4

    def test_quantile_bucket_monotone(self):
        enc = FeatureEncoder(
            [{"name": "v", "type": "categorical",
              "category_encoder": "quantile_bucket", "num_buckets": 3}],
            dataset_id="qb2")
        enc.fit({"v": np.arange(90, dtype=np.float64)})
        out = enc.transform({"v": np.array([0.0, 40.0, 89.0])})["v"]
        assert list(out) == sorted(out)
        assert out[0] == 0 and out[-1] == 2

    def test_hash_bucket_stable_and_capped(self, tmp_path):
        vals = np.array(["a", "b", "c", "a", "b"])
        enc = FeatureEncoder(
            [{"name": "tag", "type": "categorical",
              "category_encoder": "hash_bucket", "num_buckets": 100}],
            dataset_id="hb")
        fm = enc.fit({"tag": vals})
        # capped at the number of uniques, reference features.py:232-234
        assert fm["tag"].vocab_size == 3
        out = enc.transform({"tag": vals})["tag"]
        assert (out < 3).all() and out.dtype == np.int32
        # same raw value always lands in the same bucket
        assert out[0] == out[3] and out[1] == out[4]
        # persists: encodings identical after save/load (crc32, not the
        # per-process-salted builtin hash)
        enc.save(str(tmp_path))
        enc2 = FeatureEncoder.load(str(tmp_path))
        np.testing.assert_array_equal(out, enc2.transform({"tag": vals})["tag"])

    def test_unknown_category_encoder_raises(self):
        with pytest.raises(ValueError, match="category_encoder"):
            FeatureEncoder(
                [{"name": "x", "type": "categorical",
                  "category_encoder": "mystery"}],
                dataset_id="bad").fit({"x": np.array([1.0])})


class TestAutoEmbeddingDim:
    def test_rule_and_alignment(self):
        from recbox_tpu.features.schema import auto_embedding_dim
        # 6*ceil(v^0.25) rounded up to a multiple of 8
        assert auto_embedding_dim(1) == 8        # 6 -> 8
        assert auto_embedding_dim(10_000) == 64  # 6*10 = 60 -> 64
        assert auto_embedding_dim(100_000) == 112  # 6*18 = 108 -> 112

    def test_encoder_auto(self):
        enc = FeatureEncoder(
            [{"name": "item", "type": "categorical", "embedding_dim": "auto"}],
            dataset_id="auto")
        fm = enc.fit({"item": np.arange(5000).astype(str)})
        from recbox_tpu.features.schema import auto_embedding_dim
        assert fm["item"].embedding_dim == auto_embedding_dim(fm["item"].vocab_size)
        assert fm["item"].embedding_dim % 8 == 0

    def test_numeric_auto_raises(self):
        with pytest.raises(ValueError, match="auto"):
            FeatureEncoder(
                [{"name": "x", "type": "numeric", "embedding_dim": "auto"}],
                dataset_id="bad").fit({"x": np.array([1.0])})


def _log1p_round(values):
    return np.log1p(np.asarray(values, dtype=np.float64)).round().astype(np.int64)


class TestPreprocessHook:
    def test_applied_in_fit_and_transform(self, tmp_path):
        vals = np.array([0.0, 3.0, 30.0, 300.0, 3000.0])
        enc = FeatureEncoder(
            [{"name": "pv", "type": "categorical",
              "preprocess": _log1p_round}],
            dataset_id="pp")
        fm = enc.fit({"pv": vals})
        # distinct log1p-rounded values: 0,1,3,6,8 -> vocab 5 + OOV
        assert fm["pv"].vocab_size == 6
        out = enc.transform({"pv": vals})["pv"]
        assert (out > 0).all()  # all seen in fit, none OOV
        # survives persistence (module-level fn pickles by reference)
        enc.save(str(tmp_path))
        enc2 = FeatureEncoder.load(str(tmp_path))
        np.testing.assert_array_equal(out, enc2.transform({"pv": vals})["pv"])


class TestBucketEdgeCases:
    """Review findings: NaN handling, share_embedding conflicts, shared auto dims."""

    def test_quantile_nan_excluded_from_fit_imputed_at_transform(self):
        vals = np.array([1.0, 2.0, np.nan, 4.0, 5.0])
        enc = FeatureEncoder(
            [{"name": "p", "type": "categorical",
              "category_encoder": "quantile_bucket", "num_buckets": 4}],
            dataset_id="qnan")
        enc.fit({"p": vals})
        kind, (boundaries, nan_bucket) = enc.bucketizers["p"]
        assert np.isfinite(boundaries).all()    # NaN excluded from fit
        out = enc.transform({"p": np.array([1.0, np.nan, 5.0])})["p"]
        assert out[0] == 0 and out[2] == 3
        assert out[1] == nan_bucket            # median bucket, not top
        assert 0 < nan_bucket < 4

    def test_quantile_all_nan_raises(self):
        with pytest.raises(ValueError, match="NaN"):
            FeatureEncoder(
                [{"name": "p", "type": "categorical",
                  "category_encoder": "quantile_bucket"}],
                dataset_id="allnan").fit({"p": np.array([np.nan, np.nan])})

    def test_bucket_rejects_share_embedding(self):
        with pytest.raises(ValueError, match="share_embedding"):
            FeatureEncoder(
                [{"name": "item_id", "type": "categorical"},
                 {"name": "ib", "type": "categorical",
                  "category_encoder": "hash_bucket",
                  "share_embedding": "item_id"}],
                dataset_id="conflict").fit(
                {"item_id": np.array(["a"]), "ib": np.array(["a"])})

    def test_auto_dim_share_uses_base_width(self):
        # sequence share vocab = base + 1 (PAD) — an auto dim from its own
        # vocab could disagree with the base table's width
        enc = FeatureEncoder(
            [{"name": "item_id", "type": "categorical",
              "embedding_dim": "auto"},
             {"name": "hist", "type": "sequence", "splitter": "^",
              "max_len": 3, "share_embedding": "item_id",
              "embedding_dim": "auto"}],
            dataset_id="sharedim")
        fm = enc.fit({"item_id": np.array(["a", "b", "c"]),
                      "hist": np.array(["a^b", "c", "b^c^a"])})
        assert fm["hist"].embedding_dim == fm["item_id"].embedding_dim

    def test_hash_vectorized_matches_shape_and_range(self):
        vals = np.array([f"tok{i}" for i in range(5000)])
        enc = FeatureEncoder(
            [{"name": "t", "type": "categorical",
              "category_encoder": "hash_bucket", "num_buckets": 64}],
            dataset_id="hv")
        enc.fit({"t": vals})
        out = enc.transform({"t": vals})["t"]
        assert out.shape == vals.shape and out.dtype == np.int32
        assert out.min() >= 0 and out.max() < 64
        # decent spread (FNV-1a, 5000 keys into 64 buckets)
        assert len(np.unique(out)) == 64
        # stability: same values -> same buckets on a second call
        np.testing.assert_array_equal(out, enc.transform({"t": vals})["t"])
