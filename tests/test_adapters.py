"""KGSeq + DecisionTree dataset adapters — e2e from atomic files to a
training model (KSR) / a fitted tree ranker (kg_seq_dataset.py and
decisiontree_dataset.py parity)."""

import numpy as np
import pytest

from recbox_tpu.data.adapters import atomic_to_feature_matrix, build_kg_sequential
from recbox_tpu.data.atomic import load_atomic_dataset


def _write_kg_dataset(tmp_path, n_users=12, n_items=8):
    rng = np.random.default_rng(0)
    lines = ["user_id:token\titem_id:token\ttimestamp:float\n"]
    for u in range(n_users):
        for t in range(5):
            lines.append(f"u{u}\ti{(u + t) % n_items}\t{t}.0\n")
    (tmp_path / "t.inter").write_text("".join(lines))
    (tmp_path / "t.link").write_text(
        "item_id:token\tentity_id:token\n" +
        "".join(f"i{k}\te{k}\n" for k in range(n_items)))
    (tmp_path / "t.kg").write_text(
        "head_id:token\trelation_id:token\ttail_id:token\n" +
        "".join(f"e{k}\tr0\te{(k + 1) % n_items}\n" for k in range(n_items)) +
        "".join(f"e{k}\tr1\tex{k}\n" for k in range(n_items)))
    return load_atomic_dataset(str(tmp_path), "t")


class TestKGSeqAdapter:
    def test_splits_and_kg_artifacts(self, tmp_path):
        ds = _write_kg_dataset(tmp_path)
        train, valid, test, kg, mk = build_kg_sequential(
            ds, max_len=6, n_neighbors=4)
        # LOO: every user with >=3 interactions contributes 1 valid + 1 test
        assert len(valid["item_id"]) == 12 and len(test["item_id"]) == 12
        assert train["item_seq"].shape[1] == 6
        # entity space covers items + the ex* entities
        assert mk["n_entities"] >= ds.num_items + 8
        assert mk["kg_neighbors"].shape == (mk["n_entities"], 4)
        # linked entities share item ids => neighbor rows for item ids exist
        assert kg.n_items == ds.num_items

    def test_ksr_trains_on_adapter_output(self, tmp_path):
        """e2e: adapter arrays + neighbor table drive a KSR train step."""
        from recbox_tpu.features import FeatureMap, FeatureSpec
        from recbox_tpu.models.knowledge.intent import KSR
        from recbox_tpu.models.knowledge.models import StaticArray
        from recbox_tpu.ops import full_softmax_loss
        from recbox_tpu.training import Trainer, TrainerConfig

        ds = _write_kg_dataset(tmp_path)
        train, valid, _test, kg, mk = build_kg_sequential(
            ds, max_len=6, n_neighbors=4)
        n_items = ds.num_items + 1
        fm = FeatureMap(
            "kgseq", (FeatureSpec("item_id", "categorical",
                                  vocab_size=n_items, embedding_dim=8),),
            corpus_index="item_id", num_items=n_items)
        model = KSR(feature_map=fm, embedding_dim=8, hidden_size=8,
                    n_entities=mk["n_entities"],
                    kg_neighbors=StaticArray(mk["kg_neighbors"]))
        tr = Trainer(model,
                     lambda o, b: full_softmax_loss(o, b["item_id"]),
                     TrainerConfig(learning_rate=1e-2, monitor="AUC"),
                     train_method="full_scores")
        batch = {k: v[:8] for k, v in train.items()}
        l0 = float(tr.train_step(batch))
        for _ in range(5):
            l1 = float(tr.train_step(batch))
        assert np.isfinite(l1) and l1 < l0


class TestDecisionTreeAdapter:
    def test_feature_matrix_conversion(self, tmp_path):
        (tmp_path / "d.inter").write_text(
            "user_id:token\titem_id:token\trating:float\tdevice:token\n"
            "u0\ti0\t1.0\tphone\n"
            "u0\ti1\t0.0\tdesktop\n"
            "u1\ti1\t1.0\tphone\n")
        (tmp_path / "d.user").write_text(
            "user_id:token\tage:float\n"
            "u0\t20.0\nu1\t30.0\n")
        (tmp_path / "d.item").write_text(
            "item_id:token\tprice:float\tbrand:token\n"
            "i0\t5.0\tbA\ni1\t9.0\tbB\n")
        ds = load_atomic_dataset(str(tmp_path), "d")
        X, y, names = atomic_to_feature_matrix(ds, label_field="rating")
        assert X.shape == (3, 6)
        assert set(names) == {"user_id", "item_id", "device", "age",
                              "price", "brand"}
        np.testing.assert_array_equal(y, [1.0, 0.0, 1.0])
        # joined side features line up by id
        age = X[:, names.index("age")]
        np.testing.assert_array_equal(age, [20.0, 20.0, 30.0])
        price = X[:, names.index("price")]
        np.testing.assert_array_equal(price, [5.0, 9.0, 9.0])

    def test_token_threshold_drops_wide_columns(self, tmp_path):
        rows = "".join(f"u{k}\ti0\t1.0\ttok{k}\n" for k in range(40))
        (tmp_path / "w.inter").write_text(
            "user_id:token\titem_id:token\trating:float\twide:token\n" + rows)
        ds = load_atomic_dataset(str(tmp_path), "w")
        _X, _y, names = atomic_to_feature_matrix(
            ds, label_field="rating", token_num_threshold=10)
        assert "wide" not in names

    def test_tree_model_fits_adapter_output(self, tmp_path):
        """e2e: matrix feeds the native GBDT (the exlib passthroughs share
        the same (X, y) contract; xgboost/lightgbm absent in this image)."""
        from recbox_tpu.models.reranking.lambdamart import LambdaMART
        rng = np.random.default_rng(0)
        lines = ["user_id:token\titem_id:token\tlabel:float\tprice:float\n"]
        for k in range(200):
            price = float(rng.random())
            label = 1.0 if price > 0.5 else 0.0
            lines.append(f"u{k % 20}\ti{k % 10}\t{label}\t{price}\n")
        (tmp_path / "g.inter").write_text("".join(lines))
        ds = load_atomic_dataset(str(tmp_path), "g")
        X, y, names = atomic_to_feature_matrix(ds, label_field="label")
        qid = X[:, names.index("user_id")].astype(int)
        model = LambdaMART(n_trees=10, max_depth=3).fit(X, y, qid)
        scores = model.predict(X)
        # scores must rank positives above negatives overall
        from recbox_tpu.evaluation.ctr import auc_score
        assert auc_score(y, scores) > 0.9
