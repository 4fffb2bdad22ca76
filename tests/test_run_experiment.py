"""One-call raw-dataset pipeline: `run_experiment(model, dataset_name)`.

The recbole `run_recbole(model, dataset)` surface
(`third_party/recbole/quick_start/quick_start.py:42-112`): dataset NAME →
acquire (here a file://-registered ml-100k-format archive, so the chain is
proven offline; on a networked machine the same call hits the real mirror
unmodified) → atomic load → filter/remap → split → train → eval.
"""

import os
import zipfile

import numpy as np
import pytest

from recbox_tpu.data.acquire import register_dataset_url
from recbox_tpu.quick_start import run_experiment


def _make_ml100k_style_archive(tmp, name, n_users=60, n_items=48,
                               cluster=12, seed=0):
    """Tiny ml-100k-format atomic archive with planted structure: each user
    interacts (rating 5) with one contiguous item cluster and rates a few
    random out-of-cluster items low (rating 1-2). A model that learns
    user-item affinity ranks in-cluster holdouts highly; chance
    Recall@10 ≈ 10/48 ≈ 0.21 for random scoring of the catalog."""
    rng = np.random.default_rng(seed)
    lines = ["user_id:token\titem_id:token\trating:float\ttimestamp:float\n"]
    for u in range(n_users):
        c0 = (u % (n_items // cluster)) * cluster
        t = 0
        for i in rng.permutation(np.arange(c0, c0 + cluster)):
            lines.append(f"u{u}\ti{i}\t5.0\t{t}.0\n")
            t += 1
        for i in rng.choice(
                [x for x in range(n_items) if not c0 <= x < c0 + cluster],
                size=4, replace=False):
            lines.append(f"u{u}\ti{i}\t{rng.integers(1, 3)}.0\t{t}.0\n")
            t += 1
    path = os.path.join(tmp, f"{name}.zip")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(f"{name}/{name}.inter", "".join(lines))
    return path


@pytest.fixture
def dataset(tmp_path):
    name = "ml100k-mini"
    archive = _make_ml100k_style_archive(str(tmp_path), name)
    register_dataset_url(name, f"file://{archive}")
    return name, str(tmp_path / "data")


class TestRunExperiment:
    def test_bpr_end_to_end(self, dataset):
        """BPR from the dataset name in ONE call — the VERDICT round-3
        done-criterion. BPR aliases MF + PairwiseLogisticLoss (the recbole
        BPR model). Planted cluster structure ⇒ recall well above the 0.25
        random-scoring chance level (measured ~0.9 at these sizes)."""
        name, data_dir = dataset
        out = run_experiment(
            "BPR", name, data_dir=data_dir, embedding_dim=16,
            learning_rate=0.05, epochs=6, batch_size=128, num_negs=4,
            min_rating=4.0, monitor="Recall(k=10)", patience=10,
            metrics=["Recall(k=10)", "NDCG(k=10)"], seed=1)
        assert set(out) >= {"Recall(k=10)", "NDCG(k=10)",
                            "test_Recall(k=10)", "test_NDCG(k=10)"}
        assert out["Recall(k=10)"] > 0.5, out
        assert out["test_Recall(k=10)"] > 0.5, out

    def test_sequential_stage(self, dataset):
        name, data_dir = dataset
        out = run_experiment(
            "GRU4Rec", name, data_dir=data_dir, embedding_dim=16,
            max_seq_len=8, learning_rate=5e-3, epochs=1, batch_size=64,
            monitor="NDCG(k=10)", min_rating=4.0, seed=1)
        assert "Recall(k=10)" in out and "test_Recall(k=10)" in out
        assert 0.0 <= out["Recall(k=10)"] <= 1.0

    def test_sequential_stage_fused_ce_route(self, dataset):
        """`fused_ce: True` forces the flash-CE kernel path (the large-vocab
        auto-route, `quick_start` crossover gate) through the SAME one-call
        surface: training runs with the loss computed in the kernel (no
        (B, V) logits) and produces bounded metrics like the XLA path."""
        name, data_dir = dataset
        out = run_experiment(
            "SASRec", name, data_dir=data_dir, embedding_dim=16,
            max_seq_len=8, learning_rate=5e-3, epochs=1, batch_size=64,
            monitor="NDCG(k=10)", min_rating=4.0, seed=1, fused_ce=True)
        assert "Recall(k=10)" in out and "test_Recall(k=10)" in out
        assert 0.0 <= out["Recall(k=10)"] <= 1.0

    def test_traditional_stage_closed_form(self, dataset):
        """Pop fits closed-form; the planted clusters make popularity
        uninformative (uniform), so this checks plumbing + bounded values
        + train-positive masking (scores are finite, metrics in [0,1])."""
        name, data_dir = dataset
        out = run_experiment("Pop", name, data_dir=data_dir,
                             min_rating=4.0,
                             metrics=["Recall(k=10)", "NDCG(k=10)"])
        assert set(out) == {"Recall(k=10)", "NDCG(k=10)",
                            "test_Recall(k=10)", "test_NDCG(k=10)"}
        for v in out.values():
            assert 0.0 <= v <= 1.0

    def test_itemknn_beats_chance(self, dataset):
        """ItemKNN exploits the co-occurrence clusters — mechanism-level
        signal through the one-call path (chance ≈ 0.25 at 10/40)."""
        name, data_dir = dataset
        out = run_experiment("ItemKNN", name, data_dir=data_dir,
                             min_rating=4.0, metrics=["Recall(k=10)"])
        assert out["Recall(k=10)"] > 0.5, out

    def test_ranking_stage_binarized(self, dataset):
        name, data_dir = dataset
        out = run_experiment(
            "FM", name, data_dir=data_dir, embedding_dim=16,
            binarize_threshold=4.0, learning_rate=0.05, epochs=6,
            batch_size=128, monitor="AUC", metrics=["AUC", "logloss"],
            seed=1)
        assert "AUC" in out and "test_AUC" in out
        # the label is a user x item cluster interaction — only the
        # second-order term can learn it (chance AUC = 0.5; first-order
        # marginals are near-uniform by construction)
        assert out["AUC"] > 0.6, out

    def test_ranking_temporal_order_honored(self, dataset):
        """order='TO' on the ranking stage must produce a temporal split
        (review finding round 3: it was silently ignored) — smoke that it
        runs; split='LS' must be rejected for pointwise labels."""
        name, data_dir = dataset
        # the planted timeline puts every low-rated row late, so a temporal
        # valid slice is single-class: AUC is undefined there (correctly),
        # which itself evidences the split became temporal — monitor
        # logloss, which is defined on one class
        out = run_experiment(
            "FM", name, data_dir=data_dir, embedding_dim=8,
            binarize_threshold=4.0, learning_rate=0.05, epochs=1,
            batch_size=128, monitor="logloss", monitor_mode="min",
            metrics=["logloss"], order="TO", seed=1)
        assert "logloss" in out
        with pytest.raises(NotImplementedError, match="RS"):
            run_experiment("FM", name, data_dir=data_dir,
                           binarize_threshold=4.0, epochs=1, split="LS")

    def test_ranking_requires_threshold_for_star_ratings(self, dataset):
        name, data_dir = dataset
        with pytest.raises(ValueError, match="binarize_threshold"):
            run_experiment("LR", name, data_dir=data_dir, epochs=1)

    def test_kcore_filter_applies(self, dataset, tmp_path):
        """min_user_inter prunes (k-core): with a threshold above every
        user's count the split raises on the empty result rather than
        silently training on nothing."""
        name, data_dir = dataset
        with pytest.raises(Exception):
            run_experiment("BPR", name, data_dir=data_dir, epochs=1,
                           min_user_inter=1000)

    def test_multitask_stage_rejected_with_pointer(self, dataset):
        name, data_dir = dataset
        with pytest.raises(NotImplementedError, match="run_ranking"):
            run_experiment("MMOE", name, data_dir=data_dir)


class TestKnowledgeStage:
    def test_cke_from_kg_archive(self, tmp_path):
        """Knowledge stage: archive with .inter + .kg + .link trains CKE
        via run_kg_experiment (CF/KG alternation) from the dataset name."""
        rng = np.random.default_rng(2)
        name = "kg-mini"
        inter = ["user_id:token\titem_id:token\ttimestamp:float\n"]
        for u in range(40):
            for t in range(12):
                inter.append(f"u{u}\ti{(u * 3 + t) % 30}\t{t}.0\n")
        kg = ["head_id:token\trelation_id:token\ttail_id:token\n"]
        for i in range(30):
            kg.append(f"e{i}\tr0\te{(i + 1) % 30}\n")
        link = ["item_id:token\tentity_id:token\n"]
        for i in range(30):
            link.append(f"i{i}\te{i}\n")
        path = os.path.join(str(tmp_path), f"{name}.zip")
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr(f"{name}/{name}.inter", "".join(inter))
            zf.writestr(f"{name}/{name}.kg", "".join(kg))
            zf.writestr(f"{name}/{name}.link", "".join(link))
        register_dataset_url(name, f"file://{path}")
        out = run_experiment(
            "CKE", name, data_dir=str(tmp_path / "data"), embedding_dim=16,
            learning_rate=0.05, epochs=2, batch_size=128,
            kg_steps_per_epoch=4, monitor="Recall(k=20)", seed=1)
        assert "Recall(k=20)" in out
        assert 0.0 <= out["Recall(k=20)"] <= 1.0

    def test_kg_filtering_joint_remap(self, tmp_path):
        """Round-5 closure of the knowledge-stage one-call restriction:
        min_user_inter/min_rating now filter interactions and remap items
        + KG entities JOINTLY (recbole `_filter_by_inter_num` +
        `_remap_ID_all` semantics) — CKE trains end to end on the
        filtered graph instead of raising NotImplementedError."""
        rng = np.random.default_rng(3)
        name = "kg-filter"
        inter = ["user_id:token\titem_id:token\ttimestamp:float\n"]
        # 40 active users x 12 interactions + 5 sparse users (1 each)
        # that min_user_inter=4 must drop
        for u in range(40):
            for t in range(12):
                inter.append(f"u{u}\ti{(u * 3 + t) % 30}\t{t}.0\n")
        for u in range(40, 45):
            inter.append(f"u{u}\ti{u - 40}\t0.0\n")
        kg = ["head_id:token\trelation_id:token\ttail_id:token\n"]
        for i in range(30):
            kg.append(f"e{i}\tr0\te{(i + 1) % 30}\n")
        link = ["item_id:token\tentity_id:token\n"]
        for i in range(30):
            link.append(f"i{i}\te{i}\n")
        path = os.path.join(str(tmp_path), f"{name}.zip")
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr(f"{name}/{name}.inter", "".join(inter))
            zf.writestr(f"{name}/{name}.kg", "".join(kg))
            zf.writestr(f"{name}/{name}.link", "".join(link))
        register_dataset_url(name, f"file://{path}")
        out = run_experiment(
            "CKE", name, data_dir=str(tmp_path / "data"),
            min_user_inter=4, embedding_dim=16, learning_rate=0.05,
            epochs=2, batch_size=128, kg_steps_per_epoch=4,
            monitor="Recall(k=20)", seed=1)
        assert "Recall(k=20)" in out
        assert 0.0 <= out["Recall(k=20)"] <= 1.0


class TestRunCliDatasetRoute:
    def test_run_expid_with_dataset_name(self, dataset, tmp_path):
        """`python -m recbox_tpu.run` config carrying `dataset: <name>`
        (no pre-encoded npz dir) routes through run_experiment."""
        name, data_dir = dataset
        cfg_dir = tmp_path / "cfg"
        cfg_dir.mkdir()
        (cfg_dir / "model_config.yaml").write_text(
            "Base:\n"
            "  epochs: 2\n"
            "bpr_ml:\n"
            "  model: BPR\n"
            f"  dataset: {name}\n"
            f"  data_dir: ''\n"
            "  embedding_dim: 8\n"
            "  learning_rate: 0.05\n"
            "  batch_size: 128\n"
            "  min_rating: 4.0\n"
            "  monitor: Recall(k=20)\n")
        from recbox_tpu.run import run_expid
        out = run_expid(str(cfg_dir), "bpr_ml",
                        overrides={"data_dir": "", "epochs": 1,
                                   "dataset_dir": data_dir})
        assert out["model"] == "BPR" and "Recall(k=20)" in out


class TestFusedCERouteGate:
    """Correctness gates of the flash-CE auto-route (round-5 self-review):
    models overriding full_scores train a DIFFERENT objective than the
    kernel computes and must be excluded even when forced."""

    def _fm_model(self, cls, **kw):
        from recbox_tpu.features import FeatureMap, FeatureSpec
        fm = FeatureMap(
            "gate", (FeatureSpec("item_id", "categorical", source="item",
                                 vocab_size=50, embedding_dim=16),),
            query_index="user_id", corpus_index="item_id", num_items=50)
        return fm, cls(feature_map=fm, embedding_dim=16, max_seq_len=8, **kw)

    def test_full_scores_override_excluded_even_when_forced(self):
        from recbox_tpu.models.sequential.extended import CORE
        from recbox_tpu.quick_start import _use_fused_ce
        fm, model = self._fm_model(CORE, n_layers=1, n_heads=2)
        # CORE scores by cosine at temperature 0.07 (overrides full_scores)
        assert not _use_fused_ce({"fused_ce": True}, fm, model, None)

    def test_threshold_route_requires_bf16(self):
        from recbox_tpu.models.sequential.models import SASRec
        from recbox_tpu.quick_start import _use_fused_ce
        fm, m32 = self._fm_model(SASRec, n_layers=1, n_heads=2)
        _, m16 = self._fm_model(SASRec, n_layers=1, n_heads=2,
                                compute_dtype="bfloat16")
        cfg = {"fused_ce_threshold": 10}   # vocab 50 >= 10
        # auto route: only the bf16 model switches precision-compatibly
        assert not _use_fused_ce(cfg, fm, m32, None)
        assert _use_fused_ce(cfg, fm, m16, None)
        # explicit force works for the fp32 model (user accepts bf16 CE)
        assert _use_fused_ce({**cfg, "fused_ce": True}, fm, m32, None)

    def test_trainer_raises_on_mesh_plus_fused(self):
        import jax
        from jax.sharding import Mesh
        from recbox_tpu.models.sequential.models import SASRec
        from recbox_tpu.training import Trainer, TrainerConfig
        fm, model = self._fm_model(SASRec, n_layers=1, n_heads=2)
        devs = np.array(jax.devices()[:1]).reshape(1, 1)
        mesh = Mesh(devs, ("data", "model"))
        with pytest.raises(ValueError, match="single-shard"):
            Trainer(model, lambda o, b: o, TrainerConfig(),
                    mesh=mesh, train_method="fused_ce_loss")
