"""End-to-end milestone-1 slice: MF-BPR two-tower on synthetic data.

Exercises schema → encoder → loader (negative sampling) → embedding → loss →
trainer → on-device retrieval metrics (SURVEY §7 minimum slice). The
synthetic dataset plants block structure (user group g prefers item block g),
so a working pipeline must reach high Recall@20 while an untrained model sits
near chance.
"""

import numpy as np
import pytest

from recbox_tpu.data import MatchingLoader
from recbox_tpu.evaluation import RetrievalEvaluator
from recbox_tpu.features import FeatureEncoder
from recbox_tpu.models.matching.two_tower import MF, DSSM
from recbox_tpu.ops import get_matching_loss
from recbox_tpu.training import Trainer, TrainerConfig


def make_synthetic(rng, num_users=64, num_items=128, num_groups=4, n_train=1500,
                   n_valid_per_user=3):
    """Users in group g click items in block g w.p. 0.95."""
    user_group = rng.integers(0, num_groups, size=num_users)
    block = num_items // num_groups

    def draw(users):
        items = np.empty(len(users), dtype=np.int64)
        for i, u in enumerate(users):
            g = user_group[u]
            if rng.random() < 0.95:
                items[i] = rng.integers(g * block, (g + 1) * block)
            else:
                items[i] = rng.integers(0, num_items)
        return items

    train_users = rng.integers(0, num_users, size=n_train)
    train_items = draw(train_users)
    # valid items must be disjoint from the user's train items — they are
    # masked during retrieval eval (reference `core/metrics.py:56-62`)
    seen = {}
    for u, it in zip(train_users, train_items):
        seen.setdefault(u, set()).add(it)
    valid_users = np.repeat(np.arange(num_users), n_valid_per_user)
    valid_items = np.empty(len(valid_users), dtype=np.int64)
    for i, u in enumerate(valid_users):
        g = user_group[u]
        cand = [x for x in range(g * block, (g + 1) * block)
                if x not in seen.get(u, ())]
        if not cand:
            cand = [x for x in range(num_items) if x not in seen.get(u, ())]
        valid_items[i] = cand[rng.integers(0, len(cand))]

    train = {"user_id": train_users.astype(str), "item_id": train_items}
    corpus = {"item_id": np.arange(num_items)}
    return train, corpus, valid_users, valid_items


@pytest.fixture(scope="module")
def pipeline():
    rng = np.random.default_rng(7)
    train, corpus, valid_users, valid_items = make_synthetic(rng)

    enc = FeatureEncoder(
        feature_cols=[
            {"name": "user_id", "type": "categorical", "source": "user"},
            {"name": "item_id", "type": "categorical", "source": "item"},
        ],
        dataset_id="synth", query_index="user_id", corpus_index="item_id",
    )
    fm = enc.fit(train, item_corpus=corpus)
    train_arrays = enc.transform(train)
    # item ids are already contiguous ints == corpus rows
    train_arrays["item_id"] = np.asarray(train["item_id"], dtype=np.int32)
    corpus_arrays = {"item_id": np.arange(fm.num_items, dtype=np.int32)}

    # user → clicked items mapping on tokenized user ids
    uid_tok = enc.tokenizers["user_id"]
    train_uids = train_arrays["user_id"]
    train_u2i, valid_u2i = {}, {}
    for u, it in zip(train_uids, train_arrays["item_id"]):
        train_u2i.setdefault(int(u), []).append(int(it))
    valid_uids = uid_tok.encode_category(valid_users.astype(str))
    for u, it in zip(valid_uids, valid_items):
        valid_u2i.setdefault(int(u), []).append(int(it))

    unique_uids = np.unique(valid_uids)
    evaluator = RetrievalEvaluator(
        user_arrays={"user_id": unique_uids.astype(np.int32)},
        corpus_arrays=corpus_arrays,
        query_indices=unique_uids,
        train_user2items=train_u2i,
        valid_user2items=valid_u2i,
        metrics=["Recall(k=20)", "NDCG(k=10)", "HitRate(k=20)"],
        batch_size=256,
    )
    # a FACTORY, not a shared loader: MatchingLoader mutates its RNG every
    # epoch, so a module-shared instance would make each test's negatives
    # depend on which tests ran before it (order-dependent training data)
    def make_loader():
        return MatchingLoader(fm, train_arrays, corpus_arrays,
                              batch_size=256, num_negs=10, seed=3)
    return fm, make_loader, evaluator


def test_mf_bpr_learns(pipeline):
    fm, make_loader, evaluator = pipeline
    model = MF(feature_map=fm, embedding_dim=32)
    loss = get_matching_loss("PairwiseLogisticLoss")
    cfg = TrainerConfig(learning_rate=0.05, epochs=8, patience=3,
                        monitor="Recall(k=20)", monitor_mode="max",
                        grad_clip_norm=10.0)
    trainer = Trainer(model, lambda out, batch: loss(out), cfg, eval_fn=evaluator)
    before = evaluator(_init_only(trainer, make_loader()))
    metrics = trainer.fit(make_loader())
    assert metrics["Recall(k=20)"] > 0.35, metrics
    assert metrics["Recall(k=20)"] > before["Recall(k=20)"] + 0.2


def _init_only(trainer, loader):
    if trainer.params is None:
        trainer.init(next(iter(loader)))
    return trainer


def test_dssm_smoke(pipeline):
    fm, make_loader, evaluator = pipeline
    model = DSSM(feature_map=fm, embedding_dim=16,
                 user_hidden_units=(32, 16), item_hidden_units=(32, 16))
    loss = get_matching_loss("SoftmaxCrossEntropyLoss")
    cfg = TrainerConfig(learning_rate=0.01, epochs=1, monitor="Recall(k=20)")
    trainer = Trainer(model, lambda out, batch: loss(out), cfg, eval_fn=evaluator)
    metrics = trainer.fit(make_loader())
    assert np.isfinite(metrics["Recall(k=20)"])


def test_checkpoint_resume(pipeline, tmp_path):
    fm, make_loader, evaluator = pipeline
    model = MF(feature_map=fm, embedding_dim=8)
    loss = get_matching_loss("PairwiseLogisticLoss")
    cfg = TrainerConfig(learning_rate=0.05, epochs=1, monitor="Recall(k=20)")
    t1 = Trainer(model, lambda out, b: loss(out), cfg, eval_fn=evaluator)
    t1.fit(make_loader())
    path = str(tmp_path / "ckpt.msgpack")
    t1.save(path)

    t2 = Trainer(model, lambda out, b: loss(out), cfg, eval_fn=evaluator)
    t2.init(next(iter(make_loader())))
    t2.load(path)
    assert t2.step == t1.step
    m1, m2 = evaluator(t1), evaluator(t2)
    np.testing.assert_allclose(m1["Recall(k=20)"], m2["Recall(k=20)"], rtol=1e-5)
