"""Multi-interest (MIND/ComiRec), SimpleX, YoutubeSBC, and traditional models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from recbox_tpu.data import ArrayLoader, MatchingLoader
from recbox_tpu.evaluation import evaluate_retrieval
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.matching.multi_interest import (
    MIND, ComiRec, SimpleX, YoutubeSBC, sampled_softmax_inbatch_loss,
)
from recbox_tpu.models.matching.traditional import (
    EASE, ItemKNN, Pop, build_interaction_matrix, topk_items,
)
from recbox_tpu.ops import get_matching_loss
from recbox_tpu.training import Trainer, TrainerConfig


def _seq_fm(n_items):
    return FeatureMap(
        "mi", (FeatureSpec("item_id", "categorical", source="item",
                           vocab_size=n_items + 1, embedding_dim=16),),
        query_index="user_id", corpus_index="item_id", num_items=n_items + 1)


def _mi_batch(rng, n_items, B=32, L=10, negs=4):
    seq = rng.integers(1, n_items + 1, size=(B, L)).astype(np.int32)
    seq[:, :3] = 0  # some padding
    ids = rng.integers(1, n_items + 1, size=(B, 1 + negs)).astype(np.int32)
    return {"item_seq": seq, "seq_len": np.full(B, L - 3, np.int32),
            "__item_ids__": ids, "item::item_id": ids}


@pytest.mark.parametrize("cls", [MIND, ComiRec])
def test_multi_interest_shapes(cls, rng):
    n_items = 50
    fm = _seq_fm(n_items)
    model = cls(feature_map=fm, embedding_dim=16, interest_num=3)
    batch = {k: jnp.asarray(v) for k, v in _mi_batch(rng, n_items).items()}
    variables = model.init(jax.random.PRNGKey(0), batch)
    params = nn.meta.unbox(variables["params"])
    scores = model.apply({"params": params}, batch)
    assert scores.shape == (32, 5)
    interests = model.apply({"params": params}, batch, method=model.user_tower)
    assert interests.shape == (32, 3, 16)


def test_multi_interest_retrieval_max_merge(rng):
    # multi-interest eval: (U, K, D) embeddings, scores maxed over K.
    # Planted so the MERGE RULE is what's tested: each user's true item is
    # the best match for exactly ONE interest and strongly negative for
    # the others — max-merge ranks it #1, while a mean/min merge buries it
    # below the distractor that is mildly positive for EVERY interest.
    items = np.zeros((30, 3), np.float32)
    users = np.zeros((3, 3, 3), np.float32)
    valid = {}
    for u in range(3):                           # one distinct axis each
        true_item = u + 1
        items[true_item, u] = 1.0                # aligned with interest u
        users[u, u] = np.eye(3)[u] * 2.0         # interest u points at it
        users[u, (u + 1) % 3] = -np.eye(3)[u]    # another interest hates it
        valid[u] = [true_item]
    items[20] = 0.2                              # mild all-interest distractor
    out = evaluate_retrieval(jnp.asarray(users), jnp.asarray(items), {},
                             valid, [0, 1, 2], ["Recall(k=1)"])
    assert out["Recall(k=1)"] == pytest.approx(1.0)
    # max over K ranks each true item #1 (score 2.0 vs distractor 0.4);
    # a mean-merge scores the true item (2-1)/3 = 0.33 vs the distractor's
    # ~0.2 on every interest — the max rule is load-bearing here


def test_simplex_cosine_scores_bounded(rng):
    fm = FeatureMap(
        "sx", (FeatureSpec("user_id", "categorical", "user", vocab_size=20,
                           embedding_dim=8),
               FeatureSpec("item_id", "categorical", "item", vocab_size=30,
                           embedding_dim=8)),
        query_index="user_id", corpus_index="item_id", num_items=30)
    model = SimpleX(feature_map=fm, embedding_dim=8, gamma=0.7)
    batch = {
        "user_id": jnp.arange(4), "item_seq": jnp.ones((4, 5), jnp.int32),
        "__item_ids__": jnp.ones((4, 3), jnp.int32),
        "item::item_id": jnp.ones((4, 3), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    params = nn.meta.unbox(variables["params"])
    scores = model.apply({"params": params}, batch)
    assert scores.shape == (4, 3)
    assert np.all(np.abs(np.asarray(scores)) <= 1 + 1e-5)  # cosine


def test_youtube_sbc_inbatch_training(rng):
    n_users, n_items, n = 64, 80, 3000
    users = rng.integers(0, n_users, n).astype(np.int32)
    items = ((users % 8) * 10 + rng.integers(0, 10, n)).astype(np.int32)
    counts = np.bincount(items, minlength=n_items).astype(np.float64)
    log_q = np.log((counts + 1) / (counts.sum() + n_items)).astype(np.float32)
    fm = FeatureMap(
        "sbc", (FeatureSpec("user_id", "categorical", "user", vocab_size=n_users,
                            embedding_dim=16),
                FeatureSpec("item_id", "categorical", "item", vocab_size=n_items,
                            embedding_dim=16)),
        query_index="user_id", corpus_index="item_id", num_items=n_items)
    model = YoutubeSBC(feature_map=fm, embedding_dim=16,
                       user_hidden_units=(32, 16), item_hidden_units=(32, 16))
    arrays = {"user_id": users, "item_id": items, "__log_q__": log_q[items]}
    loader = ArrayLoader(arrays, batch_size=128, drop_last=True, seed=0)
    cfg = TrainerConfig(learning_rate=5e-3, epochs=1, monitor="x")
    trainer = Trainer(
        model,
        lambda scores, b: sampled_softmax_inbatch_loss(scores, b["__log_q__"]),
        cfg, train_method="inbatch_scores")
    losses = []
    for _ in range(3):
        for batch in loader:
            batch.pop("__mask__", None)
            losses.append(float(trainer.train_step(batch)))
    assert losses[-1] < losses[0]  # learning


class TestTraditional:
    def _data(self, rng):
        n_users, n_items = 30, 40
        users = np.repeat(np.arange(n_users), 5)
        items = ((users % 4) * 10 + rng.integers(0, 10, len(users)))
        return users, items, n_users, n_items

    def test_pop(self, rng):
        users, items, U, I = self._data(rng)
        pop = Pop().fit(users, items, U, I)
        scores = pop.full_scores(np.arange(3))
        assert scores.shape == (3, I)
        top = int(jnp.argmax(scores[0]))
        assert top == np.bincount(items, minlength=I).argmax()

    def test_itemknn_blocks(self, rng):
        users, items, U, I = self._data(rng)
        knn = ItemKNN(topk=10).fit(users, items, U, I)
        X = build_interaction_matrix(users, items, U, I)
        s, i = topk_items(knn, np.arange(U), topk=5,
                          mask_seen=jnp.asarray(X))
        # recommendations stay in the user's block (0..9 for group 0 etc.)
        for u in range(U):
            block = (u % 4) * 10
            in_block = ((i[u] >= block) & (i[u] < block + 10)).mean()
            assert in_block > 0.5

    def test_ease_reconstruction_better_than_pop(self, rng):
        users, items, U, I = self._data(rng)
        ease = EASE(reg_weight=50.0).fit(users, items, U, I)
        X = build_interaction_matrix(users, items, U, I)
        scores = np.asarray(ease.full_scores(np.arange(U)))
        # scores for interacted items should exceed block-external items
        pos_mean = scores[X > 0].mean()
        neg_mean = scores[X == 0].mean()
        assert pos_mean > neg_mean

    def test_ease_diag_zero(self, rng):
        users, items, U, I = self._data(rng)
        ease = EASE().fit(users, items, U, I)
        np.testing.assert_allclose(np.diagonal(np.asarray(ease.B)), 0, atol=1e-5)
