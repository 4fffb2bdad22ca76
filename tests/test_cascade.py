"""Full three-stage cascade: two-tower retrieval → DCN ranking → PRM rerank.

The BASELINE.md end-to-end config: candidates retrieved by a trained MF
tower through BruteForceMIPS, scored by a trained DCN, reranked listwise by
PRM — asserting each stage's plumbing composes and the cascade beats the
unranked retrieval order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from recbox_tpu.data import ArrayLoader, MatchingLoader
from recbox_tpu.evaluation.rerank import evaluate_rerank
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.matching.two_tower import MF
from recbox_tpu.models.ranking.ctr import DCN
from recbox_tpu.models.reranking.models import PRM, listwise_bce
from recbox_tpu.ops import binary_crossentropy, get_matching_loss
from recbox_tpu.retrieval import BruteForceMIPS
from recbox_tpu.training import Trainer, TrainerConfig


N_USERS, N_ITEMS, LIST = 40, 120, 16


@pytest.fixture(scope="module")
def world():
    """Ground truth: user u likes item i iff same group AND (u+i) even."""
    rng = np.random.default_rng(21)
    group_u = np.arange(N_USERS) % 4
    group_i = np.arange(N_ITEMS) % 4

    def likes(u, i):
        return (group_u[u] == group_i[i]) & (((u + i) % 2) == 0)

    users = rng.integers(0, N_USERS, 4000)
    items = rng.integers(0, N_ITEMS, 4000)
    clicks = likes(users, items) | (rng.random(4000) < 0.02)
    return rng, likes, users.astype(np.int32), items.astype(np.int32), \
        clicks.astype(np.float32)


def test_cascade_end_to_end(world):
    rng, likes, users, items, clicks = world
    fm = FeatureMap(
        "cascade", (
            FeatureSpec("user_id", "categorical", "user", vocab_size=N_USERS,
                        embedding_dim=16),
            FeatureSpec("item_id", "categorical", "item", vocab_size=N_ITEMS,
                        embedding_dim=16)),
        labels=("click",), query_index="user_id", corpus_index="item_id",
        num_items=N_ITEMS)

    # --- stage 1: two-tower matching on positive interactions -------------
    pos = clicks > 0
    match_loader = MatchingLoader(
        fm, {"user_id": users[pos], "item_id": items[pos]},
        {"item_id": np.arange(N_ITEMS, dtype=np.int32)},
        batch_size=256, num_negs=8, seed=0)
    mf = MF(feature_map=fm, embedding_dim=16)
    loss = get_matching_loss("PairwiseLogisticLoss")
    t_match = Trainer(mf, lambda o, b: loss(o),
                      TrainerConfig(learning_rate=0.05, epochs=1, monitor="x"))
    for _ in range(1):
        for batch in match_loader:
            batch.pop("__mask__", None)
            t_match.train_step(batch)

    # encode users + corpus, retrieve LIST candidates per user
    variables = {"params": t_match.params}
    user_embs = np.asarray(mf.apply(
        variables, {"user_id": jnp.arange(N_USERS)}, method=mf.encode_user))
    item_embs = np.asarray(mf.apply(
        variables, {"item_id": jnp.arange(N_ITEMS)}, method=mf.encode_item))
    index = BruteForceMIPS(item_embs)
    _, cand = index.search(user_embs, topk=LIST)   # (N_USERS, LIST)

    # retrieval recall of likes: candidates should hit the user's group
    like_rate = np.mean([likes(u, i) for u in range(N_USERS) for i in cand[u]])
    assert like_rate > 0.2  # way above the 12.5% base rate

    # --- stage 2: DCN CTR ranking on (user, item) clicks -------------------
    ctr_arrays = {"user_id": users, "item_id": items, "click": clicks}
    dcn = DCN(feature_map=fm, embedding_dim=16, num_cross_layers=2,
              hidden_units=(32,))
    t_rank = Trainer(dcn, lambda o, b: binary_crossentropy(o, b["click"]),
                     TrainerConfig(learning_rate=1e-2, epochs=1, monitor="x"))
    rank_loader = ArrayLoader(ctr_arrays, batch_size=256, drop_last=True)
    for _ in range(6):
        for batch in rank_loader:
            batch.pop("__mask__", None)
            t_rank.train_step(batch)

    # score all candidates: flatten (user, cand) pairs
    flat_users = np.repeat(np.arange(N_USERS, dtype=np.int32), LIST)
    flat_items = cand.reshape(-1).astype(np.int32)
    ctr_scores = np.asarray(t_rank.apply(
        {"user_id": flat_users, "item_id": flat_items})).reshape(N_USERS, LIST)

    true_rel = np.array([[1.0 if likes(u, i) else 0.0 for i in cand[u]]
                         for u in range(N_USERS)])
    base = evaluate_rerank(-np.arange(LIST)[None].repeat(N_USERS, 0).astype(float),
                           true_rel, ks=[5])      # retrieval order
    ranked = evaluate_rerank(ctr_scores, true_rel, ks=[5])
    # the CTR stage must IMPROVE on raw retrieval order, not merely not
    # degrade it (a noise ranker would pass a -0.02 tolerance)
    assert ranked["NDCG@5"] > base["NDCG@5"] + 0.02, (base, ranked)

    # --- stage 3: PRM listwise rerank over DCN-scored lists ----------------
    # item features for the reranker: [user emb ‖ item emb ‖ ctr score]
    feats = np.concatenate([
        user_embs[flat_users].reshape(N_USERS, LIST, -1),
        item_embs[flat_items].reshape(N_USERS, LIST, -1),
        ctr_scores[..., None]], axis=-1).astype(np.float32)
    mask = np.ones((N_USERS, LIST), bool)
    prm = PRM(d_model=16, n_layers=1, n_heads=2, max_list_len=LIST)
    # HELD-OUT split: train the reranker on the first half of users' lists
    # and evaluate on the second — fitting and scoring the same lists
    # would measure in-sample memorization, not generalization
    half = N_USERS // 2
    f_tr = jnp.asarray(feats[:half])
    l_tr = jnp.asarray(true_rel[:half])
    m_tr = jnp.asarray(mask[:half])
    pvars = prm.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)}, f_tr, m_tr,
                     train=True)
    params = nn.meta.unbox(pvars["params"])
    import optax
    tx = optax.adam(1e-2)
    st = tx.init(params)

    @jax.jit
    def step(params, st):
        def loss_fn(p):
            s = prm.apply({"params": p}, f_tr, m_tr, train=True,
                          rngs={"dropout": jax.random.PRNGKey(0)})
            return listwise_bce(s, l_tr, m_tr)
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, st2 = tx.update(g, st, params)
        return optax.apply_updates(params, up), st2, loss

    for _ in range(100):
        params, st, _ = step(params, st)
    rerank_scores = np.asarray(prm.apply(
        {"params": params}, jnp.asarray(feats[half:]),
        jnp.asarray(mask[half:]), train=False))
    base_eval = evaluate_rerank(
        -np.arange(LIST)[None].repeat(N_USERS - half, 0).astype(float),
        true_rel[half:], ks=[5])
    reranked = evaluate_rerank(rerank_scores, true_rel[half:], ks=[5])
    # the cascade must not degrade retrieval order, and must be high
    # quality on lists it never trained on
    assert reranked["NDCG@5"] >= base_eval["NDCG@5"] - 1e-9, \
        (base_eval, ranked, reranked)
    assert reranked["NDCG@5"] > 0.8, (base_eval, ranked, reranked)
