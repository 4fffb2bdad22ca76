"""Mechanism-sensitive learns-signal tests, batch 6.

* ripple attention (RippleNet): the model has NO user table — a user's
  identity is entirely their ripple memory, so generalizing to held-out
  users with unseen ripple sets proves the candidate-vs-memory attention
  o_h = Σ softmax(v·Rh)·t is what carries the signal (reference
  `ripplenet.py`).
* log-q correction (YoutubeSBC): with in-batch negatives, popular items
  get over-penalized as negatives — equal-preference users end up scoring
  the rare item ABOVE the equally-liked popular one. The sampled-softmax
  log-q term makes the learned score estimate log p(i|u) + log q(i), so a
  corrected twin trained on identical batches must show a clearly lower
  rare−pop gap (reference `youtube_sbc.py` sampling-bias correction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.ops.losses import pairwise_logistic_loss


# ---------------------------------------------------------------------------
# 1. RippleNet — held-out users, unseen ripple memories
# ---------------------------------------------------------------------------

def test_ripplenet_generalizes_to_held_out_ripple_sets():
    from recbox_tpu.models.knowledge import RippleNet

    n_pairs = 20
    n_items = 2 * n_pairs                     # entities = items here
    H, M = 1, 4                               # 1 hop, 4 memories
    n_train_users, n_test_users = 64, 16
    rng = np.random.default_rng(0)

    def make_user():
        """ripple heads = 4 random EVEN entities; tails = odd partners."""
        evens = rng.choice(np.arange(0, n_items, 2), size=M, replace=False)
        heads = evens[None, :]                          # (H, M)
        tails = heads + 1
        rels = np.full((H, M), 1)
        return heads, rels, tails

    def batchify(users_ripple, idx, item_cols):
        hs = np.stack([users_ripple[u][0] for u in idx])
        rs = np.stack([users_ripple[u][1] for u in idx])
        ts = np.stack([users_ripple[u][2] for u in idx])
        return {"ripple_heads": jnp.asarray(hs),
                "ripple_relations": jnp.asarray(rs),
                "ripple_tails": jnp.asarray(ts),
                "__item_ids__": jnp.asarray(item_cols)}

    fm = FeatureMap(
        "ripls", (FeatureSpec("user_id", "categorical", source="user",
                              vocab_size=n_train_users, embedding_dim=16),
                  FeatureSpec("item_id", "categorical", source="item",
                              vocab_size=n_items, embedding_dim=16)),
        query_index="user_id", corpus_index="item_id", num_items=n_items)
    model = RippleNet(feature_map=fm, embedding_dim=16, n_entities=n_items,
                      n_relations=2, n_hops=H)
    train_ripples = [make_user() for _ in range(n_train_users)]
    test_ripples = [make_user() for _ in range(n_test_users)]

    # positives = the user's ripple TAILS (odd partners of their seeds)
    init_b = batchify(train_ripples, np.arange(8),
                      np.zeros((8, 2), np.int32))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, init_b)
    params = nn.meta.unbox(variables["params"])
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, b):
        def loss_fn(p):
            out = model.apply({"params": p}, b, True,
                              rngs={"dropout": jax.random.PRNGKey(2)})
            return pairwise_logistic_loss(out)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(200):
        uidx = rng.integers(0, n_train_users, size=128)
        pos = np.array([train_ripples[u][2][0, rng.integers(0, M)]
                        for u in uidx])
        neg = rng.integers(0, n_items, size=128)
        b = batchify(train_ripples, uidx,
                     np.stack([pos, neg], axis=1).astype(np.int32))
        params, opt_state, _ = step(params, opt_state, b)

    # held-out users: score all odd items, their ripple tails must win
    all_odd = np.arange(1, n_items, 2, dtype=np.int32)
    tb = batchify(test_ripples, np.arange(n_test_users),
                  np.tile(all_odd, (n_test_users, 1)))
    scores = np.asarray(model.apply({"params": params}, tb, False))
    wins, total = 0, 0
    for u in range(n_test_users):
        mine = set(test_ripples[u][2].ravel().tolist())
        m_mask = np.isin(all_odd, list(mine))
        for s_in in scores[u][m_mask]:
            for s_out in scores[u][~m_mask]:
                total += 1
                wins += int(s_in > s_out)
    assert wins / total > 0.75, wins / total   # chance = 0.5


# ---------------------------------------------------------------------------
# 2. YoutubeSBC — log-q correction shrinks in-batch popularity bias
# ---------------------------------------------------------------------------

def test_youtube_sbc_log_q_corrects_popularity_bias():
    from recbox_tpu.models.matching.multi_interest import (
        YoutubeSBC, sampled_softmax_inbatch_loss)

    n_users, n_items = 64, 16
    pop_item, rare_item = 0, 1
    n_eval = 16                               # users 48..63: equal preference
    rng = np.random.default_rng(0)
    # users 0..47 interact with pop only (they DRIVE its popularity);
    # eval users 48..63 like pop and rare EXACTLY equally (1:1) — any
    # learned pop-vs-rare gap for them is sampling bias, not preference
    users, items = [], []
    for u in range(n_users - n_eval):
        for _ in range(4):
            users.append(u)
            items.append(pop_item)
        users.append(u)
        items.append(int(rng.integers(2, n_items)))
    for u in range(n_users - n_eval, n_users):
        users += [u, u]
        items += [pop_item, rare_item]
    users = np.asarray(users, np.int64)
    items = np.asarray(items, np.int64)
    counts = np.bincount(items, minlength=n_items).astype(np.float64)
    log_q = np.log(counts / counts.sum() + 1e-12).astype(np.float32)

    fm = FeatureMap(
        "sbcls", (FeatureSpec("user_id", "categorical", source="user",
                              vocab_size=n_users, embedding_dim=16),
                  FeatureSpec("item_id", "categorical", source="item",
                              vocab_size=n_items, embedding_dim=16)),
        query_index="user_id", corpus_index="item_id", num_items=n_items)

    def train(correct: bool):
        model = YoutubeSBC(feature_map=fm, embedding_dim=16,
                           user_hidden_units=(16,), item_hidden_units=(16,))
        b0 = {"user_id": jnp.asarray(users[:8]),
              "item_id": jnp.asarray(items[:8])}
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, b0,
                               method=model.inbatch_scores)
        params = nn.meta.unbox(variables["params"])
        tx = optax.adam(5e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, b, lq):
            def loss_fn(p):
                s = model.apply({"params": p}, b, True,
                                rngs={"dropout": jax.random.PRNGKey(2)},
                                method=model.inbatch_scores)
                return sampled_softmax_inbatch_loss(
                    s, lq if correct else None)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        rng_l = np.random.default_rng(1)      # same batches for both twins
        n = len(users)
        for _ in range(300):
            idx = rng_l.integers(0, n, size=64)
            b = {"user_id": jnp.asarray(users[idx]),
                 "item_id": jnp.asarray(items[idx])}
            lq = jnp.asarray(log_q[items[idx]])
            params, opt_state, _ = step(params, opt_state, b, lq)
        # equal-preference users only: rare − pop score gap
        u = model.apply({"params": params},
                        {"user_id": jnp.arange(n_users - n_eval, n_users)},
                        method=model.user_tower)
        it = model.apply({"params": params},
                         {"item_id": jnp.asarray([pop_item, rare_item])},
                         method=model.item_tower)
        s = np.asarray(jnp.dot(u, it.T))
        return float(np.mean(s[:, 1] - s[:, 0]))    # rare − pop gap

    gap_corrected = train(correct=True)
    gap_uncorrected = train(correct=False)
    # uncorrected: pop floods the in-batch negatives and gets
    # over-penalized, so rare out-scores pop despite equal preference;
    # with the log-q term the learned scores satisfy
    # s = log p(i|u) + log q(i), i.e. pop is RESTORED by its popularity —
    # the corrected gap must sit clearly below the uncorrected one
    assert gap_uncorrected > 0, gap_uncorrected
    assert gap_corrected < gap_uncorrected - 0.5, \
        (gap_corrected, gap_uncorrected)
