"""Mechanism tests batch 10 — the round-3 VERDICT's named under-covered
families, each test planted so only the model's MECHANISM can pass it:

* KGNNLS label smoothing: propagated labels must FOLLOW the graph
  (clicked-neighborhood candidates score above unclicked-neighborhood
  ones — `kgnnls.py` label propagation semantics), chance = equal scores;
* MCCLK cross-view contrast: cold-start items reachable only through the
  SEMANTIC (KG) view rank above other cold items, chance ≈ 1/2 per pair;
* AITM: the adaptive-transfer wiring is forward-only along the funnel
  (task t's head depends on tower t-1 through the transfer attention;
  task t-1 never depends on tower t) — `aitm.py` information flow;
* CDAE: the per-user bias embedding V_u disambiguates users with
  IDENTICAL input histories (`cdae.py` h = act(W'x + V_u + b)),
  chance = 50%;
* PPO: the clipped-surrogate objective (multi-epoch updates on stale
  rollouts, advantage = reward - value) improves list reward
  (`librerank/rl_reranker.py:6-309` PPO mechanics);
* EGR: evaluator-guided two-stage training — a policy trained ONLY
  against the learned evaluator's value improves TRUE NDCG it never saw.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from recbox_tpu.features import FeatureMap, FeatureSpec


# ---------------------------------------------------------------------------
# 1. KGNNLS — propagated labels follow the graph structure
# ---------------------------------------------------------------------------

def test_kgnnls_propagated_labels_follow_graph():
    """Two cold candidate items: GOOD's KG neighbors are all items the user
    clicked, BAD's are all unclicked. Label propagation (a user-relation-
    softmax convex combination of neighbor labels, `kgnnls.py`) must score
    GOOD near 1 and BAD near 0 at ANY parameter setting — the mechanism is
    structural, so this holds at init (chance level: equal scores)."""
    from recbox_tpu.data.knowledge import KnowledgeGraph, build_neighbor_table
    from recbox_tpu.models.knowledge import KGNNLS, StaticArray

    n_items = 10                       # 0-3 clicked, 4-7 unclicked, 8/9 cand
    GOOD, BAD = 8, 9
    heads = np.array([GOOD] * 4 + [BAD] * 4)
    tails = np.array([0, 1, 2, 3, 4, 5, 6, 7])
    kg = KnowledgeGraph(heads=heads, relations=np.ones(8, np.int64),
                        tails=tails, n_entities=n_items, n_relations=2,
                        n_items=n_items)
    ents, rels = build_neighbor_table(kg, n_neighbors=4, seed=0)
    fm = FeatureMap(
        "kgnnls10", (FeatureSpec("user_id", "categorical", source="user",
                                 vocab_size=4, embedding_dim=8),
                     FeatureSpec("item_id", "categorical", source="item",
                                 vocab_size=n_items, embedding_dim=8)),
        query_index="user_id", corpus_index="item_id", num_items=n_items)
    model = KGNNLS(feature_map=fm, embedding_dim=8, num_users=4,
                   num_items=n_items, n_entities=n_items, n_relations=2,
                   n_hops=1, neighbor_entities=StaticArray(ents),
                   neighbor_relations=StaticArray(rels))
    B = 2
    item_ids = jnp.asarray([[GOOD], [BAD]])
    batch = {"user_id": jnp.asarray([0, 0]),
             "__item_ids__": item_ids}
    labels = np.zeros((B, n_items), np.float32)
    labels[:, [0, 1, 2, 3]] = 1.0      # the user clicked items 0-3
    variables = model.init(jax.random.PRNGKey(0), batch, item_ids,
                           jnp.asarray(labels),
                           method=model.label_propagate)
    pred = np.asarray(model.apply(
        {"params": nn.meta.unbox(variables["params"])}, batch, item_ids,
        jnp.asarray(labels), method=model.label_propagate))
    assert pred[0, 0] > 0.9, pred      # all-clicked neighborhood
    assert pred[1, 0] < 0.1, pred      # all-unclicked neighborhood
    # and ls_loss prefers the structure-consistent ground truth
    ls_good = model.apply({"params": nn.meta.unbox(variables["params"])},
                          batch, item_ids, jnp.asarray(labels),
                          jnp.asarray([[1.0], [0.0]]), method=model.ls_loss)
    ls_bad = model.apply({"params": nn.meta.unbox(variables["params"])},
                         batch, item_ids, jnp.asarray(labels),
                         jnp.asarray([[0.0], [1.0]]), method=model.ls_loss)
    assert float(ls_good) < float(ls_bad)


# ---------------------------------------------------------------------------
# 2. MCCLK — cold start through the semantic (KG) view only
# ---------------------------------------------------------------------------

def _mcclk_world():
    from recbox_tpu.models.knowledge import StaticArray
    from recbox_tpu.models.knowledge.intent import MCCLK

    n_pairs, n_users = 12, 48
    n_items = 2 * n_pairs
    heads = np.concatenate([np.arange(0, n_items, 2),
                            np.arange(1, n_items, 2)])
    tails = np.concatenate([np.arange(1, n_items, 2),
                            np.arange(0, n_items, 2)])
    users = np.repeat(np.arange(n_users), 6).astype(np.int64)
    items = (2 * (users % n_pairs)).astype(np.int64)   # EVEN items only
    fm = FeatureMap(
        "mcclk10", (FeatureSpec("user_id", "categorical", source="user",
                                vocab_size=n_users, embedding_dim=16),
                    FeatureSpec("item_id", "categorical", source="item",
                                vocab_size=n_items, embedding_dim=16)),
        query_index="user_id", corpus_index="item_id", num_items=n_items)
    model = MCCLK(feature_map=fm, embedding_dim=16, num_users=n_users,
                  n_entities=n_items, n_relations=2, n_layers=1,
                  inter_users=StaticArray(users.astype(np.int32)),
                  inter_items=StaticArray(items.astype(np.int32)),
                  kg_heads=StaticArray(heads.astype(np.int32)),
                  kg_relations=StaticArray(np.ones(len(heads), np.int32)),
                  kg_tails=StaticArray(tails.astype(np.int32)))
    return model, users, items, n_users, n_items


def test_mcclk_only_semantic_view_reaches_cold_items():
    """Structural wiring of the two views (`mcclk.py` semantics):
    interactions only touch EVEN items, so a cold ODD item's
    COLLABORATIVE (LightGCN) view must be independent of every even
    item's embedding, while its SEMANTIC view must depend on its
    KG-paired even item — the cross-view contrast is therefore the only
    bridge that can carry CF signal to cold items."""
    model, users, items, n_users, n_items = _mcclk_world()
    init_ids = jnp.asarray(items[:8])[:, None].repeat(2, 1)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           {"user_id": jnp.asarray(users[:8]),
                            "__item_ids__": init_ids})
    params = nn.meta.unbox(variables["params"])
    ODD, PAIR_EVEN, OTHER_EVEN = 7, 6, 8

    def view_component(p_entity, which):
        p = {**params, "emb_entity": p_entity}
        if which == "collab":
            out = model.apply({"params": p}, method=model.collaborative_view)[1]
        else:
            out = model.apply({"params": p}, method=model.semantic_view)
        return jnp.sum(out[ODD])

    for which, expect_pair, expect_other in (("collab", 0.0, 0.0),
                                             ("sem", None, 0.0)):
        g = jax.grad(view_component)(params["emb_entity"], which)
        g = np.asarray(g)
        pair_dep = np.abs(g[PAIR_EVEN]).sum()
        other_dep = np.abs(g[OTHER_EVEN]).sum()
        if expect_pair is None:
            assert pair_dep > 0, (which, "semantic view must reach the pair")
        else:
            assert pair_dep == expect_pair, (which, pair_dep)
        assert other_dep == expect_other, (which, other_dep)


def test_mcclk_contrast_aligns_the_two_views():
    """The multi-level cross-view contrast (`mcclk.py` InfoNCE between the
    collaborative and semantic item views): optimizing contrastive_loss
    ALONE must make each item's semantic view retrieve its own
    collaborative view (top-1 across the catalog). Chance = 1/n_items
    ≈ 4%; measured ≫ 90%."""
    model, users, items, n_users, n_items = _mcclk_world()
    init_ids = jnp.asarray(items[:8])[:, None].repeat(2, 1)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           {"user_id": jnp.asarray(users[:8]),
                            "__item_ids__": init_ids})
    params = nn.meta.unbox(variables["params"])
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    all_items = jnp.arange(n_items)[:, None]

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            return model.apply({"params": p},
                               {"__item_ids__": all_items},
                               method=model.contrastive_loss)
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(200):
        params, opt, _ = step(params, opt)
    _, collab_i = model.apply({"params": params},
                              method=model.collaborative_view)
    sem_i = model.apply({"params": params}, method=model.semantic_view)
    collab_i = np.asarray(collab_i) / np.maximum(
        np.linalg.norm(np.asarray(collab_i), axis=1, keepdims=True), 1e-9)
    sem_i = np.asarray(sem_i) / np.maximum(
        np.linalg.norm(np.asarray(sem_i), axis=1, keepdims=True), 1e-9)
    top1 = (sem_i @ collab_i.T).argmax(axis=1)
    acc = float((top1 == np.arange(n_items)).mean())
    assert acc > 0.9, acc


# ---------------------------------------------------------------------------
# 3. AITM — transfer flows FORWARD along the funnel only
# ---------------------------------------------------------------------------

def test_aitm_transfer_is_forward_only():
    """`aitm.py`: task t's head consumes an attention fusion of its own
    tower and a TRANSFER of task t-1's fused state. Structurally: task-1
    logits must depend on tower_0's parameters (nonzero gradient through
    the transfer path), and task-0 logits must NOT depend on tower_1
    (conversion never leaks into click — the funnel ordering)."""
    from recbox_tpu.models.multitask.models import AITM

    fm = FeatureMap("aitm10", (
        FeatureSpec("a", "categorical", vocab_size=16, embedding_dim=8),
        FeatureSpec("b", "categorical", vocab_size=16, embedding_dim=8)),
        labels=("click", "conversion"))
    model = AITM(feature_map=fm, embedding_dim=8, tower_units=(16,),
                 transfer_dim=8)
    rng = np.random.default_rng(0)
    batch = {"a": jnp.asarray(rng.integers(0, 16, 32)),
             "b": jnp.asarray(rng.integers(0, 16, 32))}
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch)
    params = nn.meta.unbox(variables["params"])

    def task_out(p, t):
        return jnp.sum(model.apply({"params": p}, batch)[:, t])

    g1 = jax.grad(task_out)(params, 1)
    g0 = jax.grad(task_out)(params, 0)
    norm = lambda tree: float(sum(jnp.sum(jnp.abs(x))
                                  for x in jax.tree_util.tree_leaves(tree)))
    assert norm(g1["tower_0"]) > 0, "transfer path dead: task 1 sees no tower_0"
    assert norm(g0["tower_1"]) == 0, "funnel violated: task 0 depends on tower_1"
    assert norm(g0["tower_0"]) > 0


# ---------------------------------------------------------------------------
# 4. CDAE — per-user bias disambiguates identical histories
# ---------------------------------------------------------------------------

def test_cdae_user_bias_disambiguates_identical_histories():
    """Two user groups share the IDENTICAL input history {0..4}; group A's
    full preference additionally contains item 10, group B's item 11. The
    encoder input is the same vector for every user, so ranking 10 over 11
    for A (and vice versa) is achievable ONLY through the per-user bias
    V_u in the bottleneck (`cdae.py`). Chance: 50%."""
    from recbox_tpu.models.matching.autoencoder import CDAE

    n_users, n_items, hid = 32, 12, 8
    common = np.zeros((n_users, n_items), np.float32)
    common[:, :5] = 1.0                                  # identical input
    target = common.copy()
    group_a = np.arange(n_users) < n_users // 2
    target[group_a, 10] = 1.0
    target[~group_a, 11] = 1.0
    model = CDAE(num_users=n_users, num_items=n_items, hidden_dim=hid,
                 corruption=0.0)
    batch = {"history": jnp.asarray(common),
             "user_id": jnp.arange(n_users)}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "reparam": jax.random.PRNGKey(1)}, batch)
    params = variables["params"]
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    y = jnp.asarray(target)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply({"params": p}, batch)
            return jnp.mean(
                optax.sigmoid_binary_cross_entropy(logits, y))
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(300):
        params, opt, _ = step(params, opt)
    scores = np.asarray(model.apply({"params": params}, batch))
    pref_a = scores[group_a, 10] > scores[group_a, 11]
    pref_b = scores[~group_a, 11] > scores[~group_a, 10]
    acc = np.concatenate([pref_a, pref_b]).mean()
    assert acc > 0.95, acc            # measured 1.0; 0.5 without V_u


# ---------------------------------------------------------------------------
# 5. PPO — the clipped objective itself improves reward
# ---------------------------------------------------------------------------

def test_ppo_objective_improves_reward():
    """True PPO loop (not REINFORCE): collect rollouts with FROZEN old
    params, run several clipped-surrogate epochs on the stale batch
    (advantage = reward - value baseline), repeat. NDCG@5 of the produced
    permutations must improve — `rl_reranker.py:6-309` mechanics."""
    from recbox_tpu.models.reranking.rl import (
        PPOReranker, list_reward_ndcg, ppo_loss,
    )

    B, N, D = 16, 8, 6
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    labels = jnp.asarray((np.asarray(feats)[..., 0] > 0).astype(np.float32))
    mask = jnp.ones((B, N), bool)
    model = PPOReranker(d_model=16, max_list_len=N)
    variables = model.init(jax.random.PRNGKey(0), feats, mask,
                           jax.random.PRNGKey(1), method=model.rollout)
    params = variables["params"]
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def collect(params, key):
        perm, logp_old, value = model.apply({"params": params}, feats, mask,
                                            key, method=model.rollout)
        r = list_reward_ndcg(perm, labels, mask, k=5)
        return perm, logp_old, value, r

    @jax.jit
    def ppo_update(params, opt, perm, logp_old, value_old, r):
        def loss_fn(p):
            logp_new, _ent, value = model.apply(
                {"params": p}, feats, mask, perm,
                method=model.evaluate_actions)
            adv = r - value_old
            return ppo_loss(logp_new, logp_old, adv, value, r,
                            clip_eps=0.2)
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    key = jax.random.PRNGKey(7)
    rewards = []
    for _ in range(60):
        key, sub = jax.random.split(key)
        perm, logp_old, value_old, r = collect(params, sub)
        rewards.append(float(jnp.mean(r)))
        for _ in range(4):                 # multiple epochs on stale data
            params, opt, _ = ppo_update(params, opt, perm, logp_old,
                                        value_old, r)
    early = np.mean(rewards[:10])
    late = np.mean(rewards[-10:])
    assert late > early + 0.05, (early, late)


# ---------------------------------------------------------------------------
# 6. EGR — evaluator-guided policy improvement (two-stage)
# ---------------------------------------------------------------------------

def test_egr_evaluator_guided_policy_improves_true_ndcg():
    """Stage 1: EGREvaluator learns the click model from labels. Stage 2:
    the policy is trained with reward = the EVALUATOR's value of the
    reordered list — it never sees a label. If the evaluator-guided loop
    (the EGR mechanism, `librerank` generator/evaluator) transfers real
    signal, TRUE NDCG@5 of the policy's orderings improves."""
    from recbox_tpu.models.reranking.models import listwise_bce
    from recbox_tpu.models.reranking.rl import (
        EGREvaluator, PPOReranker, list_reward_ndcg, reinforce_loss,
    )

    B, N, D = 16, 8, 6
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    labels = jnp.asarray((np.asarray(feats)[..., 0] > 0).astype(np.float32))
    mask = jnp.ones((B, N), bool)

    # stage 1: supervised evaluator
    ev = EGREvaluator(d_model=16)
    ev_vars = ev.init(jax.random.PRNGKey(0), feats, mask)
    ev_params = ev_vars["params"]
    tx1 = optax.adam(1e-2)
    opt1 = tx1.init(ev_params)

    @jax.jit
    def ev_step(p, opt):
        def loss_fn(pp):
            return listwise_bce(ev.apply({"params": pp}, feats, mask),
                                labels, mask)
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, opt = tx1.update(g, opt)
        return optax.apply_updates(p, up), opt, loss

    for _ in range(150):
        ev_params, opt1, _ = ev_step(ev_params, opt1)

    # stage 2: policy sees ONLY an evaluator-derived reward — the
    # position-discounted predicted-click DCG of the REORDERED list (the
    # librerank reward shape: discounted clicks; a flat mean would be
    # near order-invariant and carry no ranking gradient)
    discount = jnp.where(jnp.arange(N) < 5,
                         1.0 / jnp.log2(jnp.arange(N) + 2.0), 0.0)
    pol = PPOReranker(d_model=16, max_list_len=N)
    pol_vars = pol.init(jax.random.PRNGKey(3), feats, mask,
                        jax.random.PRNGKey(4), method=pol.rollout)
    pol_params = pol_vars["params"]
    tx2 = optax.adam(5e-3)
    opt2 = tx2.init(pol_params)

    @jax.jit
    def pol_step(p, opt, key):
        def loss_fn(pp):
            perm, logp, _v = pol.apply({"params": pp}, feats, mask, key,
                                       method=pol.rollout)
            re_feats = jnp.take_along_axis(feats, perm[..., None], axis=1)
            re_mask = jnp.take_along_axis(mask, perm, axis=1)
            sc = ev.apply({"params": ev_params}, re_feats, re_mask)
            p_click = jax.nn.sigmoid(sc) * re_mask.astype(sc.dtype)
            r = jnp.sum(p_click * discount[None, :], axis=-1)
            return reinforce_loss(logp, r, baseline=jnp.mean(r)), perm
        (loss, perm), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, opt = tx2.update(g, opt)
        return optax.apply_updates(p, up), opt, perm

    key = jax.random.PRNGKey(9)
    true_ndcg = []
    for _ in range(150):
        key, sub = jax.random.split(key)
        pol_params, opt2, perm = pol_step(pol_params, opt2, sub)
        true_ndcg.append(float(jnp.mean(
            list_reward_ndcg(perm, labels, mask, k=5))))
    early = np.mean(true_ndcg[:15])
    late = np.mean(true_ndcg[-15:])
    assert late > early + 0.05, (early, late)
