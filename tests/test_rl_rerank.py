"""RL rerankers: EGR evaluator/discriminator, PPO pointer policy (rollout
validity, REINFORCE learning on a known-reward task), and LambdaMART."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from recbox_tpu.models.reranking.lambdamart import LambdaMART
from recbox_tpu.models.reranking.models import listwise_bce
from recbox_tpu.models.reranking.rl import (
    EGRDiscriminator, EGREvaluator, PPOReranker, list_reward_ndcg, ppo_loss,
    reinforce_loss,
)

B, N, D = 16, 8, 6


def _lists(rng):
    """Candidate lists where label = 1 iff feature-0 > 0."""
    feats = rng.normal(size=(B, N, D)).astype(np.float32)
    labels = (feats[..., 0] > 0).astype(np.float32)
    mask = np.ones((B, N), bool)
    mask[:, -2:] = rng.random((B, 2)) < 0.7
    labels = labels * mask
    return jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(mask)


@pytest.fixture()
def lists():
    return _lists(np.random.default_rng(0))


class TestEGR:
    def test_evaluator_learns_click_model(self, lists):
        feats, labels, mask = lists
        model = EGREvaluator(d_model=16)
        variables = model.init(jax.random.PRNGKey(0), feats, mask)
        params = variables["params"]
        tx = optax.adam(1e-2)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                s = model.apply({"params": p}, feats, mask)
                return listwise_bce(s, labels, mask)
            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, loss

        for _ in range(150):
            params, opt, loss = step(params, opt)
        scores = model.apply({"params": params}, feats, mask)
        pred = (np.asarray(scores) > 0) == np.asarray(labels)
        acc = pred[np.asarray(mask)].mean()
        assert acc > 0.9, acc
        v = model.apply({"params": params}, feats, mask,
                        method=model.list_value)
        assert v.shape == (B,) and np.isfinite(np.asarray(v)).all()

    def test_discriminator_separates_orders(self, lists):
        feats, labels, mask = lists
        model = EGRDiscriminator(d_model=16, hidden_units=(16,))
        # real = sorted by label desc (clicked first); fake = reversed
        order = jnp.argsort(-labels, axis=1)
        real = jnp.take_along_axis(feats, order[..., None], axis=1)
        fake = jnp.flip(real, axis=1)
        variables = model.init(jax.random.PRNGKey(0), real, mask)
        params = variables["params"]
        tx = optax.adam(1e-2)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                lr_ = model.apply({"params": p}, real, mask)
                lf_ = model.apply({"params": p}, fake, mask)
                return jnp.mean(jax.nn.softplus(-lr_)) + jnp.mean(
                    jax.nn.softplus(lf_))
            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, loss

        for _ in range(150):
            params, opt, loss = step(params, opt)
        lr_ = model.apply({"params": params}, real, mask)
        lf_ = model.apply({"params": params}, fake, mask)
        assert float(jnp.mean(lr_)) > float(jnp.mean(lf_))


class TestPPO:
    def test_rollout_is_valid_permutation(self, lists):
        feats, labels, mask = lists
        model = PPOReranker(d_model=16, max_list_len=N)
        variables = model.init(jax.random.PRNGKey(0), feats, mask,
                               jax.random.PRNGKey(1), method=model.rollout)
        perm, logp, value = model.apply(variables, feats, mask,
                                        jax.random.PRNGKey(2),
                                        method=model.rollout)
        perm = np.asarray(perm)
        for b in range(B):
            assert sorted(perm[b]) == list(range(N))   # a permutation
        assert np.isfinite(np.asarray(logp)).all()
        assert value.shape == (B,)

    def test_evaluate_actions_matches_rollout_logp(self, lists):
        feats, labels, mask = lists
        model = PPOReranker(d_model=16, max_list_len=N)
        variables = model.init(jax.random.PRNGKey(0), feats, mask,
                               jax.random.PRNGKey(1), method=model.rollout)
        perm, logp, _ = model.apply(variables, feats, mask,
                                    jax.random.PRNGKey(2),
                                    method=model.rollout)
        logp2, ent, v = model.apply(variables, feats, mask, perm,
                                    method=model.evaluate_actions)
        np.testing.assert_allclose(np.asarray(logp), np.asarray(logp2),
                                   atol=1e-4)
        assert (np.asarray(ent) >= -1e-5).all()

    def test_reinforce_improves_ndcg(self, lists):
        feats, labels, mask = lists
        model = PPOReranker(d_model=16, max_list_len=N)
        variables = model.init(jax.random.PRNGKey(0), feats, mask,
                               jax.random.PRNGKey(1), method=model.rollout)
        params = variables["params"]
        tx = optax.adam(5e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, key):
            def loss_fn(p):
                perm, logp, value = model.apply(
                    {"params": p}, feats, mask, key, method=model.rollout)
                r = list_reward_ndcg(perm, labels, mask, k=5)
                return reinforce_loss(logp, r, baseline=jnp.mean(r)), r
            (loss, r), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, jnp.mean(r)

        key = jax.random.PRNGKey(3)
        rewards = []
        for i in range(200):
            key, sub = jax.random.split(key)
            params, opt, r = step(params, opt, sub)
            rewards.append(float(r))
        early = np.mean(rewards[:20])
        late = np.mean(rewards[-20:])
        assert late > early + 0.05, (early, late)

    def test_ppo_loss_clips(self):
        logp_new = jnp.log(jnp.full((4, 3), 0.9))
        logp_old = jnp.log(jnp.full((4, 3), 0.1))
        adv = jnp.ones(4)
        v = jnp.zeros(4)
        r = jnp.zeros(4)
        loss = ppo_loss(logp_new, logp_old, adv, v, r, clip_eps=0.2)
        # ratio huge but clipped at 1.2 → pg term = −1.2
        assert float(loss) == pytest.approx(-1.2, abs=1e-3)


class TestLambdaMART:
    def test_learns_monotone_feature(self):
        rng = np.random.default_rng(0)
        n_q, per_q = 30, 10
        X = rng.normal(size=(n_q * per_q, 4))
        rel = (X[:, 0] > 0.5).astype(float) * 2 + (X[:, 0] > -0.5)
        qid = np.repeat(np.arange(n_q), per_q)
        model = LambdaMART(n_trees=20, learning_rate=0.2, max_depth=3)
        model.fit(X, rel, qid)
        ndcg = model.ndcg(X, rel, qid, k=5)
        assert ndcg > 0.9, ndcg
        # unseen queries from the same distribution
        X2 = rng.normal(size=(10 * per_q, 4))
        rel2 = (X2[:, 0] > 0.5).astype(float) * 2 + (X2[:, 0] > -0.5)
        qid2 = np.repeat(np.arange(10), per_q)
        assert model.ndcg(X2, rel2, qid2, k=5) > 0.85
