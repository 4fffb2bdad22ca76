"""General recommenders: neural CF (NeuMF/ConvNCF/NAIS/FISM/ENMF),
autoencoders (MultiVAE/MacridVAE/RecVAE/CDAE), and closed-form traditionals
(PureSVD/SLIM/ADMMSLIM). Planted structure: a block (community) model —
user u likes item i iff block(u) == block(i). Every model must rank
in-block items above out-of-block ones for held-out positives."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.matching.autoencoder import (
    CDAE, MacridVAE, MultiVAE, RecVAE, build_history_matrix, cdae_loss,
    multivae_loss,
)
from recbox_tpu.models.matching.neural_cf import (
    ConvNCF, ENMF, FISM, NAIS, NeuMF, enmf_loss,
)
from recbox_tpu.models.matching.traditional import ADMMSLIM, SLIM, PureSVD
from recbox_tpu.ops import pairwise_logistic_loss

N_USERS, N_ITEMS, N_BLOCKS = 60, 48, 4


def _block_data(rng, density=0.5):
    """user u interacts with ~density of items in block(u)."""
    ub = rng.integers(0, N_BLOCKS, size=N_USERS)
    ib = np.arange(N_ITEMS) % N_BLOCKS
    users, items = [], []
    for u in range(N_USERS):
        block_items = np.flatnonzero(ib == ub[u])
        chosen = rng.choice(block_items, size=max(2, int(len(block_items) * density)),
                            replace=False)
        users += [u] * len(chosen)
        items += list(chosen)
    return np.array(users), np.array(items), ub, ib


@pytest.fixture(scope="module")
def block():
    rng = np.random.default_rng(4)
    return _block_data(rng)


def _fm():
    return FeatureMap(
        "blocks",
        (FeatureSpec("user_id", "categorical", source="user",
                     vocab_size=N_USERS, embedding_dim=16),
         FeatureSpec("item_id", "categorical", source="item",
                     vocab_size=N_ITEMS, embedding_dim=16),),
        query_index="user_id", corpus_index="item_id", num_items=N_ITEMS)


def _block_auc(scores, ub, ib):
    """Mean fraction of (in-block, out-block) item pairs ranked correctly."""
    scores = np.asarray(scores)
    aucs = []
    for u in range(scores.shape[0]):
        pos = scores[u, ib == ub[u]]
        neg = scores[u, ib != ub[u]]
        aucs.append((pos[:, None] > neg[None, :]).mean())
    return float(np.mean(aucs))


def _train_pairwise(model, users, items, rng, steps=300, lr=1e-2,
                    batch=256, extra_batch=None, neg_range=None):
    """BPR training on (user, pos, sampled-neg) triples via model.score."""
    import optax
    init_ids = jnp.asarray(items[:8])[:, None].repeat(2, 1)
    init_batch = {"user_id": jnp.asarray(users[:8]),
                  "__item_ids__": init_ids,
                  "item::item_id": init_ids}
    if extra_batch:
        init_batch.update({k: jnp.asarray(v[:8]) for k, v in extra_batch.items()})
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, init_batch)
    params = nn.meta.unbox(variables["params"])
    tx = optax.adam(lr)
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

    rng_np = np.random.default_rng(0)
    n = len(users)
    for _ in range(steps):
        idx = rng_np.integers(0, n, size=batch)
        neg = rng_np.integers(0, neg_range or N_ITEMS, size=batch)
        ids = jnp.asarray(np.stack([items[idx], neg], axis=1))
        b = {"user_id": jnp.asarray(users[idx]),
             "__item_ids__": ids, "item::item_id": ids}
        if extra_batch:
            b.update({k: jnp.asarray(v[idx]) for k, v in extra_batch.items()})
        params, opt_state, loss = step(params, opt_state, b)
    return params


def _pad_histories(users, items, max_len=24):
    hist = np.zeros((N_USERS, max_len), np.int64)
    for u in range(N_USERS):
        mine = items[users == u][:max_len]
        hist[u, :len(mine)] = mine + 1  # ids shifted by 1; 0 = PAD
    return hist


class TestNeuralCF:
    def test_neumf_learns_blocks(self, block):
        users, items, ub, ib = block
        model = NeuMF(feature_map=_fm(), embedding_dim=16,
                      num_users=N_USERS, num_items=N_ITEMS,
                      mlp_hidden_units=(32, 16))
        params = _train_pairwise(model, users, items, None)
        scores = model.apply(
            {"params": params},
            {"user_id": jnp.arange(N_USERS)}, method=model.full_scores)
        assert _block_auc(scores, ub, ib) > 0.8

    def test_convncf_runs_and_learns(self, block):
        users, items, ub, ib = block
        model = ConvNCF(feature_map=_fm(), embedding_dim=16,
                        num_users=N_USERS, num_items=N_ITEMS,
                        channels=(8,))
        params = _train_pairwise(model, users, items, None, steps=200)
        scores = model.apply(
            {"params": params},
            {"user_id": jnp.arange(N_USERS)}, method=model.full_scores)
        assert _block_auc(scores, ub, ib) > 0.7

    @pytest.mark.parametrize("cls,kw", [(FISM, {}), (NAIS, {"attention_dim": 8})],
                             ids=["FISM", "NAIS"])
    def test_history_models_learn_blocks(self, block, cls, kw):
        users, items, ub, ib = block
        # ids shifted by +1 for PAD=0 in histories & candidates
        fm = FeatureMap(
            "blocks_hist",
            (FeatureSpec("user_id", "categorical", source="user",
                         vocab_size=N_USERS, embedding_dim=16),
             FeatureSpec("item_id", "categorical", source="item",
                         vocab_size=N_ITEMS + 1, embedding_dim=16),),
            query_index="user_id", corpus_index="item_id",
            num_items=N_ITEMS + 1)
        hist = _pad_histories(users, items)
        model = cls(feature_map=fm, embedding_dim=16, num_users=N_USERS,
                    num_items=N_ITEMS + 1, **kw)
        users_arr = users
        items_shift = items + 1
        params = _train_pairwise(
            model, users_arr, items_shift, None, steps=200,
            extra_batch={"hist": hist[users]})
        scores = model.apply(
            {"params": params},
            {"user_id": jnp.arange(N_USERS), "hist": jnp.asarray(hist)},
            method=model.full_scores)
        assert _block_auc(np.asarray(scores)[:, 1:], ub, ib) > 0.8

    def test_enmf_whole_corpus_loss_learns(self, block):
        import optax
        users, items, ub, ib = block
        fm = _fm()
        hist = _pad_histories(users, items)
        model = ENMF(feature_map=fm, embedding_dim=16, num_users=N_USERS,
                     num_items=N_ITEMS + 1, dropout=0.0)
        b0 = {"hist": jnp.asarray(hist)}
        variables = model.init({"params": jax.random.PRNGKey(0)}, b0,
                               method=model.all_scores_and_parts)
        params = nn.meta.unbox(variables["params"])
        tx = optax.adagrad(5e-2)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                pos, u, table, h = model.apply(
                    {"params": p}, b0, method=model.all_scores_and_parts)
                return enmf_loss(pos, u, table, h, b0["hist"] != 0,
                                 neg_weight=0.1)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(150):
            params, opt_state, loss = step(params, opt_state)
        scores = model.apply(
            {"params": params},
            {"user_id": jnp.arange(N_USERS), "hist": jnp.asarray(hist)},
            method=model.full_scores)
        assert _block_auc(np.asarray(scores)[:, 1:], ub, ib) > 0.8


class TestAutoencoders:
    def _train_ae(self, model, X, loss_kind, steps=200, lr=1e-3):
        import optax
        batch = {"history": jnp.asarray(X),
                 "user_id": jnp.arange(N_USERS)}
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)}, batch, train=True)
        params = variables["params"]
        tx = optax.adam(lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                out, inter = model.apply(
                    {"params": p}, batch, True,
                    rngs={"reparam": key, "dropout": key},
                    mutable=["intermediates"])
                if loss_kind == "vae":
                    kl = inter["intermediates"]["kl"][0]
                    return multivae_loss(out, batch, kl, beta=0.1)
                return cdae_loss(out, batch)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        key = jax.random.PRNGKey(3)
        for i in range(steps):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sub)
        return params, batch

    @pytest.mark.parametrize("cls,kw,loss_kind", [
        (MultiVAE, {"hidden_units": (64,), "latent_dim": 16, "dropout": 0.2}, "vae"),
        (MacridVAE, {"latent_dim": 16, "k_factors": 4, "dropout": 0.2}, "vae"),
        (RecVAE, {"hidden_dim": 64, "latent_dim": 16, "n_enc_layers": 2,
                  "dropout": 0.2}, "vae"),
        (CDAE, {"hidden_dim": 16, "corruption": 0.2}, "cdae"),
    ], ids=["MultiVAE", "MacridVAE", "RecVAE", "CDAE"])
    def test_ae_learns_blocks(self, block, cls, kw, loss_kind):
        users, items, ub, ib = block
        X = build_history_matrix(users, items, N_USERS, N_ITEMS)
        kwargs = dict(num_items=N_ITEMS, **kw)
        if cls is CDAE:
            kwargs["num_users"] = N_USERS
        model = cls(**kwargs)
        params, batch = self._train_ae(model, X, loss_kind)
        scores = model.apply({"params": params}, batch, False,
                             method=model.full_scores)
        assert _block_auc(scores, ub, ib) > 0.85


class TestTraditionalExtended:
    @pytest.mark.parametrize("cls,kw", [
        (PureSVD, {"factors": 8}),
        (SLIM, {"l1_reg": 1e-4, "l2_reg": 1e-4, "n_iters": 10}),
        (ADMMSLIM, {"lambda1": 0.1, "lambda2": 1.0, "rho": 10.0,
                    "n_iters": 30}),
    ], ids=["PureSVD", "SLIM", "ADMMSLIM"])
    def test_closed_form_learns_blocks(self, block, cls, kw):
        users, items, ub, ib = block
        model = cls(**kw).fit(users, items, N_USERS, N_ITEMS)
        scores = model.full_scores(np.arange(N_USERS))
        assert _block_auc(scores, ub, ib) > 0.9

    def test_slim_weights_sparse_nonneg_zero_diag(self, block):
        users, items, _, _ = block
        model = SLIM(l1_reg=1e-3, l2_reg=1e-4, n_iters=10).fit(
            users, items, N_USERS, N_ITEMS)
        W = np.asarray(model.W)
        assert np.allclose(np.diag(W), 0)
        assert (W >= 0).all()
        assert (W == 0).mean() > 0.3  # l1 actually sparsifies


def test_multivae_trains_through_generic_trainer(block):
    """The generic Trainer must drive the VAE (reparam rng supplied by the
    step; loss self-contained via train_method='elbo_loss')."""
    from recbox_tpu.training import Trainer, TrainerConfig

    users, items, ub, ib = block
    X = build_history_matrix(users, items, N_USERS, N_ITEMS)
    model = MultiVAE(num_items=N_ITEMS, hidden_units=(64,), latent_dim=16,
                     dropout=0.2)

    class _Loader:
        def __iter__(self):
            rng = np.random.default_rng(0)
            for _ in range(6):
                sel = rng.integers(0, N_USERS, 32)
                yield {"history": X[sel]}

    t = Trainer(model, lambda out, b: out,
                TrainerConfig(learning_rate=1e-2, epochs=6, patience=8,
                              monitor="AUC", lr_decay_factor=1.0,
                              reload_best_on_plateau=False),
                train_method="elbo_loss")
    t.fit(_Loader())
    scores = np.asarray(t.apply({"history": X}, method=model.full_scores))
    assert _block_auc(scores, ub, ib) > 0.8
