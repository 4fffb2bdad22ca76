"""RecVAE composite prior + alternating trainer semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from recbox_tpu.models.matching.autoencoder import (
    RecVAE, log_norm_pdf, recvae_loss,
)
from recbox_tpu.training.recvae import RecVAETrainer, _phase_mask

N_ITEMS = 50


def _history(rng, n=200):
    X = (rng.random((n, N_ITEMS)) < 0.15).astype(np.float32)
    X[X.sum(1) == 0, 0] = 1.0
    return X


def _model():
    return RecVAE(num_items=N_ITEMS, hidden_dim=32, latent_dim=8,
                  n_enc_layers=2, dropout=0.1)


def test_log_norm_pdf_matches_closed_form():
    x = jnp.asarray([0.0, 1.0, -2.0])
    got = log_norm_pdf(x, 0.0, 0.0)
    want = -0.5 * (np.log(2 * np.pi) + np.asarray([0.0, 1.0, 4.0]))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_composite_prior_mixture():
    """Prior logpdf is logsumexp of the three weighted components."""
    rng = np.random.default_rng(0)
    model = _model()
    batch = {"history": jnp.asarray(_history(rng, 4))}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "reparam": jax.random.PRNGKey(1)},
                           batch, train=True,
                           method=model.forward_with_latents)
    params = variables["params"]
    z = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    prior = model.apply({"params": params}, batch, z,
                        method=model.composite_prior_logpdf)
    assert prior.shape == (4, 8)
    mu, logvar = model.apply({"params": params}, batch,
                             method=model.encode)
    w1, w2, w3 = model.mixture_weights
    comps = np.stack([
        np.asarray(log_norm_pdf(z, 0.0, 0.0)) + np.log(w1),
        np.asarray(log_norm_pdf(z, mu, logvar)) + np.log(w2),
        np.asarray(log_norm_pdf(z, 0.0, 10.0)) + np.log(w3),
    ])
    want = np.log(np.exp(comps).sum(0))
    np.testing.assert_allclose(np.asarray(prior), want, rtol=1e-5)


def test_kl_weight_scales_with_history_count():
    """gamma-weighted KL: heavier users get a larger KL multiplier."""
    logits = jnp.zeros((2, N_ITEMS))
    mu = jnp.ones((2, 4)); logvar = jnp.zeros((2, 4)); z = mu
    prior = log_norm_pdf(z, 0.0, 0.0)
    light = {"history": jnp.zeros((2, N_ITEMS)).at[:, 0].set(1.0)}
    heavy = {"history": jnp.ones((2, N_ITEMS))}
    l_light = float(recvae_loss(logits, mu, logvar, z, prior, light,
                                gamma=0.005))
    l_heavy = float(recvae_loss(logits, mu, logvar, z, prior, heavy,
                                gamma=0.005))
    # same mll structure; KL term scaled by |history| dominates difference
    assert l_heavy != l_light


def test_phase_masks_partition_params():
    rng = np.random.default_rng(1)
    t = RecVAETrainer(_model(), seed=0)
    X = _history(rng)
    t._init({"history": X[:32]})
    enc_mask = _phase_mask(t.params, decoder=False)
    dec_mask = _phase_mask(t.params, decoder=True)
    enc_leaves = jax.tree_util.tree_leaves(enc_mask)
    dec_leaves = jax.tree_util.tree_leaves(dec_mask)
    assert any(enc_leaves) and any(dec_leaves)
    # exact partition
    assert all(a != b for a, b in zip(enc_leaves, dec_leaves))


def test_alternating_updates_touch_only_phase_params():
    rng = np.random.default_rng(2)
    t = RecVAETrainer(_model(), learning_rate=1e-2, seed=0)
    X = _history(rng)
    t._init({"history": X[:32]})
    dec_before = np.asarray(t.params["dec"]["kernel"]).copy()
    enc_before = np.asarray(t.params["enc_in"]["kernel"]).copy()
    t._sweep(X, 64, decoder=False)      # encoder phase
    assert np.allclose(np.asarray(t.params["dec"]["kernel"]), dec_before)
    assert not np.allclose(np.asarray(t.params["enc_in"]["kernel"]),
                           enc_before)
    enc_mid = np.asarray(t.params["enc_in"]["kernel"]).copy()
    t._sweep(X, 64, decoder=True)       # decoder phase
    assert np.allclose(np.asarray(t.params["enc_in"]["kernel"]), enc_mid)
    assert not np.allclose(np.asarray(t.params["dec"]["kernel"]), dec_before)


def test_fit_improves_reconstruction():
    rng = np.random.default_rng(3)
    X = _history(rng, n=300)
    model = _model()
    t = RecVAETrainer(model, learning_rate=5e-3, seed=0)

    def nll(params):
        batch = {"history": jnp.asarray(X)}
        logits = model.apply({"params": params}, batch, train=False)
        ls = jax.nn.log_softmax(logits, axis=-1)
        return -float(jnp.mean(jnp.sum(ls * batch["history"], axis=-1)))

    t._init({"history": X[:64]})
    before = nll(t.params)
    t.fit(X, epochs=8, batch_size=64)
    after = nll(t.params)
    assert after < before, (before, after)
    # prior refresh happens after the final encoder sweep, and decoder
    # sweeps never touch the encoder — so the snapshot matches the encoder
    np.testing.assert_allclose(np.asarray(t.old_params["enc_in"]["kernel"]),
                               np.asarray(t.params["enc_in"]["kernel"]))
    scores = t.scores(X[:5])
    assert scores.shape == (5, N_ITEMS) and np.isfinite(scores).all()


def test_zero_phase_epochs_and_tiny_dataset():
    rng = np.random.default_rng(5)
    X = _history(rng, n=20)
    t = RecVAETrainer(_model(), n_dec_epochs=0, seed=0)
    t.fit(X, epochs=1, batch_size=64)     # batch > n: shrinks to one batch
    assert t.params is not None
    t2 = RecVAETrainer(_model(), n_enc_epochs=0, seed=0)
    t2.fit(X, epochs=1, batch_size=8)
    assert t2.params is not None
