"""Autoencoder recommenders: MultiVAE, MacridVAE, RecVAE, CDAE.

TPU-native re-designs of recbole's AE family
(`third_party/recbole/model/general_recommender/{multivae,macridvae,recvae,
cdae}.py`). These consume the user's full interaction row (multi-hot
`history` (B, N)) and reconstruct scores over all items, trained by
reconstruction objectives (multinomial CE + KL for the VAEs, pointwise
logistic for CDAE) — no negative sampling, no towers.

Conventions:
  * `__call__(batch, train, rng via 'reparam' collection) -> (B, N) logits`
  * losses are free functions (`multivae_loss`, `cdae_loss`) so the Trainer
    wires them like any other loss_fn;
  * the multi-hot rows come from `build_history_matrix` (host-side, once).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MultiVAE", "MacridVAE", "RecVAE", "CDAE",
           "multivae_loss", "cdae_loss", "build_history_matrix"]


def build_history_matrix(user_ids, item_ids, num_users: int,
                         num_items: int) -> np.ndarray:
    """Dense multi-hot (num_users, num_items) float32 interaction rows."""
    X = np.zeros((num_users, num_items), dtype=np.float32)
    X[np.asarray(user_ids), np.asarray(item_ids)] = 1.0
    return X


def _normalize(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class MultiVAE(nn.Module):
    """Variational AE with multinomial likelihood (`multivae.py`):
    encoder MLP → (μ, logσ²) → z → decoder MLP → logits."""

    num_items: int
    hidden_units: Sequence[int] = (600,)
    latent_dim: int = 128
    dropout: float = 0.5

    @nn.compact
    def _forward(self, batch, train: bool = False):
        x = _normalize(batch["history"])
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i, hu in enumerate(self.hidden_units):
            x = jnp.tanh(nn.Dense(hu, name=f"enc{i}")(x))
        mu = nn.Dense(self.latent_dim, name="mu")(x)
        logvar = nn.Dense(self.latent_dim, name="logvar")(x)
        if train:
            eps = jax.random.normal(self.make_rng("reparam"), mu.shape)
            z = mu + eps * jnp.exp(0.5 * logvar)
        else:
            z = mu
        h = z
        for i, hu in enumerate(reversed(self.hidden_units)):
            h = jnp.tanh(nn.Dense(hu, name=f"dec{i}")(h))
        logits = nn.Dense(self.num_items, name="out")(h)
        kl = -0.5 * jnp.sum(
            1 + logvar - mu ** 2 - jnp.exp(logvar), axis=1)   # per-user (B,)
        return logits, kl

    def __call__(self, batch, train: bool = False):
        logits, kl = self._forward(batch, train)
        self.sow("intermediates", "kl", kl)
        return logits

    def full_scores(self, batch, train: bool = False):
        return self(batch, train)

    def elbo_loss(self, batch, beta: float = 0.2,
                  train: bool = True) -> jnp.ndarray:
        """Self-contained training loss so the generic Trainer drives this
        model like any other: ``Trainer(model, lambda out, b: out,
        train_method='elbo_loss')`` (the sown-KL + custom-loop protocol
        stays available for β-annealing schedules)."""
        logits, kl = self._forward(batch, train)
        return multivae_loss(logits, batch, kl, beta=beta)


def multivae_loss(logits, batch, kl, beta: float = 0.2) -> jnp.ndarray:
    """Multinomial CE + β·KL (`multivae.py` calculate_loss; β annealing is
    the caller's job via the beta argument). ``kl`` may be the batch mean or
    a per-user (B,) vector (it is reduced here)."""
    log_softmax = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.mean(jnp.sum(log_softmax * batch["history"], axis=-1))
    return ce + beta * jnp.mean(kl)


class MacridVAE(nn.Module):
    """Macro-micro disentangled VAE (`macridvae.py`): K concept prototypes;
    items softly assigned to concepts; per-concept encoders produce one
    z_k each; scores = Σ_k assignment_ik · ⟨z_k, e_i⟩/τ (cosine space)."""

    num_items: int
    latent_dim: int = 64
    k_factors: int = 4
    tau: float = 0.1
    dropout: float = 0.5

    @nn.compact
    def __call__(self, batch, train: bool = False):
        x = batch["history"]                               # (B, N)
        items = self.param("emb_item", nn.initializers.normal(0.05),
                           (self.num_items, self.latent_dim))
        protos = self.param("emb_proto", nn.initializers.normal(0.05),
                            (self.k_factors, self.latent_dim))
        items_n = _normalize(items)
        cates = jax.nn.softmax(
            jnp.dot(items_n, _normalize(protos).T) / self.tau, axis=-1)  # (N, K)
        xd = nn.Dropout(self.dropout, deterministic=not train)(_normalize(x))
        mus, logvars, zs = [], [], []
        enc_mu = nn.Dense(self.latent_dim, name="enc_mu")
        enc_lv = nn.Dense(self.latent_dim, name="enc_lv")
        for k in range(self.k_factors):
            xk = xd * cates[None, :, k]
            h = jnp.tanh(nn.Dense(2 * self.latent_dim, name=f"enc{k}")(xk))
            mu = _normalize(enc_mu(h))
            lv = enc_lv(h)
            if train:
                eps = jax.random.normal(self.make_rng("reparam"), mu.shape)
                z = mu + eps * jnp.exp(0.5 * lv)
            else:
                z = mu
            mus.append(mu); logvars.append(lv); zs.append(_normalize(z))
        probs = sum(
            jax.nn.softmax(jnp.dot(zs[k], items_n.T) / self.tau, axis=-1)
            * cates[None, :, k]
            for k in range(self.k_factors))
        # reference KL (`macridvae.py:140-143`): -0.5·Σ(1 + logvar − e^logvar)
        # SUMMED over factors — no μ² term (μ is normalized to the unit
        # sphere above) and no /K averaging (dividing would shrink the
        # effective beta K-fold vs the cited hyperparameters)
        kl = sum(-0.5 * jnp.sum(1 + lv - jnp.exp(lv), axis=1)
                 for lv in logvars)                            # (B,)
        self.sow("intermediates", "kl", kl)
        return jnp.log(probs + 1e-12)

    def full_scores(self, batch, train: bool = False):
        return self(batch, train)


def log_norm_pdf(x, mu, logvar):
    """Element-wise log N(x; mu, exp(logvar)) (`recvae.py:37-39`)."""
    return -0.5 * (logvar + jnp.log(2 * jnp.pi)
                   + jnp.square(x - mu) / jnp.exp(logvar))


class RecVAE(nn.Module):
    """RecVAE (`recvae.py`): denoising encoder with swish layers + LayerNorm,
    linear decoder, and the COMPOSITE prior — a 3-component mixture of
    N(0, I), the OLD encoder's posterior q_old(z|x), and a wide
    N(0, e^10·I) with weights `mixture_weights` (`recvae.py:41-73`). The old
    encoder's params are a frozen snapshot refreshed by the alternating
    trainer (`training/recvae.py`, mirroring RecVAETrainer + update_prior,
    `trainer/trainer.py:1257-1300`)."""

    num_items: int
    hidden_dim: int = 600
    latent_dim: int = 200
    n_enc_layers: int = 3
    dropout: float = 0.5
    gamma: float = 0.005
    beta: float = 0.2
    mixture_weights: Tuple[float, float, float] = (3 / 20, 3 / 4, 1 / 10)

    def setup(self):
        self.enc_in = nn.Dense(self.hidden_dim, name="enc_in")
        self.enc_norm0 = nn.LayerNorm()
        self.enc_hidden = [nn.Dense(self.hidden_dim, name=f"enc{i}")
                           for i in range(self.n_enc_layers - 1)]
        self.enc_norms = [nn.LayerNorm() for _ in range(self.n_enc_layers - 1)]
        self.mu_head = nn.Dense(self.latent_dim, name="mu")
        self.logvar_head = nn.Dense(self.latent_dim, name="logvar")
        self.dec = nn.Dense(self.num_items, name="dec")

    def encode(self, batch, dropout: float = 0.0, train: bool = False):
        """(mu, logvar) of q(z|x). The composite prior evaluates the old
        encoder with dropout 0 (`recvae.py:63-64`)."""
        x = _normalize(batch["history"])
        if train and dropout > 0:
            keep = jax.random.bernoulli(self.make_rng("dropout"),
                                        1.0 - dropout, x.shape)
            x = x * keep / (1.0 - dropout)
        h = self.enc_in(x)
        h = self.enc_norm0(jax.nn.swish(h))
        for dense, norm in zip(self.enc_hidden, self.enc_norms):
            h = norm(jax.nn.swish(dense(h)) + h)
        return self.mu_head(h), self.logvar_head(h)

    def __call__(self, batch, train: bool = False):
        logits, _, _, _ = self.forward_with_latents(batch, train)
        return logits

    def forward_with_latents(self, batch, train: bool = False):
        """(logits, mu, logvar, z) — the tuple `recvae_loss` consumes."""
        mu, logvar = self.encode(batch, self.dropout, train)
        if train:
            eps = jax.random.normal(self.make_rng("reparam"), mu.shape)
            z = mu + eps * jnp.exp(0.5 * logvar)
        else:
            z = mu
        logits = self.dec(z)
        self.sow("intermediates", "kl",
                 -0.5 * jnp.sum(
                     1 + logvar - mu ** 2 - jnp.exp(logvar), axis=1))  # (B,)
        return logits, mu, logvar, z

    def composite_prior_logpdf(self, batch, z):
        """log p(z) under the 3-component mixture, evaluated with THIS
        module's (frozen-snapshot) encoder params (`recvae.py:63-73`)."""
        post_mu, post_logvar = self.encode(batch, 0.0, train=False)
        w1, w2, w3 = self.mixture_weights
        comps = jnp.stack([
            log_norm_pdf(z, 0.0, 0.0) + jnp.log(w1),
            log_norm_pdf(z, post_mu, post_logvar) + jnp.log(w2),
            log_norm_pdf(z, 0.0, 10.0) + jnp.log(w3),
        ])
        return jax.scipy.special.logsumexp(comps, axis=0)

    def full_scores(self, batch, train: bool = False):
        return self(batch, train)


def recvae_loss(logits, mu, logvar, z, prior_logpdf, batch,
                gamma: float = 0.005, beta: float = 0.2) -> jnp.ndarray:
    """Negative ELBO with the composite prior (`recvae.py:150-172`):
    kl_weight = gamma·|history| per user (or beta when gamma == 0);
    kld = E[ log q(z|x) − log p_composite(z) ]."""
    x = batch["history"]
    mll = jnp.mean(jnp.sum(jax.nn.log_softmax(logits, axis=-1) * x, axis=-1))
    kl_weight = gamma * jnp.sum(x, axis=-1) if gamma else beta
    kld = jnp.mean(kl_weight * jnp.sum(
        log_norm_pdf(z, mu, logvar) - prior_logpdf, axis=-1))
    return -(mll - kld)


class CDAE(nn.Module):
    """Collaborative denoising AE (`cdae.py`): h = act(Wᵀx̃ + V_u + b),
    out = Wᵒh + bᵒ — per-user bias embedding in the bottleneck."""

    num_users: int
    num_items: int
    hidden_dim: int = 64
    corruption: float = 0.5
    hidden_activation: str = "relu"

    @nn.compact
    def __call__(self, batch, train: bool = False):
        x = batch["history"]
        if train:
            keep = jax.random.bernoulli(
                self.make_rng("reparam"), 1.0 - self.corruption, x.shape)
            x = x * keep / (1.0 - self.corruption)
        h = nn.Dense(self.hidden_dim, name="enc")(x)
        u = nn.Embed(self.num_users, self.hidden_dim, name="user_bias")(
            batch["user_id"])
        act = jax.nn.relu if self.hidden_activation == "relu" else jnp.tanh
        h = act(h + u)
        return nn.Dense(self.num_items, name="dec")(h)

    def full_scores(self, batch, train: bool = False):
        return self(batch, train)


def cdae_loss(logits, batch) -> jnp.ndarray:
    """Pointwise logistic reconstruction over all items (`cdae.py`)."""
    y = batch["history"]
    return jnp.mean(jnp.sum(
        jnp.maximum(logits, 0) - logits * y
        + jnp.log1p(jnp.exp(-jnp.abs(logits))), axis=-1))


class RaCT(nn.Module):
    """RaCT (recbole `ract.py` shape): MultiVAE actor + a critic MLP that
    predicts the (normalized) ranking quality from per-user loss features
    [CE, KL, log1p(history count)]. Training protocol (caller's loop, as in
    the reference's phased trainer): pretrain the actor with
    `multivae_loss`, regress `critic_score` on true NDCG, then fine-tune
    the actor to maximize the frozen critic (loss = −critic_score)."""

    num_items: int
    hidden_units: Sequence[int] = (600,)
    latent_dim: int = 128
    dropout: float = 0.5
    critic_hidden: Sequence[int] = (64, 32)

    def setup(self):
        self.actor = MultiVAE(self.num_items, self.hidden_units,
                              self.latent_dim, self.dropout)
        self.critic_layers = [nn.Dense(w, name=f"critic{k}")
                              for k, w in enumerate(self.critic_hidden)]
        self.critic_out = nn.Dense(1, name="critic_out")

    def __call__(self, batch, train: bool = False):
        return self.actor(batch, train)

    def full_scores(self, batch, train: bool = False):
        return self.actor(batch, train)

    def critic_score(self, feats: jnp.ndarray) -> jnp.ndarray:
        """feats (B, 3) = [ce_u, kl_u, log1p|history|_u] → predicted NDCG."""
        h = feats
        for layer in self.critic_layers:
            h = jax.nn.relu(layer(h))
        return jax.nn.sigmoid(self.critic_out(h))[..., 0]


def ract_critic_features(logits, batch, kl) -> jnp.ndarray:
    """Per-user [CE, KL, log1p(count)] critic inputs (`ract.py`)."""
    log_softmax = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(log_softmax * batch["history"], axis=-1)
    counts = jnp.sum(batch["history"], axis=-1)
    kl_b = jnp.broadcast_to(kl, ce.shape)  # per-user (B,) passes through
    return jnp.stack([ce, kl_b, jnp.log1p(counts)], axis=-1)
