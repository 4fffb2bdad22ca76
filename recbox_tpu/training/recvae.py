"""RecVAE alternating trainer: enc/dec phases + composite-prior refresh.

Mirrors recbole's RecVAETrainer (`trainer/trainer.py:1257-1300`): each outer
epoch runs `n_enc_epochs` sweeps updating ONLY the encoder, then refreshes
the composite prior's frozen encoder snapshot (`recvae.py:195-196`
update_prior), then `n_dec_epochs` sweeps updating ONLY the decoder.
TPU-native shape: the two phases are two jitted steps over `optax.masked`
optimizers (one Adam state per phase, exactly the reference's two
optimizers); the old-encoder snapshot is a frozen params arg, not a module
copy."""

from __future__ import annotations

import logging
from typing import Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from recbox_tpu.utils.seeding import training_key

from recbox_tpu.models.matching.autoencoder import recvae_loss

logger = logging.getLogger("recbox_tpu")

__all__ = ["RecVAETrainer"]


def _phase_mask(params: dict, decoder: bool) -> dict:
    """True where the leaf belongs to the phase (top-level 'dec' = decoder)."""
    return {k: jax.tree_util.tree_map(
        lambda _: (k == "dec") == decoder, v)
        for k, v in params.items()}


class RecVAETrainer:
    """Alternating optimization for `RecVAE`.

    Usage::

        t = RecVAETrainer(model)
        t.fit(history, epochs=50, batch_size=500)
        scores = t.scores(history)     # (B, N) for retrieval eval
    """

    def __init__(self, model, learning_rate: float = 5e-4,
                 n_enc_epochs: int = 3, n_dec_epochs: int = 1,
                 seed: int = 2024, rng_impl: str = "rbg"):
        self.model = model
        self.learning_rate = learning_rate
        self.n_enc_epochs = n_enc_epochs
        self.n_dec_epochs = n_dec_epochs
        self.params = None
        self.old_params = None      # the composite prior's frozen encoder
        self._rng = training_key(seed, rng_impl)
        self._np_rng = np.random.default_rng(seed)
        self._steps: Dict[bool, callable] = {}
        self._opt_states: Dict[bool, object] = {}
        self._txs: Dict[bool, optax.GradientTransformation] = {}

    def _init(self, sample: Dict[str, np.ndarray]) -> None:
        rng, self._rng = jax.random.split(self._rng)
        batch = {k: jnp.asarray(v) for k, v in sample.items()}
        variables = self.model.init(
            {"params": rng, "reparam": rng, "dropout": rng}, batch,
            train=True, method=self.model.forward_with_latents)
        self.params = flax.linen.meta.unbox(
            flax.core.unfreeze(variables)["params"])
        self.old_params = jax.tree_util.tree_map(jnp.array, self.params)
        for decoder in (False, True):
            mask = _phase_mask(self.params, decoder)
            inv = jax.tree_util.tree_map(lambda m: not m, mask)
            # optax.masked passes unmasked updates through UNCHANGED, so the
            # out-of-phase grads must be zeroed explicitly
            tx = optax.chain(optax.masked(optax.set_to_zero(), inv),
                             optax.masked(optax.adam(self.learning_rate),
                                          mask))
            self._txs[decoder] = tx
            self._opt_states[decoder] = tx.init(self.params)

    def _build_step(self, decoder: bool):
        model = self.model
        tx = self._txs[decoder]
        gamma, beta = model.gamma, model.beta

        def step(params, old_params, opt_state, batch, rng):
            def loss_fn(p):
                logits, mu, logvar, z = model.apply(
                    {"params": p}, batch, train=True,
                    rngs={"reparam": rng,
                          "dropout": jax.random.fold_in(rng, 1)},
                    method=model.forward_with_latents)
                prior = model.apply({"params": old_params}, batch, z,
                                    method=model.composite_prior_logpdf)
                return recvae_loss(logits, mu, logvar, z, prior, batch,
                                   gamma=gamma, beta=beta)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        return jax.jit(step, donate_argnums=(0, 2))

    def _sweep(self, history: np.ndarray, batch_size: int,
               decoder: bool) -> float:
        if decoder not in self._steps:
            self._steps[decoder] = self._build_step(decoder)
        step = self._steps[decoder]
        n = len(history)
        batch_size = min(batch_size, n)  # small datasets: one full batch
        order = self._np_rng.permutation(n)
        losses = []
        for i in range(0, n - batch_size + 1, batch_size):
            batch = {"history": jnp.asarray(history[order[i:i + batch_size]])}
            rng, self._rng = jax.random.split(self._rng)
            self.params, self._opt_states[decoder], loss = step(
                self.params, self.old_params, self._opt_states[decoder],
                batch, rng)
            losses.append(loss)
        return float(jnp.mean(jnp.stack(losses))) if losses else float("nan")

    def update_prior(self) -> None:
        """old encoder ← current encoder (`recvae.py:195-196`)."""
        self.old_params = jax.tree_util.tree_map(jnp.array, self.params)

    def fit(self, history: np.ndarray, epochs: int = 10,
            batch_size: int = 500,
            eval_fn: Optional[callable] = None) -> dict:
        history = np.asarray(history, np.float32)
        if self.params is None:
            self._init({"history": history[:min(len(history), batch_size)]})
        for epoch in range(epochs):
            enc_loss = dec_loss = float("nan")  # n_*_epochs may be 0
            for _ in range(self.n_enc_epochs):
                enc_loss = self._sweep(history, batch_size, decoder=False)
            self.update_prior()
            for _ in range(self.n_dec_epochs):
                dec_loss = self._sweep(history, batch_size, decoder=True)
            logger.info("recvae epoch %d: enc %.4f dec %.4f",
                        epoch, enc_loss, dec_loss)
            if eval_fn is not None:
                eval_fn(self)
        return self.params

    def scores(self, history: np.ndarray) -> np.ndarray:
        """(B, N) full-corpus scores for retrieval evaluation."""
        batch = {"history": jnp.asarray(np.asarray(history, np.float32))}
        return np.asarray(self.model.apply(
            {"params": self.params}, batch, train=False))
