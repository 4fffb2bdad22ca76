"""Generative / RL rerankers: EGR evaluator-generator and a PPO pointer
policy.

Re-designed from librerank's TF1 graphs
(`third_party/librerank/reranker.py:418-530` EGR evaluator/discriminator,
`third_party/librerank/rl_reranker.py:6-309` RLModel/PPOModel): session
loops and feed-dicts become a `lax.scan` pointer decoder — each step attends
the remaining candidates against a GRU state over the already-emitted
prefix, samples (or argmaxes) the next item, and masks it out. Sampling is
jit-compatible (categorical over −inf-masked logits), so rollout, reward,
and the PPO update all stay on device.

Batch contract matches `models.py`: item_feats (B, N, D), mask (B, N).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recbox_tpu.nn.core import MLP

__all__ = ["EGREvaluator", "EGRDiscriminator", "PPOReranker",
           "reinforce_loss", "ppo_loss", "list_reward_ndcg"]


class EGREvaluator(nn.Module):
    """List evaluator (`reranker.py:418-470` EGR_evaluator): Bi-GRU over the
    ordered list → per-item click logits + a list-level value. Trained with
    listwise BCE on logged lists; its mean click probability is the reward
    signal for the generator."""

    d_model: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, item_feats, mask, train: bool = False):
        x = nn.Dense(self.d_model, name="proj")(item_feats)
        # length-aware recurrence (the reference's
        # bidirectional_dynamic_rnn + sequence_length): a plain flip would
        # run the backward GRU through padded slots, making valid items'
        # logits — and thus the generator's reward — depend on padding.
        # seq_lengths assumes a valid PREFIX; roll rows whose valid run
        # starts later (pre-padded lists) to a prefix and roll back after.
        N = x.shape[1]
        lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
        lead = jnp.argmax(mask.astype(jnp.int32), axis=-1)
        pos = jnp.arange(N)[None, :]
        fwd_idx = (pos + lead[:, None]) % N
        inv_idx = (pos - lead[:, None]) % N
        xp = jnp.take_along_axis(x, fwd_idx[..., None], axis=1)
        fwd = nn.RNN(nn.GRUCell(self.d_model), name="fwd")(
            xp, seq_lengths=lengths)
        bwd = nn.RNN(nn.GRUCell(self.d_model), name="bwd", reverse=True,
                     keep_order=True)(xp, seq_lengths=lengths)
        h = jnp.concatenate([fwd, bwd], axis=-1)
        h = jnp.take_along_axis(h, inv_idx[..., None], axis=1)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        scores = nn.Dense(1, name="score")(h)[..., 0]
        return scores

    def list_value(self, item_feats, mask, train: bool = False) -> jnp.ndarray:
        """Expected list reward = masked mean click probability (B,)."""
        scores = self(item_feats, mask, train)
        p = jax.nn.sigmoid(scores) * mask.astype(scores.dtype)
        return jnp.sum(p, axis=-1) / jnp.maximum(
            jnp.sum(mask.astype(scores.dtype), axis=-1), 1.0)


class EGRDiscriminator(nn.Module):
    """Order discriminator (`reranker.py:471-530` EGR_discriminator):
    real (logged) vs generated orders → one logit per list."""

    d_model: int = 64
    hidden_units: Sequence[int] = (64, 32)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, item_feats, mask, train: bool = False):
        x = nn.Dense(self.d_model, name="proj")(item_feats)
        h = nn.RNN(nn.GRUCell(self.d_model), name="gru")(x)
        m = mask[..., None].astype(h.dtype)
        pooled = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        out = MLP(self.hidden_units, output_dim=1, dropout=self.dropout,
                  name="head")(pooled, train=train)
        return out[..., 0]                                    # (B,) logits


class PPOReranker(nn.Module):
    """Pointer-decoder policy (`rl_reranker.py` RLModel/PPOModel): emit a
    permutation of the candidate list one position at a time.

    `rollout` returns (perm, logp, value); `scores` gives deterministic
    per-item scores (−position of argmax decoding) so the model also serves
    through the standard reranker scoring interface.
    """

    d_model: int = 64
    max_list_len: int = 30

    def setup(self):
        self.proj = nn.Dense(self.d_model, name="proj")
        self.cell = nn.GRUCell(self.d_model, name="cell")
        self.att_c = nn.Dense(self.d_model, use_bias=False, name="att_c")
        self.att_h = nn.Dense(self.d_model, use_bias=False, name="att_h")
        self.att_v = nn.Dense(1, use_bias=False, name="att_v")
        self.value_head = nn.Dense(1, name="value")

    def _pointer_logits(self, cand, h):
        """cand (B, N, D), h (B, D) → (B, N) selection logits."""
        e = jnp.tanh(self.att_c(cand) + self.att_h(h)[:, None])
        return self.att_v(e)[..., 0]

    def _materialize(self, cand, h0):
        # flax params cannot be created inside lax.scan bodies — touch every
        # submodule once outside the scan so init happens in the outer scope
        self._pointer_logits(cand, h0)
        self.cell(h0, cand[:, 0])
        self.value_head(h0)

    def _decode(self, item_feats, mask, rng, greedy: bool):
        cand = self.proj(item_feats)                          # (B, N, D)
        B, N, D = cand.shape
        h0 = jnp.mean(cand * mask[..., None].astype(cand.dtype), axis=1)
        avail0 = mask
        self._materialize(cand, h0)

        def step(carry, key):
            h, picked = carry
            avail = avail0 & ~picked
            # once valid candidates run out, emit remaining invalid slots so
            # the output is always a true permutation of 0..N−1
            sel = jnp.where(jnp.any(avail, axis=-1, keepdims=True),
                            avail, ~picked)
            logits = jnp.where(sel, self._pointer_logits(cand, h), -1e9)
            if greedy:
                choice = jnp.argmax(logits, axis=-1)
            else:
                choice = jax.random.categorical(key, logits, axis=-1)
            logp = jax.nn.log_softmax(logits, axis=-1)[
                jnp.arange(B), choice]
            chosen = jnp.take_along_axis(cand, choice[:, None, None]
                                         .repeat(D, 2), axis=1)[:, 0]
            new_h, _ = self.cell(h, chosen)
            picked = picked | (jnp.arange(N)[None, :] == choice[:, None])
            return (new_h, picked), (choice, logp)

        keys = jax.random.split(rng, N)
        picked0 = jnp.zeros_like(mask)
        (hT, _), (perm, logp) = jax.lax.scan(step, (h0, picked0), keys)
        value = self.value_head(hT)[..., 0]
        return jnp.swapaxes(perm, 0, 1), jnp.swapaxes(logp, 0, 1), value

    def rollout(self, item_feats, mask, rng) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Sample a permutation: perm (B, N) item indices by emitted
        position, per-step log-probs (B, N), critic value (B,)."""
        return self._decode(item_feats, mask, rng, greedy=False)

    def __call__(self, item_feats, mask, train: bool = False) -> jnp.ndarray:
        """Deterministic scores: items emitted earlier score higher
        (score = N − emit position), masked to −1e9 on invalid slots."""
        perm, _, _ = self._decode(item_feats, mask,
                                  jax.random.PRNGKey(0), greedy=True)
        B, N = perm.shape
        pos = jnp.zeros((B, N), jnp.float32).at[
            jnp.arange(B)[:, None], perm].set(
            jnp.arange(N, dtype=jnp.float32)[None, :])
        return jnp.where(mask, N - pos, -1e9)

    def evaluate_actions(self, item_feats, mask, perm):
        """Log-probs/value of a *given* permutation under the current policy
        (the PPO re-evaluation pass)."""
        cand = self.proj(item_feats)
        B, N, D = cand.shape
        h0 = jnp.mean(cand * mask[..., None].astype(cand.dtype), axis=1)
        self._materialize(cand, h0)

        def step(carry, choice):
            h, picked = carry
            avail = mask & ~picked
            sel = jnp.where(jnp.any(avail, axis=-1, keepdims=True),
                            avail, ~picked)
            logits = jnp.where(sel, self._pointer_logits(cand, h), -1e9)
            logp_all = jax.nn.log_softmax(logits, axis=-1)
            logp = logp_all[jnp.arange(B), choice]
            ent = -jnp.sum(jnp.exp(logp_all) * logp_all *
                           sel.astype(logp_all.dtype), axis=-1)
            chosen = jnp.take_along_axis(cand, choice[:, None, None]
                                         .repeat(D, 2), axis=1)[:, 0]
            new_h, _ = self.cell(h, chosen)
            picked = picked | (jnp.arange(N)[None, :] == choice[:, None])
            return (new_h, picked), (logp, ent)

        picked0 = jnp.zeros_like(mask)
        (hT, _), (logp, ent) = jax.lax.scan(step, (h0, picked0),
                                            jnp.swapaxes(perm, 0, 1))
        value = self.value_head(hT)[..., 0]
        return (jnp.swapaxes(logp, 0, 1), jnp.swapaxes(ent, 0, 1), value)


def list_reward_ndcg(perm, labels, mask, k: int = 10) -> jnp.ndarray:
    """NDCG@k of an emitted permutation against per-item labels (B,)."""
    B, N = perm.shape
    lab = jnp.take_along_axis(labels * mask.astype(labels.dtype),
                              perm, axis=1)
    pos = jnp.arange(N)
    disc = jnp.where(pos < k, 1.0 / jnp.log2(pos + 2.0), 0.0)
    dcg = jnp.sum(lab * disc[None, :], axis=-1)
    ideal = jnp.sort(labels * mask.astype(labels.dtype), axis=-1)[:, ::-1]
    idcg = jnp.sum(ideal * disc[None, :], axis=-1)
    return dcg / jnp.maximum(idcg, 1e-9)


def _masked_sum(logp, step_mask):
    """Sum per-step log-probs over VALID decode steps only. Slates shorter
    than N emit filler picks of padded slots once real candidates run out;
    their log-probs are meaningless and must not drive gradients."""
    if step_mask is None:
        return jnp.sum(logp, axis=-1)
    return jnp.sum(logp * step_mask.astype(logp.dtype), axis=-1)


def reinforce_loss(logp, reward, baseline=None,
                   step_mask=None) -> jnp.ndarray:
    """REINFORCE with optional baseline (`rl_reranker.py` RLModel).
    ``step_mask`` (B, N) flags the valid (non-filler) decode steps — e.g.
    ``arange(N)[None] < mask.sum(1)[:, None]``."""
    adv = reward if baseline is None else reward - baseline
    return -jnp.mean(_masked_sum(logp, step_mask)
                     * jax.lax.stop_gradient(adv))


def ppo_loss(logp_new, logp_old, advantage, value, reward,
             clip_eps: float = 0.2, vf_coef: float = 0.5,
             ent_coef: float = 0.0, entropy=None,
             step_mask=None) -> jnp.ndarray:
    """Clipped PPO objective (`rl_reranker.py:215-309` PPOModel): per-list
    ratio over summed step log-probs, value MSE, optional entropy bonus.
    ``step_mask`` excludes filler decode steps (see reinforce_loss)."""
    ratio = jnp.exp(_masked_sum(logp_new - logp_old, step_mask))
    adv = jax.lax.stop_gradient(advantage)
    pg = -jnp.mean(jnp.minimum(
        ratio * adv,
        jnp.clip(ratio, 1 - clip_eps, 1 + clip_eps) * adv))
    vf = jnp.mean(jnp.square(value - reward))
    ent = 0.0 if entropy is None else -jnp.mean(
        _masked_sum(entropy, step_mask))
    return pg + vf_coef * vf + ent_coef * ent
