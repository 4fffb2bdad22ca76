"""Attention blocks: DIN target attention, transformer encoder, multi-interest.

Re-designed equivalents of:
  - TargetAttention / LocalActivationUnit (DIN):
    `recbox/ranking/pytorch/layers/attentions/target_attention.py`,
    `third_party/deepctr/layers/core.py:28` + `layers/sequence.py`
    (AttentionSequencePoolingLayer);
  - TransformerEncoder (SASRec/BERT4Rec/PRM):
    `third_party/recbole/model/layers.py:385-632`;
  - CapsuleNetwork (MIND dynamic routing) and MultiInterestSA (ComiRec):
    `third_party/rechub/basic/layers.py:516-650`.

All masking is additive −1e9 on static shapes; attention matrices are O(L²)
over short behavior sequences (L ≤ ~200) so plain XLA attention is already
MXU-bound — no flash kernel needed at these lengths.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from recbox_tpu.nn.core import MLP

__all__ = [
    "TargetAttention", "TransformerEncoder", "PositionalEmbedding",
    "CapsuleNetwork", "MultiInterestSA",
]

NEG_INF = -1e9


class TargetAttention(nn.Module):
    """DIN-style attention of a target item over the behavior sequence.

    score MLP input = [hist, target, hist−target, hist*target]; softmax over
    valid positions (optional); weighted sum → (B, D).
    """
    hidden_units: tuple = (80, 40)
    activation: str = "dice"
    use_softmax: bool = False

    @nn.compact
    def __call__(self, target: jnp.ndarray, sequence: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None, train: bool = False):
        # target (B, D); sequence (B, L, D); mask (B, L) bool
        L = sequence.shape[1]
        t = jnp.repeat(target[:, None, :], L, axis=1)
        att_in = jnp.concatenate([sequence, t, sequence - t, sequence * t], axis=-1)
        score = MLP(self.hidden_units, activation=self.activation,
                    output_dim=1)(att_in, train=train)[..., 0]  # (B, L)
        if mask is not None:
            score = jnp.where(mask, score, NEG_INF if self.use_softmax else 0.0)
        if self.use_softmax:
            score = jax.nn.softmax(score, axis=-1)
        return jnp.einsum("bl,bld->bd", score, sequence)


class PositionalEmbedding(nn.Module):
    """Learned absolute position embedding added to a (B, L, D) sequence."""
    max_len: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        L, D = x.shape[1], x.shape[2]
        pos = self.param("pos_emb", nn.initializers.normal(0.02), (self.max_len, D))
        return x + pos[None, :L, :]


class TransformerEncoder(nn.Module):
    """Stack of pre/post-LN transformer blocks over (B, L, D).

    Mirrors recbole's TransformerEncoder contract
    (`model/layers.py:572-632`): n_layers × [MHA + FFN], layer-norm eps 1e-12,
    GELU feed-forward, additive attention mask. ``causal=True`` adds the
    autoregressive mask used by SASRec (`abstract_recommender.py:175`).
    """
    n_layers: int = 2
    n_heads: int = 2
    hidden_dropout: float = 0.2
    attn_dropout: float = 0.2
    inner_dim_multiple: int = 4
    causal: bool = False
    # computation dtype for the projection/FFN matmuls and attention einsums
    # (params stay fp32; layer-norms and residual adds promote back to fp32).
    # bfloat16 is the MXU-native choice — measured on v5e: the SASRec bench
    # regime's encoder fwd+bwd drops materially at equal learns-signal
    # quality. None = inherit fp32.
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        D = x.shape[-1]
        L = x.shape[1]
        attn_bias = jnp.zeros((1, 1, L, L), x.dtype)
        if mask is not None:
            attn_bias = attn_bias + jnp.where(mask, 0.0, NEG_INF)[:, None, None, :]
        if self.causal:
            causal = jnp.tril(jnp.ones((L, L), bool))
            attn_bias = attn_bias + jnp.where(causal, 0.0, NEG_INF)[None, None]
        assert D % self.n_heads == 0, "hidden dim must divide num heads"
        head_dim = D // self.n_heads
        for i in range(self.n_layers):
            q = nn.DenseGeneral((self.n_heads, head_dim), dtype=self.dtype,
                                name=f"q{i}")(x)
            k = nn.DenseGeneral((self.n_heads, head_dim), dtype=self.dtype,
                                name=f"k{i}")(x)
            v = nn.DenseGeneral((self.n_heads, head_dim), dtype=self.dtype,
                                name=f"v{i}")(x)
            att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
                jnp.asarray(head_dim, q.dtype))
            att = jax.nn.softmax(att + attn_bias.astype(q.dtype), axis=-1)
            att = nn.Dropout(self.attn_dropout, deterministic=not train)(att)
            h = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(x.shape)
            h = nn.Dense(D, dtype=self.dtype, name=f"o{i}")(h)
            h = nn.Dropout(self.hidden_dropout, deterministic=not train)(h)
            x = nn.LayerNorm(epsilon=1e-12)(x + h)
            f = nn.Dense(D * self.inner_dim_multiple, dtype=self.dtype)(x)
            f = jax.nn.gelu(f)
            f = nn.Dense(D, dtype=self.dtype)(f)
            f = nn.Dropout(self.hidden_dropout, deterministic=not train)(f)
            x = nn.LayerNorm(epsilon=1e-12)(x + f)
        return x


class CapsuleNetwork(nn.Module):
    """MIND behavior-to-interest dynamic routing → (B, K, D) interest capsules.

    Re-design of `rechub/basic/layers.py:553-650`: routing logits start from
    a FIXED random draw shared across the batch — the reference's
    non-trainable randn routing logits; a zero init would leave every
    capsule identical forever (uniform softmax → same squash(mean) → same
    logits update, a symmetry nothing breaks). ``routing_rounds`` iterations
    of squash(softmax-routing); the bilinear map S is shared across
    capsules. Stop-gradient on the logits update matches the reference
    detach(). Padded behaviors are excluded by ZEROING their routing weight
    after the softmax (the softmax runs over the capsule axis, so an
    additive per-position mask would cancel out).
    """
    interest_num: int = 4
    routing_rounds: int = 3

    @nn.compact
    def __call__(self, history: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B, L, D = history.shape
        S = self.param("bilinear", nn.initializers.xavier_normal(), (D, D))
        u = jnp.einsum("bld,de->ble", history, S)  # (B, L, D)
        # deterministic symmetry-breaking init (reference: fixed randn)
        logits = jnp.broadcast_to(
            jax.random.normal(jax.random.PRNGKey(17),
                              (1, self.interest_num, L), u.dtype),
            (B, self.interest_num, L))
        keep = mask[:, None, :].astype(u.dtype)    # (B, 1, L)

        def squash(v):
            n2 = jnp.sum(v * v, axis=-1, keepdims=True)
            return (n2 / (1.0 + n2)) * v * jax.lax.rsqrt(n2 + 1e-9)

        caps = jnp.zeros((B, self.interest_num, D), u.dtype)
        for _ in range(self.routing_rounds):
            w = jax.nn.softmax(logits, axis=1) * keep
            caps = squash(jnp.einsum("bkl,bld->bkd", w, u))
            logits = logits + jnp.einsum(
                "bkd,bld->bkl", caps, jax.lax.stop_gradient(u))
        return caps


class MultiInterestSA(nn.Module):
    """ComiRec self-attentive multi-interest extractor → (B, K, D).

    Reference: `rechub/basic/layers.py:516-552` — tanh(W1·h) → K attention
    heads → weighted sums of the history.
    """
    interest_num: int = 4
    hidden_dim: Optional[int] = None

    @nn.compact
    def __call__(self, history: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B, L, D = history.shape
        hidden = self.hidden_dim or D * 4
        h = jnp.tanh(nn.Dense(hidden, use_bias=False)(history))
        att = nn.Dense(self.interest_num, use_bias=False)(h)  # (B, L, K)
        att = att + jnp.where(mask, 0.0, NEG_INF)[..., None]
        att = jax.nn.softmax(att, axis=1)
        return jnp.einsum("blk,bld->bkd", att, history)
