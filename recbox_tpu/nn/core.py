"""Core NN blocks: MLP, logistic regression, factorization machine, activations.

Functional equivalents of the reference blocks (re-designed for XLA fusion):
  - MLP_Layer / MLP_Block / DNN: `recbox/core/pytorch/layers/mlp.py:8-39`,
    `third_party/deepctr/layers/core.py:123`;
  - Dice / tanh-GELU activations: `recbox/core/pytorch/layers/activations.py:23-40`;
  - FactorizationMachine: `recbox/ranking/pytorch/layers/blocks/...`,
    `third_party/deepctr/layers/interaction.py:557` (sum-square trick);
  - LogisticRegression first-order term: field-wise 1-d embeddings + bias.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["MLP", "Dice", "get_activation", "FactorizationMachine", "LogisticRegression"]


class Dice(nn.Module):
    """Data-adaptive activation from the DIN paper.

    p(x) = sigmoid(batchnorm(x)); out = p*x + (1-p)*alpha*x — reference
    `activations.py:23-33` (batchnorm without affine, eps=1e-9).
    """
    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = nn.BatchNorm(use_running_average=not train, use_bias=False,
                            use_scale=False, epsilon=1e-9)(x)
        alpha = self.param("alpha", nn.initializers.zeros, (x.shape[-1],))
        p = jax.nn.sigmoid(norm)
        return p * x + (1.0 - p) * alpha * x


_ACTIVATIONS: dict = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "leaky_relu": jax.nn.leaky_relu,
    "softmax": jax.nn.softmax,
    "elu": jax.nn.elu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "identity": lambda x: x,
    "linear": lambda x: x,
    "none": lambda x: x,
}


def get_activation(act: Union[str, Callable, None]) -> Callable:
    """String registry like the reference `set_activation`
    (`recbox/utils/torch_utils.py:84-96`). 'dice' must be used as a module."""
    if act is None:
        return lambda x: x
    if callable(act):
        return act
    key = act.lower()
    if key == "dice":
        raise ValueError("Dice is stateful; instantiate recbox_tpu.nn.Dice directly")
    if key not in _ACTIVATIONS:
        raise NotImplementedError(f"activation={act}")
    return _ACTIVATIONS[key]


class MLP(nn.Module):
    """Configurable tower: [Dense → (BN) → act → (dropout)]* → optional head.

    Mirrors MLP_Layer semantics (`mlp.py:8-39`): per-layer hidden units,
    activations, batch_norm before activation, dropout after, optional
    final ``output_dim`` layer with no activation.
    """

    hidden_units: Sequence[int]
    activation: Union[str, Sequence[str]] = "relu"
    output_dim: Optional[int] = None
    dropout: Union[float, Sequence[float]] = 0.0
    batch_norm: bool = False
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.hidden_units)
        acts = [self.activation] * n if isinstance(self.activation, str) else list(self.activation)
        drops = [self.dropout] * n if isinstance(self.dropout, (int, float)) else list(self.dropout)
        for i, units in enumerate(self.hidden_units):
            x = nn.Dense(units, use_bias=self.use_bias, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_normal())(x)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train)(x)
            if str(acts[i]).lower() == "dice":
                x = Dice()(x, train=train)
            else:
                x = get_activation(acts[i])(x)
            if drops[i] > 0:
                x = nn.Dropout(rate=drops[i], deterministic=not train)(x)
        if self.output_dim is not None:
            x = nn.Dense(self.output_dim, use_bias=self.use_bias, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_normal())(x)
        return x


class FactorizationMachine(nn.Module):
    """Second-order FM over stacked field embeddings (B, F, D) → (B, 1).

    0.5 * (sum² − sum-of-squares) summed over D — the classic identity the
    reference uses (`deepctr/layers/interaction.py:557-600`); one fused
    reduction, no pairwise loop.
    """

    @nn.compact
    def __call__(self, field_emb: jnp.ndarray) -> jnp.ndarray:
        sum_sq = jnp.square(jnp.sum(field_emb, axis=1))
        sq_sum = jnp.sum(jnp.square(field_emb), axis=1)
        return 0.5 * jnp.sum(sum_sq - sq_sum, axis=-1, keepdims=True)


class LogisticRegression(nn.Module):
    """First-order linear term: per-field scalar weights + global bias → (B, 1).

    Implemented as a dim-1 FeatureEmbedding consumer: callers pass the stacked
    (B, F, 1) weight lookups or a flat (B, K) input.
    """

    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 3:
            out = jnp.sum(x, axis=(1, 2), keepdims=False)[:, None]
        else:
            out = nn.Dense(1, use_bias=False,
                           kernel_init=nn.initializers.xavier_normal())(x)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (1,))
            out = out + b
        return out
