"""Multi-task CTR models: SharedBottom, MMOE, PLE, ESMM, AITM.

Re-designed from the reference MTL zoos (`third_party/rechub/models/
multi_task/*.py`, `third_party/deepctr/models/multitask/*.py`, first-party
MultiTaskModel `recbox/ranking/pytorch/models/multitask_model.py:29-130`).

Contract: `__call__(batch) -> (B, T)` task outputs ordered like
``feature_map.labels``. All models emit logits except ESMM, whose second head
is the product probability pCTCVR = pCTR·pCVR (`output_type` = 'probs') —
use `multitask_loss(..., from_logits=False)` there.
Expert MLPs are batched with einsum over an expert axis (one MXU matmul per
layer for all experts) rather than a Python module list per expert.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recbox_tpu.features.schema import FeatureMap
from recbox_tpu.models.base import RankingModel
from recbox_tpu.nn.core import MLP
from recbox_tpu.nn.embedding import FeatureEmbedding, concat_embeddings

__all__ = ["SharedBottom", "MMOE", "PLE", "ESMM", "AITM", "multitask_loss"]


def multitask_loss(outputs: jnp.ndarray, labels: jnp.ndarray,
                   weights=None, from_logits: bool = True) -> jnp.ndarray:
    """Σ_t w_t · BCE(outputs[:, t], labels[:, t]) — EQ weighting default
    (reference `multitask_model.py:95-108`)."""
    labels = labels.astype(outputs.dtype)
    if from_logits:
        per = jax.nn.softplus(outputs) - labels * outputs
    else:
        p = jnp.clip(outputs, 1e-7, 1 - 1e-7)
        per = -(labels * jnp.log(p) + (1 - labels) * jnp.log1p(-p))
    per_task = jnp.mean(per, axis=0)  # (T,)
    if weights is not None:
        per_task = per_task * jnp.asarray(weights, outputs.dtype)
    return jnp.sum(per_task)


class _MTLBase(RankingModel):
    embedding_dim: int = 16

    @property
    def num_tasks(self) -> int:
        return len(self.feature_map.labels)

    def _embed_flat(self, batch) -> jnp.ndarray:
        embs = FeatureEmbedding(self.feature_map,
                                embedding_dim=self.embedding_dim,
                                name="embedding")(batch)
        return concat_embeddings(embs, self.feature_map.input_features)


class _BatchedExperts(nn.Module):
    """E parallel MLPs computed as stacked einsums: (B, D) → (B, E, H)."""

    num_experts: int
    hidden_units: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        E = self.num_experts
        h = jnp.repeat(x[:, None, :], E, axis=1)  # (B, E, D)
        for li, units in enumerate(self.hidden_units):
            w = self.param(f"w{li}", nn.initializers.xavier_normal(),
                           (E, h.shape[-1], units))
            b = self.param(f"b{li}", nn.initializers.zeros, (E, units))
            h = jax.nn.relu(jnp.einsum("bed,edu->beu", h, w) + b)
        return h


class SharedBottom(_MTLBase):
    """Shared MLP bottom + per-task towers (`shared_bottom.py` shape)."""

    bottom_units: Sequence[int] = (256, 128)
    tower_units: Sequence[int] = (64,)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        x = self._embed_flat(batch)
        bottom = MLP(self.bottom_units, dropout=self.dropout,
                     name="bottom")(x, train=train)
        outs = [MLP(self.tower_units, output_dim=1, dropout=self.dropout,
                    name=f"tower_{t}")(bottom, train=train)
                for t in range(self.num_tasks)]
        return jnp.concatenate(outs, axis=-1)


class MMOE(_MTLBase):
    """Multi-gate mixture of experts (`mmoe.py` shape)."""

    num_experts: int = 4
    expert_units: Sequence[int] = (256, 128)
    tower_units: Sequence[int] = (64,)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        x = self._embed_flat(batch)
        experts = _BatchedExperts(self.num_experts, tuple(self.expert_units),
                                  name="experts")(x)  # (B, E, H)
        outs = []
        for t in range(self.num_tasks):
            gate = jax.nn.softmax(
                nn.Dense(self.num_experts, use_bias=False,
                         name=f"gate_{t}")(x), axis=-1)
            mixed = jnp.einsum("beh,be->bh", experts, gate)
            outs.append(MLP(self.tower_units, output_dim=1,
                            dropout=self.dropout,
                            name=f"tower_{t}")(mixed, train=train))
        return jnp.concatenate(outs, axis=-1)


class PLE(_MTLBase):
    """Progressive layered extraction (`ple.py` shape): per-task experts +
    shared experts with customized gate control, ``num_levels`` deep."""

    num_levels: int = 1
    specific_experts: int = 2
    shared_experts: int = 2
    expert_units: Sequence[int] = (128,)
    tower_units: Sequence[int] = (64,)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        x = self._embed_flat(batch)
        T = self.num_tasks
        task_inputs = [x] * T
        shared_input = x
        for level in range(self.num_levels):
            task_expert_outs = []
            for t in range(T):
                e = _BatchedExperts(self.specific_experts,
                                    tuple(self.expert_units),
                                    name=f"l{level}_task{t}_experts")(task_inputs[t])
                task_expert_outs.append(e)  # (B, S, H)
            shared_out = _BatchedExperts(self.shared_experts,
                                         tuple(self.expert_units),
                                         name=f"l{level}_shared_experts")(shared_input)
            new_task_inputs = []
            for t in range(T):
                cand = jnp.concatenate([task_expert_outs[t], shared_out], axis=1)
                gate = jax.nn.softmax(
                    nn.Dense(cand.shape[1], use_bias=False,
                             name=f"l{level}_gate{t}")(task_inputs[t]), axis=-1)
                new_task_inputs.append(jnp.einsum("beh,be->bh", cand, gate))
            if level < self.num_levels - 1:
                # the final CGC level has no shared branch (its mixture
                # would feed nothing — only the towers read task_inputs)
                all_experts = jnp.concatenate(
                    task_expert_outs + [shared_out], axis=1)
                shared_gate = jax.nn.softmax(
                    nn.Dense(all_experts.shape[1], use_bias=False,
                             name=f"l{level}_shared_gate")(shared_input),
                    axis=-1)
                shared_input = jnp.einsum("beh,be->bh", all_experts,
                                          shared_gate)
            task_inputs = new_task_inputs
        outs = [MLP(self.tower_units, output_dim=1, dropout=self.dropout,
                    name=f"tower_{t}")(task_inputs[t], train=train)
                for t in range(T)]
        return jnp.concatenate(outs, axis=-1)


class ESMM(_MTLBase):
    """Entire-space multi-task model (`esmm.py` shape): labels = (ctr, ctcvr);
    outputs (B, 2) = (pCTR, pCTCVR = pCTR·pCVR), probabilities."""

    tower_units: Sequence[int] = (128, 64)
    dropout: float = 0.0
    output_type: str = "probs"

    @nn.compact
    def __call__(self, batch, train: bool = False):
        assert self.num_tasks == 2, "ESMM needs (ctr, ctcvr) labels"
        x = self._embed_flat(batch)
        ctr_logit = MLP(self.tower_units, output_dim=1, dropout=self.dropout,
                        name="ctr_tower")(x, train=train)
        cvr_logit = MLP(self.tower_units, output_dim=1, dropout=self.dropout,
                        name="cvr_tower")(x, train=train)
        pctr = jax.nn.sigmoid(ctr_logit)
        pcvr = jax.nn.sigmoid(cvr_logit)
        return jnp.concatenate([pctr, pctr * pcvr], axis=-1)


class AITM(_MTLBase):
    """Adaptive information transfer multi-task (`aitm.py` shape): task t
    receives an attention-fused transfer from task t−1's tower output —
    ordered labels model a conversion funnel."""

    tower_units: Sequence[int] = (128, 64)
    transfer_dim: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train: bool = False):
        x = self._embed_flat(batch)
        T = self.num_tasks
        towers = [MLP(self.tower_units, output_dim=self.transfer_dim,
                      dropout=self.dropout, name=f"tower_{t}")(x, train=train)
                  for t in range(T)]
        outs = []
        prev = None
        for t in range(T):
            cur = towers[t]
            if prev is not None:
                transfer = nn.Dense(self.transfer_dim, name=f"transfer_{t}")(prev)
                stack = jnp.stack([cur, transfer], axis=1)  # (B, 2, H)
                q = nn.Dense(self.transfer_dim, use_bias=False, name=f"q{t}")(stack)
                k = nn.Dense(self.transfer_dim, use_bias=False, name=f"k{t}")(stack)
                v = nn.Dense(self.transfer_dim, use_bias=False, name=f"v{t}")(stack)
                att = jax.nn.softmax(
                    jnp.sum(q * k, axis=-1) / jnp.sqrt(float(self.transfer_dim)),
                    axis=-1)
                cur = jnp.einsum("bn,bnh->bh", att, v)
            outs.append(nn.Dense(1, name=f"head_{t}")(cur))
            prev = cur
        return jnp.concatenate(outs, axis=-1)
