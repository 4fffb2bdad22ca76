"""KD_DAGFM: knowledge-distilled directed-acyclic-graph factorization
machine.

Re-design of recbole's `third_party/recbole/model/context_aware_recommender/
kd_dagfm.py`: the student is a DAGFM — field states propagate over a learned
complete field graph for L layers (x^{l+1}_i = Σ_j w^l_{ij} ⊙ x^l_j, inner
or outer kernels), logits from the concatenated layer sums — trained to
match a stronger teacher's logits (`distillation_loss`) then fine-tuned
with CTR loss. Any registered CTR model can be the teacher.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from recbox_tpu.models.ranking.ctr import _FieldModel
from recbox_tpu.nn.embedding import stack_embeddings

__all__ = ["DAGFM", "KD_DAGFM", "distillation_loss"]


class DAGFM(_FieldModel):
    """The student network (`kd_dagfm.py` DAGFM): per-layer field-graph
    propagation with elementwise ('inner') or low-rank outer kernels."""

    n_layers: int = 3
    kernel_type: str = "inner"   # 'inner' | 'outer'
    rank: int = 8

    @nn.compact
    def __call__(self, batch, train: bool = False):
        field = stack_embeddings(self._embedding()(batch),
                                 self.feature_map.input_features)
        B, F, D = field.shape
        x = field
        outs = [jnp.sum(field, axis=1)]
        for l in range(self.n_layers):
            if self.kernel_type == "inner":
                w = self.param(f"w{l}", nn.initializers.xavier_normal(),
                               (F, F, D))
                x = jnp.einsum("bfd,fgd->bgd", x, w) * field + x
            else:
                p = self.param(f"p{l}", nn.initializers.xavier_normal(),
                               (F, F, D, self.rank))
                q = self.param(f"q{l}", nn.initializers.xavier_normal(),
                               (F, F, self.rank, D))
                prop = jnp.einsum("bfd,fgdr,fgre->bge", x, p, q)
                x = prop * field + x
            outs.append(jnp.sum(x, axis=1))
        feats = jnp.concatenate(outs, axis=-1).astype(jnp.float32)
        logit = nn.Dense(1, kernel_init=nn.initializers.xavier_normal(),
                         name="head")(feats)
        return logit.reshape(-1)


class KD_DAGFM(DAGFM):
    """Alias carrying the reference's registered name; the distillation
    schedule (teacher forward → `distillation_loss` → CTR fine-tune) lives
    in the training loop, mirroring `kd_dagfm.py`'s two-phase fit."""


def distillation_loss(student_logits, teacher_logits, labels=None,
                      alpha: float = 0.9) -> jnp.ndarray:
    """α·MSE(student, teacher logits) + (1−α)·BCE(student, labels)
    (`kd_dagfm.py` loss shape); labels optional for pure distillation."""
    kd = jnp.mean(jnp.square(student_logits
                             - jax.lax.stop_gradient(teacher_logits)))
    if labels is None:
        return kd
    bce = jnp.mean(jax.nn.softplus(student_logits)
                   - labels * student_logits)
    return alpha * kd + (1.0 - alpha) * bce
