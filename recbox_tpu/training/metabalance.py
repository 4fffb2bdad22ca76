"""MetaBalance: gradient-magnitude balancing for multi-task training.

Re-design of Torch-RecHub's MetaBalance optimizer
(`third_party/rechub/basic/metaoptimizer.py:9-80`): for parameters shared
across tasks, each auxiliary task's gradient is rescaled so its moving-
average norm tracks the dominant task's norm, relaxed by `relax_factor` —
preventing one task's gradient from drowning the others.

Functional form for JAX: the caller computes per-task gradients of the
shared params (jax.grad per loss, or jax.jacrev once) and folds the balanced
sum into any optax optimizer. State = per-task moving-average norms, a
pytree-matching dict.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["MetaBalanceState", "metabalance_init", "metabalance_combine"]


class MetaBalanceState(NamedTuple):
    # per-task, per-leaf moving-average gradient norms
    norms: Tuple


def metabalance_init(n_tasks: int, params) -> MetaBalanceState:
    zeros = [jax.tree_util.tree_map(lambda x: jnp.zeros(()), params)
             for _ in range(n_tasks)]
    return MetaBalanceState(norms=tuple(zeros))


def metabalance_combine(task_grads: Sequence, state: MetaBalanceState,
                        relax_factor: float = 0.7,
                        beta: float = 0.9):
    """Balance per-task gradients of SHARED params and sum them.

    Args:
      task_grads: list of pytrees, one per task (task 0 = the main task
        whose magnitude anchors the rest — rechub uses the first loss).
      state: moving-average norms from previous step.
      relax_factor: 0 = leave auxiliary grads untouched, 1 = fully match
        the main task's norm (reference default 0.7).
      beta: moving-average decay (reference 0.9).

    Returns (combined_grads, new_state).
    """
    n_tasks = len(task_grads)
    leaves0, treedef = jax.tree_util.tree_flatten(task_grads[0])
    all_leaves = [jax.tree_util.tree_flatten(g)[0] for g in task_grads]
    norm_leaves = [jax.tree_util.tree_flatten(n)[0] for n in state.norms]

    new_norms: List[List[jnp.ndarray]] = [[] for _ in range(n_tasks)]
    combined = []
    for li in range(len(leaves0)):
        norms_t = []
        for t in range(n_tasks):
            g = all_leaves[t][li]
            n_now = jnp.linalg.norm(g)
            n_avg = beta * norm_leaves[t][li] + (1.0 - beta) * n_now
            new_norms[t].append(n_avg)
            norms_t.append(n_avg)
        anchor = norms_t[0]
        total = all_leaves[0][li]
        for t in range(1, n_tasks):
            scale = anchor / jnp.maximum(norms_t[t], 1e-12)
            # relax between untouched (1.0) and fully-matched (scale)
            eff = relax_factor * scale + (1.0 - relax_factor)
            total = total + all_leaves[t][li] * eff
        combined.append(total)

    new_state = MetaBalanceState(norms=tuple(
        jax.tree_util.tree_unflatten(treedef, ns) for ns in new_norms))
    return jax.tree_util.tree_unflatten(treedef, combined), new_state
