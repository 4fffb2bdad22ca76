"""Item2Vec: skip-gram with negative sampling over item co-occurrence.

Re-design of daisy's Item2Vec
(`third_party/daisy/model/Item2VecRecommender.py` + the SkipGramNegativeSampler
in `daisy/utils/sampler.py:105-157`): items co-occurring inside a user's
interaction list are (center, context) pairs; SGNS embeddings are trained
with a vectorized loss; the user vector for retrieval is the mean of history
item vectors (daisy's user_vector inference).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from recbox_tpu.nn.embedding import emb_init

__all__ = ["Item2Vec", "sgns_loss", "build_skipgram_pairs"]


def build_skipgram_pairs(user_items: Dict[int, list], window: int = 2,
                         max_pairs: int = 200_000,
                         seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """(center, context) pairs from per-user item lists within a window
    (`sampler.py` SkipGramNegativeSampler semantics, order-based window)."""
    rng = np.random.default_rng(seed)
    centers, contexts = [], []
    for items in user_items.values():
        arr = np.asarray(items)
        n = len(arr)
        for i in range(n):
            lo, hi = max(0, i - window), min(n, i + window + 1)
            for j in range(lo, hi):
                if j != i:
                    centers.append(arr[i])
                    contexts.append(arr[j])
    centers = np.asarray(centers, np.int32)
    contexts = np.asarray(contexts, np.int32)
    if len(centers) > max_pairs:
        sel = rng.choice(len(centers), max_pairs, replace=False)
        centers, contexts = centers[sel], contexts[sel]
    return centers, contexts


class Item2Vec(nn.Module):
    """SGNS item embeddings; `pair_logits` drives training, `user_vector`
    and `item_vectors` drive retrieval."""

    num_items: int
    embedding_dim: int = 64

    def setup(self):
        init = nn.with_partitioning(emb_init(0.05), (("data", "model"), None))
        self.center_table = self.param("emb_center", init,
                                       (self.num_items, self.embedding_dim))
        self.context_table = self.param("emb_context", init,
                                        (self.num_items, self.embedding_dim))

    def __call__(self, batch, train: bool = False):
        return self.pair_logits(batch["center"], batch["context"],
                                batch["neg"])

    def pair_logits(self, center, context, neg):
        """(B,) positive logits and (B, N) negative logits."""
        c = jnp.take(jnp.asarray(self.center_table), center, axis=0)
        ctx = jnp.take(jnp.asarray(self.context_table), context, axis=0)
        nv = jnp.take(jnp.asarray(self.context_table), neg, axis=0)
        pos = jnp.sum(c * ctx, axis=-1)
        negs = jnp.einsum("bd,bnd->bn", c, nv)
        return pos, negs

    def item_vectors(self) -> jnp.ndarray:
        return jnp.asarray(self.center_table)

    def user_vector(self, hist) -> jnp.ndarray:
        """Mean of history item vectors; hist (B, L) zero-padded."""
        emb = jnp.take(jnp.asarray(self.center_table), hist, axis=0)
        mask = (hist != 0).astype(emb.dtype)[..., None]
        return jnp.sum(emb * mask, axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1), 1e-12)


def sgns_loss(pos_neg) -> jnp.ndarray:
    """Skip-gram negative-sampling loss: −logσ(pos) − Σ logσ(−neg)."""
    pos, negs = pos_neg
    return jnp.mean(-jax.nn.log_sigmoid(pos)
                    - jnp.sum(jax.nn.log_sigmoid(-negs), axis=-1))
