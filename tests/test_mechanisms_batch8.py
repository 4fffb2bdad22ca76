"""Mechanism-sensitive learns-signal tests, batch 8.

* user-query attention (SHAN): each history holds one type-A and one
  type-B item; the user's group decides which one is the target. An
  item-only or recency model caps at 0.5 — SHAN's user-embedding
  attention query must break the tie (reference `shan.py`).
* high-order Markov (FOSSIL): the target is a fixed successor of the
  LAST item while fillers are uniform — the order-blind FISM pooling is
  uninformative; the η-weighted last-item factor must carry it
  (reference `fossil.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from recbox_tpu.features import FeatureMap, FeatureSpec

from tests.test_learns_signal import _recall_at, _seq_fm, _train_full_scores


# ---------------------------------------------------------------------------
# 2. SHAN — the user-embedding query decides which history item matters
# ---------------------------------------------------------------------------

def test_shan_user_query_selects_preferred_type():
    from recbox_tpu.models.sequential.extended import SHAN
    type_a = np.arange(1, 11)
    type_b = np.arange(11, 21)
    neutral = np.arange(21, 31)
    V, L, n_users, n = 31, 6, 32, 4000
    rng = np.random.default_rng(0)
    seqs = np.zeros((n, L), np.int32)
    uids = rng.integers(0, n_users, size=n).astype(np.int32)
    targets = np.zeros(n, np.int32)
    for i in range(n):
        a = rng.choice(type_a)
        b = rng.choice(type_b)
        fill = rng.choice(neutral, size=L - 2)
        row = np.concatenate([[a, b], fill])
        rng.shuffle(row)
        seqs[i] = row
        targets[i] = a if uids[i] % 2 == 0 else b
    arrays = {"item_seq": seqs, "seq_len": np.full(n, L, np.int32),
              "item_id": targets, "user_id": uids}
    model = SHAN(feature_map=_seq_fm(V), embedding_dim=16, max_seq_len=L,
                 dropout=0.0, num_users=n_users, short_len=3)
    params = _train_full_scores(model, arrays, steps=300, lr=1e-2)
    sub = {k: v[:512] for k, v in arrays.items()}
    scores = np.asarray(model.apply(
        {"params": params}, {k: jnp.asarray(v) for k, v in sub.items()},
        train=False, method=model.full_scores))
    acc = float((scores.argmax(1) == sub["item_id"]).mean())
    assert acc > 0.75, acc                    # user-agnostic ceiling: 0.5


# ---------------------------------------------------------------------------
# 3. FOSSIL — the Markov factor carries the successor structure
# ---------------------------------------------------------------------------

def test_fossil_markov_factor_learns_successor():
    from recbox_tpu.models.sequential.extended import FOSSIL
    V, L, n = 25, 6, 4000
    rng = np.random.default_rng(0)
    # SYMMETRIC partner pairs (a<->b): FOSSIL's Markov factor scores
    # eta·e_last·e_target with ONE shared item table, so an asymmetric
    # permutation (succ(a)=b but succ(b)!=a) is not representable — the
    # pair structure is, and still defeats the order-blind pooled part.
    # items 1..24 in 12 pairs: partner(2k-1) = 2k, partner(2k) = 2k-1
    seqs = rng.integers(1, V, size=(n, L)).astype(np.int32)
    last = seqs[:, -1]
    targets = np.where(last % 2 == 1, last + 1, last - 1).astype(np.int32)
    uids = rng.integers(0, 16, size=n).astype(np.int32)
    arrays = {"item_seq": seqs, "seq_len": np.full(n, L, np.int32),
              "item_id": targets, "user_id": uids}
    model = FOSSIL(feature_map=_seq_fm(V), embedding_dim=16, max_seq_len=L,
                   dropout=0.0, num_users=16, order_k=1)
    params = _train_full_scores(model, arrays, steps=400, lr=1e-2)
    rec = _recall_at(model, params, {k: v[:512] for k, v in arrays.items()},
                     k=1)
    # the set-pooled FISM part is order-blind noise here; the last-item
    # factor must factorize the pair map (chance 1/25)
    assert rec > 0.5, rec
