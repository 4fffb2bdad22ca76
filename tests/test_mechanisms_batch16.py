"""Mechanism tests batch 16 — GRU4RecF's feature-fusion channel.

Cold-item transfer through the parallel feature sequence: item-level
transitions are category-level Markov (target category = succ(category
of last item)), and the EVAL rows end in items never seen anywhere in
training. An id-only recurrent model (GRU4Rec) has untrained embeddings
for those items — it is at chance on them (measured in-test as the
ceiling) even though it solves warm rows; GRU4RecF's fused category
sequence (`third_party/recbole/.../gru4recf.py` — recurrent input is
[item emb ‖ feature emb]) reads the category id, which IS trained, and
transfers the successor rule. Chance = one category in 8.
"""

import numpy as np
import pytest

from tests.test_learns_signal import _seq_fm, _train_full_scores

C = 8            # categories
V = 201          # item ids 1..200 (0 = PAD); category(i) = (i-1) % C
L = 5


def _cat(items):
    return (np.asarray(items) - 1) % C


def _make_world(rng, n_train=4000, n_eval=512):
    cold = np.arange(1, V)[rng.random(V - 1) < 0.2]          # ~40 cold items
    warm = np.setdiff1d(np.arange(1, V), cold)

    def draw(pool_last, n):
        seqs = rng.choice(warm, size=(n, L)).astype(np.int32)
        last = rng.choice(pool_last, size=n).astype(np.int32)
        seqs[:, -1] = last
        succ = (_cat(last) + 1) % C
        # target: a WARM item of the successor category
        targets = np.array([rng.choice(warm[_cat(warm) == s]) for s in succ],
                           np.int32)
        return seqs, targets

    tr_seqs, tr_targets = draw(warm, n_train)
    ev_seqs, ev_targets = draw(cold, n_eval)                 # cold last item
    return warm, cold, tr_seqs, tr_targets, ev_seqs, ev_targets


def _arrays(seqs, targets):
    n = len(targets)
    return {"item_seq": seqs, "seq_len": np.full(n, L, np.int32),
            "item_id": targets, "user_id": np.zeros(n, np.int32),
            "feat_seq": (_cat(seqs) + 1).astype(np.int32)}   # 0 reserved


def _category_top1_acc(model, params, arrays, warm):
    import jax.numpy as jnp
    scores = np.asarray(model.apply(
        {"params": params}, {k: jnp.asarray(v) for k, v in arrays.items()},
        train=False, method=model.full_scores))
    # restrict to warm items (cold ids are unranked candidates for both
    # models alike; the question is which CATEGORY the model points at)
    mask = np.full(scores.shape[1], -np.inf)
    mask[warm] = 0.0
    top1 = (scores + mask[None, :]).argmax(1)
    return float((_cat(top1) == _cat(arrays["item_id"])).mean())


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(40)
    return _make_world(rng)


def test_gru4recf_feature_channel_transfers_to_cold_items(world):
    from recbox_tpu.models.sequential.pretrain import GRU4RecF
    warm, cold, tr_seqs, tr_targets, ev_seqs, ev_targets = world
    model = GRU4RecF(feature_map=_seq_fm(V), embedding_dim=16,
                     hidden_size=32, max_seq_len=L, dropout=0.0,
                     feature_vocab=C + 1)
    params = _train_full_scores(model, _arrays(tr_seqs, tr_targets),
                                steps=400, lr=1e-2)
    acc = _category_top1_acc(model, params, _arrays(ev_seqs, ev_targets),
                             warm)
    # chance 1/8 = 0.125; the id-only ceiling below measures ~chance
    assert acc > 0.6, acc


def test_gru4rec_id_only_is_blind_to_cold_items(world):
    from recbox_tpu.models.sequential.models import GRU4Rec
    warm, cold, tr_seqs, tr_targets, ev_seqs, ev_targets = world
    model = GRU4Rec(feature_map=_seq_fm(V), embedding_dim=16,
                    hidden_size=32, max_seq_len=L, dropout=0.0)
    params = _train_full_scores(model, _arrays(tr_seqs, tr_targets),
                                steps=400, lr=1e-2)
    # sanity: it DOES solve warm rows (the rule is learnable from ids)
    warm_acc = _category_top1_acc(
        model, params, _arrays(tr_seqs[:512], tr_targets[:512]), warm)
    assert warm_acc > 0.6, warm_acc
    # ...but the cold last items' embeddings never received a gradient,
    # so the recurrent state carries no category information for them —
    # this measured ceiling is what the GRU4RecF test beats (chance 0.125)
    acc = _category_top1_acc(model, params, _arrays(ev_seqs, ev_targets),
                             warm)
    assert acc < 0.35, acc
