"""Mechanism tests batch 15 — list-context rerankers, shared-bottom
transfer, and the EGR order discriminator:

* MiDNN / GSF on a LIST-RELATIVE signal: the clicked item is the one
  whose value is the maximum WITHIN ITS LIST, but every list carries a
  large random offset (offset σ=5 vs item σ=1), so the raw value alone
  barely identifies the winner. A pointwise MLP (no list context) is the
  measured ceiling; MiDNN's global min/max list features
  (`librerank/reranker.py:302-330`) and GSF's groupwise joint scoring
  (`reranker.py:251-301`) must beat it decisively. Chance = 1/8 per list.
* SharedBottom transfer: task B has only ~2% labeled rows and its label
  is a latent XOR that 60 rows cannot teach from scratch (measured
  B-only ceiling ~0.5); jointly training with task A (plentiful labels,
  SAME latent) lets the shared bottom learn the XOR and the B tower just
  reads it out. Reference: `rechub/models/multi_task/shared_bottom.py`.
* EGRDiscriminator order sensitivity: "real" lists are sorted descending
  by feature 0, "fake" lists are random permutations of the SAME items —
  the per-list item SET is identical between classes, so any
  permutation-invariant pooling is provably at AUC 0.5; the GRU
  (`librerank/reranker.py:471-530` EGR_discriminator) must separate them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.reranking.models import GSF, MiDNN, listwise_bce
from recbox_tpu.nn.core import MLP

# ---------------------------------------------------------------------------
# MiDNN / GSF: list-relative max
# ---------------------------------------------------------------------------

L, D = 8, 4


@pytest.fixture(scope="module")
def list_relative_data():
    rng = np.random.default_rng(30)
    B = 1500
    offset = rng.normal(0.0, 5.0, size=(B, 1))        # per-list offset
    rel = rng.normal(0.0, 1.0, size=(B, L))           # within-list value
    value = offset + rel
    feats = rng.normal(size=(B, L, D)).astype(np.float32)
    feats[:, :, 0] = value                             # value in channel 0
    labels = np.zeros((B, L), np.float32)
    labels[np.arange(B), rel.argmax(1)] = 1.0          # click = list max
    mask = np.ones((B, L), bool)
    return feats, labels, mask


class _PointwiseMLP(nn.Module):
    """List-blind ceiling: the same MLP head applied per item."""

    hidden_units = (32, 16)

    @nn.compact
    def __call__(self, item_feats, mask, train: bool = False):
        return MLP(self.hidden_units, output_dim=1,
                   name="mlp")(item_feats, train=train)[..., 0]


def _train_reranker(model, feats, labels, mask, steps=250, lr=5e-3):
    f, l, m = jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(mask)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, f, m,
                           train=True)
    params = nn.meta.unbox(variables["params"])
    tx = optax.adam(lr)
    st = tx.init(params)

    @jax.jit
    def step(params, st):
        def loss_fn(p):
            scores = model.apply({"params": p}, f, m, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(2)})
            return listwise_bce(scores, l, m)
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, st2 = tx.update(g, st, params)
        return optax.apply_updates(params, up), st2, loss

    for _ in range(steps):
        params, st, _ = step(params, st)
    scores = np.asarray(model.apply({"params": params}, f, m, train=False))
    return float((scores.argmax(1) == labels.argmax(1)).mean())


def test_pointwise_mlp_ceiling_on_list_relative_signal(list_relative_data):
    feats, labels, mask = list_relative_data
    acc = _train_reranker(_PointwiseMLP(), feats, labels, mask)
    # the raw value is offset-dominated (σ_offset=5 vs σ_rel=1): knowing v
    # alone says little about within-list rank. Measured ceiling for the
    # MiDNN/GSF tests below; chance 1/8 = 0.125.
    assert acc < 0.45, acc


def test_midnn_global_list_features_find_the_list_max(list_relative_data):
    feats, labels, mask = list_relative_data
    acc = _train_reranker(MiDNN(hidden_units=(32, 16)), feats, labels, mask)
    # min/max normalization removes the list offset exactly — the
    # normalized channel 0 IS the within-list rank signal
    assert acc > 0.8, acc


def test_gsf_groupwise_context_beats_pointwise(list_relative_data):
    feats, labels, mask = list_relative_data
    acc = _train_reranker(GSF(group_size=3, hidden_units=(32, 16)),
                          feats, labels, mask, steps=350)
    # size-3 circular groups see only partial context, so GSF lands
    # between pointwise (<0.45 measured above) and MiDNN; it must still
    # clearly beat the list-blind ceiling
    assert acc > 0.55, acc


# ---------------------------------------------------------------------------
# SharedBottom vs MMOE: hard sharing under task conflict
# ---------------------------------------------------------------------------

def test_sharedbottom_hard_sharing_conflicts_where_mmoe_gates_dont():
    """The MMOE paper's motivating mechanism, planted exactly: two tasks
    need two ORTHOGONAL features (parity of field a / parity of field b)
    and the shared capacity is ONE dimension. SharedBottom's single hard-
    shared bottleneck must sacrifice one task (measured: the weaker task
    falls to ~chance), while MMOE with two 1-dim experts and per-task
    gates routes each parity to its own expert and solves both.
    References: `rechub/models/multi_task/shared_bottom.py` (hard
    sharing), `mmoe.py` (softmax gates over experts). Chance 0.5.

    (A scarce-label transfer construction was tried first and rejected:
    with few task-B labels the B tower's readout direction is under-
    determined regardless of what the shared bottom carries, so the
    measured contrast was readout sample-complexity, not the sharing
    mechanism.)"""
    from recbox_tpu.models.multitask.models import (
        MMOE, SharedBottom, multitask_loss,
    )
    rng = np.random.default_rng(31)
    n, vocab = 6000, 16
    a = rng.integers(0, vocab, n)
    b = rng.integers(0, vocab, n)
    arrays = {"cat_a": a.astype(np.int32), "cat_b": b.astype(np.int32),
              "task_a": (a % 2).astype(np.float32),
              "task_b": (b % 2).astype(np.float32)}
    fm = FeatureMap("mt15", (
        FeatureSpec("cat_a", "categorical", vocab_size=vocab, embedding_dim=8),
        FeatureSpec("cat_b", "categorical", vocab_size=vocab, embedding_dim=8),
    ), labels=("task_a", "task_b"))
    split = int(n * 0.8)
    train = {k: v[:split] for k, v in arrays.items()}
    valid = {k: v[split:] for k, v in arrays.items()}

    def auc(scores, y):
        pos, neg = scores[y == 1], scores[y == 0]
        return (pos[:, None] > neg[None, :]).mean()

    def fit(model):
        tb = {k: jnp.asarray(v) for k, v in train.items()}
        params = nn.meta.unbox(model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            {k: v[:8] for k, v in tb.items()}, train=True)["params"])
        tx = optax.adam(1e-2)
        st = tx.init(params)
        y = jnp.stack([tb["task_a"], tb["task_b"]], axis=1)

        @jax.jit
        def step(params, st):
            def loss_fn(p):
                out = model.apply({"params": p}, tb, train=True,
                                  rngs={"dropout": jax.random.PRNGKey(2)})
                return multitask_loss(out, y)
            loss, g = jax.value_and_grad(loss_fn)(params)
            up, st2 = tx.update(g, st, params)
            return optax.apply_updates(params, up), st2, loss

        for _ in range(600):
            params, st, _ = step(params, st)
        out = np.asarray(model.apply(
            {"params": params}, {k: jnp.asarray(v) for k, v in valid.items()},
            train=False))
        return (float(auc(out[:, 0], valid["task_a"])),
                float(auc(out[:, 1], valid["task_b"])))

    sb = fit(SharedBottom(feature_map=fm, embedding_dim=8, bottom_units=(1,),
                          tower_units=()))
    mm = fit(MMOE(feature_map=fm, embedding_dim=8, num_experts=2,
                  expert_units=(1,), tower_units=()))
    # measured (seed 31): SharedBottom (1.0, 0.448) — task B sacrificed;
    # MMOE (1.0, 1.0) — gates route each parity to its own expert
    assert min(sb) < 0.7, sb
    assert max(sb) > 0.9, sb          # it does solve ONE task
    assert min(mm) > 0.9, mm


# ---------------------------------------------------------------------------
# EGRDiscriminator: order sensitivity
# ---------------------------------------------------------------------------

def test_egr_discriminator_separates_order_not_content():
    from recbox_tpu.models.reranking.rl import EGRDiscriminator
    rng = np.random.default_rng(32)
    B, N, Df = 600, 6, 4
    base = rng.normal(size=(B, N, Df)).astype(np.float32)
    real = np.take_along_axis(
        base, np.argsort(-base[:, :, 0], axis=1)[:, :, None], axis=1)
    fake = np.take_along_axis(
        base, rng.permuted(np.tile(np.arange(N), (B, 1)), axis=1)[:, :, None],
        axis=1)
    feats = np.concatenate([real, fake], axis=0)
    y = np.concatenate([np.ones(B), np.zeros(B)]).astype(np.float32)
    mask = np.ones((2 * B, N), bool)

    model = EGRDiscriminator(d_model=16, hidden_units=(16,))
    f, m = jnp.asarray(feats), jnp.asarray(mask)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, f, m,
                           train=True)
    params = nn.meta.unbox(variables["params"])
    tx = optax.adam(5e-3)
    st = tx.init(params)
    yj = jnp.asarray(y)

    @jax.jit
    def step(params, st):
        def loss_fn(p):
            logit = model.apply({"params": p}, f, m, train=True,
                                rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.mean(jax.nn.softplus(logit) - yj * logit)
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, st2 = tx.update(g, st, params)
        return optax.apply_updates(params, up), st2, loss

    for _ in range(300):
        params, st, _ = step(params, st)
    logit = np.asarray(model.apply({"params": params}, f, m, train=False))
    pos, neg = logit[y == 1], logit[y == 0]
    auc = (pos[:, None] > neg[None, :]).mean()
    # real and fake lists contain IDENTICAL item sets — any permutation-
    # invariant pooling is provably at 0.5; only the GRU's order
    # sensitivity can separate the classes
    assert auc > 0.85, auc
