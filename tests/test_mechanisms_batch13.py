"""Mechanism tests batch 13 — discriminating tests for ranking-stage
mechanisms that no earlier batch isolates:

* BST vs DIN on an ORDER signal: the label depends only on the order of
  the two history items. DIN's target attention is permutation-invariant
  over the history, so it is STRUCTURALLY blind here (measured in-test as
  the ceiling, ~0.5); BST's positional embeddings + self-attention must
  crack it. References: `third_party/deepctr/models/sequence/bst.py`
  (position encoding), `din.py` (attention pooling).
* DeepIM's order-3 interaction machine on 3-way PARITY: y = a xor b xor c
  of three independent fair bits is pairwise-independent — EVERY
  order-<=2 model (FM included) sits at AUC 0.5 provably (any two inputs
  are jointly independent of y); the order-3 IM term contains exactly the
  x_a*x_b*x_c product that solves it. Reference:
  `recbox/ranking/pytorch/layers/interactions/interaction_machine.py`.
* DCN-Mix's low-rank mixture cross (crossnet_only, rank 2, no DNN) on
  XOR: the multiplicative signal must flow through the low-rank expert
  cross alone. Reference: `deepctr/layers/interaction.py` CrossNetMix.
* MLR's piecewise-linear regions on a sign-agreement signal over NUMERIC
  fields (y = 1[ctx*feat > 0]): a single LR is linear in each numeric
  value and provably stuck at 0.5 (measured); the region softmax gives
  MLR per-region linear learners. Reference: `deepctr/models/mlr.py`.

Chance level is 0.5 for every test (balanced binary labels); the
mechanism-free ceiling is additionally MEASURED in-test where a natural
ablation exists (DIN for the order test, FM for parity, LR for regions).
"""

import numpy as np
import pytest

from recbox_tpu.data import ArrayLoader
from recbox_tpu.evaluation import CTREvaluator
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.ops import binary_crossentropy
from recbox_tpu.training import Trainer, TrainerConfig


def _fit(model, train, valid, epochs=8, lr=1e-2, seed=3):
    loader = ArrayLoader(train, batch_size=256, drop_last=True, seed=seed)
    ev = CTREvaluator(valid, label="click", metrics=["AUC"])
    cfg = TrainerConfig(learning_rate=lr, epochs=epochs, patience=20,
                        monitor="AUC", lr_decay_factor=1.0,
                        reload_best_on_plateau=False)
    tr = Trainer(model, lambda o, b: binary_crossentropy(o, b["click"]),
                 cfg, eval_fn=ev)
    return tr.fit(loader)


def _split(arrays, frac=0.85):
    n = len(arrays["click"])
    k = int(n * frac)
    return ({a: v[:k] for a, v in arrays.items()},
            {a: v[k:] for a, v in arrays.items()})


# ---------------------------------------------------------------------------
# BST vs DIN: order signal
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def order_data():
    rng = np.random.default_rng(13)
    n, vocab = 4000, 24
    a = rng.integers(0, vocab, n)
    off = rng.integers(1, vocab, n)
    b = (a + off) % vocab                      # guaranteed != a
    hist = np.stack([a, b], axis=1).astype(np.int32)
    click = (a < b).astype(np.float32)         # depends ONLY on order
    target = rng.integers(0, vocab, n).astype(np.int32)   # uninformative
    arrays = {"hist": hist, "item_id": target, "click": click}
    fm = FeatureMap("order13", (
        FeatureSpec("item_id", "categorical", vocab_size=vocab + 1,
                    embedding_dim=16),
        FeatureSpec("hist", "sequence", vocab_size=vocab + 1,
                    embedding_dim=16, max_len=2, padding_idx=vocab,
                    share_embedding="item_id"),
    ), labels=("click",))
    return fm, *_split(arrays)


def test_bst_positions_crack_order_signal(order_data):
    from recbox_tpu.models.ranking.sequence_ctr import BST
    fm, train, valid = order_data
    model = BST(feature_map=fm, embedding_dim=16, n_layers=1, n_heads=2,
                hidden_units=(64, 32))
    metrics = _fit(model, train, valid, epochs=10)
    # chance 0.5; permutation-invariant ceiling measured below (~0.5);
    # typical measured BST: ~0.97
    assert metrics["AUC"] > 0.8, metrics


def test_din_is_structurally_order_blind(order_data):
    from recbox_tpu.models.ranking.sequence_ctr import DIN
    fm, train, valid = order_data
    model = DIN(feature_map=fm, embedding_dim=16,
                attention_hidden_units=(32,), attention_activation="relu",
                hidden_units=(64, 32))
    metrics = _fit(model, train, valid, epochs=6)
    # target attention pools {h1, h2} permutation-invariantly: (a, b) and
    # (b, a) produce IDENTICAL inputs to the head, and both labels occur
    # for every unordered pair, so AUC converges to 0.5 regardless of
    # training. This is the measured ceiling the BST test beats.
    assert metrics["AUC"] < 0.62, metrics


# ---------------------------------------------------------------------------
# DeepIM: 3-way parity
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def parity_data():
    rng = np.random.default_rng(14)
    n = 6000
    a, b, c = (rng.integers(0, 2, n) for _ in range(3))
    click = ((a ^ b ^ c) == 1).astype(np.float32)
    arrays = {"fa": a.astype(np.int32), "fb": b.astype(np.int32),
              "fc": c.astype(np.int32), "click": click}
    fm = FeatureMap("parity13", (
        FeatureSpec("fa", "categorical", vocab_size=2, embedding_dim=8),
        FeatureSpec("fb", "categorical", vocab_size=2, embedding_dim=8),
        FeatureSpec("fc", "categorical", vocab_size=2, embedding_dim=8),
    ), labels=("click",))
    return fm, *_split(arrays)


def test_fm_provably_stuck_at_chance_on_3way_parity(parity_data):
    from recbox_tpu.models.ranking.ctr import FM
    fm, train, valid = parity_data
    # For independent fair bits, parity is pairwise-independent: any two
    # of (a, b, c) are jointly independent of y, so every order-<=2
    # statistic matches between classes and FM's optimum is the constant
    # predictor. Chance = 0.5 by construction AND by information.
    metrics = _fit(FM(feature_map=fm, embedding_dim=8), train, valid,
                   epochs=6, lr=5e-2)
    assert metrics["AUC"] < 0.58, metrics


def test_deepim_order3_term_cracks_3way_parity(parity_data):
    from recbox_tpu.models.ranking.ctr_extended import DeepIM
    fm, train, valid = parity_data
    # hidden_units=() leaves only a linear head beside the IM block, so
    # success must flow through the order-3 interaction term (which
    # contains the x_a⊙x_b⊙x_c product that encodes parity when each bit
    # embeds to ±v). Measured FM ceiling above: ~0.5.
    model = DeepIM(feature_map=fm, embedding_dim=8, im_order=3,
                   hidden_units=(), emb_init_scheme="xavier_normal")
    metrics = _fit(model, train, valid, epochs=14, lr=5e-2)
    assert metrics["AUC"] > 0.85, metrics


# ---------------------------------------------------------------------------
# DCN-Mix: low-rank mixture cross, no DNN
# ---------------------------------------------------------------------------

def test_dcnmix_low_rank_cross_cracks_xor():
    from recbox_tpu.models.ranking.ctr_extended import DCNMix
    rng = np.random.default_rng(15)
    n = 5000
    a, b = rng.integers(0, 2, n), rng.integers(0, 2, n)
    click = ((a ^ b) == 1).astype(np.float32)
    arrays = {"fa": a.astype(np.int32), "fb": b.astype(np.int32),
              "click": click}
    fm = FeatureMap("xor13", (
        FeatureSpec("fa", "categorical", vocab_size=2, embedding_dim=8),
        FeatureSpec("fb", "categorical", vocab_size=2, embedding_dim=8),
    ), labels=("click",))
    train, valid = _split(arrays)
    # crossnet_only + rank-2 experts: XOR must flow through the low-rank
    # mixture cross (x ⊙ U·g(C·V^T x)); no DNN path exists. Chance 0.5
    # (LR ceiling on this construction measured at ~0.5 in
    # tests/test_ranking_e2e.py's linear baselines).
    model = DCNMix(feature_map=fm, embedding_dim=8,
                   model_structure="crossnet_only", num_cross_layers=2,
                   low_rank=2, num_experts=2,
                   emb_init_scheme="xavier_normal")
    metrics = _fit(model, train, valid, epochs=12, lr=5e-2)
    assert metrics["AUC"] > 0.85, metrics


# ---------------------------------------------------------------------------
# MLR: piecewise-linear regions over numeric fields
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def region_data():
    rng = np.random.default_rng(16)
    n = 6000
    ctx = rng.choice([-1.0, 1.0], n) + 0.05 * rng.normal(size=n)
    feat = rng.normal(size=n)
    click = ((ctx * feat) > 0).astype(np.float32)     # sign agreement
    arrays = {"ctx": ctx.astype(np.float32),
              "feat": feat.astype(np.float32), "click": click}
    fm = FeatureMap("region13", (
        FeatureSpec("ctx", "numeric", embedding_dim=8),
        FeatureSpec("feat", "numeric", embedding_dim=8),
    ), labels=("click",))
    return fm, *_split(arrays)


def test_lr_provably_stuck_on_sign_agreement(region_data):
    from recbox_tpu.models.ranking.ctr import LR
    fm, train, valid = region_data
    # logit = w1*ctx + w2*feat is odd in each variable while the label is
    # even under joint sign flip: E[y | ctx, feat] = E[y | -ctx, -feat],
    # so the best linear AUC is 0.5 (measured ceiling for the MLR test).
    metrics = _fit(LR(feature_map=fm), train, valid, epochs=5, lr=5e-2)
    assert metrics["AUC"] < 0.58, metrics


def test_mlr_regions_crack_sign_agreement(region_data):
    from recbox_tpu.models.ranking.ctr_extended import MLR
    fm, train, valid = region_data
    # the region softmax splits on sign(ctx); each region's learner is
    # then linear in feat with opposite slopes — exactly LS-PLM's
    # divide-and-conquer mechanism. Chance 0.5, LR ceiling ~0.5 above.
    model = MLR(feature_map=fm, num_regions=4,
                emb_init_scheme="xavier_normal")
    metrics = _fit(model, train, valid, epochs=12, lr=5e-2)
    assert metrics["AUC"] > 0.85, metrics
