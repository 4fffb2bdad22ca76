"""Mechanism tests batch 17 — the field-interaction GEOMETRY family.

Three constructions, each with a provable (and measured) ceiling for the
mechanism-free model:

* RING DIRECTION — fields fa/fb SHARE one embedding table; the label is
  the orientation of a ring edge: (x, x+1 mod V) -> 1, (x+1 mod V, x) -> 0.
  - Any additive logit g(fa) + h(fb) is provably stuck at 0.5: separating
    all edges needs (g-h)(x) > (g-h)(x+1) around a CYCLE, impossible.
  - FM with a shared table is provably stuck: <v(x), v(y)> is symmetric,
    so reversed pairs (opposite labels) get identical interaction scores.
  - FEFM is stuck BY DESIGN: its pair kernels are symmetrized W + W^T
    (`deepctr/models/deepfefm.py` field-embedded symmetric interaction).
  - HFM with circular CONVOLUTION is stuck: a circ-conv b == b circ-conv a
    (commutative), so even the deep head sees identical features for
    reversed pairs.
  - FmFM's FREE pair kernel (`fmfm` — FuxiCTR lineage of the reference's
    ranking stage) carries an antisymmetric part v(x)^T A v(y) = -v(y)^T
    A v(x) that represents orientation (embed the ring on a circle, A = a
    rotation); it must crack the test.
  - HFM with circular CORRELATION (`recbox/ranking/pytorch/layers/
    interactions/holographic_interaction.py`) is NON-commutative; with the
    deep head it must crack the test. The conv-vs-corr pair is the
    holographic mechanism, isolated.

* XOR OF MATCHES — y = 1[a==b] XOR 1[c==d] with balanced planted match
  bits. Any model whose readout is ADDITIVE over pair scores (FM, FEFM)
  has AUC 0.5 at best: with logit s = alpha*m1 + beta*m2 + const, every
  (alpha, beta) ranks one of the positive cells below a negative cell
  (measured ceilings below). DeepFEFM's DNN reads the per-pair interaction
  VECTOR s_ij, and NFM's DNN reads the bi-interaction pooled vector — both
  non-additive readouts of pairwise products — and must crack it.

* 3-WAY PARITY — y = a xor b xor c of independent fair bits is pairwise
  independent, so every order-<=2 model (FM) is provably at 0.5 (the
  measured FM ceiling lives in test_mechanisms_batch13.py). DIFM's factor
  estimating networks rescale each field embedding by a function of ALL
  fields (`deepctr/models/difm.py`), making the effective (a,b) pair term
  depend on c — order-3 capacity. DAGFM's depth-2 field-graph propagation
  (`third_party/recbole/.../kd_dagfm.py` DAGFM) accumulates products of
  three distinct field embeddings.

Chance level is 0.5 for every test (balanced binary labels).
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
    cfg = TrainerConfig(learning_rate=lr, epochs=epochs, patience=50,
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
# ring direction (shared table)
# ---------------------------------------------------------------------------

V_RING = 8


@pytest.fixture(scope="module")
def ring_data():
    rng = np.random.default_rng(17)
    n = 5000
    x = rng.integers(0, V_RING, n)
    fwd = rng.integers(0, 2, n)
    nxt = (x + 1) % V_RING
    fa = np.where(fwd == 1, x, nxt).astype(np.int32)
    fb = np.where(fwd == 1, nxt, x).astype(np.int32)
    arrays = {"fa": fa, "fb": fb, "click": fwd.astype(np.float32)}
    fm = FeatureMap("ring17", (
        FeatureSpec("fa", "categorical", vocab_size=V_RING, embedding_dim=8),
        FeatureSpec("fb", "categorical", vocab_size=V_RING, embedding_dim=8,
                    share_embedding="fa"),
    ), labels=("click",))
    return fm, *_split(arrays)


def test_fm_shared_table_is_direction_blind(ring_data):
    from recbox_tpu.models.ranking.ctr import FM
    fm, train, valid = ring_data
    # <v(x), v(y)> symmetric + additive linear terms provably acyclic:
    # this is the measured ceiling every direction test below beats.
    metrics = _fit(FM(feature_map=fm, embedding_dim=8,
                      emb_init_scheme="xavier_normal"),
                   train, valid, epochs=6, lr=5e-2)
    assert metrics["AUC"] < 0.58, metrics


def test_fefm_symmetrized_kernels_are_direction_blind(ring_data):
    from recbox_tpu.models.ranking.ctr_extended import FEFM
    fm, train, valid = ring_data
    # v(x)^T (W + W^T) v(y) is symmetric in (x, y) whatever W learns.
    metrics = _fit(FEFM(feature_map=fm, embedding_dim=8,
                        emb_init_scheme="xavier_normal"),
                   train, valid, epochs=6, lr=5e-2)
    assert metrics["AUC"] < 0.58, metrics


def test_fmfm_free_pair_kernel_reads_direction(ring_data):
    from recbox_tpu.models.ranking.ctr_extended import FmFM
    fm, train, valid = ring_data
    # the antisymmetric part of the free (D, D) pair kernel represents
    # edge orientation. Chance 0.5; FM/FEFM ceilings measured above.
    metrics = _fit(FmFM(feature_map=fm, embedding_dim=8,
                        emb_init_scheme="xavier_normal"),
                   train, valid, epochs=12, lr=5e-2)
    assert metrics["AUC"] > 0.85, metrics


def test_hfm_circular_convolution_is_commutative_blind(ring_data):
    from recbox_tpu.models.ranking.ctr_extended import HFM
    fm, train, valid = ring_data
    # circular convolution commutes, so with the SHARED table the deep
    # head receives identical features for reversed pairs.
    model = HFM(feature_map=fm, embedding_dim=8, deep=True,
                interaction_type="circular_convolution",
                hidden_units=(32,), emb_init_scheme="xavier_normal")
    metrics = _fit(model, train, valid, epochs=6, lr=5e-2)
    assert metrics["AUC"] < 0.58, metrics


def test_hfm_circular_correlation_reads_direction(ring_data):
    from recbox_tpu.models.ranking.ctr_extended import HFM
    fm, train, valid = ring_data
    # circular correlation does NOT commute — the lone change from the
    # blind variant above, isolating the holographic mechanism.
    model = HFM(feature_map=fm, embedding_dim=8, deep=True,
                interaction_type="circular_correlation",
                hidden_units=(32,), emb_init_scheme="xavier_normal")
    metrics = _fit(model, train, valid, epochs=12, lr=5e-2)
    assert metrics["AUC"] > 0.8, metrics


# ---------------------------------------------------------------------------
# XOR of matches
# ---------------------------------------------------------------------------

V_XOR = 6


@pytest.fixture(scope="module")
def xor_match_data():
    rng = np.random.default_rng(18)
    n = 6000

    def pair(match):
        x = rng.integers(0, V_XOR, n)
        off = rng.integers(1, V_XOR, n)
        y = np.where(match == 1, x, (x + off) % V_XOR)
        return x.astype(np.int32), y.astype(np.int32)

    m1 = rng.integers(0, 2, n)
    m2 = rng.integers(0, 2, n)
    a, b = pair(m1)
    c, d = pair(m2)
    click = (m1 ^ m2).astype(np.float32)
    arrays = {"a": a, "b": b, "c": c, "d": d, "click": click}
    specs = tuple(FeatureSpec(nm, "categorical", vocab_size=V_XOR,
                              embedding_dim=16) for nm in "abcd")
    fm = FeatureMap("xorm17", specs, labels=("click",))
    return fm, *_split(arrays)


def test_fm_additive_pair_readout_stuck_on_xor_of_matches(xor_match_data):
    from recbox_tpu.models.ranking.ctr import FM
    fm, train, valid = xor_match_data
    # FM's logit is additive over pair scores ~ alpha*m1 + beta*m2: for
    # balanced independent match bits every additive ranking has AUC 0.5.
    metrics = _fit(FM(feature_map=fm, embedding_dim=16,
                      emb_init_scheme="xavier_normal"),
                   train, valid, epochs=6, lr=5e-2)
    assert metrics["AUC"] < 0.62, metrics


def test_fefm_additive_readout_stuck_on_xor_of_matches(xor_match_data):
    from recbox_tpu.models.ranking.ctr_extended import FEFM
    fm, train, valid = xor_match_data
    metrics = _fit(FEFM(feature_map=fm, embedding_dim=16,
                        emb_init_scheme="xavier_normal"),
                   train, valid, epochs=6, lr=5e-2)
    assert metrics["AUC"] < 0.62, metrics


def test_deepfefm_pair_vector_dnn_cracks_xor_of_matches(xor_match_data):
    from recbox_tpu.models.ranking.ctr_extended import DeepFEFM
    fm, train, valid = xor_match_data
    # the DNN reads the per-pair interaction VECTOR s_ij — m1 and m2
    # arrive as separate inputs, so XOR is representable; the plain-FEFM
    # ceiling above (~0.5) is what this beats.
    model = DeepFEFM(feature_map=fm, embedding_dim=16,
                     hidden_units=(64, 32),
                     emb_init_scheme="xavier_normal")
    metrics = _fit(model, train, valid, epochs=14, lr=2e-2)
    assert metrics["AUC"] > 0.8, metrics


def test_nfm_bi_interaction_mlp_cracks_xor_of_matches(xor_match_data):
    from recbox_tpu.models.ranking.ctr import NFM
    fm, train, valid = xor_match_data
    # bi-interaction pooling keeps the PAIRWISE-PRODUCT VECTOR (not its
    # sum); the MLP above it can place the (a,b) and (c,d) products in
    # different subspaces and compute XOR — FM's scalar sum cannot
    # (measured above).
    model = NFM(feature_map=fm, embedding_dim=16, hidden_units=(64, 32),
                emb_init_scheme="xavier_normal")
    metrics = _fit(model, train, valid, epochs=14, lr=2e-2)
    assert metrics["AUC"] > 0.8, metrics


# ---------------------------------------------------------------------------
# 3-way parity (FM ceiling measured in test_mechanisms_batch13.py)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def parity_data():
    rng = np.random.default_rng(19)
    n = 6000
    a, b, c = (rng.integers(0, 2, n) for _ in range(3))
    click = ((a ^ b ^ c) == 1).astype(np.float32)
    arrays = {"fa": a.astype(np.int32), "fb": b.astype(np.int32),
              "fc": c.astype(np.int32), "click": click}
    fm = FeatureMap("parity17", (
        FeatureSpec("fa", "categorical", vocab_size=2, embedding_dim=8),
        FeatureSpec("fb", "categorical", vocab_size=2, embedding_dim=8),
        FeatureSpec("fc", "categorical", vocab_size=2, embedding_dim=8),
    ), labels=("click",))
    return fm, *_split(arrays)


def test_difm_input_aware_rescaling_cracks_3way_parity(parity_data):
    from recbox_tpu.models.ranking.ctr_extended import DIFM
    fm, train, valid = parity_data
    # the FENs make each field's scale m_i a function of ALL fields, so
    # the (a,b) pair term m_a*m_b*<v_a,v_b> depends on c — order-3
    # capacity a plain FM provably lacks (FM ceiling ~0.5, measured in
    # test_mechanisms_batch13.py::test_fm_provably_stuck_at_chance_on_3way_parity).
    model = DIFM(feature_map=fm, embedding_dim=8, fen_hidden_units=(32,),
                 emb_init_scheme="xavier_normal")
    metrics = _fit(model, train, valid, epochs=14, lr=5e-2)
    assert metrics["AUC"] > 0.8, metrics


def test_dagfm_depth2_propagation_cracks_3way_parity(parity_data):
    from recbox_tpu.models.ranking.distill import DAGFM
    fm, train, valid = parity_data
    # layer-l state x_l = prop(x_{l-1}) * field + x_{l-1}: two layers
    # accumulate products of three distinct field embeddings — exactly
    # the a*b*c term parity needs.
    model = DAGFM(feature_map=fm, embedding_dim=8, n_layers=2,
                  kernel_type="inner", emb_init_scheme="xavier_normal")
    metrics = _fit(model, train, valid, epochs=14, lr=5e-2)
    assert metrics["AUC"] > 0.8, metrics
