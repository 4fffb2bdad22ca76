"""Extended sequential zoo: shape/finite smoke across all models, adjacency
correctness for session graphs, BERT4Rec cloze scoring, and a learning test
(FPMC picks up a user-independent Markov chain through its MC factor)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from recbox_tpu.data import ArrayLoader
from recbox_tpu.data.sequential import leave_one_out_split
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.sequential.extended import (
    BERT4Rec, CORE, FDSA, FOSSIL, FPMC, HGN, HRM, NPE, RepeatNet, SHAN, SINE,
    LightSANs, TransRec,
)
from recbox_tpu.models.sequential.session_graph import (
    GCSAN, SRGNN, session_adjacency,
)
from recbox_tpu.ops import full_softmax_loss
from recbox_tpu.training import Trainer, TrainerConfig

N_ITEMS = 30
N_USERS = 40
MAX_LEN = 8


def seq_feature_map():
    return FeatureMap(
        "seq_ext", (FeatureSpec("item_id", "categorical", source="item",
                                vocab_size=N_ITEMS + 1, embedding_dim=16),),
        query_index="user_id", corpus_index="item_id", num_items=N_ITEMS + 1)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    seqs = {}
    for u in range(N_USERS):
        start = rng.integers(1, N_ITEMS + 1)
        seqs[u] = np.array([(start + k - 1) % N_ITEMS + 1 for k in range(10)])
    train, valid, _ = leave_one_out_split(seqs, max_len=MAX_LEN)
    return seq_feature_map(), train, valid


ALL_MODELS = [
    (BERT4Rec, dict(n_layers=1, n_heads=2)),
    (FPMC, dict(num_users=N_USERS)),
    (TransRec, dict(num_users=N_USERS)),
    (HGN, dict(num_users=N_USERS)),
    (SHAN, dict(num_users=N_USERS)),
    (FOSSIL, dict(num_users=N_USERS, order_k=2)),
    (HRM, dict(num_users=N_USERS)),
    (NPE, dict(num_users=N_USERS)),
    (CORE, dict(n_layers=1, n_heads=2)),
    (LightSANs, dict(n_layers=1, n_heads=2, k_interests=3)),
    (FDSA, dict(n_layers=1, n_heads=2)),
    (RepeatNet, dict(hidden_size=16)),
    (SINE, dict(prototype_num=10, interest_num=2)),
    (SRGNN, dict(steps=1)),
    (GCSAN, dict(n_layers=1, n_heads=1)),
]


@pytest.mark.parametrize("model_cls,kwargs",
                         ALL_MODELS, ids=[c.__name__ for c, _ in ALL_MODELS])
def test_full_scores_smoke(data, model_cls, kwargs):
    fm, train, _ = data
    model = model_cls(feature_map=fm, embedding_dim=16, max_seq_len=MAX_LEN,
                      dropout=0.0, **kwargs)
    db = {k: jnp.asarray(train[k][:12])
          for k in ("item_seq", "seq_len", "item_id", "user_id")}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, db, train=True,
                           method=model.full_scores)
    params = nn.meta.unbox(variables["params"])
    scores = model.apply({"params": params}, db, method=model.full_scores)
    assert scores.shape == (12, N_ITEMS + 1)
    assert np.isfinite(np.asarray(scores)).all()


@pytest.mark.parametrize("model_cls,kwargs",
                         [(FPMC, dict(num_users=N_USERS)),
                          (SRGNN, dict(steps=1)),
                          (SINE, dict(prototype_num=10, interest_num=2))],
                         ids=["FPMC", "SRGNN", "SINE"])
def test_sampled_call_smoke(data, model_cls, kwargs):
    """The matching-stage (B, 1+negs) scoring path also works."""
    fm, train, _ = data
    model = model_cls(feature_map=fm, embedding_dim=16, max_seq_len=MAX_LEN,
                      dropout=0.0, **kwargs)
    B, S = 6, 4
    rng = np.random.default_rng(0)
    db = {k: jnp.asarray(train[k][:B])
          for k in ("item_seq", "seq_len", "user_id")}
    ids = rng.integers(1, N_ITEMS + 1, size=(B, S))
    db["__item_ids__"] = jnp.asarray(ids)
    db["item::item_id"] = jnp.asarray(ids)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, db)
    params = nn.meta.unbox(variables["params"])
    scores = model.apply({"params": params}, db)
    assert scores.shape == (B, S)
    assert np.isfinite(np.asarray(scores)).all()


class TestSessionAdjacency:
    def test_counts_and_normalization(self):
        # session 1→2→1→3, right-padded to L=5
        seq = jnp.array([[1, 2, 1, 3, 0]])
        a_in, a_out = session_adjacency(seq)
        a_in, a_out = np.asarray(a_in)[0], np.asarray(a_out)[0]
        # transitions: 1→2, 2→1, 1→3. node 1 has outdeg 2 → weights 0.5
        # positions of item 1: p0, p2 — identical rows
        np.testing.assert_allclose(a_out[0], a_out[2])
        assert a_out[0, 1] == pytest.approx(0.5)   # 1→2
        assert a_out[0, 3] == pytest.approx(0.5)   # 1→3
        assert a_out[1, 0] == pytest.approx(0.5)   # 2→1 spread over dup cols
        assert a_out[1, 2] == pytest.approx(0.5)
        # PAD row/col empty
        assert a_out[4].sum() == 0 and a_out[:, 4].sum() == 0
        # a_in is the in-normalized transpose: edges into node 2 come from 1
        assert a_in[1, 0] > 0

    def test_no_self_loops_without_repeats(self):
        seq = jnp.array([[1, 2, 3, 0]])
        _, a_out = session_adjacency(seq)
        a = np.asarray(a_out)[0]
        assert np.trace(a) == 0


def test_bert4rec_cloze_scores(data):
    fm, train, _ = data
    model = BERT4Rec(feature_map=fm, embedding_dim=16, max_seq_len=MAX_LEN,
                     n_layers=1, n_heads=2, dropout=0.0)
    seq = jnp.asarray(train["item_seq"][:4].copy())
    mask_tok = N_ITEMS + 1  # vocab_size
    positions = jnp.full((4, 1), MAX_LEN - 1)
    masked = seq.at[:, -1].set(mask_tok)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, masked,
        jnp.asarray(train["seq_len"][:4]), positions,
        method=model.masked_item_scores)
    params = nn.meta.unbox(variables["params"])
    scores = model.apply({"params": params}, masked,
                         jnp.asarray(train["seq_len"][:4]), positions,
                         method=model.masked_item_scores)
    assert scores.shape == (4, 1, N_ITEMS + 1)


def test_repeatnet_probs_normalized(data):
    fm, train, _ = data
    model = RepeatNet(feature_map=fm, embedding_dim=16, hidden_size=16,
                      max_seq_len=MAX_LEN, dropout=0.0)
    db = {k: jnp.asarray(train[k][:8]) for k in ("item_seq", "seq_len")}
    variables = model.init({"params": jax.random.PRNGKey(0)}, db,
                           method=model.full_scores)
    params = nn.meta.unbox(variables["params"])
    logp = model.apply({"params": params}, db, method=model.full_scores)
    total = np.exp(np.asarray(logp)).sum(-1)
    np.testing.assert_allclose(total, 1.0, atol=1e-3)


def test_fpmc_learns_markov(data):
    fm, train, valid = data
    model = FPMC(feature_map=fm, embedding_dim=32, max_seq_len=MAX_LEN,
                 num_users=N_USERS)
    cfg = TrainerConfig(learning_rate=2e-2, epochs=8, monitor="hit",
                        lr_decay_factor=1.0, reload_best_on_plateau=False)
    trainer = Trainer(model,
                      lambda out, b: full_softmax_loss(out, b["item_id"]),
                      cfg, train_method="full_scores")
    loader = ArrayLoader(train, batch_size=128, drop_last=True, seed=0)
    for _ in range(8):
        for batch in loader:
            batch.pop("__mask__", None)
            trainer.train_step(batch)
    scores = trainer.apply(
        {k: valid[k] for k in ("item_seq", "seq_len", "user_id")},
        method=trainer.model.full_scores)
    hit = float(np.mean(np.asarray(scores).argmax(-1) == valid["item_id"]))
    assert hit > 0.5, f"FPMC hit@1={hit}"


def test_transformer_family_bfloat16_param_compat(data):
    """compute_dtype='bfloat16' (round 5) must not change the param tree of
    any transformer-based model, and transplanted fp32 params must produce
    close scores — the same transplant contract as SASRec's dtype test."""
    fm, train, _ = data
    db = {k: jnp.asarray(train[k][:4]) for k in ("item_seq", "seq_len")}
    for cls in (CORE, FDSA):
        m32 = cls(feature_map=fm, embedding_dim=16, max_seq_len=MAX_LEN,
                  n_layers=1, n_heads=2, dropout=0.0)
        m16 = cls(feature_map=fm, embedding_dim=16, max_seq_len=MAX_LEN,
                  n_layers=1, n_heads=2, dropout=0.0,
                  compute_dtype="bfloat16")
        v = m32.init({"params": jax.random.PRNGKey(0)}, db,
                     method=m32.full_scores)
        v16 = m16.init({"params": jax.random.PRNGKey(0)}, db,
                       method=m16.full_scores)
        assert jax.tree_util.tree_structure(v) == \
            jax.tree_util.tree_structure(v16), cls.__name__
        params = nn.meta.unbox(v["params"])
        s32 = m32.apply({"params": params}, db, method=m32.full_scores)
        s16 = m16.apply({"params": params}, db, method=m16.full_scores)
        err = float(jnp.max(jnp.abs(s32 - s16)) /
                    (jnp.max(jnp.abs(s32)) + 1e-9))
        assert err < 0.05, (cls.__name__, err)


def test_bert4rec_fused_cloze_matches_xla_ce(data):
    """fused_cloze_loss == masked CE over masked_item_scores, with pad
    positions (weight 0) excluded exactly — the large-vocab cloze path."""
    fm, train, _ = data
    model = BERT4Rec(feature_map=fm, embedding_dim=16, max_seq_len=MAX_LEN,
                     n_layers=1, n_heads=2, dropout=0.0)
    seq = jnp.asarray(train["item_seq"][:6].copy())
    sl = jnp.asarray(train["seq_len"][:6])
    mask_tok = N_ITEMS + 1
    positions = jnp.stack([jnp.full(6, MAX_LEN - 1),
                           jnp.full(6, MAX_LEN - 2)], axis=1)   # (6, 2)
    labels = jnp.take_along_axis(seq, positions, axis=1)
    masked = seq.at[:, -1].set(mask_tok).at[:, -2].set(mask_tok)
    weights = jnp.asarray([[1.0, 1.0], [1.0, 0.0], [1.0, 1.0],
                           [0.0, 1.0], [1.0, 1.0], [1.0, 1.0]])
    variables = model.init({"params": jax.random.PRNGKey(0)}, masked, sl,
                           positions, method=model.masked_item_scores)
    params = nn.meta.unbox(variables["params"])

    scores = model.apply({"params": params}, masked, sl, positions,
                         method=model.masked_item_scores)  # (6, 2, V)
    logp = jax.nn.log_softmax(scores, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=2)[..., 0]
    ref = -jnp.sum(weights * picked) / jnp.sum(weights)

    fused = model.apply({"params": params}, masked, sl, positions, labels,
                        weights, method=model.fused_cloze_loss)
    assert abs(float(ref) - float(fused)) < 2e-3 * abs(float(ref)), \
        (float(ref), float(fused))
