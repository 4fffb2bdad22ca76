"""Regression tests for the round-2 ranking/reranking review findings:

LambdaRank antisymmetric lambdas, GSF/EGR/DSIN padding invariance, and
the DIEN dimension guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from recbox_tpu.features import FeatureMap, FeatureSpec


def test_lambdarank_lambdas_antisymmetric_and_vanishing():
    from recbox_tpu.models.reranking.lambdamart import _lambdas_for_query
    # perfectly ordered pair: both lambdas ~ 0 (no force on a correct
    # ordering with margin)
    lam = _lambdas_for_query(np.array([10.0, 0.0]), np.array([1.0, 0.0]))
    assert np.all(np.abs(lam) < 1e-3), lam
    # inverted pair: strong antisymmetric force (push rel up, irrel down)
    lam_inv = _lambdas_for_query(np.array([0.0, 10.0]), np.array([1.0, 0.0]))
    assert lam_inv[0] > 0.1 and lam_inv[1] < -0.1
    assert lam_inv[0] == pytest.approx(-lam_inv[1], rel=1e-9)


def test_gsf_scores_invariant_to_pad_content():
    from recbox_tpu.models.reranking.models import GSF
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 8, 4)).astype(np.float32)
    mask = np.zeros((2, 8), bool)
    mask[:, :5] = True
    model = GSF(group_size=3, hidden_units=(16,))
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                   jnp.asarray(mask))
    s1 = np.asarray(model.apply(v, jnp.asarray(feats), jnp.asarray(mask)))
    feats2 = feats.copy()
    feats2[:, 5:] = 999.0                       # garbage in padded slots
    s2 = np.asarray(model.apply(v, jnp.asarray(feats2), jnp.asarray(mask)))
    np.testing.assert_allclose(s1[:, :5], s2[:, :5], rtol=1e-5)


def test_egr_evaluator_invariant_to_padding_prepad():
    """PRE-padded lists (valid items as a SUFFIX — the framework's default
    tokenizer layout): valid logits must equal the post-padded run's."""
    from recbox_tpu.models.reranking.rl import EGREvaluator
    rng = np.random.default_rng(0)
    valid_feats = rng.normal(size=(2, 4, 6)).astype(np.float32)
    model = EGREvaluator(d_model=8)
    post = np.zeros((2, 8, 6), np.float32)
    post[:, :4] = valid_feats
    m_post = np.zeros((2, 8), bool)
    m_post[:, :4] = True
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(post),
                   jnp.asarray(m_post))
    s_post = np.asarray(model.apply(v, jnp.asarray(post),
                                    jnp.asarray(m_post)))
    pre = np.zeros((2, 8, 6), np.float32)
    pre[:, 4:] = valid_feats
    m_pre = np.zeros((2, 8), bool)
    m_pre[:, 4:] = True
    s_pre = np.asarray(model.apply(v, jnp.asarray(pre), jnp.asarray(m_pre)))
    np.testing.assert_allclose(s_pre[:, 4:], s_post[:, :4], rtol=1e-5)


def test_egr_evaluator_invariant_to_padding():
    from recbox_tpu.models.reranking.rl import EGREvaluator
    rng = np.random.default_rng(0)
    valid_feats = rng.normal(size=(2, 4, 6)).astype(np.float32)
    model = EGREvaluator(d_model=8)

    def run(N, pad_fill):
        feats = np.full((2, N, 6), pad_fill, np.float32)
        feats[:, :4] = valid_feats
        mask = np.zeros((2, N), bool)
        mask[:, :4] = True
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                       jnp.asarray(mask))
        return v, np.asarray(model.apply(v, jnp.asarray(feats),
                                         jnp.asarray(mask)))

    v, s8 = run(8, 0.0)
    _, s8b = run(8, 123.0)                      # pad content changes
    np.testing.assert_allclose(s8[:, :4], s8b[:, :4], rtol=1e-5)
    # pad LENGTH changes (same params apply to any N)
    feats16 = np.zeros((2, 16, 6), np.float32)
    feats16[:, :4] = valid_feats
    mask16 = np.zeros((2, 16), bool)
    mask16[:, :4] = True
    s16 = np.asarray(model.apply(v, jnp.asarray(feats16),
                                 jnp.asarray(mask16)))
    np.testing.assert_allclose(s8[:, :4], s16[:, :4], rtol=1e-5)


def test_dien_rejects_dim_mismatch():
    from recbox_tpu.models.ranking.sequence_ctr import DIEN
    fm = FeatureMap("dd", (
        FeatureSpec("item_id", "categorical", vocab_size=11,
                    embedding_dim=16),
        FeatureSpec("hist", "sequence", vocab_size=11, embedding_dim=16,
                    max_len=4, padding_idx=10, share_embedding="item_id"),
    ), labels=("click",))
    model = DIEN(feature_map=fm, embedding_dim=16, gru_hidden=8)
    batch = {"item_id": jnp.arange(2), "hist": jnp.ones((2, 4), jnp.int32)}
    with pytest.raises(ValueError, match="gru_hidden"):
        model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, batch, train=True)


def test_dsin_prepadded_histories_match_postpadded():
    """The framework's default tokenizer pads at the FRONT (valid sessions
    are a suffix): DSIN's session Bi-GRU must produce the same logits as
    for the equivalent post-padded layout."""
    from recbox_tpu.models.ranking.sequence_ctr import DSIN
    vocab, L = 20, 10
    fm = FeatureMap("dsinpp", (
        FeatureSpec("item_id", "categorical", vocab_size=vocab + 1,
                    embedding_dim=8),
        FeatureSpec("hist", "sequence", vocab_size=vocab + 1,
                    embedding_dim=8, max_len=L, padding_idx=vocab,
                    share_embedding="item_id"),
    ), labels=("click",))
    model = DSIN(feature_map=fm, embedding_dim=8, session_count=5,
                 hidden_units=(16,))
    rng = np.random.default_rng(0)
    real = rng.integers(1, vocab, size=(2, 4)).astype(np.int32)
    post = np.full((2, L), vocab, np.int32)
    post[:, :4] = real                           # valid prefix
    pre = np.full((2, L), vocab, np.int32)
    pre[:, L - 4:] = real                        # valid suffix (pre-pad)
    b_post = {"item_id": jnp.asarray([3, 7]), "hist": jnp.asarray(post)}
    b_pre = {"item_id": jnp.asarray([3, 7]), "hist": jnp.asarray(pre)}
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, b_post, train=True)
    out_post = np.asarray(model.apply(v, b_post))
    out_pre = np.asarray(model.apply(v, b_pre))
    np.testing.assert_allclose(out_pre, out_post, rtol=1e-4)


def test_dsin_invariant_to_empty_session_padding():
    from recbox_tpu.models.ranking.sequence_ctr import DSIN
    vocab, L = 20, 10                            # 5 sessions of 2
    fm = FeatureMap("dsinp", (
        FeatureSpec("item_id", "categorical", vocab_size=vocab + 1,
                    embedding_dim=8),
        FeatureSpec("hist", "sequence", vocab_size=vocab + 1,
                    embedding_dim=8, max_len=L, padding_idx=vocab,
                    share_embedding="item_id"),
    ), labels=("click",))
    model = DSIN(feature_map=fm, embedding_dim=8, session_count=5,
                 hidden_units=(16,))
    rng = np.random.default_rng(0)
    hist = np.full((2, L), vocab, np.int32)      # all PAD
    hist[:, :4] = rng.integers(1, vocab, size=(2, 4))  # 2 valid sessions
    batch = {"item_id": jnp.asarray([3, 7]), "hist": jnp.asarray(hist)}
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    out1 = np.asarray(model.apply(v, batch))
    # the behavior ids in padded sessions are PAD either way, but the
    # number of trailing empty sessions must not leak through the Bi-GRU:
    # compare against a shorter-history model? Same shapes here — instead
    # verify the backward state at valid sessions ignores empty ones by
    # checking invariance under session_count growth via longer padding
    fm2 = FeatureMap("dsinp2", (
        FeatureSpec("item_id", "categorical", vocab_size=vocab + 1,
                    embedding_dim=8),
        FeatureSpec("hist", "sequence", vocab_size=vocab + 1,
                    embedding_dim=8, max_len=20, padding_idx=vocab,
                    share_embedding="item_id"),
    ), labels=("click",))
    model2 = DSIN(feature_map=fm2, embedding_dim=8, session_count=10,
                  hidden_units=(16,))
    hist2 = np.full((2, 20), vocab, np.int32)
    hist2[:, :4] = hist[:, :4]
    batch2 = {"item_id": jnp.asarray([3, 7]), "hist": jnp.asarray(hist2)}
    out2 = np.asarray(model2.apply(v, batch2))
    np.testing.assert_allclose(out1, out2, rtol=1e-4)
