"""Regression tests for the round-2 model-family review findings:

cosine train/serve symmetry, SRGNN unique-node adjacency parity, MIND
label-conditioned interest attention, SGL/NCL full-denominator InfoNCE,
MacridVAE reference KL, NAIS exp overflow, negative-sampling exclude_ids,
and LINE vertex-embedding serving.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from recbox_tpu.features import FeatureMap, FeatureSpec


def _two_tower_fm(n_users=8, n_items=12, dim=8):
    return FeatureMap(
        "mf", (FeatureSpec("user_id", "categorical", source="user",
                           vocab_size=n_users, embedding_dim=dim),
               FeatureSpec("item_id", "categorical", source="item",
                           vocab_size=n_items, embedding_dim=dim)),
        query_index="user_id", corpus_index="item_id", num_items=n_items)


# ---------------------------------------------------------------------------
# cosine-trained models serve in cosine space
# ---------------------------------------------------------------------------

def test_cosine_models_encode_normalized():
    from recbox_tpu.models.matching.two_tower import MF
    model = MF(feature_map=_two_tower_fm(), embedding_dim=8,
               similarity="cosine")
    v = model.init(jax.random.PRNGKey(0),
                   {"item_id": jnp.arange(4)}, method=model.encode_item)
    emb = model.apply(v, {"item_id": jnp.arange(12)},
                      method=model.encode_item)
    norms = np.linalg.norm(np.asarray(emb), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    # dot-similarity models stay un-normalized
    model2 = MF(feature_map=_two_tower_fm(), embedding_dim=8)
    v2 = model2.init(jax.random.PRNGKey(0),
                     {"item_id": jnp.arange(4)}, method=model2.encode_item)
    emb2 = model2.apply(v2, {"item_id": jnp.arange(12)},
                        method=model2.encode_item)
    assert not np.allclose(np.linalg.norm(np.asarray(emb2), axis=-1), 1.0)


# ---------------------------------------------------------------------------
# session adjacency equals recbole's unique-node graph
# ---------------------------------------------------------------------------

def test_session_adjacency_unique_node_parity():
    from recbox_tpu.models.sequential.session_graph import session_adjacency
    # session [a,b,a,c,b] with a=1,b=2,c=3: unique transitions from a are
    # {b, c} → recbole weights 1/2 each; positionally b occupies 2 slots so
    # each b position gets 1/4 and the c position 1/2
    seq = jnp.asarray([[1, 2, 1, 3, 2]])
    a_in, a_out = session_adjacency(seq)
    row_a = np.asarray(a_out)[0, 0]            # out-edges of position 0 (a)
    np.testing.assert_allclose(row_a, [0.0, 0.25, 0.0, 0.5, 0.25], atol=1e-6)
    # duplicate positions of the same item carry identical rows
    np.testing.assert_allclose(np.asarray(a_out)[0, 2], row_a, atol=1e-6)
    # aggregate message weight to a = 1/2 h_b + 1/2 h_c (unique-node form)
    agg_b = row_a[1] + row_a[4]
    assert agg_b == pytest.approx(0.5) and row_a[3] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# MIND: interest attention is conditioned on the positive
# ---------------------------------------------------------------------------

def test_mind_scores_negatives_with_positive_conditioned_vector():
    from recbox_tpu.models.matching.multi_interest import MIND
    fm = FeatureMap(
        "mind", (FeatureSpec("user_id", "categorical", source="user",
                             vocab_size=8, embedding_dim=16),
                 FeatureSpec("item_id", "categorical", source="item",
                             vocab_size=30, embedding_dim=16),
                 FeatureSpec("item_seq", "sequence", vocab_size=30,
                             embedding_dim=16, max_len=6)),
        query_index="user_id", corpus_index="item_id", num_items=30)
    model = MIND(feature_map=fm, embedding_dim=16, interest_num=3)
    rng = np.random.default_rng(0)
    seq = rng.integers(1, 30, size=(4, 6)).astype(np.int32)
    ids_a = np.array([[5, 9, 11]] * 4, np.int32)   # pos=5
    ids_b = np.array([[7, 9, 11]] * 4, np.int32)   # pos=7, same negatives
    b_a = {"item_seq": jnp.asarray(seq), "__item_ids__": jnp.asarray(ids_a),
           "item::item_id": jnp.asarray(ids_a)}
    v = model.init(jax.random.PRNGKey(0), b_a)
    # randomize params: at init the capsule interests can be near-identical,
    # which would make the attention irrelevant regardless of conditioning
    leaves, treedef = jax.tree_util.tree_flatten(nn.meta.unbox(v["params"]))
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [jax.random.normal(k, l.shape, l.dtype)
              for k, l in zip(keys, leaves)]
    v = {"params": jax.tree_util.tree_unflatten(treedef, leaves)}
    s_a = np.asarray(model.apply(v, b_a))
    b_b = dict(b_a, **{"__item_ids__": jnp.asarray(ids_b),
                       "item::item_id": jnp.asarray(ids_b)})
    s_b = np.asarray(model.apply(v, b_b))
    # the negatives' scores depend on WHICH positive conditions the
    # attention (reference mind.py:56-65) — per-candidate attention would
    # make them identical across the two batches
    assert not np.allclose(s_a[:, 1:], s_b[:, 1:])


# ---------------------------------------------------------------------------
# infonce_all: duplicates are not false negatives
# ---------------------------------------------------------------------------

def test_infonce_all_duplicates_additive():
    from recbox_tpu.models.matching.graph_extended import infonce_all
    rng = np.random.default_rng(0)
    allv = jnp.asarray(rng.normal(size=(10, 8)), jnp.float32)
    a = allv[:3]
    single = float(infonce_all(a[:1], a[:1], allv))
    dup = float(infonce_all(jnp.concatenate([a[:1], a[:1]]),
                            jnp.concatenate([a[:1], a[:1]]), allv))
    # per-anchor terms are independent of duplication: sum doubles exactly
    assert dup == pytest.approx(2 * single, rel=1e-6)


# ---------------------------------------------------------------------------
# MacridVAE: reference KL (no mu^2 term, summed over factors)
# ---------------------------------------------------------------------------

def test_macridvae_kl_matches_reference_formula():
    from recbox_tpu.models.matching.autoencoder import MacridVAE
    model = MacridVAE(num_items=12, latent_dim=4, k_factors=3, dropout=0.0)
    hist = jnp.asarray(np.eye(12, dtype=np.float32)[:5] )
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           {"history": hist}, train=False)
    _, inter = model.apply(variables, {"history": hist}, train=False,
                           mutable=["intermediates"])
    kl = np.asarray(inter["intermediates"]["kl"][0])
    assert kl.shape == (5,)
    # with logvar ~ small init values, each factor contributes
    # -0.5*sum(1 + lv - e^lv) ~ +eps >= 0; summing over K factors keeps it
    # non-negative and finite (the old /K + mu^2 form was ~0.5*K*|mu|^2)
    assert np.all(np.isfinite(kl)) and np.all(kl >= -1e-5)


# ---------------------------------------------------------------------------
# NAIS: huge attention logits stay finite
# ---------------------------------------------------------------------------

def test_nais_large_logits_finite():
    from recbox_tpu.models.matching.neural_cf import NAIS
    fm = _two_tower_fm(n_items=10)
    model = NAIS(feature_map=fm, embedding_dim=8, num_users=8, num_items=10)
    batch = {"user_id": jnp.arange(2),
             "hist": jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]]),
             "__item_ids__": jnp.asarray([[6, 7], [8, 9]])}
    v = model.init(jax.random.PRNGKey(0), batch,
                   jnp.asarray([[6, 7], [8, 9]]), method=model.score)
    params = nn.meta.unbox(v["params"])
    # inflate the attention output weights so raw logits overflow exp()
    params["att_out"]["kernel"] = params["att_out"]["kernel"] * 1e6
    s = model.apply({"params": params}, batch,
                    jnp.asarray([[6, 7], [8, 9]]), method=model.score)
    assert np.all(np.isfinite(np.asarray(s)))


# ---------------------------------------------------------------------------
# negative sampling: exclude_ids never drawn
# ---------------------------------------------------------------------------

def test_sample_negatives_exclude_ids():
    from recbox_tpu.data.sampling import sample_negatives
    rng = np.random.default_rng(0)
    pos = np.arange(1, 11, dtype=np.int64)
    negs = sample_negatives(pos, 12, 50, rng, exclude_ids=(0, 11))
    assert not np.any(negs == 0) and not np.any(negs == 11)
    # popularity distribution path too
    probs = np.ones(12) / 12
    negs_p = sample_negatives(pos, 12, 50, rng, probs=probs,
                              exclude_ids=(0, 11))
    assert not np.any(negs_p == 0) and not np.any(negs_p == 11)


# ---------------------------------------------------------------------------
# LINE order=2: serves with vertex embeddings, trains the context term
# ---------------------------------------------------------------------------

def test_line_serves_vertex_and_trains_context():
    from recbox_tpu.models.matching.graph_extended import LINE
    fm = _two_tower_fm(n_users=6, n_items=8)
    edges = (np.array([0, 1, 2]), np.array([1, 2, 3]))
    model = LINE(feature_map=fm, embedding_dim=8, num_users=6, num_items=8,
                 edge_users=edges[0], edge_items=edges[1], order=2)
    ids = jnp.asarray([[1, 4], [2, 5]])
    batch = {"user_id": jnp.asarray([0, 1]), "__item_ids__": ids,
             "item::item_id": ids}
    v = model.init(jax.random.PRNGKey(0), batch)
    params = nn.meta.unbox(v["params"])
    # serving tower = VERTEX table rows (line.py full_sort_predict)
    emb = model.apply({"params": params}, {"item_id": jnp.arange(8)},
                      method=model.item_tower)
    np.testing.assert_allclose(np.asarray(emb),
                               np.asarray(params["emb_item"]), rtol=1e-6)
    # training scores move when ONLY the context table changes
    s0 = np.asarray(model.apply({"params": params}, batch))
    params2 = jax.tree_util.tree_map(lambda x: x, params)
    params2["emb_item_ctx"] = params2["emb_item_ctx"] + 1.0
    s1 = np.asarray(model.apply({"params": params2}, batch))
    assert not np.allclose(s0, s1)
