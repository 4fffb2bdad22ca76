"""Mechanism-sensitive learns-signal tests, batch 7.

* feature-stream attention (FDSA): test sequences are composed of item ids
  NEVER seen in training (untrained id embeddings = noise); only the
  parallel category sequence carries signal, so above-chance accuracy
  proves the dual feature stream works (reference `fdsa.py`).
* cosine-contrastive margin (SimpleX): negatives below the margin must
  contribute EXACTLY zero gradient — the margin is a hard filter of easy
  negatives, not a soft weight (reference `cosine_contrastive_loss.py`).
* macro disentangling (MacridVAE): two planted co-occurrence clusters must
  land on two DIFFERENT concept prototypes in the learned item→concept
  assignment (reference `macridvae.py` cates).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from recbox_tpu.ops.losses import cosine_contrastive_loss, full_softmax_loss

from tests.test_learns_signal import _seq_fm


# ---------------------------------------------------------------------------
# 1. FDSA — the feature stream carries signal for unseen item ids
# ---------------------------------------------------------------------------

def test_fdsa_feature_stream_generalizes_to_unseen_items():
    from recbox_tpu.models.sequential.extended import FDSA
    n_in, n_cats, L = 40, 4, 6
    anchors = np.arange(n_in + 1, n_in + 1 + n_cats)     # targets 41..44
    V = n_in + 1 + n_cats
    cat = lambda ids: (ids - 1) % n_cats + 1             # item -> category
    rng = np.random.default_rng(0)

    def make(ids_pool, n):
        seqs = rng.choice(ids_pool, size=(n, L)).astype(np.int32)
        feats = cat(seqs).astype(np.int32)
        targets = anchors[cat(seqs[:, -1]) - 1].astype(np.int32)
        return {"item_seq": seqs, "feat_seq": feats,
                "seq_len": np.full(n, L, np.int32), "item_id": targets}

    train_arrays = make(np.arange(1, n_in // 2 + 1), 4000)   # ids 1..20
    test_arrays = make(np.arange(n_in // 2 + 1, n_in + 1), 512)  # 21..40

    model = FDSA(feature_map=_seq_fm(V), embedding_dim=16, max_seq_len=L,
                 dropout=0.0, n_layers=1, n_heads=2,
                 feature_vocab=n_cats + 1)
    init = {k: jnp.asarray(v[:8]) for k, v in train_arrays.items()}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           init, train=True, method=model.full_scores)
    params = nn.meta.unbox(variables["params"])
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            scores = model.apply({"params": p}, batch, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(2)},
                                 method=model.full_scores)
            return full_softmax_loss(scores, batch["item_id"])
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(train_arrays["item_id"])
    for _ in range(250):
        sel = rng.integers(0, n, 128)
        batch = {k: jnp.asarray(v[sel]) for k, v in train_arrays.items()}
        params, opt_state, _ = step(params, opt_state, batch)

    scores = np.asarray(model.apply(
        {"params": params},
        {k: jnp.asarray(v) for k, v in test_arrays.items()},
        train=False, method=model.full_scores))
    acc = float((scores.argmax(1) == test_arrays["item_id"]).mean())
    # the item stream sees only untrained ids; 4-way anchor choice through
    # the category stream — id-only models sit at ~0.25
    assert acc > 0.7, acc


# ---------------------------------------------------------------------------
# 2. SimpleX loss — margin hard-filters easy negatives
# ---------------------------------------------------------------------------

def test_cosine_contrastive_margin_zeroes_easy_negative_gradients():
    margin = 0.4
    y = jnp.asarray([[0.8, 0.39, 0.41, -0.2]])   # pos, below, above, below

    g = jax.grad(lambda s: cosine_contrastive_loss(s, margin=margin))(y)
    g = np.asarray(g)[0]
    assert g[0] != 0.0                    # positive always pulls
    assert g[1] == 0.0 and g[3] == 0.0    # below-margin negatives: filtered
    assert g[2] > 0.0                     # above-margin negative: pushed

    # negative_weight rescales surviving negatives but must not unfilter
    g_w = jax.grad(lambda s: cosine_contrastive_loss(
        s, margin=margin, negative_weight=2.0))(y)
    g_w = np.asarray(g_w)[0]
    assert g_w[1] == 0.0 and g_w[3] == 0.0
    np.testing.assert_allclose(g_w[2], g[2] * 2.0 / 3.0, rtol=1e-6)


# ---------------------------------------------------------------------------
# 3. MacridVAE — concept prototypes separate planted clusters
# ---------------------------------------------------------------------------

def test_macridvae_prototypes_separate_clusters():
    from recbox_tpu.models.matching.autoencoder import MacridVAE
    n_items, n_users = 40, 600
    clus_a, clus_b = np.arange(0, 20), np.arange(20, 40)
    rng = np.random.default_rng(0)
    hist = np.zeros((n_users, n_items), np.float32)
    for u in range(n_users):
        pool = clus_a if u % 2 == 0 else clus_b
        hist[u, rng.choice(pool, size=6, replace=False)] = 1.0

    model = MacridVAE(num_items=n_items, latent_dim=16, k_factors=2,
                      dropout=0.0, tau=0.1)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           {"history": jnp.asarray(hist[:8])}, train=False)
    params = variables["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x):
        def loss_fn(p):
            logp = model.apply({"params": p}, {"history": x}, train=False)
            return -jnp.mean(jnp.sum(x * logp, axis=1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(800):
        sel = rng.integers(0, n_users, 128)
        params, opt_state, _ = step(params, opt_state, jnp.asarray(hist[sel]))

    items = np.asarray(params["emb_item"])
    protos = np.asarray(params["emb_proto"])
    items_n = items / np.linalg.norm(items, axis=1, keepdims=True)
    protos_n = protos / np.linalg.norm(protos, axis=1, keepdims=True)
    sim = items_n @ protos_n.T
    assign = sim.argmax(1)                               # (N,) concept ids
    # the two clusters must map to DIFFERENT dominant concepts...
    maj_a = np.bincount(assign[clus_a], minlength=2).argmax()
    maj_b = np.bincount(assign[clus_b], minlength=2).argmax()
    assert maj_a != maj_b, (maj_a, maj_b)
    # ...and the soft item→concept assignment (cates) must separate them
    # well beyond the untrained baseline: measured 0.35 trained vs 0.135
    # at init (seed 0) — the objective rewards but does not force hard
    # assignments at this scale, so the argmax purity plateaus ~0.67
    cates = np.asarray(jax.nn.softmax(jnp.asarray(sim) / 0.1, axis=-1))
    gap = abs(cates[clus_a, 0].mean() - cates[clus_b, 0].mean())
    assert gap > 0.25, gap
