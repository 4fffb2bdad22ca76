"""Mechanism tests batch 11 — the last two registry models without any
test reference (round-3 audit: 123/125 covered):

* YoutubeDNN: with a DEGENERATE user id (vocab 1, identical for every
  user), all discrimination must flow through the mean-pooled history
  sharing the item embedding (`two_tower.py` YoutubeDNN user tower —
  the reference's watch-vector averaging). Chance AUC = 0.5.
* KD_DAGFM: pure distillation (labels=None) transfers the teacher's
  learned XOR skill into the student — the student never sees a label
  (`kd_dagfm.py` two-phase fit). Chance AUC = 0.5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.ops import pairwise_logistic_loss


def test_youtubednn_ranks_from_pooled_history_alone():
    """Block preference data where the user id carries ZERO information
    (one shared id): YoutubeDNN's user tower sees only the pooled watch
    history, so in-block AUC > 0.8 proves the history-pooling mechanism
    (chance 0.5 — an id-only tower cannot beat it)."""
    from recbox_tpu.models.matching.two_tower import YoutubeDNN

    rng = np.random.default_rng(0)
    n_items, n_blocks, L, n_rows = 40, 4, 5, 1200
    block = n_items // n_blocks
    grp = rng.integers(0, n_blocks, n_rows)
    hist = np.stack([rng.integers(g * block, (g + 1) * block, L)
                     for g in grp]).astype(np.int32)
    pos = np.array([rng.integers(g * block, (g + 1) * block)
                    for g in grp], np.int64)
    fm = FeatureMap("yt11", (
        FeatureSpec("user_id", "categorical", source="user", vocab_size=1,
                    embedding_dim=8),
        FeatureSpec("hist", "sequence", source="user", vocab_size=n_items,
                    embedding_dim=16, max_len=L,
                    share_embedding="item_id"),
        FeatureSpec("item_id", "categorical", source="item",
                    vocab_size=n_items, embedding_dim=16)),
        query_index="user_id", corpus_index="item_id", num_items=n_items)
    model = YoutubeDNN(feature_map=fm, embedding_dim=16,
                       hidden_units=(32, 16))
    zeros = np.zeros(n_rows, np.int32)

    def batch_of(idx, negs):
        ids = jnp.asarray(np.stack([pos[idx], negs], axis=1))
        return {"user_id": jnp.asarray(zeros[idx]),
                "hist": jnp.asarray(hist[idx]),
                "__item_ids__": ids,
                "item::item_id": ids}

    init_b = batch_of(np.arange(8), np.zeros(8, np.int64))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, init_b)
    params = nn.meta.unbox(variables["params"])
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, b):
        def loss_fn(p):
            return pairwise_logistic_loss(model.apply({"params": p}, b, True))
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(300):
        idx = rng.integers(0, n_rows, 256)
        params, opt, _ = step(params, opt,
                              batch_of(idx, rng.integers(0, n_items, 256)))
    u = np.asarray(model.apply(
        {"params": params},
        {"user_id": jnp.asarray(zeros), "hist": jnp.asarray(hist)},
        method=model.user_tower))
    it = np.asarray(model.apply(
        {"params": params}, {"item_id": jnp.arange(n_items)},
        method=model.item_tower))
    scores = u @ it.T
    in_block = np.zeros_like(scores, bool)
    for r, g in enumerate(grp):
        in_block[r, g * block:(g + 1) * block] = True
    auc_num = auc_den = 0
    for r in range(0, n_rows, 10):           # subsample rows for speed
        s_in = scores[r][in_block[r]]
        s_out = scores[r][~in_block[r]]
        auc_num += (s_in[:, None] > s_out[None, :]).sum()
        auc_den += s_in.size * s_out.size
    auc = auc_num / auc_den
    assert auc > 0.8, auc


def test_kd_dagfm_distills_teacher_without_labels():
    """Two-phase KD (`kd_dagfm.py`): a DCNv2 teacher learns the planted
    XOR; the KD_DAGFM student then trains on distillation_loss with
    labels=None — logits only. Student AUC > 0.75 proves the transfer
    (chance 0.5; the student never observes a click)."""
    from recbox_tpu.models.ranking.ctr import DCNv2
    from recbox_tpu.models.ranking.distill import KD_DAGFM, distillation_loss
    from tests.test_ranking_e2e import make_ctr_data
    from recbox_tpu.data import ArrayLoader
    from recbox_tpu.evaluation import CTREvaluator
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import Trainer, TrainerConfig

    rng = np.random.default_rng(5)
    fm, arrays = make_ctr_data(rng, n=5000)
    split = int(0.8 * len(arrays["click"]))
    train = {k: v[:split] for k, v in arrays.items()}
    valid = {k: v[split:] for k, v in arrays.items()}

    teacher = DCNv2(feature_map=fm, embedding_dim=8, hidden_units=(32, 16))
    cfg = TrainerConfig(learning_rate=1e-2, epochs=5, patience=8,
                        monitor="AUC", lr_decay_factor=1.0,
                        reload_best_on_plateau=False)
    t_ev = CTREvaluator(valid, label="click", metrics=["AUC"])
    t_tr = Trainer(teacher,
                   lambda o, b: binary_crossentropy(o, b["click"]),
                   cfg, eval_fn=t_ev)
    t_metrics = t_tr.fit(ArrayLoader(train, batch_size=256, drop_last=True,
                                     seed=0))
    assert t_metrics["AUC"] > 0.8, t_metrics         # teacher must know XOR

    feat_keys = [k for k in train if k != "click"]
    student = KD_DAGFM(feature_map=fm, embedding_dim=8, n_layers=2)
    init_b = {k: jnp.asarray(train[k][:8]) for k in feat_keys}
    s_vars = student.init({"params": jax.random.PRNGKey(0)}, init_b)
    s_params = nn.meta.unbox(s_vars["params"])
    tx = optax.adam(1e-2)
    opt = tx.init(s_params)
    t_vars = {"params": t_tr.full_params(), **t_tr.model_state}

    @jax.jit
    def kd_step(p, opt, b):
        t_logits = teacher.apply(t_vars, b)          # labels NEVER used
        def loss_fn(pp):
            return distillation_loss(student.apply({"params": pp}, b),
                                     t_logits)
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(p, up), opt, loss

    n = len(train["click"])
    for _ in range(400):
        idx = rng.integers(0, n, 256)
        b = {k: jnp.asarray(train[k][idx]) for k in feat_keys}
        s_params, opt, _ = kd_step(s_params, opt, b)

    vb = {k: jnp.asarray(valid[k]) for k in feat_keys}
    s_logits = np.asarray(student.apply({"params": s_params}, vb))
    y = valid["click"]
    order = np.argsort(s_logits)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(len(y))
    n_pos, n_neg = y.sum(), (1 - y).sum()
    auc = (ranks[y == 1].sum() - n_pos * (n_pos - 1) / 2) / (n_pos * n_neg)
    assert auc > 0.75, auc
