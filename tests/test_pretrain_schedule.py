"""S3Rec phased pretraining: data reconstruction + schedule + transfer."""

import numpy as np
import pytest

from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.sequential.pretrain import S3Rec
from recbox_tpu.training.pretrain import (
    S3RecPretrainer, reconstruct_pretrain_batch, transfer_pretrained,
)

N_ITEMS = 30
L = 8


def _fm():
    return FeatureMap(
        "s3p", (FeatureSpec("item_id", "categorical", source="item",
                            vocab_size=N_ITEMS + 1, embedding_dim=16),),
        query_index="user_id", corpus_index="item_id",
        num_items=N_ITEMS + 1)


def _seqs(rng, n=64):
    seq_len = rng.integers(3, L + 1, n).astype(np.int32)
    seqs = rng.integers(1, N_ITEMS, size=(n, L)).astype(np.int32)
    seqs[np.arange(L)[None, :] >= seq_len[:, None]] = 0
    return seqs, seq_len


def test_reconstruct_shapes_and_semantics():
    rng = np.random.default_rng(0)
    seqs, seq_len = _seqs(rng)
    mask_token = N_ITEMS + 1  # model.mask_token == vocab_size
    out = reconstruct_pretrain_batch(seqs, seq_len, N_ITEMS + 1, mask_token,
                                     rng, mask_ratio=0.4)
    B = len(seqs)
    for k in ("masked_seq", "pos_items", "neg_items", "masked_segment",
              "pos_segment", "neg_segment"):
        assert out[k].shape == (B, L), k

    ms, pos, neg = out["masked_seq"], out["pos_items"], out["neg_items"]
    # left padding: invalid prefix is zeros, valid tail is non-zero
    j = np.arange(L)[None, :]
    left_pad = j < (L - seq_len[:, None])
    assert (ms[left_pad] == 0).all() and (pos[left_pad] == 0).all()
    assert (pos[~left_pad] > 0).all()
    # masked positions hold the mask token, pos_items hold the true item
    masked = ms == mask_token
    assert masked.any()
    assert (pos[masked] != mask_token).all()
    # negatives at masked positions never collide with the row's items
    for b in range(B):
        row_set = set(seqs[b][: seq_len[b]].tolist())
        for t in np.where(masked[b])[0]:
            assert neg[b, t] not in row_set
    # non-masked positions: neg == pos == original
    assert (neg[~masked] == pos[~masked]).all()

    # segment instances: masked_segment's masked span matches pos_segment's
    # revealed span
    seg, posg, negg = (out["masked_segment"], out["pos_segment"],
                       out["neg_segment"])
    span = seg == mask_token
    assert span.any()
    assert (posg[span] != mask_token).all()
    assert (posg[span] == pos[span]).all()      # segment = original items
    # outside the span (valid region), pos_segment is masked out
    outside = (~span) & (~left_pad)
    assert (posg[outside] == mask_token).all() | (seq_len < 2).any()
    # negative segment differs from the positive somewhere
    assert (negg[span] != posg[span]).any()


def test_reconstruct_with_attributes():
    rng = np.random.default_rng(1)
    seqs, seq_len = _seqs(rng, n=16)
    A = 5
    att = (rng.random((N_ITEMS + 2, A)) > 0.6).astype(np.float32)
    att[0] = 0
    out = reconstruct_pretrain_batch(seqs, seq_len, N_ITEMS + 1, N_ITEMS + 1,
                                     rng, 0.3, attribute_table=att)
    assert out["attributes"].shape == (16, L, A)
    # attributes follow the original (pos) item at each position
    np.testing.assert_allclose(out["attributes"][0, -1],
                               att[out["pos_items"][0, -1]])


def test_pretrain_loss_decreases_and_transfer():
    rng = np.random.default_rng(2)
    seqs, seq_len = _seqs(rng, n=96)
    fm = _fm()
    A = 5
    att = (rng.random((N_ITEMS + 2, A)) > 0.6).astype(np.float32)
    model = S3Rec(feature_map=fm, embedding_dim=16, max_seq_len=L,
                  n_layers=1, n_heads=2, dropout=0.0, n_attributes=A)

    pre = S3RecPretrainer(model, learning_rate=1e-2, mask_ratio=0.3,
                          attribute_table=att, seed=0)

    # measure the joint loss on a FIXED probe batch before and after
    import jax
    probe_rng = np.random.default_rng(42)
    probe = reconstruct_pretrain_batch(seqs[:32], seq_len[:32], N_ITEMS + 1,
                                       N_ITEMS + 1, probe_rng, 0.3, att)

    pre.pretrain(seqs, seq_len, epochs=1, batch_size=32)
    params_e1 = jax.tree_util.tree_map(np.asarray, pre.params)
    loss1 = float(model.apply({"params": params_e1}, probe, train=False,
                              method=model.pretrain_losses))
    pre.pretrain(seqs, seq_len, epochs=3, batch_size=32)
    loss2 = float(model.apply({"params": pre.params}, probe, train=False,
                              method=model.pretrain_losses))
    assert np.isfinite(loss1) and np.isfinite(loss2)
    assert loss2 < loss1, (loss1, loss2)

    # transfer into a fine-tune trainer: pretrained subtrees replace fresh
    # init, causal encoder keeps its fresh weights
    from recbox_tpu.training import Trainer, TrainerConfig

    def loss_fn(scores, batch):
        import jax.numpy as jnp
        return -jnp.mean(jax.nn.log_softmax(scores)[
            jnp.arange(scores.shape[0]), batch["target"]])

    tr = Trainer(model, loss_fn, TrainerConfig(learning_rate=1e-3,
                                               monitor="AUC"),
                 train_method="full_scores")
    batch = {"item_seq": seqs[:8], "seq_len": seq_len[:8],
             "target": seqs[:8, -1].astype(np.int32)}
    tr.init(batch)
    fresh_causal = np.asarray(
        jax.tree_util.tree_leaves(tr.params["causal"])[0]).copy()
    tr.params = transfer_pretrained(tr.params, pre.params)
    np.testing.assert_allclose(
        np.asarray(tr.params["emb_item"]), np.asarray(pre.params["emb_item"]))
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(tr.params["causal"])[0]),
        fresh_causal)
    # fine-tune step runs on the grafted params
    loss = tr.train_step(batch)
    assert np.isfinite(float(loss))


def test_pretrain_with_dataset_smaller_than_batch():
    rng = np.random.default_rng(9)
    seqs, seq_len = _seqs(rng, n=20)
    model = S3Rec(feature_map=_fm(), embedding_dim=16, max_seq_len=L,
                  n_layers=1, n_heads=2, dropout=0.0)
    pre = S3RecPretrainer(model, learning_rate=1e-2, mask_ratio=0.3, seed=0)
    params = pre.pretrain(seqs, seq_len, epochs=1, batch_size=256)
    assert params is not None   # batch shrank to n; training happened
