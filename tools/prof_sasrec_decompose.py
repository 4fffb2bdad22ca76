"""Where do SASRec's 11.4 ms/step go? Component decomposition on-chip.

The SASRec regime (V=60k, L=50, d=64, B=1024, full-softmax CE,
tools/prof_sasrec_train.py: 11.38-11.45 ms/step) has no proven op floor
(BENCH secondary `interpretation` field). MXU FLOP content is tiny:
last-position logits fwd+bwd ~23.6 GFLOP + encoder ~34 GFLOP total
≈ 0.35 ms at 170 TFLOP/s bf16 — so the step should be dominated by
something else (f32 rate? dropout RNG? table scatter? optimizer?).

Variants (honest ITERS-scan, content-varied, float() sync, best-of-3):
  fwd_full        full_scores forward (f32, train=False)
  fwd_train       full_scores forward (train=True: dropout live)
  vg_loss         value_and_grad of the CE loss (grads consumed)
  train_step      the real Trainer step (threads params; ~bench number)
  logits_only     (B,D)x(D,V) matmul + CE from a FIXED user matrix
  encoder_only    user_tower forward
  fwd_bf16        full_scores with params/emb cast to bf16 in-flight

Run: cd /root/repo && timeout 900 python tools/prof_sasrec_decompose.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

VOCAB, L, B, D, ITERS = 60_000, 50, 1024, 64, 30


def timed(name, fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out)) if hasattr(out, "dtype") else float(out[0])
    best = float("inf")
    for rep in range(1, 4):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out)) if hasattr(out, "dtype") else float(out[0])
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    print(f"{name:14s} {per*1e3:7.2f} ms/iter", flush=True)
    return per


def main():
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.sequential.models import SASRec
    from recbox_tpu.ops import full_softmax_loss
    from recbox_tpu.training import Trainer, TrainerConfig

    fm = FeatureMap(
        "sasprof", (FeatureSpec("item_id", "categorical",
                                vocab_size=VOCAB, embedding_dim=D),),
        corpus_index="item_id", num_items=VOCAB)
    model = SASRec(feature_map=fm, embedding_dim=D, max_seq_len=L,
                   n_layers=2, n_heads=2, dropout=0.1)
    rng = np.random.default_rng(0)
    batch = {
        "item_seq": rng.integers(1, VOCAB, (B, L)).astype(np.int32),
        "seq_len": np.full(B, L, np.int32),
        "item_id": rng.integers(1, VOCAB, B).astype(np.int32),
    }
    t = Trainer(model, lambda o, b: full_softmax_loss(o, b["item_id"]),
                TrainerConfig(learning_rate=1e-3, monitor="AUC"),
                train_method="full_scores")
    t.init(batch)
    params = t.params
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(0)

    def scan_fwd(train):
        @jax.jit
        def run(p, b):
            def body(c, i):
                bb = dict(b)
                bb["item_seq"] = (b["item_seq"] + i) % VOCAB
                kw = {"rngs": {"dropout": jax.random.fold_in(key, i)}} \
                    if train else {}
                s = model.apply({"params": p}, bb, train=train,
                                method=model.full_scores, **kw)
                return c + jnp.sum(s.astype(jnp.float32)), ()
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
            return c
        return run

    @jax.jit
    def vg_loss(p, b):
        def one(pp, bb, i):
            def loss_fn(q):
                s = model.apply(
                    {"params": q}, bb, train=True,
                    method=model.full_scores,
                    rngs={"dropout": jax.random.fold_in(key, i)})
                return full_softmax_loss(s, bb["item_id"])
            l, g = jax.value_and_grad(loss_fn)(pp)
            return l + sum(jnp.sum(x.astype(jnp.float32))
                           for x in jax.tree_util.tree_leaves(g))

        def body(c, i):
            bb = dict(b)
            bb["item_seq"] = (b["item_seq"] + i) % VOCAB
            return c + one(p, bb, i), ()
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        return c

    @jax.jit
    def encoder_only(p, b):
        def body(c, i):
            bb = dict(b)
            bb["item_seq"] = (b["item_seq"] + i) % VOCAB
            u = model.apply({"params": p}, bb, train=False,
                            method=model.user_tower)
            return c + jnp.sum(u.astype(jnp.float32)), ()
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        return c

    table = params["emb_item"] if "emb_item" in params else \
        jax.tree_util.tree_leaves(
            {k: v for k, v in params.items() if "emb_item" in str(k)})[0]

    @jax.jit
    def logits_only(u0, tab, y):
        def body(c, i):
            u = u0 * (1.0 + 1e-6 * i)
            s = jnp.dot(u, tab.T, preferred_element_type=jnp.float32)
            lse = jax.nn.logsumexp(s, axis=1)
            tgt = jnp.take_along_axis(s, y[:, None], axis=1)[:, 0]
            return c + jnp.sum(lse - tgt), ()
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        return c

    @jax.jit
    def fwd_bf16(p, b):
        pb = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)

        def body(c, i):
            bb = dict(b)
            bb["item_seq"] = (b["item_seq"] + i) % VOCAB
            s = model.apply({"params": pb}, bb, train=False,
                            method=model.full_scores)
            return c + jnp.sum(s.astype(jnp.float32)), ()
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        return c

    print(f"devices: {jax.devices()}", flush=True)
    timed("fwd_full", scan_fwd(False), params, db)
    timed("fwd_train", scan_fwd(True), params, db)
    timed("vg_loss", vg_loss, params, db)
    timed("encoder_only", encoder_only, params, db)
    u0 = np.asarray(model.apply({"params": params}, db, train=False,
                                method=model.user_tower))
    timed("logits_only", logits_only, jnp.asarray(u0),
          jnp.asarray(table), db["item_id"])
    timed("fwd_bf16", fwd_bf16, params, db)

    # the real step for reference (threads params call-to-call)
    _ = float(t.train_steps_repeat(batch, ITERS)[-1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(t.train_steps_repeat(batch, ITERS)[-1])
        best = min(best, time.perf_counter() - t0)
    print(f"{'train_step':14s} {best/ITERS*1e3:7.2f} ms/iter", flush=True)


def main2():
    """Second-level attribution: vg of encoder alone vs logits alone,
    dropout on/off, and the table scatter cost."""
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.sequential.models import SASRec
    from recbox_tpu.ops import full_softmax_loss
    from recbox_tpu.training import Trainer, TrainerConfig

    fm = FeatureMap(
        "sasprof", (FeatureSpec("item_id", "categorical",
                                vocab_size=VOCAB, embedding_dim=D),),
        corpus_index="item_id", num_items=VOCAB)
    model = SASRec(feature_map=fm, embedding_dim=D, max_seq_len=L,
                   n_layers=2, n_heads=2, dropout=0.1)
    model_nodrop = SASRec(feature_map=fm, embedding_dim=D, max_seq_len=L,
                          n_layers=2, n_heads=2, dropout=0.0)
    rng = np.random.default_rng(0)
    batch = {
        "item_seq": rng.integers(1, VOCAB, (B, L)).astype(np.int32),
        "seq_len": np.full(B, L, np.int32),
        "item_id": rng.integers(1, VOCAB, B).astype(np.int32),
    }
    t = Trainer(model, lambda o, b: full_softmax_loss(o, b["item_id"]),
                TrainerConfig(learning_rate=1e-3, monitor="AUC"),
                train_method="full_scores")
    t.init(batch)
    params = t.params
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(0)

    def vg_of(apply_loss, use_i=True):
        @jax.jit
        def run(p, b):
            def body(c, i):
                bb = dict(b)
                bb["item_seq"] = (b["item_seq"] + i) % VOCAB
                def loss_fn(q):
                    return apply_loss(q, bb, i)
                l, g = jax.value_and_grad(loss_fn)(p)
                return c + l + sum(jnp.sum(x.astype(jnp.float32))
                                   for x in jax.tree_util.tree_leaves(g)), ()
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
            return c
        return run

    # encoder-only vg (mean-sum head so the (B,D) output becomes a loss)
    def enc_loss(q, bb, i):
        u = model.apply({"params": q}, bb, train=True,
                        method=model.user_tower,
                        rngs={"dropout": jax.random.fold_in(key, i)})
        return jnp.sum(u * u)

    def enc_loss_nodrop(q, bb, i):
        u = model_nodrop.apply({"params": q}, bb, train=True,
                               method=model_nodrop.user_tower)
        return jnp.sum(u * u)

    def full_loss_nodrop(q, bb, i):
        s = model_nodrop.apply({"params": q}, bb, train=True,
                               method=model_nodrop.full_scores)
        return full_softmax_loss(s, bb["item_id"])

    # logits+CE vg from a fixed user matrix: table grad + dU only
    u0 = jnp.asarray(np.asarray(model.apply(
        {"params": params}, db, train=False, method=model.user_tower)))

    @jax.jit
    def vg_logits(tab, b):
        def body(c, i):
            u = u0 * (1.0 + 1e-6 * i)
            def loss_fn(tb):
                s = jnp.dot(u, tb.T, preferred_element_type=jnp.float32)
                return full_softmax_loss(s, b["item_id"])
            l, g = jax.value_and_grad(loss_fn)(tab)
            return c + l + jnp.sum(g.astype(jnp.float32)), ()
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        return c

    table = params["emb_item"]
    print("--- second level ---", flush=True)
    timed("vg_encoder", vg_of(enc_loss), params, db)
    timed("vg_enc_nodrop", vg_of(enc_loss_nodrop), params, db)
    timed("vg_full_nodrp", vg_of(full_loss_nodrop), params, db)
    timed("vg_logits", vg_logits, jnp.asarray(table), db)


if __name__ == "__main__":
    main()
    main2()
