"""Decompose the SASRec train step at the round-5 (rbg+bf16) operating point.

Honest scan-chained timing: each probe is ONE jit with a lax.scan whose
iterations depend on the previous (content-varied inputs), float() sync.

MEASURED (v5e, 2026-08-20, V=60k L=50 B=1024 d=64 2L/2H):
    full_step(adam)   7.08 ms   (bench band [7.0, 8.6])
    full_vg           6.66 ms   -> optimizer ~0.4 ms
    encoder_vg        4.44 ms   (table gather + scatter-grad ~2 ms row-op
                                 wall + transformer ~2.3 ms vs ~0.3 FLOP
                                 floor — small-matmul/VPU bound)
    logitsCE_vg       2.85 ms   (245 MB logits HBM traffic; the flash-CE
                                 kernel halves this ISOLATED but loses
                                 in-context at this V — see
                                 ops/pallas/fused_ce.py crossover)
Falsified here: QKV projection fusion (3 dots -> 1 concat dot) buys only
14 µs/iter at these shapes — XLA's scheduling already covers it.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

VOCAB, L, B, D, ITERS = 60_000, 50, 1024, 64, 30

from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.sequential.models import SASRec
from recbox_tpu.ops import full_softmax_loss
from recbox_tpu.training import Trainer, TrainerConfig

fm = FeatureMap("sasprof", (FeatureSpec("item_id", "categorical",
                            vocab_size=VOCAB, embedding_dim=D),),
                corpus_index="item_id", num_items=VOCAB)
model = SASRec(feature_map=fm, embedding_dim=D, max_seq_len=L,
               n_layers=2, n_heads=2, dropout=0.1,
               compute_dtype="bfloat16")
rng = np.random.default_rng(0)
batch = {"item_seq": rng.integers(1, VOCAB, (B, L)).astype(np.int32),
         "seq_len": np.full(B, L, np.int32),
         "item_id": rng.integers(1, VOCAB, B).astype(np.int32)}
t = Trainer(model, lambda o, b: full_softmax_loss(o, b["item_id"]),
            TrainerConfig(learning_rate=1e-3, monitor="AUC"),
            train_method="full_scores")
t.init(batch)
params = t.params
db = {k: jnp.asarray(v) for k, v in batch.items()}
key = jax.random.key(0, impl="rbg")


def timed(name, fn, *a):
    out = fn(*a); _ = float(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); out = fn(*a); _ = float(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:24s} {best/ITERS*1e3:7.2f} ms/iter", flush=True)


def scan_chain(body):
    @jax.jit
    def run(p, b):
        def step(c, i):
            return body(c, p, b, i), ()
        c, _ = jax.lax.scan(step, 0.0, jnp.arange(ITERS))
        return c
    return run


# (a) full vg (loss + grads, no optimizer)
def full_vg(c, p, b, i):
    bb = dict(b); bb["item_seq"] = (b["item_seq"] + i) % VOCAB
    def loss_fn(q):
        s = model.apply({"params": q}, bb, train=True,
                        method=model.full_scores,
                        rngs={"dropout": jax.random.fold_in(key, i)})
        return full_softmax_loss(s, bb["item_id"])
    l, g = jax.value_and_grad(loss_fn)(p)
    return c + l + sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree_util.tree_leaves(g))

# (b) encoder-only vg: gather + encoder, no logits/CE (sum output as loss)
def enc_vg(c, p, b, i):
    bb_seq = (b["item_seq"] + i) % VOCAB
    def loss_fn(q):
        u = model.apply({"params": q},
                        {"item_seq": bb_seq, "seq_len": b["seq_len"]},
                        train=True, method=model.user_tower,
                        rngs={"dropout": jax.random.fold_in(key, i)})
        return jnp.sum(u.astype(jnp.float32) ** 2)
    l, g = jax.value_and_grad(loss_fn)(p)
    return c + l + sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree_util.tree_leaves(g))

# (c) logits+CE-only vg: fixed user vectors, table param only
user_fixed = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
def logits_vg(c, p, b, i):
    u = user_fixed + i * 1e-6
    def loss_fn(q):
        tbl = q["emb_item"]
        s = jnp.dot(u.astype(jnp.bfloat16), tbl.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32)
        return full_softmax_loss(s, b["item_id"])
    l, g = jax.value_and_grad(loss_fn)(p)
    return c + l + jnp.sum(g["emb_item"].astype(jnp.float32))

# (d) full train step incl. adam (reference: what bench measures)
# use trainer's own path
def bench_like():
    k = ITERS
    _ = float(t.train_steps_repeat(batch, k)[-1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(t.train_steps_repeat(batch, k)[-1])
        best = min(best, time.perf_counter() - t0)
    print(f"{'full_step(adam)':24s} {best/k*1e3:7.2f} ms/iter", flush=True)


print("devices:", jax.devices(), flush=True)
timed("full_vg", scan_chain(full_vg), params, db)
timed("encoder_vg", scan_chain(enc_vg), params, db)
timed("logitsCE_vg", scan_chain(logits_vg), params, db)
bench_like()
