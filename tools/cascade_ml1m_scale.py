"""BASELINE row 5 at ML-1M scale: two-tower retrieval → DCN ranking → PRM
listwise rerank, end to end on the ml1m_scale parity dataset (6040 users,
3706 items, ~1M interactions — `tools/parity_gen_ml1m_scale.py`).

Upgrades `tests/test_cascade.py` (40-user toy plumbing check) to the
production-scale evidence VERDICT round-1 weak-point 4 asked for. Reference
cascade shape: matching bases (`recbox/matching/pytorch/models/match_model.py`)
feeding ranking bases (`recbox/ranking/pytorch/models/ranking_model.py`)
feeding librerank's PRM (`third_party/librerank/reranker.py:331`).

Protocol (leakage-clean):
  split 0.8/0.1/0.1 by-user RO, seed 2024 (same as the parity runners).
  Stage 1  MF-BPR two-tower, full-sort retrieval; candidates for *valid*
           lists exclude train history only, candidates for *test* lists
           exclude train+valid (recbole full-sort test masking).
  Stage 2  DCN on train interactions + mixed random/hard negatives (hard =
           MF candidates that are not known positives — impression-style),
           with the MF retrieval score as a numeric feature (the production
           cascade's "retrieval score feeds the ranker" contract); labeled
           AUC on a valid-derived holdout; DCN re-scores the candidate lists.
  Stage 3  PRM trained on valid-labeled lists (the "logged feedback" a
           production reranker trains on), evaluated on test-labeled lists.

Run on TPU:  OURS_PLATFORM= python tools/cascade_ml1m_scale.py
Knobs: MF_EPOCHS (8) DCN_EPOCHS (3) PRM_STEPS (300) LIST (50) CAND (200)

Round 5: this protocol is now a first-class API —
`quick_start.run_cascade_experiment(dataset, matcher=, ranker=,
reranker=)` (tests/test_cascade_api.py, examples/cascade_three_stage.py);
this tool remains the at-scale measured record.
"""
import sys; sys.path.insert(0, "/root/repo")
import os
import time

import jax
_PLAT = os.environ.get("OURS_PLATFORM", "cpu")
if _PLAT:  # empty string = default backend (TPU when present)
    jax.config.update("jax_platform_name", _PLAT)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from recbox_tpu.data import ArrayLoader, MatchingLoader
from recbox_tpu.data.atomic import load_atomic_dataset
from recbox_tpu.evaluation import RetrievalEvaluator
from recbox_tpu.evaluation.ctr import auc_score, log_loss
from recbox_tpu.evaluation.rerank import evaluate_rerank
from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.matching.two_tower import MF
from recbox_tpu.models.ranking.ctr import DCN
from recbox_tpu.models.reranking.models import PRM, listwise_bce
from recbox_tpu.ops import binary_crossentropy, get_matching_loss
from recbox_tpu.training import Trainer, TrainerConfig

MF_EPOCHS = int(os.environ.get("MF_EPOCHS", 8))
DCN_EPOCHS = int(os.environ.get("DCN_EPOCHS", 3))
PRM_STEPS = int(os.environ.get("PRM_STEPS", 300))
LIST = int(os.environ.get("LIST", 50))      # rerank list length
CAND = int(os.environ.get("CAND", 200))     # retrieval candidates/user
NEG_PER_POS = 3

t_start = time.time()


def log(msg):
    print(f"[{time.time() - t_start:7.1f}s] {msg}", flush=True)


# --- data ------------------------------------------------------------------
root = "/tmp/parity/ml1m_scale"
if not os.path.exists(os.path.join(root, "ml1m_scale.inter")):
    log("generating ml1m_scale dataset")
    import subprocess
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 "parity_gen_ml1m_scale.py")], check=True)
ds = load_atomic_dataset(root, "ml1m_scale")
inter = ds.to_interactions(rating_field="rating", time_field="timestamp")
num_users, num_items = ds.num_users, ds.num_items
train, valid, test = inter.split_ratio((0.8, 0.1, 0.1), order="RO",
                                       group_by_user=True, seed=2024)
log(f"splits {len(train)}/{len(valid)}/{len(test)}  U={num_users} I={num_items}")


def u2i(dset):
    out = {}
    for u, i in zip(dset.user_ids, dset.item_ids):
        out.setdefault(int(u), []).append(int(i))
    return out


train_u2i, valid_u2i, test_u2i = u2i(train), u2i(valid), u2i(test)

fm = FeatureMap(
    "ml1m_cascade", (
        FeatureSpec("user_id", "categorical", "user", vocab_size=num_users,
                    embedding_dim=32),
        FeatureSpec("item_id", "categorical", "item", vocab_size=num_items,
                    embedding_dim=32)),
    labels=("click",), query_index="user_id", corpus_index="item_id",
    num_items=num_items)
corpus = {"item_id": np.arange(num_items, dtype=np.int32)}

# --- stage 1: MF-BPR two-tower retrieval -----------------------------------
loader = MatchingLoader(
    fm, {"user_id": train.user_ids.astype(np.int32),
         "item_id": train.item_ids.astype(np.int32)},
    corpus, batch_size=512, num_negs=1, seed=99, exclude_seen=True)
vu = np.array(sorted(valid_u2i), np.int32)
ev = RetrievalEvaluator({"user_id": vu}, corpus, vu, train_u2i, valid_u2i,
                        metrics=["Recall(k=20)", "NDCG(k=20)"])
mf = MF(feature_map=fm, embedding_dim=32, emb_init_scheme="normal")
t_match = Trainer(
    mf, lambda o, b: get_matching_loss("PairwiseLogisticLoss")(o),
    TrainerConfig(rng_impl="threefry",  # recorded cascade numbers (QUALITY_PARITY.md)
        # were measured under the pre-round-5 stream
        learning_rate=1e-3, epochs=MF_EPOCHS, patience=10,
                  monitor="Recall(k=20)", lr_decay_factor=1.0,
                  reload_best_on_plateau=False), eval_fn=ev)
stage1_valid = t_match.fit(loader)
log(f"stage1 MF valid: {stage1_valid}")

variables = {"params": t_match.params}
user_embs = np.asarray(mf.apply(
    variables, {"user_id": jnp.arange(num_users)}, method=mf.encode_user))
item_embs = np.asarray(mf.apply(
    variables, {"item_id": jnp.arange(num_items)}, method=mf.encode_item))

# full score matrix is tiny at this scale: (6040, 3706)
scores_all = user_embs @ item_embs.T


def candidates(users, hist_maps, k):
    """Top-k unseen candidates per user; history masked to -inf."""
    s = scores_all[users].copy()
    for r, u in enumerate(users):
        seen = []
        for h in hist_maps:
            seen.extend(h.get(int(u), []))
        s[r, seen] = -np.inf
    idx = np.argpartition(-s, kth=min(k, s.shape[1] - 1), axis=1)[:, :k]
    row_s = np.take_along_axis(s, idx, axis=1)
    order = np.argsort(-row_s, axis=1, kind="stable")
    return np.take_along_axis(idx, order, axis=1)   # (B, k) best-first


tu = np.array(sorted(test_u2i), np.int32)
test_cand = candidates(tu, (train_u2i, valid_u2i), CAND)
valid_cand = candidates(vu, (train_u2i,), CAND)

# test-protocol retrieval metrics (full-sort, train+valid masked)
hist = {u: train_u2i.get(u, []) + valid_u2i.get(u, [])
        for u in set(train_u2i) | set(valid_u2i)}
test_ev = RetrievalEvaluator({"user_id": tu}, corpus, tu, hist, test_u2i,
                             metrics=["Recall(k=20)", "NDCG(k=20)"])
stage1_test = test_ev(t_match)
def _relevance(users, cand, u2i):
    out = np.zeros(cand.shape, np.float64)
    for r, u in enumerate(users):
        pos = set(u2i[int(u)])
        out[r] = [1.0 if i in pos else 0.0 for i in cand[r]]
    return out

rel_test = _relevance(tu, test_cand, test_u2i)
rel_valid = _relevance(vu, valid_cand, valid_u2i)
cand_recall = float(np.mean(
    rel_test.sum(1) / np.maximum([len(test_u2i[int(u)]) for u in tu], 1)))
log(f"stage1 MF test: {stage1_test}  candidate-recall@{CAND}: {cand_recall:.4f}")

# --- stage 2: DCN CTR ranking ---------------------------------------------
rng = np.random.default_rng(11)

# MF score as a ranker feature, standardized over train positives
_mf_mu = float(np.mean(scores_all[train.user_ids, train.item_ids]))
_mf_sd = float(np.std(scores_all[train.user_ids, train.item_ids]) + 1e-8)


def mf_feat(u, i):
    return ((scores_all[u, i] - _mf_mu) / _mf_sd).astype(np.float32)


# per-user hard-negative pools: MF candidates (train excluded) that are not
# known (train/valid) positives — impression-style ranker negatives
hard_pool = {}
for r, u in enumerate(vu):
    vset = set(valid_u2i.get(int(u), ()))
    pool = [i for i in valid_cand[r] if i not in vset]
    if pool:
        hard_pool[int(u)] = np.array(pool, np.int32)


def make_ctr(dset, hist_maps):
    """Positives = interactions; negatives = NEG_PER_POS draws per positive,
    half uniform-unseen, half from the user's hard-negative pool."""
    pos_u = dset.user_ids.astype(np.int32)
    pos_i = dset.item_ids.astype(np.int32)
    n_hard = NEG_PER_POS // 2
    n_rand = NEG_PER_POS - n_hard
    neg_u = np.repeat(pos_u, n_rand)
    neg_i = rng.integers(0, num_items, len(neg_u)).astype(np.int32)
    seen = {}
    for h in hist_maps:
        for u, its in h.items():
            seen.setdefault(u, set()).update(its)
    # resample collisions with the user's seen set (a few rounds suffice)
    for _ in range(4):
        bad = np.array([i in seen.get(int(u), ()) for u, i
                        in zip(neg_u, neg_i)])
        if not bad.any():
            break
        neg_i[bad] = rng.integers(0, num_items, int(bad.sum()))
    hu = np.repeat(pos_u, n_hard)
    hi = np.empty(len(hu), np.int32)
    for r, u in enumerate(hu):
        pool = hard_pool.get(int(u))
        hi[r] = pool[rng.integers(0, len(pool))] if pool is not None \
            else rng.integers(0, num_items)
    u = np.concatenate([pos_u, neg_u, hu])
    i = np.concatenate([pos_i, neg_i, hi])
    y = np.concatenate([np.ones(len(pos_u), np.float32),
                        np.zeros(len(neg_u) + len(hu), np.float32)])
    p = rng.permutation(len(u))
    u, i, y = u[p], i[p], y[p]
    return {"user_id": u, "item_id": i, "mf_score": mf_feat(u, i), "click": y}


ctr_train = make_ctr(train, (train_u2i,))
ctr_valid = make_ctr(valid, (train_u2i, valid_u2i))
log(f"ctr rows: train {len(ctr_train['click'])} valid {len(ctr_valid['click'])}")

fm_rank = FeatureMap(
    "ml1m_cascade_rank", (
        FeatureSpec("user_id", "categorical", "user", vocab_size=num_users,
                    embedding_dim=32),
        FeatureSpec("item_id", "categorical", "item", vocab_size=num_items,
                    embedding_dim=32),
        FeatureSpec("mf_score", "numeric", embedding_dim=32)),
    labels=("click",))
dcn = DCN(feature_map=fm_rank, embedding_dim=32, num_cross_layers=2,
          hidden_units=(64, 32))
t_rank = Trainer(dcn, lambda o, b: binary_crossentropy(o, b["click"]),
                 TrainerConfig(rng_impl="threefry",  # recorded cascade numbers (QUALITY_PARITY.md)
        # were measured under the pre-round-5 stream
        learning_rate=1e-3, epochs=DCN_EPOCHS,
                               grad_clip_norm=10.0, monitor="x"))
rank_loader = ArrayLoader(ctr_train, batch_size=8192, drop_last=True)
for ep in range(DCN_EPOCHS):
    for batch in rank_loader:
        batch.pop("__mask__", None)
        t_rank.train_step(batch)
    log(f"stage2 DCN epoch {ep + 1}/{DCN_EPOCHS} done")


def dcn_scores(users_flat, items_flat):
    out = []
    for s in range(0, len(users_flat), 65536):
        u, i = users_flat[s:s + 65536], items_flat[s:s + 65536]
        out.append(np.asarray(t_rank.apply(
            {"user_id": u, "item_id": i, "mf_score": mf_feat(u, i)})))
    return np.concatenate(out)


vpred = dcn_scores(ctr_valid["user_id"], ctr_valid["item_id"])
stage2_auc = auc_score(ctr_valid["click"], vpred)
stage2_ll = log_loss(ctr_valid["click"], 1.0 / (1.0 + np.exp(-vpred)))
log(f"stage2 DCN valid AUC {stage2_auc:.4f} logloss {stage2_ll:.4f}")


def score_lists(users, cand):
    B, K = cand.shape
    fu = np.repeat(users, K).astype(np.int32)
    fi = cand.reshape(-1).astype(np.int32)
    return dcn_scores(fu, fi).reshape(B, K)


dcn_test = score_lists(tu, test_cand)
dcn_valid = score_lists(vu, valid_cand)

# truncate to LIST by DCN order (the production cascade: ranker prunes
# retrieval candidates before the expensive listwise model)
def truncate(cand, scores, rel, k):
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return (np.take_along_axis(cand, order, axis=1),
            np.take_along_axis(scores, order, axis=1),
            np.take_along_axis(rel, order, axis=1))


tc, ts, tr = truncate(test_cand, dcn_test, rel_test, LIST)
vc, vs, vr = truncate(valid_cand, dcn_valid, rel_valid, LIST)

retrieval_order = evaluate_rerank(-np.arange(CAND)[None].repeat(len(tu), 0)
                                  .astype(float), rel_test, ks=[10, 20])
dcn_order = evaluate_rerank(dcn_test, rel_test, ks=[10, 20])
log(f"NDCG@10 test lists: retrieval-order {retrieval_order['NDCG@10']:.4f} "
    f"DCN-order {dcn_order['NDCG@10']:.4f}")


# --- stage 3: PRM listwise rerank ------------------------------------------
def prm_feats(users, cand, scores):
    """[user emb ‖ item emb ‖ mf score ‖ dcn score] per list position."""
    B, K = cand.shape
    fu = np.repeat(users, K)
    fi = cand.reshape(-1)
    return np.concatenate([
        np.repeat(user_embs[users][:, None, :], K, axis=1),
        item_embs[fi].reshape(B, K, -1),
        mf_feat(fu, fi).reshape(B, K, 1),
        scores[..., None]], axis=-1).astype(np.float32)


f_tr, l_tr = prm_feats(vu, vc, vs), vr.astype(np.float32)
f_te, l_te = prm_feats(tu, tc, ts), tr.astype(np.float32)
mask_tr = np.ones(l_tr.shape, bool)
prm = PRM(d_model=64, n_layers=2, n_heads=4, max_list_len=LIST)
pvars = prm.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)},
                 jnp.asarray(f_tr[:2]), jnp.asarray(mask_tr[:2]), train=True)
params = nn.meta.unbox(pvars["params"])
tx = optax.adam(1e-3)
opt = tx.init(params)
BATCH_L = 256


@jax.jit
def prm_step(params, opt, f, l, m, key):
    def loss_fn(p):
        s = prm.apply({"params": p}, f, m, train=True,
                      rngs={"dropout": key})
        return listwise_bce(s, l, m)
    loss, g = jax.value_and_grad(loss_fn)(params)
    up, opt2 = tx.update(g, opt, params)
    return optax.apply_updates(params, up), opt2, loss


key = jax.random.PRNGKey(3)
n_lists = len(f_tr)
for step in range(PRM_STEPS):
    key, k1, k2 = jax.random.split(key, 3)
    idx = np.asarray(jax.random.randint(k1, (BATCH_L,), 0, n_lists))
    params, opt, loss = prm_step(params, opt, jnp.asarray(f_tr[idx]),
                                 jnp.asarray(l_tr[idx]),
                                 jnp.asarray(mask_tr[idx]), k2)
    if (step + 1) % 100 == 0:
        log(f"stage3 PRM step {step + 1}/{PRM_STEPS} loss {float(loss):.4f}")

prm_scores = np.asarray(prm.apply(
    {"params": params}, jnp.asarray(f_te), jnp.ones(l_te.shape, bool),
    train=False))
dcn_order_l = evaluate_rerank(ts, tr, ks=[10, 20])
prm_order = evaluate_rerank(prm_scores, tr, ks=[10, 20])

print()
print("=" * 72)
print(f"CASCADE @ ML-1M scale  (U={num_users} I={num_items} "
      f"cand={CAND} list={LIST})")
print(f"stage1 two-tower : valid {stage1_valid}")
print(f"                   test  {stage1_test}  "
      f"cand-recall@{CAND} {cand_recall:.4f}")
print(f"stage2 DCN       : AUC {stage2_auc:.4f}  logloss {stage2_ll:.4f}")
print(f"test-list NDCG@10: retrieval {retrieval_order['NDCG@10']:.4f}  "
      f"DCN {dcn_order['NDCG@10']:.4f}")
print(f"stage3 PRM (len-{LIST} lists): DCN-order NDCG@10 "
      f"{dcn_order_l['NDCG@10']:.4f} MAP@10 {dcn_order_l['MAP@10']:.4f}")
print(f"                   PRM-order NDCG@10 {prm_order['NDCG@10']:.4f} "
      f"MAP@10 {prm_order['MAP@10']:.4f}")
print("=" * 72)
