"""Per-metric evaluator-equivalence harness: our engines vs recbole's.

VERDICT round-4 missing #1: whole-model head-to-heads confound training
parity with evaluation parity. This harness removes the confound — it
feeds IDENTICAL score matrices / top-k id lists / labels to

  * the vendored reference evaluator, executed in place from
    /root/reference with stubbed optional deps
    (`third_party/recbole/evaluator/collector.py:96-185` Collector incl.
    the tie-handled average rank, `evaluator/evaluator.py:16-40`,
    `evaluator/metrics.py:39-766` — all 16 metric classes), and
  * recbox_tpu.evaluation.{retrieval,ctr,beyond_accuracy} + std_gauc,

then asserts equality (<=1e-8, above recbole's metric_decimal_place=10
rounding) or a NAMED divergence for every metric class.

Named divergences (by design, documented at the definitions):
  * MRR/MAP keep the first-party recbox semantics
    (`recbox/core/metrics.py` ARHR-style / hits-normalized); recbole's
    first-hit MRR and min(|R|,k)-normalized MAP are `StdMRR`/`StdMAP` —
    the comparison is recbole MRR<->StdMRR, MAP<->StdMAP.
  * recbole `Hit` is our `HitRate` (name only).
  * LogLoss clip eps: ours 1e-7 default vs recbole 1e-15 — differs only
    for predictions within 1e-7 of {0,1}; harness passes eps=1e-15.
  * recbole GAUC's user_len comes from `desc_scores.argmin` and assumes
    >=1 -inf entry per row (the PAD-column convention its full-sort
    protocol guarantees); `std_gauc` masks by finiteness directly.

The pytest wrapper is tests/test_evaluator_equivalence.py; the results
table lives in docs/QUALITY_PARITY.md.

Run: cd /root/repo && env PYTHONPATH= JAX_PLATFORMS=cpu \
         python tools/parity_eval_metrics.py
Exit status: number of non-matching, non-explained metrics.
"""

import sys
from collections import Counter

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

TOL = 1e-8


def _config(metrics, topk=(5, 10)):
    """Plain dict standing in for recbole's Config: the evaluator stack
    only reads keys via __getitem__ (verified: collector.py:71-76,
    base_metric.py:30-57, metrics.py TailPercentage/GAUC ctors)."""
    return {
        "metrics": list(metrics), "topk": list(topk), "device": "cpu",
        "eval_args": {"mode": "full"}, "metric_decimal_place": 10,
        "LABEL_FIELD": "label", "tail_ratio": 0.1,
    }


def _make_ranking_scenario(seed=0, users=96, items=200):
    """Score matrix with the full-sort protocol's structure: a -inf PAD
    column 0, per-user -inf history masks, deliberate score TIES (to
    exercise the collector's average-rank path), one all-positive user
    and realistic positive sets."""
    rng = np.random.default_rng(seed)
    scores = rng.normal(size=(users, items)).astype(np.float64)
    # ties: quantize half the matrix coarsely
    scores[:, items // 2:] = np.round(scores[:, items // 2:], 1)
    scores[:, 0] = -np.inf                     # PAD column (recbole conv.)
    pos = np.zeros((users, items), dtype=np.int64)
    for u in range(users):
        hist = rng.choice(np.arange(1, items), size=rng.integers(5, 30),
                          replace=False)
        scores[u, hist] = -np.inf              # train-clicked mask
        finite = np.flatnonzero(np.isfinite(scores[u]))
        if u == 0:
            pos[u, finite] = 1                 # degenerate: no negatives
        else:
            chosen = rng.choice(finite, size=rng.integers(1, 7),
                                replace=False)
            pos[u, chosen] = 1
    item_counts = rng.integers(0, 50, size=items)
    item_counts[0] = 0
    return scores, pos, item_counts


def run_ranking_rows(topk=(5, 10)):
    """Rows for the 6 top-k classes + GAUC + the 5 beyond-accuracy
    classes (12 of 16)."""
    from reference_stubs import install_reference
    install_reference()
    import torch
    from recbole.evaluator.collector import Collector
    from recbole.evaluator.evaluator import Evaluator

    from recbox_tpu.evaluation import (evaluate_beyond_accuracy,
                                       retrieval_metrics_from_topk,
                                       std_gauc)

    scores, pos, item_counts = _make_ranking_scenario()
    users, items = scores.shape
    metrics = ["Hit", "MRR", "MAP", "Recall", "NDCG", "Precision", "GAUC",
               "ItemCoverage", "AveragePopularity", "ShannonEntropy",
               "GiniIndex", "TailPercentage"]
    cfg = _config(metrics, topk)

    # ---- reference side: Collector + Evaluator on the raw matrices ----
    coll = Collector(cfg)
    pu, pi = np.nonzero(pos)
    coll.eval_batch_collect(torch.tensor(scores), None,
                            torch.tensor(pu), torch.tensor(pi))
    coll.data_struct.set("data.num_items", items)
    coll.data_struct.set("data.count_items",
                         Counter({i: int(c) for i, c in
                                  enumerate(item_counts) if c > 0}))
    ref = Evaluator(cfg).evaluate(coll.get_data_struct())

    # ---- our side: identical top-k ids (torch.topk, the same op the ---
    # reference collector used) + the same matrices
    kmax = max(topk)
    topk_ids = torch.topk(torch.tensor(scores), kmax, dim=-1)[1].numpy()
    true_lists = [np.flatnonzero(pos[u]).tolist() for u in range(users)]
    width = max(len(t) for t in true_lists)
    true_padded = np.full((users, width), -1, np.int64)
    for u, t in enumerate(true_lists):
        true_padded[u, :len(t)] = t

    name_map = {"Hit": "HitRate", "MRR": "StdMRR", "MAP": "StdMAP",
                "Recall": "Recall", "NDCG": "NDCG",
                "Precision": "Precision"}
    ours_topk = retrieval_metrics_from_topk(
        topk_ids, true_padded,
        [f"{name_map[m]}(k={k})" for m in name_map for k in topk])

    rows = []
    for m, ours_name in name_map.items():
        note = {"Hit": "name: ours HitRate",
                "MRR": "recbole first-hit MRR == our StdMRR "
                       "(first-party MRR is ARHR-style, by design)",
                "MAP": "recbole MAP == our StdMAP (first-party MAP "
                       "normalizes by hits retrieved, by design)"}.get(
                    m, "")
        for k in topk:
            rows.append((f"{m}@{k}", ref[f"{m.lower()}@{k}"],
                         ours_topk[f"{ours_name}(k={k})"], note))

    rows.append(("GAUC", ref["gauc"], std_gauc(scores, pos),
                 "degenerate users excluded, pos-count weighting, "
                 "tie-averaged ranks"))

    for k in topk:
        ours_ba = evaluate_beyond_accuracy(
            topk_ids[:, :k], items, item_counts=item_counts,
            metrics=["ItemCoverage", "AveragePopularity", "ShannonEntropy",
                     "GiniIndex", "TailPercentage"], tail_ratio=0.1)
        for m in ours_ba:
            rows.append((f"{m}@{k}", ref[f"{m.lower()}@{k}"], ours_ba[m],
                         ""))
    return rows


def run_value_rows():
    """Rows for the 4 value classes: AUC, MAE, RMSE, LogLoss."""
    from reference_stubs import install_reference
    install_reference()
    import torch
    from recbole.evaluator.collector import Collector
    from recbole.evaluator.evaluator import Evaluator

    from recbox_tpu.evaluation import auc_score, log_loss

    rng = np.random.default_rng(7)
    n = 4000
    preds = rng.uniform(0.001, 0.999, size=n)
    preds[: n // 4] = np.round(preds[: n // 4], 2)       # prediction ties
    labels = (rng.random(n) < 0.3).astype(np.float64)
    cfg = _config(["AUC", "MAE", "RMSE", "LogLoss"], topk=(5,))
    coll = Collector(cfg)
    coll.eval_collect(torch.tensor(preds), torch.tensor(labels))
    ref = Evaluator(cfg).evaluate(coll.get_data_struct())
    return [
        ("AUC", ref["auc"], auc_score(labels, preds),
         "ours: tie-averaged Mann-Whitney == sklearn trapezoid ROC"),
        ("MAE", ref["mae"], float(np.mean(np.abs(preds - labels))), ""),
        ("RMSE", ref["rmse"],
         float(np.sqrt(np.mean((preds - labels) ** 2))), ""),
        ("LogLoss", ref["logloss"], log_loss(labels, preds, eps=1e-15),
         "clip eps: ours defaults 1e-7, recbole 1e-15 — identical for "
         "preds in [1e-7, 1-1e-7]"),
    ]


def main():
    rows = run_ranking_rows() + run_value_rows()
    bad = 0
    print(f"{'metric':24s} {'reference':>14s} {'ours':>14s}  match  note")
    for name, ref_v, our_v, note in rows:
        ok = abs(float(ref_v) - float(our_v)) <= TOL
        bad += not ok
        print(f"{name:24s} {float(ref_v):14.10f} {float(our_v):14.10f}  "
              f"{'OK' if ok else 'MISMATCH':5s}  {note}")
    n_classes = 16
    print(f"\n{len(rows)} comparisons over {n_classes} reference metric "
          f"classes; {bad} mismatches")
    return bad


if __name__ == "__main__":
    sys.exit(main())
