"""Grouped-metric engines at production eval scale: device vs host loop.

VERDICT round-1 weak-point 6: the host Python group loop
(`evaluation/ctr.py` `_grouped_rank_metric`) is quadratically painful at
production eval scale. This measures both engines at 1M rows / 100k groups
(gAUC + MRR + NDCG@10, the DIN/MIND eval set) and prints the speedup; the
acceptance bar is >= 10x.

Run: cd /root/repo && python tools/prof_grouped_metrics.py
(works on CPU too: JAX_PLATFORM_NAME=cpu)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N, GROUPS = 1_000_000, 100_000


def main():
    from recbox_tpu.evaluation.ctr import (
        _grouped_rank_metric, _mrr, _ndcg, grouped_auc,
    )
    from recbox_tpu.evaluation.grouped import grouped_metrics_device

    rng = np.random.default_rng(0)
    y = (rng.random(N) > 0.7).astype(np.float32)
    p = rng.random(N).astype(np.float32)
    g = rng.integers(0, GROUPS, N).astype(np.int32)

    # device engine: compile+warmup, then best-of-3 with per-rep
    # perturbed predictions (identical execute requests can be served
    # from the tunnel cache — bench.py measurement note)
    dev = grouped_metrics_device(y, p, g, ["gAUC", "MRR"], ndcg_ks=(10,))
    t_dev = float("inf")
    for rep in range(1, 4):
        pv = p * (1.0 + 1e-9 * rep)
        t0 = time.perf_counter()
        dev = grouped_metrics_device(y, pv, g, ["gAUC", "MRR"], ndcg_ks=(10,))
        t_dev = min(t_dev, time.perf_counter() - t0)

    t0 = time.perf_counter()
    host = {
        "gAUC": grouped_auc(y, p, g, weighted=True),
        "MRR": _grouped_rank_metric(y, p, g, _mrr),
        "NDCG@10": _grouped_rank_metric(y, p, g,
                                        lambda t, q: _ndcg(t, q, 10)),
    }
    t_host = time.perf_counter() - t0

    for k in ("gAUC", "MRR", "NDCG@10"):
        assert abs(dev[k] - host[k]) < 1e-4, (k, dev[k], host[k])
    print(f"rows={N:,} groups={GROUPS:,}")
    print(f"host loop engine : {t_host:8.2f} s")
    print(f"device engine    : {t_dev:8.3f} s")
    print(f"speedup          : {t_host / t_dev:8.1f}x "
          f"({'PASS' if t_host / t_dev >= 10 else 'FAIL'} >=10x bar)")


if __name__ == "__main__":
    main()
