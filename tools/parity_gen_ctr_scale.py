"""Criteo-sample-SCALE synthetic CTR dataset (1M rows, multi-field).

The Criteo-sample BASELINE row needs egress; this stand-in matches its
scale regime: 1M impressions, 8 categorical fields of mixed cardinality
with planted pairwise interactions plus per-field main effects. Writes
/tmp/parity/ctr_scale/ctr_scale.inter for both frameworks.
"""
import os

import numpy as np

rng = np.random.default_rng(11)
N = 1_000_000
CARDS = [5000, 2000, 500, 100, 50, 20, 10, 5]
cols = [rng.integers(0, c, N) for c in CARDS]
# main effects + two planted interactions
w = [rng.normal(0, 0.6, c) for c in CARDS]
logit = sum(wc[col] for wc, col in zip(w, cols)) - 0.8
logit += np.where((cols[3] % 2) == (cols[4] % 2), 1.0, -1.0)
logit += np.where((cols[5] + cols[6]) % 3 == 0, 0.7, 0.0)
y = (rng.random(N) < 1 / (1 + np.exp(-logit))).astype(int)
os.makedirs("/tmp/parity/ctr_scale", exist_ok=True)
names = ["user_id", "item_id"] + [f"c{i}" for i in range(2, len(CARDS))]
with open("/tmp/parity/ctr_scale/ctr_scale.inter", "w") as fh:
    fh.write("\t".join(f"{n}:token" for n in names) + "\tlabel:float\n")
    for k in range(N):
        fh.write("\t".join(str(col[k]) for col in cols) + f"\t{y[k]}\n")
print(N, "rows, pos rate", y.mean())
