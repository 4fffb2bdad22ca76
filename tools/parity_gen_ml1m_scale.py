"""ML-1M-SCALE synthetic dataset for production-scale parity runs.

Matches MovieLens-1M's shape statistics (6040 users, 3706 items, ~1M
interactions, Zipf-ish item popularity, heavy-tailed per-user activity)
with planted block structure so both frameworks have real signal to learn
— the offline stand-in for the egress-blocked BASELINE.md ML-1M row
(VERDICT round-1 weak-point 5: parity evidence was 301-user-toy only).
Writes /tmp/parity/ml1m_scale/ml1m_scale.inter.
"""
import os

import numpy as np

rng = np.random.default_rng(7)
NUM_USERS, NUM_ITEMS, N_BLOCKS = 6040, 3706, 24
ub = rng.integers(0, N_BLOCKS, NUM_USERS)
ib = np.arange(NUM_ITEMS) % N_BLOCKS
# popularity: Zipf within each block (ml-1m's item counts are ~Zipf 1.0)
pop = 1.0 / (1.0 + np.argsort(np.argsort(rng.random(NUM_ITEMS))))
rows = []
for u in range(NUM_USERS):
    # heavy-tailed activity: lognormal, clipped to ml-1m's [20, 2000]
    k = int(np.clip(rng.lognormal(4.6, 0.8), 20, 2000))
    block_items = np.flatnonzero(ib == ub[u])
    p = pop[block_items] / pop[block_items].sum()
    n_block = min(int(k * 0.85), len(block_items))
    chosen = rng.choice(block_items, size=n_block, replace=False, p=p)
    others = np.flatnonzero(ib != ub[u])
    po = pop[others] / pop[others].sum()
    noise = rng.choice(others, size=max(1, k - n_block), replace=False, p=po)
    for t, it in enumerate(list(chosen) + list(noise)):
        rows.append((u, it, 1, t))
rng.shuffle(rows)
os.makedirs("/tmp/parity/ml1m_scale", exist_ok=True)
with open("/tmp/parity/ml1m_scale/ml1m_scale.inter", "w") as fh:
    fh.write("user_id:token\titem_id:token\trating:float\ttimestamp:float\n")
    for u, i, r, t in rows:
        fh.write(f"{u}\t{i}\t{r}\t{t}\n")
print(len(rows), "interactions,", NUM_USERS, "users,", NUM_ITEMS, "items")
