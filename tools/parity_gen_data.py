import numpy as np
rng = np.random.default_rng(7)
num_users, num_items, n_blocks = 300, 400, 8
ub = rng.integers(0, n_blocks, num_users)
ib = np.arange(num_items) % n_blocks
rows = []
for u in range(num_users):
    block_items = np.flatnonzero(ib == ub[u])
    k = rng.integers(15, 30)
    chosen = rng.choice(block_items, size=min(k, len(block_items)), replace=False)
    # a bit of cross-block noise
    noise = rng.choice(np.flatnonzero(ib != ub[u]), size=3, replace=False)
    for t, it in enumerate(list(chosen) + list(noise)):
        rows.append((u, it, 1, t))
rng.shuffle(rows)
import os
os.makedirs("/tmp/parity/synth", exist_ok=True)
with open("/tmp/parity/synth/synth.inter", "w") as fh:
    fh.write("user_id:token\titem_id:token\trating:float\ttimestamp:float\n")
    for u, i, r, t in rows:
        fh.write(f"{u}\t{i}\t{r}\t{t}\n")
print(len(rows), "interactions")
