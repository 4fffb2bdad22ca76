import numpy as np
rng = np.random.default_rng(11)
num_users, num_items, seq_len = 400, 200, 30
succ = rng.permutation(num_items)   # deterministic successor map
rows = []
for u in range(num_users):
    it = rng.integers(0, num_items)
    for t in range(seq_len):
        rows.append((u, it, 1, t))
        it = succ[it] if rng.random() < 0.85 else rng.integers(0, num_items)
import os
os.makedirs("/tmp/parity/synthseq", exist_ok=True)
with open("/tmp/parity/synthseq/synthseq.inter", "w") as fh:
    fh.write("user_id:token\titem_id:token\trating:float\ttimestamp:float\n")
    for u, i, r, t in rows:
        fh.write(f"{u}\t{i}\t{r}\t{t}\n")
print(len(rows))
