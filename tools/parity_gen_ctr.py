import numpy as np
rng = np.random.default_rng(5)
num_users, num_items, n = 200, 300, 20000
ub = rng.integers(0, 4, num_users)
ib = np.arange(num_items) % 4
u = rng.integers(0, num_users, n)
i = rng.integers(0, num_items, n)
logit = np.where(ub[u] == ib[i], 1.5, -1.5)
y = (rng.random(n) < 1/(1+np.exp(-logit))).astype(int)
import os
os.makedirs("/tmp/parity/synthctr", exist_ok=True)
with open("/tmp/parity/synthctr/synthctr.inter", "w") as fh:
    fh.write("user_id:token\titem_id:token\tlabel:float\n")
    for k in range(n):
        fh.write(f"{u[k]}\t{i[k]}\t{y[k]}\n")
print("pos rate", y.mean())
