"""RetrievalService end-to-end query profiling (the serving wrapper's own
overhead on top of the index engines: tower encode, vectorized seen-item
exclusion, multi-interest merge).

Run on TPU: python tools/prof_service_query.py
Wall-clock per query() call INCLUDES the axon tunnel's ~40 ms dispatch
latency — the numbers below are end-to-end serving latency from the host's
point of view, not device-only time (see bench.py's measurement note).

Measured (v5e via tunnel, 1M x 128 corpus, Q=8192, k=100, round 2):
  approx     plain 657 ms/call = 12.5k qps   exclude(50/row) 1184 ms = 6.9k
  segmented  plain 416 ms/call = 19.7k qps   exclude(50/row)  750 ms = 10.9k
  approx     multi-interest K_int=4: 2060 ms/call = 4.0k qps
The device-only engines run 300-460k qps (`tools/prof_retrieval_topk.py`);
the gap is host-side batch marshalling + per-call dispatch through the
tunnel — amortized away in production by batching more queries per call.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

N_ITEMS, DIM, Q, K = 1_000_000, 128, 8192, 100


def timeit(fn, warmup=2, reps=5):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.matching.two_tower import MF
    from recbox_tpu.retrieval import RetrievalService

    rng = np.random.default_rng(0)
    fm = FeatureMap(
        "svcprof", (FeatureSpec("user_id", "categorical", source="user",
                                vocab_size=Q, embedding_dim=DIM),
                    FeatureSpec("item_id", "categorical", source="item",
                                vocab_size=N_ITEMS, embedding_dim=DIM)),
        query_index="user_id", corpus_index="item_id", num_items=N_ITEMS)
    model = MF(feature_map=fm, embedding_dim=DIM)
    vu = model.init(jax.random.PRNGKey(0),
                    {"user_id": np.arange(2, dtype=np.int32)},
                    method=model.encode_user)
    vi = model.init(jax.random.PRNGKey(1),
                    {"item_id": np.arange(2, dtype=np.int32)},
                    method=model.encode_item)
    variables = {"params": {**vu["params"], **vi["params"]}}
    corpus = {"item_id": np.arange(N_ITEMS, dtype=np.int32)}

    for method in ("approx", "segmented"):
        svc = RetrievalService(model, variables, corpus, method=method)
        users = {"user_id": rng.integers(0, Q, Q).astype(np.int32)}

        t = timeit(lambda: svc.query(users, k=K))
        print(f"[{method}] plain k={K}: {t*1e3:8.1f} ms/call "
              f"= {Q/t:9.0f} qps")

        excl = [rng.integers(0, N_ITEMS, 50).tolist() for _ in range(Q)]
        t = timeit(lambda: svc.query(users, k=K, exclude=excl), warmup=1,
                   reps=3)
        print(f"[{method}] exclude(50/row): {t*1e3:8.1f} ms/call "
              f"= {Q/t:9.0f} qps")

    # multi-interest merge cost: (B, K_int, D) via MIND towers
    from recbox_tpu.models.matching.multi_interest import MIND
    L = 20
    fm_mi = FeatureMap(
        "svcmi", (FeatureSpec("item_seq", "sequence", source="user",
                              vocab_size=N_ITEMS, embedding_dim=DIM,
                              max_len=L, share_embedding="item_id"),
                  FeatureSpec("item_id", "categorical", source="item",
                              vocab_size=N_ITEMS, embedding_dim=DIM)),
        query_index="item_seq", corpus_index="item_id", num_items=N_ITEMS)
    mi = MIND(feature_map=fm_mi, embedding_dim=DIM, interest_num=4,
              max_seq_len=L)
    hist = rng.integers(1, N_ITEMS, (Q, L)).astype(np.int32)
    vars_mi = mi.init(jax.random.PRNGKey(0), {"item_seq": hist[:2]},
                      method=mi.encode_user)
    svc = RetrievalService(mi, vars_mi, corpus, method="approx")
    t = timeit(lambda: svc.query({"item_seq": hist}, k=K), warmup=1, reps=3)
    print(f"[approx] multi-interest K_int=4 k={K}: {t*1e3:8.1f} ms/call "
          f"= {Q/t:9.0f} qps")


if __name__ == "__main__":
    main()
