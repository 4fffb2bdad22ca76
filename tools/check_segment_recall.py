"""Recall vs exact top-500 for the approx and segment-merge candidates."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N, D, K = 1_000_000, 128, 500
Q = 256

rng = np.random.default_rng(0)
items = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
queries = jnp.asarray(rng.normal(size=(Q, D)), jnp.float32)

from recbox_tpu.retrieval.index import chunked_topk

_, exact_i = chunked_topk(queries, items, K, chunk_size=65536)
exact_sets = [set(np.asarray(r).tolist()) for r in exact_i]


def recall(ids):
    ids = np.asarray(ids)
    return float(np.mean([len(set(r.tolist()) & e) / K
                          for r, e in zip(ids, exact_sets)]))


@jax.jit
def approx(q, it):
    s = jnp.dot(q.astype(jnp.bfloat16), it.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32)
    _, i = jax.lax.approx_max_k(s, K, recall_target=0.95)
    return i


@jax.jit
def segments(q, it):
    s = jnp.dot(q.astype(jnp.bfloat16), it.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32)
    seg = s.reshape(s.shape[0], 8, N // 8)
    cs, ci = jax.lax.approx_max_k(seg, 64, recall_target=0.95)
    ci = ci + (jnp.arange(8) * (N // 8))[None, :, None]
    cs = cs.reshape(s.shape[0], -1)
    ci = ci.reshape(s.shape[0], -1)
    ts, pos = jax.lax.top_k(cs, K)
    return jnp.take_along_axis(ci, pos, axis=1)


print("approx_500 recall:", recall(approx(queries, items)))
print("segments   recall:", recall(segments(queries, items)))
