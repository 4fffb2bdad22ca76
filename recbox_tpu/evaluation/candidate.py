"""Candidate-set (sampled-negative) retrieval evaluation — "uni100"/"pop100".

The recbole protocol this mirrors (`third_party/recbole/data/dataloader/
general_dataloader.py:74-183` NegSampleEvalDataLoader + `sampler/sampler.py:
147-192` sample_by_user_ids): instead of ranking every catalog item
(full-sort), each evaluated user's positives are ranked against
``num_negs`` negatives sampled per positive — uniformly ("uni100") or by
popularity ("pop100") — with the user's interacted items (train ∪ eval
positives) excluded via bounded re-draw, exactly the reference's used-ids
re-draw loop.

TPU-native shape discipline: users' positive lists are padded to the batch
max P, candidates are one static (U, P·(1+num_negs)) id matrix with an
accompanying validity mask (padded slots score −inf and use an
out-of-catalog id so they can never hit), and scoring is ONE gathered
einsum per user chunk — no per-user Python, no ragged structures. Metric
formulas are shared with the full-sort engine (`evaluation/retrieval.py`
`_metrics_chunk`), so a protocol switch changes ONLY the candidate set.
"""

from __future__ import annotations

import functools
import re
from typing import Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recbox_tpu.evaluation.retrieval import (
    NEG_INF, _metrics_chunk, _pad_lists, parse_metric,
)

__all__ = ["parse_protocol", "sample_eval_candidates", "candidate_topk",
           "evaluate_candidate_retrieval"]

_PROTO_RE = re.compile(r"^(uni|pop)(\d+)$")


def parse_protocol(protocol: str) -> Tuple[str, int]:
    """'uni100' -> ('uniform', 100); 'pop50' -> ('popularity', 50).

    The spelling matches recbole's eval_args mode strings
    (`config/configurator.py` eval mode validation)."""
    m = _PROTO_RE.match(protocol)
    if not m:
        raise NotImplementedError(
            f"eval protocol {protocol!r}; expected 'full', 'uniN' or 'popN'")
    return ("uniform" if m.group(1) == "uni" else "popularity",
            int(m.group(2)))


def sample_eval_candidates(
    query_indices: Sequence[int],
    train_user2items: Mapping[int, Sequence[int]],
    valid_user2items: Mapping[int, Sequence[int]],
    num_items: int,
    num_negs: int,
    distribution: str = "uniform",
    item_counts: Optional[np.ndarray] = None,
    seed: int = 2024,
    max_attempts: int = 50,
    exclude_items: Sequence[int] = (),
    user_chunk: Optional[int] = None,
):
    """Build the static candidate matrix for every evaluated user.

    Returns (cand_ids (U, C) int32, cand_valid (U, C) bool, true_padded
    (U, P) int32 with -1 padding) where C = P·(1+num_negs) and P is the max
    positive count. Row layout per user: [P positive slots | P·num_negs
    negative slots]. Negatives exclude the user's train AND eval positives
    by bounded re-draw (`sampler.py:147-192` semantics: after
    ``max_attempts`` rounds any still-colliding draw is kept, matching the
    reference's give-up behavior on ultra-dense users).

    ``exclude_items`` are catalog rows that are not real items (e.g. the
    PAD/OOV row 0 of a tokenizer-layout corpus): they are never drawn as
    negatives — recbole's NegSampleEvalDataLoader samples real tokens only.
    Duplicate positives inside a user's valid list are collapsed (lists
    are sets per user in the reference).
    """
    rng = np.random.default_rng(seed)
    query_indices = np.asarray(query_indices)
    U = len(query_indices)
    true_lists = [list(dict.fromkeys(valid_user2items.get(int(q), ())))
                  for q in query_indices]
    P = max((len(l) for l in true_lists), default=1) or 1
    true_padded = _pad_lists(true_lists, pad=-1)                # (U, P)
    n_neg = P * num_negs

    if distribution == "popularity":
        if item_counts is None:
            raise ValueError("popularity protocol needs item_counts")
        from recbox_tpu.data.sampling import AliasTable
        probs = np.asarray(item_counts, dtype=np.float64)
        probs = np.where(probs > 0, probs, 0.0)
        if probs.sum() == 0:
            probs = np.ones(num_items)
        alias = AliasTable(probs)
        draw = lambda size: alias.sample(size, rng).astype(np.int64)
    elif distribution == "uniform":
        draw = lambda size: rng.integers(0, num_items, size=size)
    else:
        raise NotImplementedError(f"distribution={distribution}")

    # used-id exclusion via membership bitmap, vectorized across users but
    # CHUNKED on the user axis: a dense (U, num_items) bitmap is O(users x
    # catalog) — hundreds of GB at production scale (100k+ users x millions
    # of items), where this sampled protocol exists precisely to be cheap.
    # Chunk rows so the bitmap stays <= ~256 MB; per-chunk cost then scales
    # with interactions, not users x catalog.
    excl = np.array([it for it in exclude_items if 0 <= it < num_items],
                    dtype=np.int64)
    chunk = user_chunk or max(1, min(U, (1 << 28) // (num_items + 1)))
    negs = np.empty((U, n_neg), dtype=np.int64)
    for c0 in range(0, U, chunk):
        c1 = min(c0 + chunk, U)
        uc = c1 - c0
        used = np.zeros((uc, num_items + 1), dtype=bool)
        if excl.size:
            used[:, excl] = True
        for i in range(c0, c1):
            q = int(query_indices[i])
            for it in train_user2items.get(q, ()):
                if 0 <= it < num_items:
                    used[i - c0, it] = True
            for it in true_lists[i]:
                used[i - c0, it] = True
        neg_c = draw((uc, n_neg))
        rows = np.arange(uc)[:, None]
        for _ in range(max_attempts):
            bad = used[rows, neg_c]
            n_bad = int(bad.sum())
            if n_bad == 0:
                break
            neg_c[bad] = draw(n_bad)
        negs[c0:c1] = neg_c

    pos_part = np.where(true_padded >= 0, true_padded, num_items)
    cand_ids = np.concatenate([pos_part, negs], axis=1).astype(np.int32)
    # reference parity: each user gets len_u * num_negs negatives (one
    # block of num_negs PER POSITIVE, `general_dataloader.py:110-126`) —
    # NOT P_max * num_negs; padded positives' negative blocks are masked
    n_pos = (true_padded >= 0).sum(axis=1, keepdims=True)      # (U, 1)
    neg_valid = np.arange(n_neg)[None, :] < n_pos * num_negs   # (U, n_neg)
    cand_valid = np.concatenate([true_padded >= 0, neg_valid], axis=1)
    # duplicate positives cannot occur: true_lists are deduped above (the
    # reference keeps per-user sets); padded slots carry id=num_items
    # (out of catalog) so they can never match a true item
    return cand_ids, cand_valid, true_padded


@functools.partial(jax.jit, static_argnames=("max_topk",))
def candidate_topk(user_embs, item_embs, cand_ids, cand_valid,
                   max_topk: int):
    """Top-k item ids among each user's candidate list.

    user_embs (U, D) or multi-interest (U, K, D) — scored like the
    full-sort engine (max over interests); invalid slots score −inf."""
    cand_embs = jnp.take(item_embs, jnp.minimum(cand_ids,
                                                item_embs.shape[0] - 1),
                         axis=0)                       # (U, C, D)
    if user_embs.ndim == 3:
        scores = jnp.einsum("ukd,ucd->ukc", user_embs, cand_embs).max(axis=1)
    else:
        scores = jnp.einsum("ud,ucd->uc", user_embs, cand_embs)
    scores = jnp.where(cand_valid, scores, NEG_INF)
    k = min(max_topk, cand_ids.shape[1])
    _, pos = jax.lax.top_k(scores, k)
    return jnp.take_along_axis(cand_ids, pos, axis=1)


def evaluate_candidate_retrieval(
    user_embs: np.ndarray,
    item_embs: np.ndarray,
    cand_ids: np.ndarray,
    cand_valid: np.ndarray,
    true_padded: np.ndarray,
    metrics: Sequence[str],
    chunk_size: int = 1024,
) -> Dict[str, float]:
    """Metrics over sampled candidate lists (the uni100/pop100 protocol)."""
    parsed = tuple(parse_metric(m) for m in metrics)
    max_topk = max(k for _, k in parsed)
    num_users = len(user_embs)
    item_embs = jnp.asarray(item_embs)
    sums = {f"{n}(k={k})": 0.0 for n, k in parsed}
    topk_fn = candidate_topk      # module-level jit: trace cache persists
    for start in range(0, num_users, chunk_size):
        end = min(start + chunk_size, num_users)
        cu = np.asarray(user_embs[start:end])
        ci = cand_ids[start:end]
        cm = cand_valid[start:end]
        cv = true_padded[start:end]
        pad_rows = chunk_size - (end - start)
        if pad_rows:
            cu = np.pad(cu, ((0, pad_rows),) + ((0, 0),) * (cu.ndim - 1))
            ci = np.pad(ci, ((0, pad_rows), (0, 0)),
                        constant_values=item_embs.shape[0])
            cm = np.pad(cm, ((0, pad_rows), (0, 0)))
            cv = np.pad(cv, ((0, pad_rows), (0, 0)), constant_values=-1)
        topk = topk_fn(jnp.asarray(cu), item_embs, jnp.asarray(ci),
                       jnp.asarray(cm), max_topk=max_topk)
        vals = _metrics_chunk(topk, jnp.asarray(cv), parsed)
        n_real = end - start
        for key, v in vals.items():
            sums[key] += float(jnp.sum(v[:n_real]))
    return {m: sums[f"{n}(k={k})"] / num_users
            for m, (n, k) in zip(metrics, parsed)}
