"""Knowledge-graph data structures.

TPU-native equivalent of recbole's KG pipeline
(`third_party/recbole/data/dataset/kg_dataset.py`): the reference loads
`.kg` triple TSVs plus an item↔entity `.link` file, remaps ids, and builds
dynamic adjacency dicts. Here the graph is a frozen container of int arrays
plus *static-shape* derived structures:

  * fixed-size neighbor tables (n_entities, K) with uniform resampling —
    the KGCN/KGNNLS receptive field (`kgcn.py` construct_adj);
  * ripple sets (B, n_hops, n_memory) per user — RippleNet's memories
    (`ripplenet.py` _build_ripple_set), padded/resampled to n_memory;
  * the collaborative-KG edge list (user→item interactions injected as an
    extra relation) for KGAT/CFKG (`kgat.py` ckg_graph).

Everything downstream is gather/segment_sum over these arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["KnowledgeGraph", "build_neighbor_table", "build_ripple_sets",
           "collaborative_kg_edges"]

INTERACT_RELATION = 0  # reserved relation id for user→item edges in the CKG


@dataclasses.dataclass(frozen=True)
class KnowledgeGraph:
    """Frozen triple store: heads/relations/tails (E,), sizes.

    Entity ids 0..n_entities−1; items are entities 0..n_items−1 (identity
    link — apply the .link remap before construction, as recbole's
    `_merge_item2entity` does). Relation ids start at 1; 0 is reserved for
    the user→item 'interact' relation of the collaborative KG.
    """

    heads: np.ndarray
    relations: np.ndarray
    tails: np.ndarray
    n_entities: int
    n_relations: int           # incl. the reserved interact relation
    n_items: int

    def __post_init__(self):
        assert len(self.heads) == len(self.relations) == len(self.tails)
        if len(self.relations) and self.relations.min() < 1:
            raise ValueError("relation ids must start at 1 (0 = interact)")

    @property
    def n_triples(self) -> int:
        return len(self.heads)

    def with_inverse(self) -> "KnowledgeGraph":
        """Add inverse triples with shifted relation ids (recbole
        kg_reverse_r)."""
        inv_rel = self.relations + (self.n_relations - 1)
        return KnowledgeGraph(
            heads=np.concatenate([self.heads, self.tails]),
            relations=np.concatenate([self.relations, inv_rel]),
            tails=np.concatenate([self.tails, self.heads]),
            n_entities=self.n_entities,
            n_relations=2 * self.n_relations - 1,
            n_items=self.n_items)


def build_neighbor_table(kg: KnowledgeGraph, n_neighbors: int,
                         seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """(n_entities, K) entity + relation neighbor tables with uniform
    sampling (sampling WITH replacement only when deg < K; a plain subsample otherwise) —
    `kgcn.py:construct_adj`. Entities with no out-triples self-loop on the
    interact relation (contributes the entity's own embedding)."""
    rng = np.random.default_rng(seed)
    order = np.argsort(kg.heads, kind="stable")
    h, r, t = kg.heads[order], kg.relations[order], kg.tails[order]
    starts = np.searchsorted(h, np.arange(kg.n_entities), side="left")
    ends = np.searchsorted(h, np.arange(kg.n_entities), side="right")
    ent_tab = np.zeros((kg.n_entities, n_neighbors), np.int32)
    rel_tab = np.zeros((kg.n_entities, n_neighbors), np.int32)
    for e in range(kg.n_entities):
        deg = ends[e] - starts[e]
        if deg == 0:
            ent_tab[e] = e
            rel_tab[e] = INTERACT_RELATION
            continue
        idx = rng.choice(np.arange(starts[e], ends[e]), size=n_neighbors,
                         replace=deg < n_neighbors)
        ent_tab[e] = t[idx]
        rel_tab[e] = r[idx]
    return ent_tab, rel_tab


def build_ripple_sets(kg: KnowledgeGraph, user_items: Dict[int, list],
                      n_hops: int = 2, n_memory: int = 16,
                      seed: int = 0) -> Dict[str, np.ndarray]:
    """Per-user multi-hop ripple memories (`ripplenet.py` ripple sets):
    hop-0 seeds = the user's clicked items; hop-k triples have heads in the
    hop-(k−1) tail set. Returns (U, n_hops, n_memory) head/rel/tail arrays
    (resampled to fixed n_memory; users with empty hops repeat hop-0)."""
    rng = np.random.default_rng(seed)
    order = np.argsort(kg.heads, kind="stable")
    h_sorted = kg.heads[order]
    r_sorted = kg.relations[order]     # hoisted: re-sorting per user/hop
    t_sorted = kg.tails[order]         # copies the whole KG repeatedly
    starts = np.searchsorted(h_sorted, np.arange(kg.n_entities), "left")
    ends = np.searchsorted(h_sorted, np.arange(kg.n_entities), "right")

    users = sorted(user_items)
    U = len(users)
    heads = np.zeros((U, n_hops, n_memory), np.int32)
    rels = np.zeros((U, n_hops, n_memory), np.int32)
    tails = np.zeros((U, n_hops, n_memory), np.int32)
    for ui, u in enumerate(users):
        seeds = list(user_items[u])
        for hop in range(n_hops):
            cand = []
            for s in seeds:
                if s < kg.n_entities:
                    cand.extend(range(starts[s], ends[s]))
            if not cand:
                # reference fallback (`ripplenet.py:118-131`): an empty
                # hop>0 COPIES the previous hop's ripple set verbatim; an
                # empty hop 0 (user with no KG-reachable seeds) pads with
                # all-zero triples
                if hop > 0:
                    heads[ui, hop] = heads[ui, hop - 1]
                    rels[ui, hop] = rels[ui, hop - 1]
                    tails[ui, hop] = tails[ui, hop - 1]
                    seeds = list(tails[ui, hop])
                else:
                    heads[ui, hop] = 0
                    rels[ui, hop] = 0
                    tails[ui, hop] = 0
                    seeds = [0]
                continue
            cand = np.asarray(cand)
            pick = rng.choice(cand, size=n_memory,
                              replace=len(cand) < n_memory)
            heads[ui, hop] = h_sorted[pick]
            rels[ui, hop] = r_sorted[pick]
            tails[ui, hop] = t_sorted[pick]
            seeds = list(tails[ui, hop])
    return {"users": np.asarray(users, np.int32),
            "heads": heads, "relations": rels, "tails": tails}


def collaborative_kg_edges(kg: KnowledgeGraph, user_ids, item_ids,
                           num_users: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """KGAT's collaborative KG (`kgat.py` ckg_graph): entities keep their
    ids, users are offset by n_entities; user→item edges get the reserved
    interact relation. Returns (heads, relations, tails) including inverse
    interact edges so propagation reaches users."""
    u = np.asarray(user_ids)
    if num_users and len(u) and int(u.max()) >= num_users:
        raise ValueError(
            f"user id {int(u.max())} >= num_users={num_users}: KGAT sizes "
            "its node table as n_entities + num_users, and out-of-range "
            "gathers clamp SILENTLY on TPU")
    u = u + kg.n_entities
    i = np.asarray(item_ids)
    heads = np.concatenate([kg.heads, u, i])
    rels = np.concatenate([kg.relations,
                           np.full(len(u), INTERACT_RELATION, np.int64),
                           np.full(len(u), INTERACT_RELATION, np.int64)])
    tails = np.concatenate([kg.tails, i, u])
    return heads.astype(np.int32), rels.astype(np.int32), tails.astype(np.int32)
