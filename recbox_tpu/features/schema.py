"""Feature schema: typed specs for every input feature and the dataset-level map.

Functional equivalent of the reference schemas
(`recbox/matching/features.py:12-58` FeatureMap and
`recbox/ranking/features.py:25-127` columnar FeatureMap), redesigned as frozen
dataclasses so a FeatureMap can be closed over by jitted model functions as a
static (hashable) object.

Unlike the reference's "wide matrix + column_index" trick (a torch DataLoader
optimization), batches here are dicts of named arrays with static shapes —
the natural layout for XLA.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Mapping, Optional, Sequence, Tuple

CATEGORICAL = "categorical"
NUMERIC = "numeric"
SEQUENCE = "sequence"
META = "meta"

_VALID_TYPES = (CATEGORICAL, NUMERIC, SEQUENCE, META)


def auto_embedding_dim(vocab_size: int) -> int:
    """Heuristic width 6·⌈vocab^0.25⌉ (rechub `utils/data.py:85-97`),
    rounded up to a multiple of 8 so stacked fields stay sublane-aligned
    on TPU (the rechub rule yields widths like 6/12/18 that force padding
    in (B, F, D) interaction layers)."""
    import math
    dim = 6 * math.ceil(max(1, vocab_size) ** 0.25)
    return ((dim + 7) // 8) * 8


@dataclasses.dataclass(frozen=True)
class FeatureSpec:
    """Schema of one input feature.

    Attributes:
      name: column name in the raw data / key in the batch dict.
      type: one of 'categorical' | 'numeric' | 'sequence' | 'meta'.
        'meta' features (e.g. group ids for gAUC) pass through untouched.
      source: optional tower tag — 'user' / 'item' / 'context' — used by
        two-tower models to route features (reference: `source` field in
        `recbox/matching/features.py` specs).
      vocab_size: number of embedding rows incl. OOV (index 0) and PAD (last
        index) for categorical/sequence features.
      embedding_dim: width of the embedding (or of the numeric projection).
      max_len: padded length for sequence features.
      share_embedding: name of another feature whose table this feature reuses
        (reference: `embedding.py:44-55` share_embedding aliasing).
      padding_idx: row forced to zeros (PAD); None to disable.
      pretrain_path: optional npz with a pretrained (vocab_size, dim) matrix.
      freeze_emb: if True the (pretrained) table is excluded from training.
      pooling: for sequence features: 'mean' | 'sum' | 'concat' | 'none'
        ('none' keeps the (L, D) sequence, e.g. for attention layers).
    """

    name: str
    type: str = CATEGORICAL
    source: str = ""
    vocab_size: int = 0
    embedding_dim: int = 0
    max_len: int = 0
    share_embedding: Optional[str] = None
    padding_idx: Optional[int] = None
    pretrain_path: Optional[str] = None
    freeze_emb: bool = False
    pooling: str = "mean"
    # per-table mesh placement: None = the module default (row-shard over
    # the combined grid); False = replicate this table on every device —
    # the right call for SMALL/HOT tables where replicating the tiny grad
    # all-reduce is cheaper than the id/row exchange
    # (`parallel.placement.plan_table_placement` decides from a cost model)
    shard_table: Optional[bool] = None

    def __post_init__(self):
        if self.type not in _VALID_TYPES:
            raise ValueError(f"feature {self.name}: invalid type {self.type!r}")
        if self.type == SEQUENCE and self.max_len <= 0:
            raise ValueError(f"sequence feature {self.name} needs max_len > 0")

    @property
    def table_name(self) -> str:
        return self.share_embedding or self.name

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        # shard_table is TRI-state: False (replicate) is a meaningful
        # non-default that must survive JSON round-trips — only None is
        # its "unset" value
        return {k: v for k, v in d.items()
                if v not in (None, "", 0, False)
                or k in ("name", "type", "vocab_size", "embedding_dim")
                or (k == "shard_table" and v is not None)}


@dataclasses.dataclass(frozen=True)
class FeatureMap:
    """Dataset-level schema: an ordered tuple of FeatureSpecs plus task wiring.

    Mirrors the union of the matching FeatureMap (`query_index`/`corpus_index`,
    `num_items`) and the ranking FeatureMap (`labels`, `group_id`) from the
    reference, in one immutable object.
    """

    dataset_id: str
    features: Tuple[FeatureSpec, ...]
    labels: Tuple[str, ...] = ()
    # matching wiring: which meta column identifies the query (user) and which
    # identifies the corpus row (item id) — reference `features.py:21-23`.
    query_index: str = ""
    corpus_index: str = ""
    group_id: str = ""
    num_items: int = 0
    num_samples: int = 0

    def __post_init__(self):
        names = [f.name for f in self.features]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate feature names in {self.dataset_id}")

    # -- lookups ------------------------------------------------------------
    @property
    def feature_dict(self) -> Mapping[str, FeatureSpec]:
        return {f.name: f for f in self.features}

    def __getitem__(self, name: str) -> FeatureSpec:
        return self.feature_dict[name]

    def by_type(self, ftype: str) -> Tuple[FeatureSpec, ...]:
        return tuple(f for f in self.features if f.type == ftype)

    def by_source(self, source: str) -> Tuple[FeatureSpec, ...]:
        """Features routed to a tower; '' (unset) features go to every tower."""
        return tuple(
            f for f in self.features
            if f.source in (source, "") and f.type != META
        )

    @property
    def input_features(self) -> Tuple[FeatureSpec, ...]:
        return tuple(f for f in self.features if f.type != META)

    @property
    def num_fields(self) -> int:
        return len(self.input_features)

    def sum_emb_out_dim(self, source: Optional[str] = None) -> int:
        """Total embedded width (reference: `ranking/features.py` sum_emb_out_dim)."""
        feats = self.input_features if source is None else self.by_source(source)
        total = 0
        for f in feats:
            if f.type == SEQUENCE and f.pooling == "concat":
                total += f.embedding_dim * f.max_len
            else:
                total += f.embedding_dim
        return total

    # -- persistence --------------------------------------------------------
    def to_json(self) -> str:
        d = {
            "dataset_id": self.dataset_id,
            "features": [f.to_dict() for f in self.features],
            "labels": list(self.labels),
            "query_index": self.query_index,
            "corpus_index": self.corpus_index,
            "group_id": self.group_id,
            "num_items": self.num_items,
            "num_samples": self.num_samples,
        }
        return json.dumps(d, indent=2)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as fh:
            fh.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "FeatureMap":
        with open(path) as fh:
            d = json.load(fh)
        return cls.from_dict(d)

    @classmethod
    def from_dict(cls, d: dict) -> "FeatureMap":
        feats = tuple(FeatureSpec(**fd) for fd in d["features"])
        return cls(
            dataset_id=d["dataset_id"],
            features=feats,
            labels=tuple(d.get("labels", ())),
            query_index=d.get("query_index", ""),
            corpus_index=d.get("corpus_index", ""),
            group_id=d.get("group_id", ""),
            num_items=d.get("num_items", 0),
            num_samples=d.get("num_samples", 0),
        )

    def replace(self, **kw) -> "FeatureMap":
        return dataclasses.replace(self, **kw)
