from recbox_tpu.data.loader import ArrayLoader, MatchingLoader, MASK_KEY
from recbox_tpu.data.shards import ShardLoader, load_shards, save_shards
from recbox_tpu.data.sampling import (
    AliasTable, sample_negatives, popularity_distribution,
)

__all__ = [
    "ArrayLoader", "MatchingLoader", "MASK_KEY", "AliasTable",
    "ShardLoader", "save_shards", "load_shards",
    "sample_negatives", "popularity_distribution",
]
