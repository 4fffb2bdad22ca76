from recbox_tpu.data.loader import ArrayLoader, MatchingLoader, MASK_KEY
from recbox_tpu.data.sampling import (
    AliasTable, sample_negatives, popularity_distribution,
)

__all__ = [
    "ArrayLoader", "MatchingLoader", "MASK_KEY", "AliasTable",
    "sample_negatives", "popularity_distribution",
]
