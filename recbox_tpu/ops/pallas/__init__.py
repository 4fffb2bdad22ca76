from recbox_tpu.ops.pallas.embedding_gather import (
    seq_embedding_pool, seq_embedding_pool_xla,
)

__all__ = ["seq_embedding_pool", "seq_embedding_pool_xla"]
