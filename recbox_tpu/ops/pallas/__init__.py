from recbox_tpu.ops.pallas.embedding_gather import (
    seq_embedding_pool, seq_embedding_pool_xla,
)

__all__ = ["seq_embedding_pool", "seq_embedding_pool_xla",
           "mips_fused_topk", "pallas_mips_topk", "fused_softmax_ce"]


def __getattr__(name):
    # lazy: the MIPS kernels import bitonic/topk machinery not needed by
    # embedding-only users
    if name == "mips_fused_topk":
        from recbox_tpu.ops.pallas.mips_fused_topk import mips_fused_topk
        return mips_fused_topk
    if name == "pallas_mips_topk":
        from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
        return pallas_mips_topk
    if name == "fused_softmax_ce":
        from recbox_tpu.ops.pallas.fused_ce import fused_softmax_ce
        return fused_softmax_ce
    raise AttributeError(name)
