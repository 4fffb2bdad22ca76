from recbox_tpu.retrieval.index import BruteForceMIPS, chunked_topk, approx_mips_topk
from recbox_tpu.retrieval.service import RetrievalService

__all__ = ["BruteForceMIPS", "chunked_topk", "approx_mips_topk",
           "RetrievalService"]
