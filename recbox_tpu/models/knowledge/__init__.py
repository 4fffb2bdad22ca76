"""Knowledge-aware recommenders (recbole knowledge_recommender family)."""

from recbox_tpu.models.knowledge.models import CKE, CFKG, KTUP, MKR, StaticArray
from recbox_tpu.models.knowledge.gnn import KGAT, KGCN, KGNNLS, RippleNet

__all__ = ["CKE", "CFKG", "KTUP", "MKR", "KGCN", "KGNNLS", "KGAT",
           "RippleNet", "StaticArray"]
