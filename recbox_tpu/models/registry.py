"""Model registry: name → (class, stage), the `get_model` analog.

Replaces recbole's dynamic module-file scan (`utils/utils.py:55-85`) with an
explicit registry — importable names beat filename magic under jit tracing.
Lookup is case-insensitive like the reference.
"""

from __future__ import annotations

from typing import Tuple, Type

from recbox_tpu.models.matching.two_tower import MF, DSSM, YoutubeDNN
from recbox_tpu.models.matching.graph import LightGCN, NGCF
from recbox_tpu.models.ranking.ctr import (
    AFM, AutoInt, DCN, DCNv2, DNN, DeepFM, FM, FiBiNET, LR, NFM, PNN,
    WideDeep, xDeepFM,
)
from recbox_tpu.models.multitask.models import AITM, ESMM, MMOE, PLE, SharedBottom
from recbox_tpu.models.sequential.models import (
    Caser, GRU4Rec, NARM, NextItNet, SASRec, STAMP,
)
from recbox_tpu.models.reranking.models import DLCM, GSF, MiDNN, PRM, SetRank

__all__ = ["MODEL_REGISTRY", "get_model", "register_model", "list_models"]

MODEL_REGISTRY = {}


def register_model(name: str, cls: Type, stage: str) -> None:
    MODEL_REGISTRY[name.lower()] = (cls, stage)


def get_model(name: str) -> Tuple[Type, str]:
    key = name.lower()
    if key not in MODEL_REGISTRY:
        raise KeyError(
            f"model {name!r} not registered; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[key]


def list_models(stage: str = None):
    return sorted(n for n, (_, s) in MODEL_REGISTRY.items()
                  if stage is None or s == stage)


for _name, _cls in [("MF", MF), ("DSSM", DSSM), ("YoutubeDNN", YoutubeDNN),
                    ("LightGCN", LightGCN), ("NGCF", NGCF)]:
    register_model(_name, _cls, "matching")
# recbole's BPR (`general_recommender/bpr.py`) IS matrix factorization
# trained with the pairwise logistic (BPR) loss — the matching pipelines'
# default loss — so the alias makes `run_experiment("BPR", ...)` work with
# reference spelling.
register_model("BPR", MF, "matching")
for _name, _cls in [("LR", LR), ("FM", FM), ("DNN", DNN), ("WideDeep", WideDeep),
                    ("DeepFM", DeepFM), ("NFM", NFM), ("AFM", AFM), ("DCN", DCN),
                    ("DCNv2", DCNv2), ("xDeepFM", xDeepFM), ("AutoInt", AutoInt),
                    ("PNN", PNN), ("FiBiNET", FiBiNET)]:
    register_model(_name, _cls, "ranking")
for _name, _cls in [("SharedBottom", SharedBottom), ("ESMM", ESMM),
                    ("MMOE", MMOE), ("PLE", PLE), ("AITM", AITM)]:
    register_model(_name, _cls, "multitask")
for _name, _cls in [("SASRec", SASRec), ("GRU4Rec", GRU4Rec), ("NARM", NARM),
                    ("STAMP", STAMP), ("Caser", Caser), ("NextItNet", NextItNet)]:
    register_model(_name, _cls, "sequential")
for _name, _cls in [("PRM", PRM), ("DLCM", DLCM), ("SetRank", SetRank),
                    ("MiDNN", MiDNN), ("GSF", GSF)]:
    register_model(_name, _cls, "reranking")

from recbox_tpu.models.ranking.sequence_ctr import BST, DIEN, DIN, DSIN  # noqa: E402

register_model("DIN", DIN, "ranking")
register_model("BST", BST, "ranking")
register_model("DIEN", DIEN, "ranking")
register_model("DSIN", DSIN, "ranking")

from recbox_tpu.models.ranking.ctr_extended import (  # noqa: E402
    CCPM, DCNMix, DeepFEFM, DeepIM, DIFM, EDCN, EulerNet, FEFM, FFM, FGCNN,
    FiGNN, FLEN, FmFM, FNN, FwFM, HFM, IFM, MLR, ONN,
)

for _name, _cls in [("FFM", FFM), ("FwFM", FwFM), ("FmFM", FmFM),
                    ("FEFM", FEFM), ("DeepFEFM", DeepFEFM), ("ONN", ONN),
                    ("CCPM", CCPM), ("FGCNN", FGCNN), ("FLEN", FLEN),
                    ("IFM", IFM), ("DIFM", DIFM), ("EDCN", EDCN),
                    ("MLR", MLR), ("FiGNN", FiGNN), ("EulerNet", EulerNet),
                    ("DeepIM", DeepIM), ("HFM", HFM), ("DCNMix", DCNMix),
                    ("FNN", FNN), ("WDL", WideDeep)]:
    register_model(_name, _cls, "ranking")

from recbox_tpu.models.matching.multi_interest import (  # noqa: E402
    MIND, ComiRec, SimpleX, YoutubeSBC,
)

register_model("MIND", MIND, "matching")
register_model("ComiRec", ComiRec, "matching")
register_model("SimpleX", SimpleX, "matching")
register_model("YoutubeSBC", YoutubeSBC, "matching")

from recbox_tpu.models.sequential.extended import (  # noqa: E402
    BERT4Rec, CORE, FDSA, FOSSIL, FPMC, HGN, HRM, NPE, RepeatNet, SHAN, SINE,
    LightSANs, TransRec,
)
from recbox_tpu.models.sequential.session_graph import GCSAN, SRGNN  # noqa: E402
from recbox_tpu.models.matching.neural_cf import (  # noqa: E402
    ConvNCF, ENMF, FISM, NAIS, NeuMF,
)
from recbox_tpu.models.matching.autoencoder import (  # noqa: E402
    CDAE, MacridVAE, MultiVAE, RecVAE,
)
from recbox_tpu.models.matching.traditional import (  # noqa: E402
    ADMMSLIM, EASE, ItemKNN, Pop, PureSVD, SLIM,
)

for _name, _cls in [("NeuMF", NeuMF), ("ConvNCF", ConvNCF), ("NAIS", NAIS),
                    ("FISM", FISM), ("ENMF", ENMF), ("MultiVAE", MultiVAE),
                    ("MacridVAE", MacridVAE), ("RecVAE", RecVAE),
                    ("CDAE", CDAE)]:
    register_model(_name, _cls, "matching")
for _name, _cls in [("Pop", Pop), ("ItemKNN", ItemKNN), ("EASE", EASE),
                    ("PureSVD", PureSVD), ("SLIM", SLIM),
                    ("ADMMSLIM", ADMMSLIM)]:
    register_model(_name, _cls, "traditional")

from recbox_tpu.models.matching.graph_extended import (  # noqa: E402
    DGCF, GCMC, LINE, NCL, SGL, SpectralCF,
)

for _name, _cls in [("SGL", SGL), ("NCL", NCL), ("DGCF", DGCF),
                    ("SpectralCF", SpectralCF), ("GCMC", GCMC),
                    ("LINE", LINE)]:
    register_model(_name, _cls, "matching")

from recbox_tpu.models.knowledge import (  # noqa: E402
    CFKG, CKE, KGAT, KGCN, KGNNLS, KTUP, MKR, RippleNet,
)

for _name, _cls in [("CKE", CKE), ("CFKG", CFKG), ("KTUP", KTUP),
                    ("MKR", MKR), ("KGCN", KGCN), ("KGNNLS", KGNNLS),
                    ("KGAT", KGAT), ("RippleNet", RippleNet)]:
    register_model(_name, _cls, "knowledge")

for _name, _cls in [("BERT4Rec", BERT4Rec), ("FPMC", FPMC),
                    ("TransRec", TransRec), ("HGN", HGN), ("SHAN", SHAN),
                    ("FOSSIL", FOSSIL), ("HRM", HRM), ("NPE", NPE),
                    ("CORE", CORE), ("LightSANs", LightSANs), ("FDSA", FDSA),
                    ("RepeatNet", RepeatNet), ("SINE", SINE),
                    ("SRGNN", SRGNN), ("GCSAN", GCSAN)]:
    register_model(_name, _cls, "sequential")

from recbox_tpu.models.reranking.rl import (  # noqa: E402
    EGRDiscriminator, EGREvaluator, PPOReranker,
)
from recbox_tpu.models.reranking.lambdamart import LambdaMART  # noqa: E402

register_model("EGREvaluator", EGREvaluator, "reranking")
register_model("EGRDiscriminator", EGRDiscriminator, "reranking")
register_model("PPOReranker", PPOReranker, "reranking")
register_model("EGR", EGREvaluator, "reranking")
register_model("LambdaMART", LambdaMART, "ranker")

from recbox_tpu.models.sequential.pretrain import GRU4RecF, S3Rec  # noqa: E402
from recbox_tpu.models.matching.neural_cf import NNCF  # noqa: E402
from recbox_tpu.models.matching.autoencoder import RaCT  # noqa: E402
from recbox_tpu.models.matching.item2vec import Item2Vec  # noqa: E402
from recbox_tpu.models.matching.traditional import NCEPLRec  # noqa: E402
from recbox_tpu.models.knowledge.intent import KGIN, KSR, MCCLK  # noqa: E402
from recbox_tpu.models.ranking.distill import DAGFM, KD_DAGFM  # noqa: E402
from recbox_tpu.models.exlib import (  # noqa: E402
    LightGBMRecommender, XGBoostRecommender,
)

register_model("S3Rec", S3Rec, "sequential")
register_model("GRU4RecF", GRU4RecF, "sequential")
register_model("KSR", KSR, "sequential")
register_model("NNCF", NNCF, "matching")
register_model("RaCT", RaCT, "matching")
register_model("Item2Vec", Item2Vec, "matching")
register_model("NCEPLRec", NCEPLRec, "traditional")
register_model("KGIN", KGIN, "knowledge")
register_model("MCCLK", MCCLK, "knowledge")
register_model("DAGFM", DAGFM, "ranking")
register_model("KD_DAGFM", KD_DAGFM, "ranking")
register_model("XGBoost", XGBoostRecommender, "exlib")
register_model("LightGBM", LightGBMRecommender, "exlib")
