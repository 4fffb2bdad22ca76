from recbox_tpu.nn.embedding import (
    FeatureEmbedding, concat_embeddings, stack_embeddings, masked_pool, emb_init,
)
from recbox_tpu.nn.core import (
    MLP, Dice, FactorizationMachine, LogisticRegression, get_activation,
)
from recbox_tpu.nn.interactions import (
    CrossNet, CrossNetV2, CrossNetMix, CompressedInteractionNet, InnerProduct,
    SENET, BilinearInteraction, HolographicInteraction, InteractionMachine,
    InteractingLayer,
)
from recbox_tpu.nn.attention import (
    TargetAttention, TransformerEncoder, PositionalEmbedding, CapsuleNetwork,
    MultiInterestSA,
)

__all__ = [
    "FeatureEmbedding", "concat_embeddings", "stack_embeddings", "masked_pool",
    "emb_init", "MLP", "Dice", "FactorizationMachine", "LogisticRegression",
    "get_activation", "CrossNet", "CrossNetV2", "CrossNetMix",
    "CompressedInteractionNet", "InnerProduct", "SENET", "BilinearInteraction",
    "HolographicInteraction", "InteractionMachine", "InteractingLayer",
    "TargetAttention", "TransformerEncoder", "PositionalEmbedding",
    "CapsuleNetwork", "MultiInterestSA",
]
