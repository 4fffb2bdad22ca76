from recbox_tpu.ops.losses import (
    full_softmax_loss,
    cosine_contrastive_loss, mse_matching_loss, pairwise_logistic_loss,
    pairwise_margin_loss, sigmoid_crossentropy_loss, softmax_crossentropy_loss,
    bpr_loss, binary_crossentropy, embedding_reg_loss, get_matching_loss,
    get_ranking_loss,
)

__all__ = [
    "cosine_contrastive_loss", "mse_matching_loss", "pairwise_logistic_loss",
    "pairwise_margin_loss", "sigmoid_crossentropy_loss",
    "softmax_crossentropy_loss", "bpr_loss", "binary_crossentropy",
    "embedding_reg_loss", "get_matching_loss", "get_ranking_loss",
    "full_softmax_loss",
]
