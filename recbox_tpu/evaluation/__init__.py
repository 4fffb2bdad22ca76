from recbox_tpu.evaluation.retrieval import (
    evaluate_retrieval, retrieval_metrics_from_topk, parse_metric,
    full_sort_topk, std_gauc,
)
from recbox_tpu.evaluation.beyond_accuracy import (
    evaluate_beyond_accuracy, gini_index, item_coverage, shannon_entropy,
)
from recbox_tpu.evaluation.ctr import (
    evaluate_ctr, auc_score, log_loss, grouped_auc, auc_jax,
)
from recbox_tpu.evaluation.evaluators import RetrievalEvaluator, CTREvaluator

__all__ = [
    "evaluate_retrieval", "retrieval_metrics_from_topk", "parse_metric",
    "full_sort_topk", "std_gauc", "evaluate_beyond_accuracy", "gini_index",
    "item_coverage", "shannon_entropy",
    "evaluate_ctr", "auc_score", "log_loss", "grouped_auc", "auc_jax",
    "RetrievalEvaluator", "CTREvaluator",
]
