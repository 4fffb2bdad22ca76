"""One-call experiment pipelines — the `run_recbole` / `run_expid` analog.

Mirrors the reference entry points (`third_party/recbole/quick_start/
quick_start.py:42-112`, recbox's run_expid pattern driven by
`load_config`): build the model from a config + FeatureMap, construct
loaders/evaluator, fit with early stopping, return final metrics.

Model hyperparameters are picked from the config by dataclass-field name, so
YAML sections read like the reference's model configs.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, Mapping, Optional

import numpy as np

from recbox_tpu.config.config import Config
from recbox_tpu.data import ArrayLoader, MatchingLoader
from recbox_tpu.evaluation.evaluators import (
    CTREvaluator, MultiTaskEvaluator, RetrievalEvaluator,
)
from recbox_tpu.features.schema import FeatureMap
from recbox_tpu.models.registry import get_model
from recbox_tpu.models.multitask.models import multitask_loss
from recbox_tpu.ops import binary_crossentropy, full_softmax_loss, get_matching_loss
from recbox_tpu.training import Trainer, TrainerConfig

logger = logging.getLogger("recbox_tpu")

__all__ = ["build_model", "build_trainer_config", "run_ranking_experiment",
           "run_matching_experiment"]


def build_model(config: Mapping[str, Any], feature_map: FeatureMap):
    """Instantiate the configured model, passing config keys that match its
    dataclass fields (embedding_dim, hidden_units, …)."""
    cls, stage = get_model(config["model"])
    field_names = {f.name for f in dataclasses.fields(cls)} - {"parent", "name"}
    kwargs = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in config.items() if k in field_names}
    kwargs["feature_map"] = feature_map
    return cls(**kwargs), stage


def build_trainer_config(config: Mapping[str, Any]) -> TrainerConfig:
    field_names = {f.name for f in dataclasses.fields(TrainerConfig)}
    kwargs = {k: v for k, v in config.items() if k in field_names}
    return TrainerConfig(**kwargs)


def run_ranking_experiment(
    config: Mapping[str, Any],
    feature_map: FeatureMap,
    train_arrays: Dict[str, np.ndarray],
    valid_arrays: Dict[str, np.ndarray],
    test_arrays: Optional[Dict[str, np.ndarray]] = None,
    mesh=None,
) -> Dict[str, float]:
    """CTR / multitask pipeline: loader → model → trainer.fit → metrics."""
    config = Config(config)
    model, stage = build_model(config, feature_map)
    batch_size = config.get("batch_size", 2048)
    labels = list(feature_map.labels)
    metrics = list(config.get("metrics", ["AUC", "logloss"]))
    group_id = config.get("group_id") or None

    if stage == "multitask":
        evaluator = MultiTaskEvaluator(
            valid_arrays, labels, metrics=metrics,
            from_logits=getattr(model, "output_type", "logits") == "logits")
        from_logits = getattr(model, "output_type", "logits") == "logits"

        def loss_fn(outputs, batch):
            import jax.numpy as jnp
            y = jnp.stack([batch[l] for l in labels], axis=1)
            return multitask_loss(outputs, y, from_logits=from_logits)
    else:
        evaluator = CTREvaluator(valid_arrays, label=labels[0],
                                 metrics=metrics, group_id=group_id)

        def loss_fn(outputs, batch):
            return binary_crossentropy(outputs, batch[labels[0]])

    trainer = Trainer(model, loss_fn, build_trainer_config(config),
                      eval_fn=evaluator, mesh=mesh)
    loader = ArrayLoader(train_arrays, batch_size=batch_size, drop_last=True,
                         seed=config.get("seed", 2024))
    result = trainer.fit(loader, epochs=config.get("epochs"))
    if test_arrays is not None:
        test_eval = CTREvaluator(test_arrays, label=labels[0], metrics=metrics,
                                 group_id=group_id) if stage != "multitask" \
            else MultiTaskEvaluator(test_arrays, labels, metrics=metrics)
        result = {**result, **{f"test_{k}": v
                               for k, v in test_eval(trainer).items()}}
    logger.info("experiment %s: %s", config.get("experiment_id", "?"), result)
    return result


def run_matching_experiment(
    config: Mapping[str, Any],
    feature_map: FeatureMap,
    train_arrays: Dict[str, np.ndarray],
    corpus_arrays: Dict[str, np.ndarray],
    eval_user_arrays: Dict[str, np.ndarray],
    query_indices: np.ndarray,
    train_user2items: Mapping[int, Any],
    valid_user2items: Mapping[int, Any],
    mesh=None,
) -> Dict[str, float]:
    """Two-tower / graph / sequential matching pipeline with retrieval eval."""
    config = Config(config)
    model, stage = build_model(config, feature_map)
    metrics = list(config.get("metrics", ["Recall(k=20)", "NDCG(k=10)"]))
    evaluator = RetrievalEvaluator(
        eval_user_arrays, corpus_arrays, query_indices,
        train_user2items, valid_user2items, metrics=metrics,
        batch_size=config.get("eval_batch_size", 4096))

    loss_name = config.get("loss", "PairwiseLogisticLoss")
    train_method = None
    if loss_name == "FullSoftmaxCE":
        train_method = "full_scores"

        def loss_fn(outputs, batch):
            return full_softmax_loss(outputs, batch[feature_map.corpus_index])

        loader = ArrayLoader(train_arrays,
                             batch_size=config.get("batch_size", 2048),
                             drop_last=True, seed=config.get("seed", 2024))
    else:
        match_loss = get_matching_loss(loss_name)

        def loss_fn(outputs, batch):
            return match_loss(outputs)

        loader = MatchingLoader(
            feature_map, train_arrays, corpus_arrays,
            batch_size=config.get("batch_size", 2048),
            num_negs=config.get("num_negs", 10),
            seed=config.get("seed", 2024))

    trainer = Trainer(model, loss_fn, build_trainer_config(config),
                      eval_fn=evaluator, mesh=mesh, train_method=train_method)
    result = trainer.fit(loader, epochs=config.get("epochs"))
    logger.info("experiment %s: %s", config.get("experiment_id", "?"), result)
    return result
