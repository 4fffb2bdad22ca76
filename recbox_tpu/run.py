"""One-command experiment runner: config dir + expid → train → metrics.

    python -m recbox_tpu.run --config=<dir> --expid=<id> [--key=value ...]

The reference analog is the ranking stack's run-one-expid flow — the
command the autotuner scheduler launches per accelerator
(`recbox/ranking/autotuner.py:123-145`) and recbole's `run_recbole`
script surface. `grid_search_subprocess(script="-m recbox_tpu.run", ...)`
uses this module as its target.

Config contract (see `config/config.py` for the YAML layout):
  model section   — `model` (registered name), hyperparameters, trainer
                    knobs (`learning_rate`, `epochs`, `batch_size`, ...),
                    `dataset_id`.
  dataset section — `data_dir`: a directory holding `feature_map.json`
                    (`FeatureMap.save` / `FeatureEncoder.save`) plus
                    `train.npz` / `valid.npz` (and optionally `test.npz`)
                    array-dict files (np.savez of encoded columns).

Stages ranking / multitask / sequential dispatch to the matching
`quick_start.run_*_experiment`; matching/KG/rerank pipelines need
stage-specific structures (user→item dicts, KG triples, lists) and keep
their explicit `quick_start` entry points.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Any, Dict, Mapping, Optional

import numpy as np

__all__ = ["run_expid", "main"]


def _load_split(data_dir: str, split: str) -> Optional[Dict[str, np.ndarray]]:
    path = os.path.join(data_dir, f"{split}.npz")
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def run_expid(config_dir: str, experiment_id: str,
              overrides: Optional[Mapping[str, Any]] = None,
              cli: bool = False) -> Dict[str, float]:
    """Train one configured experiment and return its final metrics."""
    from recbox_tpu.config import load_config
    from recbox_tpu.features import FeatureMap
    from recbox_tpu.models import get_model
    from recbox_tpu import quick_start

    cfg = load_config(config_dir, experiment_id, cli=cli,
                      overrides=dict(overrides) if overrides else None)
    data_dir = cfg.get("data_dir")
    if cfg.get("model") == "cascade":
        # three-stage cascade route: `model: cascade` + `dataset: <name>`
        # (+ optional matcher/ranker/reranker model names) runs
        # matching -> ranking -> reranking as one program
        # (`quick_start.run_cascade_experiment`) — the pipeline the
        # reference needs three frameworks and file handoffs for
        if not cfg.get("dataset"):
            raise KeyError(
                f"expid {experiment_id!r}: model 'cascade' needs a "
                "`dataset` name (the cascade derives all three stages' "
                "supervision from one interaction file)")
        metrics = quick_start.run_cascade_experiment(
            cfg["dataset"], matcher=cfg.get("matcher", "MF"),
            ranker=cfg.get("ranker", "DCN"),
            reranker=cfg.get("reranker", "PRM"), config=dict(cfg))
        return _finish(cfg, experiment_id, metrics,
                       dataset_id=cfg["dataset"])
    if not data_dir and cfg.get("dataset"):
        # raw-dataset route (recbole `run_recbole(model, dataset)` surface):
        # a dataset NAME instead of a pre-encoded npz dir — acquire/load/
        # filter/split/train/eval in one chain (`quick_start.run_experiment`)
        metrics = quick_start.run_experiment(
            cfg["model"], cfg["dataset"], config=dict(cfg))
        return _finish(cfg, experiment_id, metrics,
                       dataset_id=cfg["dataset"])
    if not data_dir:
        raise KeyError(
            f"expid {experiment_id!r}: no `data_dir` (pre-encoded npz dir) "
            "and no `dataset` (raw dataset name for the one-call "
            "acquire→load→split→train chain) — set one of them.")
    fm = FeatureMap.load(os.path.join(data_dir, "feature_map.json"))
    train = _load_split(data_dir, "train")
    valid = _load_split(data_dir, "valid")
    if train is None or valid is None:
        raise FileNotFoundError(
            f"{data_dir} must contain train.npz and valid.npz")
    test = _load_split(data_dir, "test")

    _, stage = get_model(cfg["model"])
    if stage in ("ranking", "multitask"):
        metrics = quick_start.run_ranking_experiment(cfg, fm, train, valid,
                                                     test_arrays=test)
    elif stage == "sequential":
        ks = cfg.get("topk", (10, 20))
        ks = (int(ks),) if isinstance(ks, int) else tuple(ks)
        metrics = quick_start.run_sequential_experiment(cfg, fm, train, valid,
                                                        test_arrays=test,
                                                        ks=ks)
    else:
        raise NotImplementedError(
            f"model {cfg['model']!r} is stage {stage!r}; the CLI covers "
            "ranking/multitask/sequential — use the quick_start."
            f"run_{stage}_experiment API for this stage (it needs "
            "stage-specific eval structures a flat npz dir cannot express).")

    return _finish(cfg, experiment_id, metrics,
                   dataset_id=cfg.get("dataset_id"))


def _finish(cfg, experiment_id, metrics, dataset_id=None):
    """One result schema + one append path for both dataset routes."""
    result = {"experiment_id": experiment_id, "model": cfg["model"],
              "dataset_id": dataset_id, **metrics}
    workdir = cfg.get("workdir")
    if workdir:
        os.makedirs(workdir, exist_ok=True)
        # the reference appends one result row per finished expid
        # (`autotuner.py` result csv); JSONL here
        with open(os.path.join(workdir, "results.jsonl"), "a") as fh:
            fh.write(json.dumps(result) + "\n")
    return result


def main(argv=None) -> Dict[str, float]:
    args = list(sys.argv[1:] if argv is None else argv)
    config_dir = expid = None
    rest = []
    for a in args:
        if a.startswith("--config="):
            config_dir = a.split("=", 1)[1]
        elif a.startswith("--expid="):
            expid = a.split("=", 1)[1]
        else:
            rest.append(a)
    if not config_dir or not expid:
        print("usage: python -m recbox_tpu.run --config=<dir> --expid=<id> "
              "[--key=value ...]", file=sys.stderr)
        raise SystemExit(2)
    # type the remaining --key=value pairs with the config system's
    # literal-eval rules, scoped to THIS argv (never the host process's
    # sys.argv, and never leaking config/expid into the experiment config)
    from recbox_tpu.config import parse_cli_overrides
    overrides = parse_cli_overrides(rest)
    result = run_expid(config_dir, expid, overrides=overrides)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
