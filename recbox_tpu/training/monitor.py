"""Early-stop monitor: weighted metric combination + patience bookkeeping.

Re-implementation of the reference Monitor (`recbox/ranking/utils.py:94-107`)
and early-stopping semantics shared by both model bases
(`match_model.py:138-160`, `ranking_model.py:163-183`): the monitored value is
a weighted sum of metrics (e.g. ``{"AUC": 1, "logloss": -1}``), improvements
are compared against the best-so-far, and a plateau triggers
reduce-lr + best-weight reload before patience runs out.
"""

from __future__ import annotations

from typing import Dict, Mapping, Union

__all__ = ["Monitor"]


class Monitor:
    def __init__(self, kv: Union[str, Mapping[str, float]], mode: str = "max",
                 patience: int = 2, min_delta: float = 1e-6):
        if isinstance(kv, str):
            kv = {kv: 1.0}
        self.kv = dict(kv)
        assert mode in ("max", "min")
        self.mode = mode
        self.patience = patience
        self.min_delta = min_delta
        self.best_value = float("-inf") if mode == "max" else float("inf")
        self.best_epoch = -1
        self.stopping_steps = 0

    def get_value(self, metrics: Dict[str, float]) -> float:
        value = 0.0
        for k, w in self.kv.items():
            if k not in metrics:
                raise KeyError(f"monitor metric {k!r} missing from {list(metrics)}")
            value += w * metrics[k]
        return value

    def update(self, metrics: Dict[str, float], epoch: int):
        """Returns (value, improved, should_stop)."""
        value = self.get_value(metrics)
        if self.mode == "max":
            improved = value > self.best_value + self.min_delta
        else:
            improved = value < self.best_value - self.min_delta
        if improved:
            self.best_value = value
            self.best_epoch = epoch
            self.stopping_steps = 0
        else:
            self.stopping_steps += 1
        return value, improved, self.stopping_steps >= self.patience

    def state(self) -> dict:
        return {"best_value": self.best_value, "best_epoch": self.best_epoch,
                "stopping_steps": self.stopping_steps}

    def restore(self, st: dict) -> None:
        self.best_value = st["best_value"]
        self.best_epoch = st["best_epoch"]
        self.stopping_steps = st["stopping_steps"]
