"""Determinism: seed everything (reference `recbox/utils/torch_utils.py:23-30`,
recbole `init_seed` `utils/utils.py:188-205`). XLA is deterministic given a
fixed PRNGKey; host-side numpy/python seeds cover the data pipeline."""

from __future__ import annotations

import os
import random

import numpy as np

__all__ = ["seed_everything"]


def seed_everything(seed: int = 2024) -> None:
    random.seed(seed)
    np.random.seed(seed)
    # NOTE: affects SUBPROCESSES only — hash randomization for this
    # process was fixed at interpreter startup (set it in the launcher for
    # in-process str-hash determinism)
    os.environ["PYTHONHASHSEED"] = str(seed)
