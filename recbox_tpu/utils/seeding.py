"""Determinism: seed everything (reference `recbox/utils/torch_utils.py:23-30`,
recbole `init_seed` `utils/utils.py:188-205`). XLA is deterministic given a
fixed PRNGKey; host-side numpy/python seeds cover the data pipeline."""

from __future__ import annotations

import os
import random

import numpy as np

__all__ = ["seed_everything", "training_key"]


def training_key(seed: int, impl: str = "rbg"):
    """Root PRNG key for a training stream.

    ``impl='rbg'`` (default) keys derive split/fold_in via threefry but draw
    random BITS through XLA's hardware ``RngBitGenerator`` — the TPU-idiomatic
    choice. Measured on v5e: the SASRec regime (V=60k, L=50, B=1024, dropout
    0.1) spends ~3.1 ms/step generating threefry dropout masks; switching the
    stream to rbg cut the value-and-grad chain 10.50 → 8.65 ms/iter (−18%).
    ``impl='threefry'`` reproduces the classic `jax.random.PRNGKey` stream
    bit-exactly (use when comparing against runs recorded before round 5).
    Bit-streams are identical within a backend+compiler version but may differ
    across them — fine for dropout/init, which only need the distribution.
    """
    import jax

    if impl == "threefry":
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=impl)


def seed_everything(seed: int = 2024) -> None:
    random.seed(seed)
    np.random.seed(seed)
    # NOTE: affects SUBPROCESSES only — hash randomization for this
    # process was fixed at interpreter startup (set it in the launcher for
    # in-process str-hash determinism)
    os.environ["PYTHONHASHSEED"] = str(seed)
