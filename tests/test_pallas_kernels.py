"""Pallas kernel correctness (interpret mode on the CPU test backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from recbox_tpu.ops.pallas import seq_embedding_pool, seq_embedding_pool_xla


@pytest.fixture
def setup(rng):
    table = jnp.asarray(rng.normal(size=(200, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 200, size=(16, 7)).astype(np.int32))
    ids = ids.at[0, :4].set(199).at[3, :].set(199)  # padding incl. full-pad row
    return table, ids


@pytest.mark.parametrize("mode", ["mean", "sum"])
def test_matches_xla(setup, mode):
    table, ids = setup
    ref = seq_embedding_pool_xla(table, ids, pad_id=199, mode=mode)
    out = seq_embedding_pool(table, ids, pad_id=199, mode=mode, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_all_padded_row_is_zero(setup):
    table, ids = setup
    out = seq_embedding_pool(table, ids, pad_id=199, mode="mean",
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out)[3], 0.0, atol=1e-6)


def test_unaligned_dim_falls_back(rng):
    # D=64 not lane-aligned → silently uses the XLA path (still correct)
    table = jnp.asarray(rng.normal(size=(50, 64)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 50, size=(8, 3)).astype(np.int32))
    out = seq_embedding_pool(table, ids, pad_id=0)
    ref = seq_embedding_pool_xla(table, ids, pad_id=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
