"""Pallas TPU kernel: fused sequence-embedding gather + masked pooling.

Computes ``pool(table[ids], ids != pad_id)`` in one pass: rows stream
HBM → VMEM through a double-buffered DMA pipeline and are accumulated
in-register, so the (B, L, D) gathered intermediate never exists in HBM.
The XLA fallback (`jnp.take` + masked_pool) writes B·L·D to HBM and reads it
back for the reduction — this kernel reads each row once and writes only
B·D.

Shapes: table (V, D) stays in HBM/ANY; each grid program gets its tile's
(TILE_B, L) ids in SMEM (whole-batch scalar prefetch would overflow SMEM)
and accumulates into a (TILE_B, D) VMEM output block; the inner
``fori_loop`` keeps NBUF row DMAs in flight (guide: "Patterns: Double
Buffering").

Measured (v5e, V=1M, D=128, B=8192, L=50, synchronous per-call timing
which includes ~40 ms of axon-tunnel latency): this kernel ~50 ms vs XLA
gather+pool ~1 ms of device time — one DMA per (row, position) serializes
on HBM latency, while XLA's gather pipelines across output tiles. The
kernel therefore stays an opt-in path (`force_pallas=True`) and a template
for fused-gather variants (e.g. gather + feature-cross) where XLA cannot
fuse; the default dispatch uses XLA on every backend. Mosaic also requires
lane-aligned rows: D % 128 == 0.

Use `seq_embedding_pool(..., interpret=True)` on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["seq_embedding_pool", "seq_embedding_pool_xla"]

NBUF = 32   # DMA pipeline depth
TILE_B = 8  # batch rows per program (sublane-aligned output block)


def _kernel(ids_ref, table_ref, out_ref, scratch, sems, *, L: int, D: int,
            pad_id: int, mode: str):
    # ids_ref: this tile's (TILE_B, L) ids in SMEM; table_ref: full table ANY
    total = TILE_B * L  # flat (row, position) work items for this tile

    def row_dma(slot, j):
        r, l = j // L, j % L
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(ids_ref[r, l], 1), :],
            scratch.at[slot],
            sems.at[slot],
        )

    for j in range(NBUF):
        @pl.when(j < total)
        def _(j=j):
            row_dma(j % NBUF, j).start()

    def body(j, acc_count):
        acc, count = acc_count
        slot = j % NBUF
        row_dma(slot, j).wait()
        row = scratch[slot][0]  # (D,)
        r, l = j // L, j % L
        valid = (ids_ref[r, l] != pad_id).astype(jnp.float32)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (TILE_B, 1), 0)[:, 0]
                  == r).astype(jnp.float32)
        acc = acc + onehot[:, None] * row[None, :] * valid
        count = count + onehot * valid

        @pl.when(j + NBUF < total)
        def _():
            row_dma((j + NBUF) % NBUF, j + NBUF).start()

        return acc, count

    acc = jnp.zeros((TILE_B, D), jnp.float32)
    count = jnp.zeros((TILE_B,), jnp.float32)
    acc, count = jax.lax.fori_loop(0, total, body, (acc, count))
    if mode == "mean":
        acc = acc / jnp.maximum(count, 1e-12)[:, None]
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("pad_id", "mode", "interpret"))
def _pallas_pool(table, ids, pad_id: int, mode: str, interpret: bool):
    B, L = ids.shape
    V, D = table.shape
    assert B % TILE_B == 0, f"batch {B} must be a multiple of {TILE_B}"
    kernel = functools.partial(_kernel, L=L, D=D, pad_id=pad_id, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=(B // TILE_B,),
        in_specs=[
            pl.BlockSpec((TILE_B, L), lambda b: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE_B, D), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NBUF, 1, D), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=interpret,
    )(ids.astype(jnp.int32), table.astype(jnp.float32))


def seq_embedding_pool_xla(table, ids, pad_id: int, mode: str = "mean"):
    """XLA reference path: gather + masked pool (materializes (B, L, D))."""
    emb = jnp.take(table, ids, axis=0)
    mask = (ids != pad_id).astype(emb.dtype)[..., None]
    summed = jnp.sum(emb * mask, axis=1)
    if mode == "sum":
        return summed
    return summed / jnp.maximum(jnp.sum(mask, axis=1), 1e-12)


def seq_embedding_pool(table, ids, pad_id: int, mode: str = "mean",
                       interpret: bool = False, force_pallas: bool = False):
    """Fused gather+pool; Pallas on TPU, XLA fallback elsewhere.

    Mosaic constraint: HBM row slices must be lane-aligned, so the Pallas
    path requires embedding_dim % 128 == 0 (and batch % 8 == 0); other
    shapes silently use the XLA path.
    """
    backend = jax.default_backend()
    eligible = (table.shape[1] % 128 == 0 and ids.shape[0] % TILE_B == 0)
    if interpret:
        return _pallas_pool(table, ids, pad_id, mode, True)
    # default = XLA on every backend (measured faster — see module docstring);
    # the Pallas path is opt-in for fused-variant experiments
    if force_pallas and eligible and backend == "tpu":
        return _pallas_pool(table, ids, pad_id, mode, False)
    return seq_embedding_pool_xla(table, ids, pad_id, mode)
