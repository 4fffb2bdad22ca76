"""Fused AdaGrad delta assembly for the packed-row embedding update.

Context: `PackedEmbeddingTrainer` (`training/packed.py`) updates all
embedding rows touched by a batch with ONE scatter-add of a (N, store_w)
f32 operand laid out [delta_slot0 | .. | delta_slotK | g2_slot0 | .. |
g2_slotK | zero pad]. Built with plain jnp ops, that operand costs ~5.7
ms/step at bench shapes on v5e (measured: `rows_only` 32.35 ms minus the
isolated 10.85 ms gather + 15.81 ms scatter, `tools/prof_packed_step.py`
2026-08-18) — the chain materializes the f32 upcast, the per-slot delta
intermediates, the lane-concat, AND a documented ~436 MB layout-change
copy XLA inserts between the model's feature-major activation layout and
the scatter operand (`training/packed.py` `_apply_row_updates` comment).
The true traffic need is one streaming pass: read G (N·W·4 B) + grads
(N·Σd·2 B), write the operand (N·store_w·4 B) ≈ 1.0 GB ≈ 1.3-3 ms.

MEASURED RESULT (v5e 2026-08-18, bench shapes, A/B via delta_kernel=):
the kernel LOSES — 39.51 ms/step vs 37.75 for the jnp chain. The ~5.7 ms
"machinery" turns out NOT to be materialized intermediates: XLA fuses the
whole delta chain into the scatter's operand computation, so the jnp path
never writes the (N, 128) operand to HBM at all, while a custom-call
kernel must (one extra 436 MB write + 436 MB read). The kernel stays as
an opt-in (`PackedEmbeddingTrainer(delta_kernel='pallas')`) and as the
measured-negative record; 'auto' resolves to the jnp chain.

What the kernel does — one pass: per row block it reads the gathered pack
rows G (f32, carrying the per-slot accumulator columns), the per-slot
row gradients (model compute dtype, e.g. bf16), computes row-wise
AdaGrad

    g2_s    = mean(g_s**2, axis=-1)
    delta_s = -lr * g_s / (sqrt(acc_s + g2_s) + eps)

in f32 with the same op order as the jnp formulation (bit-comparable),
and writes the assembled scatter operand directly — no intermediate ever
hits HBM. The learning rate arrives via SMEM so the plateau-decay
schedule keeps working without recompiles (it is a traced step argument
in the trainer).

Scope: the AdaGrad + accumulator-in-row layout (the bench regime and the
default for dim<=125 packs). The lazy-Adam and split-accumulator layouts
keep the jnp path (`_apply_row_updates`).

Reference behavior replaced: the per-table dense optimizer sweep of
`/root/reference/recbox/ranking/pytorch/models/ranking_model.py:191-217`
(torch Adam over full `nn.Embedding` tables); this trainer's row-op
formulation has no reference analog.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_adagrad_delta"]


def _make_kernel(dims, acc_cols, used, store_w, eps):
    n_slots = len(dims)

    def _kernel(lr_ref, g_ref, *refs):
        grad_refs = refs[:n_slots]
        out_ref = refs[n_slots]
        lr = lr_ref[0]
        G = g_ref[:]                                   # (bs, W) f32
        deltas, g2s = [], []
        for d, acc_col, gref in zip(dims, acc_cols, grad_refs):
            g = gref[:].astype(jnp.float32)            # (bs, d)
            g2 = jnp.mean(jnp.square(g), axis=-1, keepdims=True)
            vp = G[:, acc_col:acc_col + 1]             # (bs, 1)
            delta = -lr * g / (jnp.sqrt(vp + g2) + eps)
            deltas.append(delta)
            g2s.append(g2)
        parts = deltas + g2s
        if used < store_w:
            parts.append(jnp.zeros((G.shape[0], store_w - used),
                                   jnp.float32))
        out_ref[:] = jnp.concatenate(parts, axis=1)

    return _kernel


@functools.partial(jax.jit,
                   static_argnames=("dims", "acc_cols", "used", "store_w",
                                    "eps", "block_rows", "interpret"))
def fused_adagrad_delta(G, grads, emb_lr, *, dims: tuple, acc_cols: tuple,
                        used: int, store_w: int, eps: float,
                        block_rows: int = 4096, interpret: bool = False):
    """One-pass scatter-operand assembly for the packed AdaGrad update.

    G: (N, W) f32 gathered pack rows (accumulators at ``acc_cols``).
    grads: per-slot (N, d) row gradients (any float dtype; upcast in-VMEM).
    emb_lr: scalar learning rate (traced).
    Returns the (N, store_w) f32 update operand for ``pack.at[ids].add``.
    """
    G = jnp.asarray(G)
    n = G.shape[0]
    bs = block_rows
    while n % bs:
        bs //= 2
        if bs < 8:        # no aligned block size divides N: pad instead
            bs = min(block_rows, 8 * -(-n // 8))
            break
    n_pad = (-n) % bs
    if n_pad:
        G = jnp.pad(G, ((0, n_pad), (0, 0)), constant_values=1.0)
        grads = [jnp.pad(g, ((0, n_pad), (0, 0))) for g in grads]
    npad = n + n_pad
    lr = jnp.asarray(emb_lr, jnp.float32).reshape(1)
    grid = (npad // bs,)
    out = pl.pallas_call(
        _make_kernel(dims, acc_cols, used, store_w, eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bs, G.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((bs, int(d)), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
            for d in dims
        ],
        out_specs=pl.BlockSpec((bs, store_w), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, store_w), jnp.float32),
        # double-buffered (bs, W) in/out blocks exceed the 16 MB default
        # scoped-vmem budget at bs=8192 (24M observed on-chip); grant room
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(lr, G, *grads)
    return out[:n] if n_pad else out
