"""Fused full-softmax cross-entropy ("flash-CE") over a large item vocab.

The sequential CE protocol (recbole loss_type='CE',
`third_party/recbole/model/sequential_recommender/sasrec.py:144-150`)
scores every vocabulary item: logits = user @ table.T is (B, V) — 245 MB
fp32 at B=1024/V=60k, 4 GB at V=1M, 32 GB at B=8192/V=1M. The XLA
formulation (`ops/losses.full_softmax_loss` over
`SequentialRecommender.full_scores`) materializes that tensor in HBM and
re-reads it through log_softmax and both backward matmuls. This kernel
never lets the logits leave VMEM:

  forward   grid (B/Bt, V/Vt), V innermost. Per step: one (Bt, Vt) logits
            tile from a bf16 MXU dot (fp32 accumulation), folded into
            VMEM-resident running statistics (constant index_map over the
            sequential inner grid — the same accumulator pattern as
            `mips_fused_topk.py`): online max m + online sum-of-exp l,
            flash-attention-style rescaling. lse = m + log l outside;
            loss = mean(lse - label_logit) == full_softmax_loss exactly
            (the label logit is a B-row gather-dot outside the kernel).
  backward  dlogits = (softmax - onehot)/B never exists either: ONE
            recompute sweep forms p = exp(x - lse) per tile and feeds both
            du += p @ T (du block VMEM-resident over the inner V grid) and
            dt = p.T @ U (written directly when B <= b_tile, else
            per-B-tile partials summed outside). The onehot corrections
            are cheap row ops outside: du -= table[labels] (gather),
            dt[labels] -= user (scatter-add). The padded bf16 operands are
            custom-vjp residuals, so the (V, D) table is cast+padded once
            per step, not twice.

Design notes proven by measurement (v5e, 2026-08-20, honest scan-chained
vg with FULL gradient consumption — a `dt[:8]` slice lets XLA DCE the
partials reduction and flatters the number by ~0.1 ms):
  * NO masks/iotas in the hot loop: a BIAS COLUMN appended to the
    operands (u gains ones, t gains 0/real -1e9/pad) makes pad logits
    exactly -1e9 inside the dot, so exp() kills them with ~1.5% extra
    FLOPs; pad user rows contribute zeros to dt because their vectors are
    zero. The masked first formulation ran 1.17 ms fwd, this one 1.03.
    (An earlier closed-form correction l - n_pad*exp(-m) cancelled
    catastrophically when all real logits sat far below 0 — self-review.)
  * the 61M-element row-sum rides the MXU (dot with a ones matrix), not
    the VPU — the kernel is VPU-bound (max+sub+exp), the MXU is idle.
  * combined du+dt backward saves a whole recompute sweep (dot+exp) vs
    separate d_user/d_table kernels.
  * falsified: bf16-argument exp (7.92 vs 7.81 ms in-step — Mosaic's VPU
    exp is not faster on bf16); per-tile masks (above); QKV-style input
    re-use tricks don't apply (each tile is consumed once).

MEASURED ENVELOPE (v5e, D=64, 2-layer SASRec train step, 2026-08-20):
    isolated logits+CE vg, B=1024 V=60k:  XLA 3.00 ms -> fused 1.29 (2.3x)
    full train step B=1024 V=60k:   XLA 7.25 ms, fused 7.81 — XLA WINS at
        this size (its logits matmul/CE shares table casts and scheduling
        with the rest of the step; the kernel cannot) — the driver bench
        keeps the XLA path at the 60k regime.
    full train step B=1024 V=1M:    fused 31.7 ms vs XLA 57.4 (1.81x)
    full train step B=8192 V=1M:    fused 164 ms (50k ex/s, 2.5M 1M-way
        CE labels/s); the XLA formulation CANNOT COMPILE (32 GB logits).
Crossover: prefer `full_scores`+`full_softmax_loss` below ~100k items,
`fused_ce_loss` above — and it is the ONLY full-CE option at millions of
items, a protocol the reference cannot run at any speed (torch
F.cross_entropy over `full_sort_predict` logits materializes the same
infeasible tensor).

Reference behavior replaced: torch F.cross_entropy over
`model.full_sort_predict` logits (`sasrec.py:144-150`) — identical loss
semantics, the logits tensor just never exists. Two variants share the
kernels: `fused_softmax_ce` (single-label, optional per-row weights —
the weight folds into the backward as ``lse - log w``) and
`fused_multinomial_ce` (multi-hot VAE-decoder likelihood,
`multivae.py:126-128` — the per-row positive count folds the same way,
and the multi-hot corrections are H-row gathers/scatters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_softmax_ce", "fused_multinomial_ce"]

_NEG = -1e30


def _pad_to(x, mult, axis):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# --------------------------------------------------------------------------
# forward: running (m, l, label_logit) over the corpus sweep
# --------------------------------------------------------------------------

def _fwd_kernel(u_ref, t_ref, m_ref, l_ref):
    """Pure online-logsumexp sweep: no masks, no iotas, no label logic.

    The bias column (`_prep`) makes masking unnecessary: pad TABLE rows
    carry a -1e9 bias so their logits vanish through exp() inside the
    ordinary dot. The label logit is a B-row gather-dot outside the
    kernel. Keeping the hot
    loop to dot + max + exp + sum matters: the first formulation carried
    per-tile iota/compare/select for col masking and label pickup and ran
    1.17 ms fwd; this one runs 1.03 (v5e, B=1024 V=60k, 2026-08-20)."""
    v = pl.program_id(1)

    @pl.when(v == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    x = jax.lax.dot_general(
        u_ref[:], t_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (Bt, Vt)
    m_old = m_ref[:, :1]                               # (Bt, 1)
    m_new = jnp.maximum(m_old, jnp.max(x, axis=1, keepdims=True))
    e = jnp.exp(x - m_new).astype(jnp.bfloat16)
    # row-sum on the MXU (dot with ones), not the VPU: the kernel is
    # VPU-bound (max+sub+exp), so the 61M-element sum pass moves to the
    # idle systolic array; bf16 terms, fp32 accumulation
    ones = jnp.ones((e.shape[1], 128), jnp.bfloat16)
    s = jax.lax.dot_general(
        e, ones, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (Bt, 128)
    l_new = l_ref[:, :1] * jnp.exp(m_old - m_new) + s[:, :1]
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)


_PAD_BIAS = -1e9  # pad-row logit via the bias column: exp() is exactly 0


def _prep(user, table, bt, vt):
    """Padded bf16 operands + the pad-row BIAS COLUMN — computed once
    forward and carried to the backward as residuals, so the (V, D) table
    is cast+padded ONCE per step (at V=1M the table is 256 MB fp32; a
    second cast in bwd would be ~0.5 ms of pure HBM traffic).

    The bias column makes padding exact with zero hot-loop cost: u gains
    an all-ones column, t gains a column that is 0 for real rows and
    -1e9 for pad rows, so pad logits are -1e9 (exp = 0 exactly) INSIDE
    the dot itself. The previous closed-form correction
    ``l - n_pad*exp(-m)`` cancelled catastrophically when every real
    logit sat far below the pads' implicit 0 (all-real-mass under the
    fp32 rounding error of the pad mass -> lse = -inf, NaN grads;
    found in round-5 self-review). Gradients w.r.t. the appended
    columns are simply sliced off (the ones column is a constant; the
    bias column belongs to no real parameter)."""
    u = _pad_to(user.astype(jnp.bfloat16), bt, 0)
    t = _pad_to(table.astype(jnp.bfloat16), vt, 0)
    n_pad = t.shape[0] - table.shape[0]
    ones_col = jnp.ones((u.shape[0], 1), jnp.bfloat16)
    bias_col = jnp.zeros((t.shape[0], 1), jnp.bfloat16)
    if n_pad:
        bias_col = bias_col.at[table.shape[0]:].set(
            jnp.bfloat16(_PAD_BIAS))
    return (jnp.concatenate([u, ones_col], axis=1),
            jnp.concatenate([t, bias_col], axis=1))


def _lse_impl(user, table, bt, vt, interpret):
    """Row logsumexp of ``user @ table.T`` via the online-sweep kernel;
    returns (lse (B,), padded bf16 operands incl. the bias column) —
    shared by the single-label and multinomial ops."""
    b = user.shape[0]
    u, t = _prep(user, table, bt, vt)
    d = u.shape[1]                       # original dim + the bias column
    bp, vp = u.shape[0], t.shape[0]
    grid = (bp // bt, vp // vt)
    stat = jax.ShapeDtypeStruct((bp, 128), jnp.float32)
    m, l = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, d), lambda i, v: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vt, d), lambda i, v: (v, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, 128), lambda i, v: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 128), lambda i, v: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[stat, stat],
        interpret=interpret,
    )(u, t)
    return m[:b, 0] + jnp.log(l[:b, 0]), (u, t)


def _fwd_impl(user, table, labels, weights, bt, vt, interpret):
    b = user.shape[0]
    lse, (u, t) = _lse_impl(user, table, bt, vt, interpret)
    # label logit via gather-dot, same bf16xbf16->f32 precision as the dot
    lbl = labels.astype(jnp.int32)
    ll = jnp.sum(u[:b] * t[lbl], axis=1, dtype=jnp.float32)
    w = weights.astype(jnp.float32)
    loss = jnp.sum(w * (lse - ll)) / jnp.maximum(jnp.sum(w), 1e-12)
    return loss, lse, (u, t)


# --------------------------------------------------------------------------
# backward: two recompute sweeps (du resident over V, dt resident over B)
# --------------------------------------------------------------------------

def _bwd_kernel(u_ref, t_ref, lse_ref, du_ref, dtp_ref):
    """One sweep computes BOTH grads: p = exp(x - lse) is formed once per
    tile, then feeds du += p @ T (du block b-indexed, VMEM-resident over
    the inner V grid) and dtp[i, vtile] = p.T @ U (per-B-tile partials,
    each block written exactly once — summed over i outside; the extra
    (nB, V, D) HBM buffer trades ~30 MB of traffic for a whole recompute
    sweep's dot+exp). No masking, same argument as `_fwd_kernel`: pad
    TABLE rows are zero so their (nonzero) p multiplies zeros into du;
    pad USER rows are zero so they contribute zeros to dtp; the pad rows
    of du/dt themselves are sliced off outside."""
    v = pl.program_id(1)

    @pl.when(v == 0)
    def _init():
        du_ref[:] = jnp.zeros_like(du_ref)

    x = jax.lax.dot_general(
        u_ref[:], t_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (Bt, Vt)
    p = jnp.exp(x - lse_ref[:, :1])
    pb = p.astype(jnp.bfloat16)
    du_ref[:] = du_ref[:] + jax.lax.dot_general(
        pb, t_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (Bt, D)
    dtp_ref[0] = jax.lax.dot_general(
        pb, u_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (Vt, D)


def _bwd_kernel_nb1(u_ref, t_ref, lse_ref, du_ref, dt_ref):
    """Single-B-tile variant (the tuned default covers B <= b_tile): dt is
    written directly — no (nB, V, D) partials buffer, no sum pass."""
    v = pl.program_id(1)

    @pl.when(v == 0)
    def _init():
        du_ref[:] = jnp.zeros_like(du_ref)

    x = jax.lax.dot_general(
        u_ref[:], t_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (Bt, Vt)
    p = jnp.exp(x - lse_ref[:, :1])
    pb = p.astype(jnp.bfloat16)
    du_ref[:] = du_ref[:] + jax.lax.dot_general(
        pb, t_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (Bt, D)
    dt_ref[:] = jax.lax.dot_general(
        pb, u_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (Vt, D)


def _bwd_impl(u, t, b, n_valid, lse, bt, vt, interpret):
    d = u.shape[1]
    lse_p = _pad_to(
        jnp.broadcast_to(lse.reshape(-1, 1), (b, 128)), bt, 0)
    bp, vp = u.shape[0], t.shape[0]
    nb = bp // bt
    in_specs = [
        pl.BlockSpec((bt, d), lambda i, v: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((vt, d), lambda i, v: (v, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, 128), lambda i, v: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if nb == 1:
        du, dt = pl.pallas_call(
            _bwd_kernel_nb1,
            grid=(1, vp // vt),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((bt, d), lambda i, v: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((vt, d), lambda i, v: (v, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bp, d), jnp.float32),
                jax.ShapeDtypeStruct((vp, d), jnp.float32),
            ],
            interpret=interpret,
        )(u, t, lse_p)
        return du[:b], dt[:n_valid]

    du, dtp = pl.pallas_call(
        _bwd_kernel,
        grid=(nb, vp // vt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bt, d), lambda i, v: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vt, d), lambda i, v: (i, v, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, d), jnp.float32),
            jax.ShapeDtypeStruct((nb, vp, d), jnp.float32),
        ],
        interpret=interpret,
    )(u, t, lse_p)
    return du[:b], jnp.sum(dtp, axis=0)[:n_valid]


# --------------------------------------------------------------------------
# custom-vjp op
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_ce(user, table, labels, weights, bt, vt, interpret):
    loss, _, _ = _fwd_impl(user, table, labels, weights, bt, vt, interpret)
    return loss


def _fused_ce_fwd(user, table, labels, weights, bt, vt, interpret):
    loss, lse, (u, t) = _fwd_impl(user, table, labels, weights, bt, vt,
                                  interpret)
    # residuals carry the padded bf16 operands so bwd re-sweeps without
    # re-casting/re-padding the (V, D) table; f32 user/table for the exact
    # onehot corrections and output dtypes
    return loss, (user, table, labels, weights, lse, u, t)


def _fused_ce_bwd(bt, vt, interpret, res, g):
    user, table, labels, weights, lse, u, t = res
    b, d = user.shape
    w = weights.astype(jnp.float32)
    # per-row weights fold into lse: p_w = exp(x - (lse - log w)) = w * p,
    # so the SAME kernels produce weighted grad sums (w = 0 rows -> lse_eff
    # = +inf -> p = 0 exactly); only the onehot corrections need explicit w
    lse_eff = lse - jnp.log(w)
    du_raw, dt_raw = _bwd_impl(u, t, b, table.shape[0], lse_eff, bt, vt,
                               interpret)
    # drop the appended bias-column gradients (constant/-1e9 columns)
    du_raw, dt_raw = du_raw[:, :d], dt_raw[:, :d]
    sw = jnp.maximum(jnp.sum(w), 1e-12)
    scale = (g / sw).astype(jnp.float32)
    lbl = labels.astype(jnp.int32)
    du = (du_raw - w[:, None] * table[lbl].astype(jnp.float32)) * scale
    dt = dt_raw.at[lbl].add(-w[:, None] * user.astype(jnp.float32)) * scale
    # TRUE cotangent for the weights (was a hard zero — round-5
    # self-review): L = sum(w a)/sum(w), a = lse - ll
    # -> dL/dw_i = (a_i - L)/sum(w)
    a = lse - jnp.sum(u[:b] * t[lbl], axis=1, dtype=jnp.float32)
    loss = jnp.sum(w * a) / sw
    dw = (g * (a - loss) / sw).astype(weights.dtype)
    return du.astype(user.dtype), dt.astype(table.dtype), None, dw


_fused_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


def fused_softmax_ce(user, table, labels, weights=None,
                     b_tile: int = 1024, v_tile: int = 2048,
                     interpret: bool = None):
    """Weighted-mean CE of ``user @ table.T`` vs ``labels`` — logits stay
    in VMEM.

    Args:
      user: (B, D) query/user vectors (any float dtype; bf16 MXU compute).
      table: (V, D) item table (the full vocabulary; V needs no alignment —
        padding is handled and masked internally).
      labels: (B,) int target ids in [0, V).
      weights: optional (B,) non-negative per-row weights; loss =
        sum(w*(lse - label_logit)) / sum(w). ``w == 0`` rows are exact
        no-ops in loss AND grads (the weight folds into the backward as
        ``lse - log w``, so zero weight drives p to exactly 0) — use as a
        validity mask for padded cloze positions. None = uniform (plain
        mean, `full_softmax_loss` semantics exactly).
      b_tile / v_tile: kernel tile sizes (defaults sized for ~4 MB VMEM).
      interpret: pallas interpret mode; default auto (True off-TPU so the
        op — and models built on it — runs on the CPU test backend).

    Returns the scalar fp32 loss; differentiable w.r.t. user and table.

    Single-shard op (like the other pallas kernels): under a mesh, call it
    per-shard from shard_map, or keep the classic `full_scores` path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if weights is None:
        weights = jnp.ones((user.shape[0],), jnp.float32)
    # clamp tiles to the (128-aligned) problem size so small batches/vocabs
    # don't pad up to the bench-tuned defaults
    b_tile = min(b_tile, -(-user.shape[0] // 128) * 128)
    v_tile = min(v_tile, -(-table.shape[0] // 128) * 128)
    return _fused_ce(user, table, labels, weights, b_tile, v_tile,
                     bool(interpret))


# --------------------------------------------------------------------------
# multinomial (multi-hot) variant — the VAE-decoder likelihood
# --------------------------------------------------------------------------

def _mce_fwd_impl(user, table, pos_ids, pos_mask, bt, vt, interpret):
    b = user.shape[0]
    lse, (u, t) = _lse_impl(user, table, bt, vt, interpret)
    mm = pos_mask.astype(jnp.float32)                     # (B, H)
    n = jnp.sum(mm, axis=1)                               # (B,)
    ids = pos_ids.astype(jnp.int32)
    # positive logits via gather-dot (B, H): same bf16 precision as kernel
    ll = jnp.sum(u[:b, None, :] * t[ids], axis=2,
                 dtype=jnp.float32)
    loss = jnp.sum(n * lse - jnp.sum(mm * ll, axis=1)) / b
    return loss, lse, (u, t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_mce(user, table, pos_ids, pos_mask, bt, vt, interpret):
    loss, _, _ = _mce_fwd_impl(user, table, pos_ids, pos_mask, bt, vt,
                               interpret)
    return loss


def _fused_mce_fwd(user, table, pos_ids, pos_mask, bt, vt, interpret):
    loss, lse, (u, t) = _mce_fwd_impl(user, table, pos_ids, pos_mask, bt,
                                      vt, interpret)
    return loss, (user, table, pos_ids, pos_mask, lse, u, t)


def _fused_mce_bwd(bt, vt, interpret, res, g):
    user, table, pos_ids, pos_mask, lse, u, t = res
    b, d = user.shape
    mm = pos_mask.astype(jnp.float32)
    n = jnp.sum(mm, axis=1)
    # dlogits = n_i * p - y: the per-row positive COUNT folds into lse the
    # same way single-label weights do (lse - log n; n = 0 rows -> p = 0)
    lse_eff = lse - jnp.log(n)
    du_raw, dt_raw = _bwd_impl(u, t, b, table.shape[0], lse_eff, bt, vt,
                               interpret)
    # drop the appended bias-column gradients
    du_raw, dt_raw = du_raw[:, :d], dt_raw[:, :d]
    scale = (g / b).astype(jnp.float32)
    ids = pos_ids.astype(jnp.int32)
    tg = table[ids].astype(jnp.float32)                   # (B, H, D)
    du = (du_raw - jnp.einsum("bh,bhd->bd", mm, tg)) * scale
    add = (mm[:, :, None] * user[:, None, :].astype(jnp.float32))
    dt = dt_raw.at[ids.reshape(-1)].add(
        -add.reshape(-1, d)) * scale
    # TRUE cotangent for the mask (was a hard zero — round-5 self-review):
    # L = (1/B) sum_i (n_i lse_i - sum_h m_ih ll_ih), n_i = sum_h m_ih
    # -> dL/dm_ih = (lse_i - ll_ih)/B
    ll = jnp.sum(u[:b, None, :] * t[ids], axis=2, dtype=jnp.float32)
    dm = (g * (lse[:, None] - ll) / b).astype(pos_mask.dtype)
    return du.astype(user.dtype), dt.astype(table.dtype), None, dm


_fused_mce.defvjp(_fused_mce_fwd, _fused_mce_bwd)


def fused_multinomial_ce(user, table, pos_ids, pos_mask=None,
                         b_tile: int = 1024, v_tile: int = 2048,
                         interpret: bool = None):
    """Multinomial log-likelihood over the full vocabulary — logits stay
    in VMEM.

    ``loss = mean_i [ n_i * lse_i - sum_h mask_ih * (user_i . table[pos_ih]) ]``
    == ``-(log_softmax(user @ table.T) * multi_hot).sum(1).mean()`` — the
    VAE-decoder likelihood (recbole MultiVAE/RecVAE/CDAE,
    `third_party/recbole/model/general_recommender/multivae.py:126-128`),
    but without the (B, V) logits tensor, so it scales to million-item
    catalogs like `fused_softmax_ce`.

    Args:
      user: (B, D) latent/user vectors. A per-item decoder BIAS is
        supported by the constant-column trick: pass
        ``[user, ones(B, 1)]`` and ``[table, bias[:, None]]``.
      table: (V, D) decoder weight rows (the item table).
      pos_ids: (B, H) padded positive item ids.
      pos_mask: optional (B, H) validity mask (float/bool; None = all
        valid). Masked slots and all-empty rows are exact no-ops.

    Returns the scalar fp32 loss; differentiable w.r.t. user and table.
    Single-shard op, same crossover guidance as `fused_softmax_ce`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pos_mask is None:
        pos_mask = jnp.ones(pos_ids.shape, jnp.float32)
    pos_mask = pos_mask.astype(jnp.float32)
    b_tile = min(b_tile, -(-user.shape[0] // 128) * 128)
    v_tile = min(v_tile, -(-table.shape[0] // 128) * 128)
    return _fused_mce(user, table, pos_ids, pos_mask, b_tile, v_tile,
                      bool(interpret))
