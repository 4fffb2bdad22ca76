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


class TestPallasMIPS:
    """Fused MIPS scorer (`ops/pallas/mips_topk.py`) — interpret mode."""

    def test_matches_exact_at_proportionate_shapes(self):
        from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
        rng = np.random.default_rng(0)
        q = rng.normal(size=(16, 64)).astype(np.float32)
        c = rng.normal(size=(50_000, 64)).astype(np.float32)
        s, ids = pallas_mips_topk(q, c, 10, interpret=True,
                                  exact_merge=True)
        exact = q @ c.T
        eids = np.argsort(-exact, axis=1)[:, :10]
        recall = np.mean([len(set(np.asarray(ids)[i].tolist())
                              & set(eids[i].tolist())) / 10
                          for i in range(16)])
        assert recall >= 0.95, recall
        # returned scores are the true dot products of the returned ids
        # (rtol covers the default packed path's 2^-17 mantissa truncation)
        np.testing.assert_allclose(
            np.asarray(s),
            np.take_along_axis(exact, np.asarray(ids), axis=1), rtol=2e-5)

    def test_padding_masked(self):
        from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
        rng = np.random.default_rng(1)
        q = rng.normal(size=(8, 48)).astype(np.float32)
        c = rng.normal(size=(3000, 48)).astype(np.float32)  # heavy padding
        s, ids = pallas_mips_topk(q, c, 5, interpret=True, exact_merge=True)
        assert int(np.asarray(ids).max()) < 3000
        assert np.isfinite(np.asarray(s)).all()

    def test_negative_scores_with_padding(self):
        """Regression (round-2 ADVICE): zero-scored PAD rows must not win
        segments whose valid rows all score negative — pads are now masked
        to -inf INSIDE the kernel, before the segment reduce. Construction:
        every valid corpus row scores strictly negative for every query, so
        under the old post-segmentation masking nearly every returned slot
        was -1; exact top-k must survive."""
        from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
        rng = np.random.default_rng(3)
        q = np.abs(rng.normal(size=(8, 64))).astype(np.float32)
        c = -np.abs(rng.normal(size=(3000, 64))).astype(np.float32)
        s, ids = pallas_mips_topk(q, c, 5, interpret=True, exact_merge=True)
        ids = np.asarray(ids)
        assert (ids >= 0).all() and (ids < 3000).all(), ids
        exact = q @ c.T
        eids = np.argsort(-exact, axis=1)[:, :5]
        recall = np.mean([len(set(ids[i]) & set(eids[i])) / 5
                          for i in range(8)])
        assert recall >= 0.95, recall
        np.testing.assert_allclose(
            np.asarray(s), np.take_along_axis(exact, ids, axis=1), rtol=1e-5)

    def test_bitonic_merge_matches_default(self):
        """merge='bitonic' (the in-VMEM sorting network killing the fixed
        XLA top-k cost) must return exactly the default exact merge's
        results over the same candidates."""
        from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
        rng = np.random.default_rng(4)
        q = rng.normal(size=(8, 64)).astype(np.float32)
        c = rng.normal(size=(4000, 64)).astype(np.float32)
        s0, i0 = pallas_mips_topk(q, c, 9, interpret=True, exact_merge=True,
                                  packed=False)
        s1, i1 = pallas_mips_topk(q, c, 9, interpret=True, merge="bitonic")
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))

    def test_packed_matches_unpacked(self):
        """packed=True (winner index in the low 7 mantissa bits, one max
        reduce, no id array) must return the same ids as the explicit
        max+argmax kernel up to mantissa-truncation ties, and scores true
        to the real dot products within the documented 2^-17 envelope."""
        from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
        rng = np.random.default_rng(5)
        q = rng.normal(size=(16, 64)).astype(np.float32)
        c = rng.normal(size=(50_000, 64)).astype(np.float32)
        s, ids = pallas_mips_topk(q, c, 10, interpret=True,
                                  exact_merge=True, packed=True)
        s, ids = np.asarray(s), np.asarray(ids)
        exact = q @ c.T
        eids = np.argsort(-exact, axis=1)[:, :10]
        recall = np.mean([len(set(ids[i].tolist()) & set(eids[i].tolist()))
                          / 10 for i in range(16)])
        assert recall >= 0.95, recall
        np.testing.assert_allclose(
            s, np.take_along_axis(exact, ids, axis=1), rtol=2e-5)

    def test_packed_negative_scores_with_padding(self):
        """Packed pads sit at ~-PACK_FLOOR (finite, so the index OR can't
        fabricate NaN) — they must still never win over all-negative valid
        rows, and the result must restore the -inf/-1 pad convention."""
        from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
        rng = np.random.default_rng(6)
        q = np.abs(rng.normal(size=(8, 64))).astype(np.float32)
        c = -np.abs(rng.normal(size=(3000, 64))).astype(np.float32)
        s, ids = pallas_mips_topk(q, c, 5, interpret=True,
                                  exact_merge=True, packed=True)
        ids = np.asarray(ids)
        assert (ids >= 0).all() and (ids < 3000).all(), ids
        exact = q @ c.T
        eids = np.argsort(-exact, axis=1)[:, :5]
        recall = np.mean([len(set(ids[i].tolist()) & set(eids[i].tolist()))
                          / 5 for i in range(8)])
        assert recall >= 0.95, recall

    def test_query_tiling_single_merge_matches_single_tile(self):
        """query_tile smaller than Q sweeps tiles through the kernel but
        merges ONCE; results must equal the single-tile call (both packed
        and unpacked), including when Q is not a tile multiple."""
        from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
        rng = np.random.default_rng(7)
        q = rng.normal(size=(20, 64)).astype(np.float32)
        c = rng.normal(size=(4000, 64)).astype(np.float32)
        for packed in (False, True):
            s0, i0 = pallas_mips_topk(q, c, 7, interpret=True,
                                      exact_merge=True, packed=packed)
            s1, i1 = pallas_mips_topk(q, c, 7, interpret=True,
                                      exact_merge=True, packed=packed,
                                      query_tile=8)
            np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                                       rtol=1e-6)
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))

    def test_int8_corpus_packed(self):
        """int8 corpus (quantize_int8 rows + per-row scales): s8 scoring
        in-kernel, per-corpus-row scale applied inside, per-QUERY scale
        deferred to the k winners (ranking-invariant). Returned scores are
        quantized-approximate (same contract as int8_mips_topk pure mode:
        error ~1% relative)."""
        from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
        from recbox_tpu.retrieval.index import quantize_int8
        rng = np.random.default_rng(9)
        q = rng.normal(size=(12, 64)).astype(np.float32)
        c = rng.normal(size=(50_000, 64)).astype(np.float32)
        qc, sc = quantize_int8(jnp.asarray(c))
        s, ids = pallas_mips_topk(q, qc, 10, valid_items=50_000,
                                  interpret=True, exact_merge=True,
                                  row_scale=np.asarray(sc))
        s, ids = np.asarray(s), np.asarray(ids)
        exact = q @ c.T
        eids = np.argsort(-exact, axis=1)[:, :10]
        recall = np.mean([len(set(ids[i].tolist()) & set(eids[i].tolist()))
                          / 10 for i in range(12)])
        assert recall >= 0.9, recall
        true = np.take_along_axis(exact, ids, axis=1)
        relerr = np.abs(s - true) / np.maximum(np.abs(true), 1e-3)
        assert np.median(relerr) < 0.02, np.median(relerr)

    def test_int8_requires_scale_and_packed(self):
        from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
        from recbox_tpu.retrieval.index import quantize_int8
        rng = np.random.default_rng(10)
        q = rng.normal(size=(4, 64)).astype(np.float32)
        c = rng.normal(size=(3000, 64)).astype(np.float32)
        qc, sc = quantize_int8(jnp.asarray(c))
        with pytest.raises(ValueError, match="row_scale"):
            pallas_mips_topk(q, qc, 5, interpret=True)
        with pytest.raises(ValueError, match="packed-only"):
            pallas_mips_topk(q, qc, 5, interpret=True,
                             row_scale=np.asarray(sc), packed=False)
        with pytest.raises(ValueError, match="only meaningful"):
            pallas_mips_topk(q, c, 5, interpret=True,
                             row_scale=np.asarray(sc))

    def test_packed_bitonic_is_rejected(self):
        from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
        rng = np.random.default_rng(8)
        q = rng.normal(size=(4, 64)).astype(np.float32)
        c = rng.normal(size=(3000, 64)).astype(np.float32)
        with pytest.raises(ValueError, match="bitonic"):
            pallas_mips_topk(q, c, 5, interpret=True, merge="bitonic",
                             packed=True)

    def test_index_method_dispatch(self):
        """BruteForceMIPS(method='pallas') falls back to approx for small
        corpora (no pallas on CPU) and accepts the method string."""
        from recbox_tpu.retrieval.index import BruteForceMIPS
        rng = np.random.default_rng(2)
        items = rng.normal(size=(500, 32)).astype(np.float32)
        idx = BruteForceMIPS(items, method="pallas", bf16=False)
        q = rng.normal(size=(4, 32)).astype(np.float32)
        s, i = idx.search(q, topk=5)
        assert s.shape == (4, 5) and i.shape == (4, 5)
        exact_ids = np.argsort(-(q @ items.T), axis=1)[:, :5]
        # small corpus routes through the exact/approx fallback
        np.testing.assert_array_equal(np.sort(i, axis=1),
                                      np.sort(exact_ids, axis=1))


class TestFusedMIPS:
    """In-kernel running top-k (`ops/pallas/mips_fused_topk.py`) —
    interpret mode. The fused merge must reproduce the packed candidate
    kernel's exact-merge results (identical candidate sets)."""

    def test_matches_packed_exact_merge(self):
        from recbox_tpu.ops.pallas.mips_fused_topk import mips_fused_topk
        from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
        rng = np.random.default_rng(11)
        q = rng.normal(size=(20, 64)).astype(np.float32)
        c = rng.normal(size=(50_000, 64)).astype(np.float32)
        s, ids = mips_fused_topk(q, c, 10, interpret=True)
        s, ids = np.asarray(s), np.asarray(ids)
        s4, i4 = pallas_mips_topk(q, c, 10, interpret=True,
                                  exact_merge=True, packed=True)
        np.testing.assert_array_equal(np.sort(np.asarray(i4), axis=1),
                                      np.sort(ids, axis=1))
        # descending, recall vs exact, scores true to the returned ids
        assert (np.diff(s, axis=1) <= 1e-7).all()
        exact = q @ c.T
        eids = np.argsort(-exact, axis=1)[:, :10]
        rec = np.mean([len(set(ids[i].tolist()) & set(eids[i].tolist()))
                       / 10 for i in range(20)])
        assert rec >= 0.95, rec
        np.testing.assert_allclose(
            s, np.take_along_axis(exact, ids, axis=1), rtol=2e-5)

    def test_query_tiling_matches_single_tile(self):
        from recbox_tpu.ops.pallas.mips_fused_topk import mips_fused_topk
        rng = np.random.default_rng(12)
        q = rng.normal(size=(20, 64)).astype(np.float32)
        c = rng.normal(size=(4000, 64)).astype(np.float32)
        s0, i0 = mips_fused_topk(q, c, 7, interpret=True)
        s1, i1 = mips_fused_topk(q, c, 7, interpret=True, query_tile=8)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))

    def test_negative_scores_with_padding(self):
        from recbox_tpu.ops.pallas.mips_fused_topk import mips_fused_topk
        rng = np.random.default_rng(13)
        q = np.abs(rng.normal(size=(8, 64))).astype(np.float32)
        c = -np.abs(rng.normal(size=(3000, 64))).astype(np.float32)
        s, ids = mips_fused_topk(q, c, 5, interpret=True)
        ids = np.asarray(ids)
        assert (ids >= 0).all() and (ids < 3000).all(), ids
        exact = q @ c.T
        eids = np.argsort(-exact, axis=1)[:, :5]
        rec = np.mean([len(set(ids[i].tolist()) & set(eids[i].tolist()))
                       / 5 for i in range(8)])
        assert rec >= 0.95, rec

    def test_k_beyond_candidates_raises(self):
        from recbox_tpu.ops.pallas.mips_fused_topk import mips_fused_topk
        rng = np.random.default_rng(14)
        q = rng.normal(size=(4, 64)).astype(np.float32)
        c = rng.normal(size=(3000, 64)).astype(np.float32)
        with pytest.raises(ValueError, match="segment candidates"):
            mips_fused_topk(q, c, 2000, interpret=True)

    def test_int8_corpus(self):
        """Fused kernel over quantize_int8 rows: s8 scoring + in-kernel
        per-row rescale, per-query scale deferred to the winners."""
        from recbox_tpu.ops.pallas.mips_fused_topk import mips_fused_topk
        from recbox_tpu.retrieval.index import quantize_int8
        rng = np.random.default_rng(15)
        q = rng.normal(size=(12, 64)).astype(np.float32)
        c = rng.normal(size=(50_000, 64)).astype(np.float32)
        qc, sc = quantize_int8(jnp.asarray(c))
        s, ids = mips_fused_topk(q, qc, 10, valid_items=50_000,
                                 interpret=True, row_scale=np.asarray(sc))
        s, ids = np.asarray(s), np.asarray(ids)
        exact = q @ c.T
        eids = np.argsort(-exact, axis=1)[:, :10]
        rec = np.mean([len(set(ids[i].tolist()) & set(eids[i].tolist()))
                       / 10 for i in range(12)])
        assert rec >= 0.9, rec
        true = np.take_along_axis(exact, ids, axis=1)
        relerr = np.abs(s - true) / np.maximum(np.abs(true), 1e-3)
        assert np.median(relerr) < 0.02, np.median(relerr)
        with pytest.raises(ValueError, match="row_scale"):
            mips_fused_topk(q, qc, 10, interpret=True)
        with pytest.raises(ValueError, match="only meaningful"):
            mips_fused_topk(q, c, 10, interpret=True,
                            row_scale=np.asarray(sc))


class TestBitonicTopK:
    """In-VMEM bitonic top-k (`ops/pallas/bitonic_topk.py`) — exactness
    against lax.top_k in interpret mode, row-major and candidate-major."""

    @pytest.mark.parametrize("q,c,k", [(8, 100, 10), (4, 256, 50),
                                       (3, 1000, 7), (5, 64, 64)])
    def test_matches_lax_topk(self, q, c, k):
        import jax
        from recbox_tpu.ops.pallas.bitonic_topk import pallas_bitonic_topk
        rng = np.random.default_rng(q * c + k)
        s = rng.normal(size=(q, c)).astype(np.float32)
        ts, ti = pallas_bitonic_topk(s, k=k, q_tile=8, interpret=True)
        rs, ri = jax.lax.top_k(jnp.asarray(s), k)
        np.testing.assert_allclose(np.asarray(ts), np.asarray(rs))
        np.testing.assert_array_equal(np.asarray(ti), np.asarray(ri))

    def test_carries_explicit_ids_and_duplicate_scores(self):
        import jax
        from recbox_tpu.ops.pallas.bitonic_topk import pallas_bitonic_topk
        s = np.array([[1.0, 3.0, 3.0, 2.0, -1.0, 3.0, 0.0, 2.0]],
                     np.float32)
        ids = np.arange(8, dtype=np.int32)[None] * 10
        ts, ti = pallas_bitonic_topk(s, ids=ids, k=4, q_tile=8,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(ts)[0], [3.0, 3.0, 3.0, 2.0])
        # ties: the returned id SET at each score must be correct
        assert set(np.asarray(ti)[0, :3].tolist()) == {10, 20, 50}
        assert np.asarray(ti)[0, 3] in (30, 70)


class TestFusedSoftmaxCE:
    """Flash-CE (`ops/pallas/fused_ce.py`) — loss/grad equivalence against
    the XLA bf16 logits + `full_softmax_loss` formulation, interpret mode.
    Shapes cover: tile-aligned, unaligned V (pad-row correction), unaligned
    B, multi-B-tile (nb > 1, the partials-buffer backward) and the direct
    nb == 1 backward."""

    @pytest.mark.parametrize("b,v,d,bt,vt", [
        (64, 256, 16, 64, 128),     # aligned, nb=1 direct-dt backward
        (70, 300, 32, 32, 128),     # both unaligned, nb=3 partials backward
        (33, 1000, 8, 64, 256),     # unaligned B, nb=1
        (128, 4096, 64, 128, 512),  # bench-like ratios
        (64, 500, 100, 64, 128),    # unaligned embedding dim (lane-padded
                                    # internally by Mosaic; verified on-chip)
    ])
    def test_matches_xla_formulation(self, b, v, d, bt, vt):
        import jax
        from recbox_tpu.ops.losses import full_softmax_loss
        from recbox_tpu.ops.pallas.fused_ce import fused_softmax_ce
        rng = np.random.default_rng(b * v + d)
        user = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        table = jnp.asarray(rng.normal(size=(v, d)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, v, b), jnp.int32)

        def ref(u, t):
            s = jnp.dot(u.astype(jnp.bfloat16), t.astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32)
            return full_softmax_loss(s, labels)

        l_ref, (du_ref, dt_ref) = jax.value_and_grad(
            ref, argnums=(0, 1))(user, table)
        l_f, (du_f, dt_f) = jax.value_and_grad(
            lambda u, t: fused_softmax_ce(u, t, labels, b_tile=bt,
                                          v_tile=vt, interpret=True),
            argnums=(0, 1))(user, table)
        # bf16 probability casts in the backward dots bound grads at ~0.5%
        assert abs(float(l_ref) - float(l_f)) < 2e-4 * abs(float(l_ref))
        assert float(jnp.max(jnp.abs(du_f - du_ref))) < \
            0.02 * float(jnp.max(jnp.abs(du_ref)))
        assert float(jnp.max(jnp.abs(dt_f - dt_ref))) < \
            0.02 * float(jnp.max(jnp.abs(dt_ref)))

    def test_extreme_logits_stay_finite(self):
        # online-max rescaling: rows whose max logit would overflow exp()
        # without the running max (exp(100) > f32 max for a plain sum-exp)
        import jax
        from recbox_tpu.ops.pallas.fused_ce import fused_softmax_ce
        user = jnp.full((8, 16), 10.0, jnp.float32)
        table = jnp.full((256, 16), 1.0, jnp.float32)
        labels = jnp.arange(8, dtype=jnp.int32)
        loss = fused_softmax_ce(user, table, labels, b_tile=8, v_tile=128,
                                interpret=True)
        # all logits equal (160) -> exact CE = log(256)
        np.testing.assert_allclose(float(loss), np.log(256.0), rtol=1e-3)
        g = jax.grad(lambda u: fused_softmax_ce(
            u, table, labels, b_tile=8, v_tile=128, interpret=True))(user)
        assert np.isfinite(np.asarray(g)).all()

    def test_weighted_matches_xla_weighted_ce(self):
        # weights fold into lse as `lse - log w`; 0-weight rows must be
        # EXACT no-ops in loss and grads (pad-position masking contract)
        import jax
        from recbox_tpu.ops.pallas.fused_ce import fused_softmax_ce
        rng = np.random.default_rng(7)
        b, v, d = 48, 300, 16
        user = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        table = jnp.asarray(rng.normal(size=(v, d)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, v, b), jnp.int32)
        w = jnp.asarray(rng.random(b) * (rng.random(b) > 0.3), jnp.float32)

        def ref(u, t):
            s = jnp.dot(u.astype(jnp.bfloat16), t.astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32)
            logp = jax.nn.log_softmax(s, axis=-1)
            picked = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            return -jnp.sum(w * picked) / jnp.sum(w)

        l_ref, (du_ref, dt_ref) = jax.value_and_grad(
            ref, argnums=(0, 1))(user, table)
        l_f, (du_f, dt_f) = jax.value_and_grad(
            lambda u, t: fused_softmax_ce(u, t, labels, weights=w,
                                          b_tile=16, v_tile=128,
                                          interpret=True),
            argnums=(0, 1))(user, table)
        assert abs(float(l_ref) - float(l_f)) < 2e-4 * abs(float(l_ref))
        assert float(jnp.max(jnp.abs(du_f - du_ref))) < \
            0.02 * float(jnp.max(jnp.abs(du_ref)))
        assert float(jnp.max(jnp.abs(dt_f - dt_ref))) < \
            0.02 * float(jnp.max(jnp.abs(dt_ref)))
        # zero-weight rows: exactly zero user-grad
        zero_rows = np.asarray(w) == 0
        assert zero_rows.any()
        assert float(jnp.max(jnp.abs(du_f[zero_rows]))) == 0.0

    def test_multinomial_matches_xla_vae_likelihood(self):
        # -(log_softmax(x) * multi_hot).sum(1).mean() — the recbole
        # MultiVAE decoder likelihood (`multivae.py:126-128`) — with
        # masked pad slots and an all-empty row as exact no-ops
        import jax
        from recbox_tpu.ops.pallas.fused_ce import fused_multinomial_ce
        rng = np.random.default_rng(1)
        b, v, d, h = 40, 300, 16, 5
        user = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        table = jnp.asarray(rng.normal(size=(v, d)), jnp.float32)
        pos = jnp.asarray(rng.integers(0, v, (b, h)), jnp.int32)
        mask = jnp.asarray(rng.random((b, h)) > 0.3, jnp.float32)
        mask = mask.at[3].set(0.0)

        def ref(u, t):
            s = jnp.dot(u.astype(jnp.bfloat16), t.astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32)
            logp = jax.nn.log_softmax(s, axis=-1)
            y = jnp.zeros((b, v)).at[jnp.arange(b)[:, None], pos].add(mask)
            return -jnp.sum(logp * y) / b

        l_ref, (du_ref, dt_ref) = jax.value_and_grad(
            ref, argnums=(0, 1))(user, table)
        l_f, (du_f, dt_f) = jax.value_and_grad(
            lambda u, t: fused_multinomial_ce(u, t, pos, mask, b_tile=16,
                                              v_tile=128, interpret=True),
            argnums=(0, 1))(user, table)
        assert abs(float(l_ref) - float(l_f)) < 5e-4 * abs(float(l_ref))
        assert float(jnp.max(jnp.abs(du_f - du_ref))) < \
            0.02 * float(jnp.max(jnp.abs(du_ref)))
        assert float(jnp.max(jnp.abs(dt_f - dt_ref))) < \
            0.02 * float(jnp.max(jnp.abs(dt_ref)))
        assert float(jnp.max(jnp.abs(du_f[3]))) == 0.0  # empty row: no-op

    def test_deeply_negative_logits_with_unaligned_vocab(self):
        # round-5 self-review regression: the earlier closed-form pad
        # correction returned lse = -inf (NaN grads) when every real logit
        # sat far below the zero-pad rows' implicit 0-logit; the bias
        # column keeps it exact. All logits -40, V=300 (pads to 384):
        # exact CE = log(300).
        import jax
        from recbox_tpu.ops.pallas.fused_ce import fused_softmax_ce
        user = jnp.full((8, 16), 2.0, jnp.float32)
        table = jnp.full((300, 16), -0.125, jnp.float32)   # logits = -4
        table = table * 10.0                               # logits = -40
        labels = jnp.arange(8, dtype=jnp.int32)
        loss = fused_softmax_ce(user, table, labels, b_tile=8, v_tile=128,
                                interpret=True)
        np.testing.assert_allclose(float(loss), np.log(300.0), rtol=1e-3)
        g = jax.grad(lambda u: fused_softmax_ce(
            u, table, labels, b_tile=8, v_tile=128, interpret=True))(user)
        assert np.isfinite(np.asarray(g)).all()

    def test_weight_and_mask_cotangents_are_true_gradients(self):
        # round-5 self-review: the weights/pos_mask cotangents were hard
        # zeros; now dL/dw_i = (a_i - L)/sum(w) and dL/dm_ih =
        # (lse_i - ll_ih)/B — checked against the XLA formulation's grads
        import jax
        from recbox_tpu.ops.pallas.fused_ce import (
            fused_multinomial_ce, fused_softmax_ce)
        rng = np.random.default_rng(2)
        b, v, d, h = 24, 200, 8, 3
        user = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        table = jnp.asarray(rng.normal(size=(v, d)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, v, b), jnp.int32)
        w = jnp.asarray(0.2 + rng.random(b), jnp.float32)

        def ref_w(wv):
            s = jnp.dot(user.astype(jnp.bfloat16),
                        table.astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32)
            logp = jax.nn.log_softmax(s, axis=-1)
            picked = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            return -jnp.sum(wv * picked) / jnp.sum(wv)

        dw_ref = jax.grad(ref_w)(w)
        dw_f = jax.grad(lambda wv: fused_softmax_ce(
            user, table, labels, weights=wv, b_tile=32, v_tile=128,
            interpret=True))(w)
        np.testing.assert_allclose(np.asarray(dw_f), np.asarray(dw_ref),
                                   atol=2e-3)

        pos = jnp.asarray(rng.integers(0, v, (b, h)), jnp.int32)
        m = jnp.asarray(0.2 + rng.random((b, h)), jnp.float32)

        def ref_m(mv):
            s = jnp.dot(user.astype(jnp.bfloat16),
                        table.astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32)
            logp = jax.nn.log_softmax(s, axis=-1)
            y = jnp.zeros((b, v)).at[jnp.arange(b)[:, None], pos].add(mv)
            return -jnp.sum(logp * y) / b

        dm_ref = jax.grad(ref_m)(m)
        dm_f = jax.grad(lambda mv: fused_multinomial_ce(
            user, table, pos, mv, b_tile=32, v_tile=128,
            interpret=True))(m)
        np.testing.assert_allclose(np.asarray(dm_f), np.asarray(dm_ref),
                                   atol=2e-3)
