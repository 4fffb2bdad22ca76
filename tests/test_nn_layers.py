"""Layer zoo unit tests: shapes + analytic values where tractable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.nn import (
    MLP, BilinearInteraction, CapsuleNetwork, CompressedInteractionNet,
    CrossNet, CrossNetMix, CrossNetV2, Dice, FactorizationMachine,
    FeatureEmbedding, HolographicInteraction, InnerProduct, InteractingLayer,
    InteractionMachine, MultiInterestSA, SENET, TargetAttention,
    TransformerEncoder, concat_embeddings, masked_pool, stack_embeddings,
)


def _init(mod, *args, **kwargs):
    rng = jax.random.PRNGKey(0)
    variables = mod.init({"params": rng, "dropout": rng}, *args, **kwargs)
    return variables


class TestFM:
    def test_matches_pairwise_sum(self):
        # FM = Σ_{i<j} <v_i, v_j>; check against the explicit pair loop
        x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 5, 4)))
        fm = FactorizationMachine()
        out = fm.apply(_init(fm, x), x)
        expected = np.zeros(3)
        xn = np.asarray(x)
        for i in range(5):
            for j in range(i + 1, 5):
                expected += (xn[:, i] * xn[:, j]).sum(-1)
        np.testing.assert_allclose(out[:, 0], expected, rtol=1e-5)


class TestCrossNets:
    def test_crossnet_shapes(self):
        x = jnp.ones((4, 12))
        for mod in (CrossNet(2), CrossNetV2(2), CrossNetMix(2, low_rank=4, num_experts=2)):
            out = mod.apply(_init(mod, x), x)
            assert out.shape == (4, 12)

    def test_crossnet_zero_layers_identity(self):
        x = jnp.asarray(np.random.normal(size=(2, 6)))
        mod = CrossNet(0)
        out = mod.apply(_init(mod, x), x)
        np.testing.assert_allclose(out, x)


class TestInteractions:
    def setup_method(self):
        self.x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 8)).astype(np.float32))

    def test_inner_product_matches_pairs(self):
        mod = InnerProduct()
        out = mod.apply(_init(mod, self.x), self.x)
        assert out.shape == (2, 6)
        xn = np.asarray(self.x)
        expected = [(xn[:, i] * xn[:, j]).sum(-1) for i in range(4) for j in range(i + 1, 4)]
        np.testing.assert_allclose(out, np.stack(expected, 1), rtol=1e-5)

    def test_cin_shape(self):
        mod = CompressedInteractionNet((8, 4))
        out = mod.apply(_init(mod, self.x), self.x)
        assert out.shape == (2, 1)

    def test_cin_relu_variant_gates_negative_maps(self):
        """activation='relu' (recbole's per-layer CIN nonlinearity,
        `xdeepfm.py:152-161`) must change the output whenever a feature
        map goes negative, while identical params + identity activation
        reproduce the default path exactly."""
        mod_id = CompressedInteractionNet((8, 4))
        mod_relu = CompressedInteractionNet((8, 4), activation="relu")
        params = _init(mod_id, self.x)
        out_id = mod_id.apply(params, self.x)
        out_relu = mod_relu.apply(params, self.x)   # same param shapes
        assert np.isfinite(np.asarray(out_relu)).all()
        # gaussian inputs guarantee negative map entries, so the gate bites
        assert not np.allclose(np.asarray(out_id), np.asarray(out_relu))
        # and the default stays the identity-CIN (recbox/fuxictr) path
        out_default = CompressedInteractionNet((8, 4)).apply(params, self.x)
        np.testing.assert_allclose(np.asarray(out_id),
                                   np.asarray(out_default), rtol=1e-6)

    def test_senet_preserves_shape(self):
        mod = SENET()
        out = mod.apply(_init(mod, self.x), self.x)
        assert out.shape == self.x.shape

    @pytest.mark.parametrize("btype", ["field_all", "field_each", "field_interaction"])
    def test_bilinear_types(self, btype):
        mod = BilinearInteraction(btype)
        out = mod.apply(_init(mod, self.x), self.x)
        assert out.shape == (2, 6 * 8)

    def test_holographic_conv_matches_numpy(self):
        mod = HolographicInteraction("circular_convolution")
        out = mod.apply(_init(mod, self.x), self.x)
        xn = np.asarray(self.x)
        # first pair (0,1) circular convolution
        a, b = xn[:, 0], xn[:, 1]
        conv = np.real(np.fft.ifft(np.fft.fft(a) * np.fft.fft(b)))
        np.testing.assert_allclose(out[:, :8], conv, rtol=1e-4, atol=1e-5)

    def test_interaction_machine_orders(self):
        for order in (1, 2, 3, 4, 5):
            mod = InteractionMachine(order)
            out = mod.apply(_init(mod, self.x), self.x)
            assert out.shape == (2, 1)

    def test_autoint_layer(self):
        mod = InteractingLayer(att_dim=4, num_heads=2)
        out = mod.apply(_init(mod, self.x), self.x)
        assert out.shape == (2, 4, 8)


class TestAttention:
    def test_target_attention_masks(self):
        tgt = jnp.ones((2, 8))
        seq = jnp.asarray(np.random.normal(size=(2, 5, 8)).astype(np.float32))
        mask = jnp.array([[1, 1, 0, 0, 0], [1, 1, 1, 1, 1]], dtype=bool)
        mod = TargetAttention(hidden_units=(8,), activation="relu")
        out = mod.apply(_init(mod, tgt, seq, mask), tgt, seq, mask)
        assert out.shape == (2, 8)

    def test_transformer_causal_no_future_leak(self):
        # changing a future position must not affect earlier outputs
        x = jnp.asarray(np.random.normal(size=(1, 6, 16)).astype(np.float32))
        mod = TransformerEncoder(n_layers=1, n_heads=2, causal=True,
                                 hidden_dropout=0.0, attn_dropout=0.0)
        variables = _init(mod, x)
        out1 = mod.apply(variables, x)
        x2 = x.at[0, 5].set(99.0)
        out2 = mod.apply(variables, x2)
        np.testing.assert_allclose(out1[0, :5], out2[0, :5], atol=1e-5)
        assert not np.allclose(out1[0, 5], out2[0, 5])

    def test_capsule_and_multiinterest(self):
        hist = jnp.asarray(np.random.normal(size=(3, 10, 8)).astype(np.float32))
        mask = jnp.ones((3, 10), bool)
        for mod in (CapsuleNetwork(interest_num=4), MultiInterestSA(interest_num=4)):
            out = mod.apply(_init(mod, hist, mask), hist, mask)
            assert out.shape == (3, 4, 8)


class TestEmbedding:
    def _fm(self):
        return FeatureMap("d", (
            FeatureSpec("uid", "categorical", "user", vocab_size=10, embedding_dim=8),
            FeatureSpec("price", "numeric", "user", embedding_dim=8),
            FeatureSpec("hist", "sequence", "user", vocab_size=10, embedding_dim=8,
                        max_len=4, padding_idx=9, share_embedding="uid"),
        ))

    def test_shapes_and_sharing(self):
        fm = self._fm()
        mod = FeatureEmbedding(fm)
        batch = {
            "uid": jnp.array([1, 2]),
            "price": jnp.array([0.5, -1.0]),
            "hist": jnp.array([[9, 9, 1, 2], [1, 2, 3, 4]]),
        }
        variables = _init(mod, batch)
        # shared table: only one emb param (+1 numeric weight)
        names = list(variables["params"].keys())
        assert "emb_uid" in names and len([n for n in names if n.startswith("emb_")]) == 1
        out = mod.apply(variables, batch)
        assert out["uid"].shape == (2, 8)
        assert out["price"].shape == (2, 8)
        assert out["hist"].shape == (2, 8)  # mean-pooled

    def test_padding_rows_zeroed(self):
        fm = self._fm()
        mod = FeatureEmbedding(fm, sequence_pooling=False)
        batch = {"uid": jnp.array([0]), "price": jnp.array([1.0]),
                 "hist": jnp.array([[9, 9, 9, 1]])}
        variables = _init(mod, batch)
        out = mod.apply(variables, batch)
        np.testing.assert_allclose(out["hist"][0, :3], 0.0)

    def test_concat_stack(self):
        fm = self._fm()
        mod = FeatureEmbedding(fm)
        batch = {"uid": jnp.array([1]), "price": jnp.array([1.0]),
                 "hist": jnp.array([[1, 2, 3, 4]])}
        variables = _init(mod, batch)
        out = mod.apply(variables, batch)
        assert concat_embeddings(out, fm.input_features).shape == (1, 24)
        assert stack_embeddings(out, fm.input_features).shape == (1, 3, 8)


class TestMLPDice:
    def test_mlp_output_dim(self):
        mod = MLP((16, 8), output_dim=1, dropout=0.1, batch_norm=True)
        x = jnp.ones((4, 10))
        variables = _init(mod, x, train=False)
        out = mod.apply(variables, x, train=False)
        assert out.shape == (4, 1)

    def test_dice_stats_update(self):
        mod = Dice()
        x = jnp.asarray(np.random.normal(size=(8, 4)).astype(np.float32))
        variables = _init(mod, x, train=True)
        out, new_state = mod.apply(variables, x, train=True, mutable=["batch_stats"])
        assert out.shape == x.shape
        assert "batch_stats" in new_state

    def test_masked_pool(self):
        seq = jnp.ones((1, 3, 2))
        mask = jnp.array([[1, 1, 0]], dtype=bool)
        np.testing.assert_allclose(masked_pool(seq, mask, "sum")[0], [2.0, 2.0])
        np.testing.assert_allclose(masked_pool(seq, mask, "mean")[0], [1.0, 1.0])


def test_stack_embeddings_masked_mean_over_sequences():
    """Zero-masked pad steps must not dilute the pooled field vector."""
    import jax.numpy as jnp
    import numpy as np
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.nn.embedding import stack_embeddings

    fm = FeatureMap("se", (
        FeatureSpec("a", "categorical", vocab_size=5, embedding_dim=4),
        FeatureSpec("s", "sequence", vocab_size=5, embedding_dim=4,
                    max_len=4),), labels=())
    a = jnp.ones((2, 4))
    # 1 valid step out of 4 (pads are zero rows, as FeatureEmbedding emits)
    s = jnp.zeros((2, 4, 4)).at[:, 0, :].set(2.0)
    out = stack_embeddings({"a": a, "s": s}, fm.input_features)
    assert out.shape == (2, 2, 4)
    np.testing.assert_allclose(np.asarray(out[:, 1]), 2.0)  # not 2/4


def test_capsule_network_interests_diverge_and_mask_matters():
    """Zero-init routing logits left every MIND interest identical and the
    pad mask a softmax no-op — both must hold the fixed semantics."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from recbox_tpu.nn.attention import CapsuleNetwork

    rng = np.random.default_rng(0)
    hist = jnp.asarray(rng.normal(size=(2, 6, 8)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], bool)
    m = CapsuleNetwork(interest_num=4, routing_rounds=3)
    v = m.init(jax.random.PRNGKey(0), hist, mask)
    caps = m.apply(v, hist, mask)
    assert float(jnp.abs(caps[:, 0] - caps[:, 1]).max()) > 1e-4
    # changing a PADDED position must not move the output
    caps2 = m.apply(v, hist.at[0, 4].set(99.0), mask)
    assert float(jnp.abs(caps2[0] - caps[0]).max()) < 1e-6
    # changing a VALID position must
    caps3 = m.apply(v, hist.at[0, 1].set(99.0), mask)
    assert float(jnp.abs(caps3[0] - caps[0]).max()) > 1e-3


def test_field_model_emb_init_scheme(rng):
    """_FieldModel(emb_init_scheme='xavier_normal') must reach the tables
    (recbole-protocol parity knob; normal(1e-4) stays the default)."""
    import jax
    import numpy as np
    from flax import linen as nn
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import DeepFM
    fm = FeatureMap("init", (
        FeatureSpec("a", "categorical", vocab_size=100, embedding_dim=16),),
        labels=("y",))
    batch = {"a": np.array([1, 2], np.int32)}

    def table_std(scheme):
        m = DeepFM(feature_map=fm, embedding_dim=16, hidden_units=(8,),
                   emb_init_scheme=scheme)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, batch, train=False)
        p = nn.meta.unbox(v["params"])
        return float(np.std(np.asarray(p["embedding"]["emb_a"])))

    assert table_std("normal") < 5e-4
    assert table_std("xavier_normal") > 5e-3
