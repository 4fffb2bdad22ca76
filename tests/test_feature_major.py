"""DeepFM feature-major compute path: exact reformulation, not a variant.

`DeepFM(feature_major_compute=True)` keeps activations (F, B, D) end to
end (contiguous concat of the packed gather's per-feature row blocks,
instead of the (B, F, D) interleave) and computes FM + the first DNN layer
as feature-axis contractions. This must be NUMERICALLY IDENTICAL to the
standard path under a parameter transplant — it is a layout change aimed
at the ~6 ms/step slice/concat machinery (bench.py), not a model change.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.models.ranking.ctr import DeepFM


def _setup(num_cat=5, num_num=2, vocab=50, dim=8, batch=16,
           hidden=(32, 16)):
    feats = tuple(
        FeatureSpec(f"c{i}", "categorical", vocab_size=vocab,
                    embedding_dim=dim) for i in range(num_cat)
    ) + tuple(
        FeatureSpec(f"n{i}", "numeric", embedding_dim=dim)
        for i in range(num_num))
    fm = FeatureMap("fmaj", feats, labels=("click",))
    rng = np.random.default_rng(0)
    b = {f"c{i}": jnp.asarray(rng.integers(0, vocab, batch).astype(np.int32))
         for i in range(num_cat)}
    b.update({f"n{i}": jnp.asarray(rng.normal(size=batch).astype(np.float32))
              for i in range(num_num)})
    std = DeepFM(feature_map=fm, embedding_dim=dim, hidden_units=hidden)
    maj = DeepFM(feature_map=fm, embedding_dim=dim, hidden_units=hidden,
                 feature_major_compute=True)
    return fm, b, std, maj, num_cat + num_num, dim


def _transplant(std_params, num_cat, dim, hidden):
    """Map the standard param tree onto the feature-major one."""
    h0 = hidden[0]
    dnn = std_params["dnn"]
    out = {
        "linear": std_params["linear"],
        "embedding": std_params["embedding"],
        "lr_bias": std_params["lr"]["bias"],
        "dnn_w1": dnn["Dense_0"]["kernel"].reshape(num_cat, dim, h0),
        "dnn_b1": dnn["Dense_0"]["bias"],
        "dnn_rest": {f"Dense_{i}": dnn[f"Dense_{i + 1}"]
                     for i in range(len(hidden))},
    }
    return out


def test_feature_major_forward_identical():
    fm, b, std, maj, F, D = _setup()
    hidden = (32, 16)
    variables = std.init({"params": jax.random.PRNGKey(0)}, b)
    std_params = nn.meta.unbox(variables["params"])
    maj_params = _transplant(std_params, F, D, hidden)
    out_std = np.asarray(std.apply({"params": std_params}, b))
    out_maj = np.asarray(maj.apply({"params": maj_params}, b))
    np.testing.assert_allclose(out_maj, out_std, rtol=2e-5, atol=2e-5)


def test_feature_major_gradients_identical():
    """Row-gradient equivalence: what the packed trainer scatters back must
    be the same under either layout (the backward half of the machinery)."""
    fm, b, std, maj, F, D = _setup()
    hidden = (32, 16)
    variables = std.init({"params": jax.random.PRNGKey(0)}, b)
    std_params = nn.meta.unbox(variables["params"])
    maj_params = _transplant(std_params, F, D, hidden)

    def loss(model, params):
        return jnp.sum(jnp.square(model.apply({"params": params}, b)))

    g_std = jax.grad(lambda p: loss(std, p))(std_params)
    g_maj = jax.grad(lambda p: loss(maj, p))(maj_params)
    for table in ("embedding", "linear"):
        for k in g_std[table]:
            np.testing.assert_allclose(
                np.asarray(g_maj[table][k]), np.asarray(g_std[table][k]),
                rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(g_maj["dnn_w1"]).reshape(F * D, hidden[0]),
        np.asarray(g_std["dnn"]["Dense_0"]["kernel"]), rtol=2e-4, atol=2e-4)


def test_feature_major_trains_under_packed_trainer():
    """The flagged path must ride the PackedEmbeddingTrainer fast path
    (rows-dict protocol) unchanged and learn the XOR signal."""
    from recbox_tpu.data import ArrayLoader
    from recbox_tpu.evaluation import CTREvaluator
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import TrainerConfig
    from recbox_tpu.training.packed import PackedEmbeddingTrainer
    from tests.test_ranking_e2e import make_ctr_data

    rng = np.random.default_rng(3)
    fm, arrays = make_ctr_data(rng, n=4000)
    split = int(0.8 * len(arrays["click"]))
    train = {k: v[:split] for k, v in arrays.items()}
    valid = {k: v[split:] for k, v in arrays.items()}
    model = DeepFM(feature_map=fm, embedding_dim=8, hidden_units=(32, 16),
                   feature_major_compute=True)
    cfg = TrainerConfig(learning_rate=1e-2, epochs=6, patience=8,
                        monitor="AUC", lr_decay_factor=1.0,
                        reload_best_on_plateau=False)
    ev = CTREvaluator(valid, label="click", metrics=["AUC"])
    tr = PackedEmbeddingTrainer(
        model, lambda o, bb: binary_crossentropy(o, bb["click"]), cfg,
        eval_fn=ev)
    metrics = tr.fit(ArrayLoader(train, batch_size=256, drop_last=True,
                                 seed=0))
    assert metrics["AUC"] > 0.8, metrics
