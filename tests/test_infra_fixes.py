"""Regression tests for the round-2 features/ops/config/parallel review
findings: share-vocab ordering, share-target validation, non-ASCII hash
buckets, tokenizer flag persistence, the reference 1/p regularizer
factor, dataset-config precedence, tuner expid collisions, and async-HLO
byte parsing. (The multi-host shard_batch global-assembly fix is covered
in tests/test_multihost.py.)
"""

import numpy as np
import pytest

from recbox_tpu.features import FeatureEncoder, Tokenizer


def test_sequence_share_sees_later_categorical_merges():
    """A SEQUENCE share column must snapshot the base vocab AFTER every
    categorical share has merged into it, regardless of declaration
    order — otherwise merged tokens encode to OOV in the sequence column
    and its PAD id aliases a live shared-table row."""
    import pandas as pd
    df = pd.DataFrame({
        "item_id": ["a", "b", "c", "a"],
        "hist": ["a^b", "b^c", "c^a", "a^b"],
        "clicked": ["d", "e", "a", "b"],       # d, e extend the vocab
        "y": [1.0, 0.0, 1.0, 0.0],
    })
    # adversarial order: the sequence share is declared BEFORE the
    # categorical share that grows the vocabulary
    enc = FeatureEncoder([
        {"name": "item_id", "type": "categorical", "embedding_dim": 8},
        {"name": "hist", "type": "sequence", "share_embedding": "item_id",
         "max_len": 3, "embedding_dim": 8},
        {"name": "clicked", "type": "categorical",
         "share_embedding": "item_id", "embedding_dim": 8},
    ], label_cols=("y",))
    enc.fit(df)
    base = enc.tokenizers["item_id"]
    hist_tok = enc.tokenizers["hist"]
    # d/e merged into the base AND visible to the sequence column
    assert base.vocab.get("d") and base.vocab.get("e")
    assert hist_tok.vocab.get("d") == base.vocab["d"]
    # PAD sits beyond the FINAL vocab — no aliasing with a live row
    assert hist_tok.vocab[Tokenizer.PAD] == base.vocab_size
    spec = enc.feature_map["hist"]
    assert spec.padding_idx == base.vocab_size


def test_share_embedding_rejects_bucketized_target():
    import pandas as pd
    df = pd.DataFrame({"price": [1.0, 2.0, 3.0],
                       "price2": ["a", "b", "c"], "y": [1.0, 0.0, 1.0]})
    enc = FeatureEncoder([
        {"name": "price", "type": "categorical",
         "category_encoder": "quantile_bucket", "num_buckets": 2},
        {"name": "price2", "type": "categorical",
         "share_embedding": "price"},
    ], label_cols=("y",))
    with pytest.raises(ValueError, match="token vocabulary"):
        enc.fit(df)


def test_hash_bucket_handles_non_ascii():
    import pandas as pd
    df = pd.DataFrame({"city": ["münchen", "café", "nyc", "東京"],
                       "y": [1.0, 0.0, 1.0, 0.0]})
    enc = FeatureEncoder([
        {"name": "city", "type": "categorical",
         "category_encoder": "hash_bucket", "num_buckets": 8},
    ], label_cols=("y",))
    enc.fit(df)
    out = enc.transform(df)
    assert out["city"].shape == (4,)
    # deterministic: same inputs hash identically
    out2 = enc.transform(df)
    np.testing.assert_array_equal(out["city"], out2["city"])


def test_tokenizer_state_persists_lower_and_na_value():
    tok = Tokenizer(lower=True, na_value="?")
    tok.fit(np.array(["Apple", "apple", "Pear"]), use_padding=False)
    restored = Tokenizer.from_state(tok.state())
    np.testing.assert_array_equal(
        restored.encode_category(np.array(["APPLE", "Pear"])),
        tok.encode_category(np.array(["APPLE", "Pear"])))
    assert restored.lower is True and restored.na_value == "?"
    # case-folding actually resolves after reload
    assert restored.encode_category(np.array(["Apple"]))[0] != 0


def test_embedding_reg_loss_has_reference_1_over_p():
    import jax.numpy as jnp
    from recbox_tpu.ops.losses import embedding_reg_loss
    params = {"emb_x": jnp.asarray([[2.0, 0.0]])}
    # (1/2)·||W||_2^2 = 0.5·4 = 2.0 (match_model.py:84-89)
    assert float(embedding_reg_loss(params, p=2)) == pytest.approx(2.0)
    assert float(embedding_reg_loss(params, p=1)) == pytest.approx(2.0)


def test_dataset_config_overrides_model_base(tmp_path):
    import yaml
    from recbox_tpu.config import load_config
    model_yaml = tmp_path / "model_config.yaml"
    model_yaml.write_text(yaml.safe_dump({
        "Base": {"min_categr_count": 1, "batch_size": 64},
        "exp1": {"model": "DeepFM", "dataset_id": "criteo"},
    }))
    ds_yaml = tmp_path / "dataset_config.yaml"
    ds_yaml.write_text(yaml.safe_dump({
        "criteo": {"min_categr_count": 10, "data_root": "/x"},
    }))
    cfg = load_config(str(tmp_path), "exp1", cli=False)
    # reference precedence (ranking/utils.py:27-31): dataset section WINS
    assert cfg["min_categr_count"] == 10
    assert cfg["batch_size"] == 64 and cfg["data_root"] == "/x"


def test_tuner_expids_never_collide(tmp_path, monkeypatch):
    from recbox_tpu.config import autotuner, config as config_mod
    monkeypatch.setattr(config_mod, "hash_expid", lambda p, b: "deadbeef")
    out = autotuner.save_tuner_configs(
        {"tuner_space": {"lr": [0.1, 0.2, 0.3]}}, str(tmp_path))
    assert len(out) == 3 and len(set(out)) == 3


def test_async_collective_start_counts_result_only():
    from recbox_tpu.parallel.inspect import parse_collectives
    hlo = ("%ag = (f32[2,16]{1,0}, f32[8,16]{1,0}) "
           "all-gather-start(f32[2,16]{1,0} %p), dimensions={0}")
    ops = parse_collectives(hlo)
    assert len(ops) == 1
    assert ops[0].bytes == 8 * 16 * 4          # the result, not input+output
    # sync form of the same op reports the same number
    hlo2 = "%ag2 = f32[8,16]{1,0} all-gather(f32[2,16]{1,0} %p), dimensions={0}"
    assert parse_collectives(hlo2)[0].bytes == 8 * 16 * 4
    # trailing u32[] context scratch members must not become the "result"
    hlo3 = ("%cp = (f32[4,16]{1,0}, f32[4,16]{1,0}, u32[], u32[]) "
            "collective-permute-start(f32[4,16]{1,0} %p)")
    assert parse_collectives(hlo3)[0].bytes == 4 * 16 * 4


def test_pallas_topk_rejects_oversized_k():
    import jax.numpy as jnp
    from recbox_tpu.ops.pallas.mips_topk import pallas_mips_topk
    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.normal(size=(4096, 128)), jnp.float32)
    queries = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
    with pytest.raises(ValueError, match="candidates"):
        pallas_mips_topk(queries, corpus, 500, interpret=True)
