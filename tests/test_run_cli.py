"""python -m recbox_tpu.run — the run-one-expid CLI (autotuner worker
command, `recbox/ranking/autotuner.py:123-145`)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from recbox_tpu.features import FeatureMap, FeatureSpec
from recbox_tpu.run import run_expid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def expdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("runcli")
    data_dir = root / "data"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    vocab, n = 24, 1200
    a = rng.integers(1, vocab, n).astype(np.int32)
    b = rng.integers(1, vocab, n).astype(np.int32)
    y = (((a % 2) == 1) ^ ((b % 2) == 1)).astype(np.float32)
    fm = FeatureMap("runcli_ds", (
        FeatureSpec("a", "categorical", vocab_size=vocab, embedding_dim=8),
        FeatureSpec("b", "categorical", vocab_size=vocab, embedding_dim=8),
    ), labels=("click",))
    fm.save(str(data_dir / "feature_map.json"))
    split = int(0.8 * n)
    np.savez(data_dir / "train.npz", a=a[:split], b=b[:split],
             click=y[:split])
    np.savez(data_dir / "valid.npz", a=a[split:], b=b[split:],
             click=y[split:])
    cfg_dir = root / "configs"
    cfg_dir.mkdir()
    (cfg_dir / "model_config.yaml").write_text(f"""
Base:
    dataset_id: runcli_ds
    metrics: [AUC, logloss]
    monitor: AUC
    epochs: 12
    batch_size: 256
    learning_rate: 0.01
    patience: 12
    lr_decay_factor: 1.0

DCN_test:
    model: DCN
    embedding_dim: 8
    hidden_units: [16]

MIND_wrong_stage:
    model: MIND
""")
    (cfg_dir / "dataset_config.yaml").write_text(f"""
runcli_ds:
    data_dir: {data_dir}
    workdir: {root / "wd"}
""")
    return cfg_dir


def test_run_expid_trains_and_reports(expdir):
    result = run_expid(str(expdir), "DCN_test")
    assert result["model"] == "DCN"
    assert result["experiment_id"] == "DCN_test"
    # XOR planted signal: chance is 0.5 — the bar must sit clearly above
    # it or an untrained/constant model would pass (3 epochs reach ~0.9+)
    assert 0.7 < result["AUC"] <= 1.0, result


def test_run_expid_override_beats_config(expdir):
    # override the metric list: logloss only appears if the override lands
    result = run_expid(str(expdir), "DCN_test",
                       overrides={"epochs": 1, "metrics": ["AUC", "logloss"]})
    assert "logloss" in result, result


def test_cli_flag_override_lands(expdir):
    """--key=value flags on the CLI argv must reach the config (typed), and
    must NOT come from the host process's sys.argv."""
    from recbox_tpu.run import main
    old = sys.argv
    sys.argv = ["pytest", "--epochs=99"]  # would crash/slow if leaked in
    try:
        result = main([f"--config={expdir}", "--expid=DCN_test",
                       "--epochs=1", "--metrics=['AUC','logloss']"])
    finally:
        sys.argv = old
    assert "logloss" in result, result


def test_run_expid_wrong_stage_raises(expdir):
    with pytest.raises(NotImplementedError, match="matching"):
        run_expid(str(expdir), "MIND_wrong_stage")


def test_cli_subprocess_prints_json(expdir):
    # PYTHONPATH breaks axon TPU-plugin discovery, so the subprocess must
    # also pin JAX_PLATFORMS=cpu or backend selection aborts
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "recbox_tpu.run", f"--config={expdir}",
         "--expid=DCN_test", "--epochs=1"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    assert result["model"] == "DCN" and "AUC" in result


def test_cli_usage_error(expdir):
    # PYTHONPATH breaks axon TPU-plugin discovery, so the subprocess must
    # also pin JAX_PLATFORMS=cpu or backend selection aborts
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "recbox_tpu.run", "--expid=DCN_test"],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO)
    assert out.returncode == 2 and "usage" in out.stderr


def test_autotuner_launches_module_runner(expdir):
    """grid_search_subprocess(script="-m recbox_tpu.run") must shlex-split
    the module invocation and actually run the expid (results.jsonl row)."""
    import yaml
    from recbox_tpu.config.autotuner import grid_search_subprocess
    wd = yaml.safe_load(
        (expdir / "dataset_config.yaml").read_text())["runcli_ds"]["workdir"]
    res = os.path.join(wd, "results.jsonl")
    before = sum(1 for _ in open(res)) if os.path.exists(res) else 0
    env_backup = {k: os.environ.get(k) for k in
                  ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "PYTHONPATH")}
    os.environ.update(JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
                      PYTHONPATH=REPO)
    try:
        grid_search_subprocess(["DCN_test"], script="-m recbox_tpu.run",
                               config_dir=str(expdir), devices=("0",),
                               env_var="RUNCLI_TEST_DEV", poll_seconds=0.5)
    finally:
        for k, v in env_backup.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    after = sum(1 for _ in open(res))
    assert after == before + 1, (before, after)
