"""Per-metric evaluator equivalence vs the runnable reference evaluator.

Runs tools/parity_eval_metrics.py in a SUBPROCESS: the harness executes
the vendored recbole Collector+Evaluator in place from /root/reference
(`third_party/recbole/evaluator/{collector,evaluator,metrics}.py`) with
stubbed optional deps, and that stub machinery (fake colorlog/wandb/
hyperopt modules, numpy alias patches, reference sys.path) must never
leak into the suite's interpreter — other tests exercise the real
gated-import paths.

Asserts all 16 reference metric classes match our engines exactly
(<=1e-8) or via the named divergences documented in the harness
docstring. This decouples evaluation parity from training parity —
whole-model head-to-heads (docs/QUALITY_PARITY.md) confound the two.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS = os.path.join(REPO, "tools", "parity_eval_metrics.py")


def test_std_gauc_hand_computed():
    """recbole-semantics GAUC on a hand-checked 3-user case: user 0 is
    degenerate (all rankable items positive -> excluded), user 1 ranks
    its positive top (AUC 1), user 2 ranks its positive at the bottom of
    3 rankable (AUC 0); weights = positive counts (1 each)."""
    import numpy as np

    from recbox_tpu.evaluation import std_gauc

    inf = np.inf
    scores = np.array([
        [3.0, 2.0, -inf, -inf],   # rankable: {0, 1}, both positive
        [5.0, 1.0, 0.5, -inf],    # positive item 0 ranked first
        [0.1, 4.0, 2.0, -inf],    # positive item 0 ranked last of 3
    ])
    pos = np.array([
        [1, 1, 0, 0],
        [1, 0, 0, 0],
        [1, 0, 0, 0],
    ])
    assert std_gauc(scores, pos) == pytest.approx(0.5)
    # tie handling: positive tied with one negative -> AUC 0.5 for that
    # user; combined with user 1's AUC 1 at equal weights -> 0.75
    scores_tie = np.array([
        [5.0, 1.0, 0.5, -inf],
        [2.0, 2.0, -inf, -inf],
    ])
    pos_tie = np.array([[1, 0, 0, 0], [1, 0, 0, 0]])
    assert std_gauc(scores_tie, pos_tie) == pytest.approx(0.75)


@pytest.mark.skipif(not os.path.isdir("/root/reference/recbox"),
                    reason="reference checkout not present")
def test_all_16_metric_classes_match_reference():
    proc = subprocess.run(
        [sys.executable, HARNESS], capture_output=True, text=True,
        timeout=420, cwd=REPO,
        env={**os.environ, "PYTHONPATH": "", "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "0 mismatches" in proc.stdout, proc.stdout
    # every class appears in the table (spot-guard against the harness
    # silently dropping a scenario)
    for token in ("Hit@5", "MRR@10", "MAP@5", "Recall@10", "NDCG@5",
                  "Precision@10", "GAUC", "ItemCoverage@10",
                  "AveragePopularity@5", "ShannonEntropy@10",
                  "GiniIndex@5", "TailPercentage@10", "AUC", "MAE",
                  "RMSE", "LogLoss"):
        assert token in proc.stdout, f"missing {token}"
