"""Test config: force an 8-device virtual CPU mesh.

This is the multi-host "fake backend" the reference lacks (SURVEY §4):
sharding/collective tests run over 8 virtual CPU devices.

Note: a pytest plugin imports jax before this conftest runs, so env-var
routes (XLA_FLAGS / JAX_PLATFORM_NAME) are unreliable here; the runtime
config below works because jax initializes backends lazily.
"""

import os

import jax
import numpy as np
import pytest

jax.config.update("jax_platform_name", "cpu")     # not the axon TPU
jax.config.update("jax_num_cpu_devices", 8)       # virtual multi-chip mesh

# this sandbox's XLA:CPU compiles are slow (~1.5s per new shape); persist
# compiled executables so repeat test runs are fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# --- suite tiering (round 5, VERDICT weak #4) -------------------------------
# The full suite passed the single-sitting threshold (~12 min serial); a
# suite that good rots the first time someone skips it. Tiering:
#   quick tier:  pytest -m "not slow"   (< 5 min: schema/metrics/losses/
#                kernels/plumbing units + one e2e representative per stage)
#   full suite:  pytest tests/          (the pre-commit / round gate;
#                tools/roundcheck.py --full-tests)
# Classification is file-granular (training-loop files are slow) with
# named per-stage representatives kept in the quick tier so every stage
# still trains end to end there.

SLOW_FILES = {
    # planted-structure mechanism/training batches
    *(f"test_mechanisms_batch{i}.py" for i in range(4, 23)),
    "test_learns_signal.py", "test_gap_models.py",
    "test_general_recommenders.py", "test_graph.py",
    "test_graph_extended.py", "test_knowledge.py", "test_matching_e2e.py",
    "test_matching_zoo.py", "test_model_fixes.py", "test_multihost.py",
    "test_multitask.py", "test_packed_training.py",
    "test_pretrain_schedule.py", "test_preemption.py",
    "test_ranking_e2e.py", "test_ranking_fixes.py",
    "test_recvae_composite.py", "test_reranking.py", "test_rl_rerank.py",
    "test_run_cli.py", "test_run_experiment.py", "test_sequence_ctr.py",
    "test_sequential.py", "test_sequential_extended.py",
    "test_sparse_training.py", "test_ctr_extended.py",
    "test_cascade.py", "test_cascade_api.py",
    "test_evaluator_equivalence.py", "test_native_fixes.py",
    "test_parallel.py", "test_pallas_kernels.py", "test_trainer_fixes.py",
    "test_aux_subsystems.py", "test_eval_fixes.py", "test_infra_fixes.py",
    "test_shards.py", "test_feature_major.py",
}

# one end-to-end representative per stage stays in the quick tier
QUICK_KEEP = {
    "test_ranking_e2e.py::test_deepfm_learns_interaction",      # ranking
    "test_matching_e2e.py::test_mf_bpr_learns",                 # matching
    "test_sequential.py::test_sasrec_learns_markov[float32]",   # sequential
    "test_sequential.py::test_sasrec_learns_markov[bfloat16]",  # + the bench
    # configuration (bf16 encoder/logits) trains end to end in the quick tier
    "test_reranking.py::test_reranker_learns[PRM-kwargs0]",     # reranking
    "test_multitask.py::test_mmoe_learns",                      # multitask
    "test_knowledge.py::TestTranslationModels::"
    "test_cke_learns_blocks_and_kg_loss",                       # knowledge
    "test_parallel.py::test_sharded_step_matches_unsharded",    # multichip
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: training-loop / e2e tests excluded from the quick tier "
        "(pytest -m 'not slow'); the full suite remains the round gate")


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    for item in items:
        fname = os.path.basename(str(item.fspath))
        short_id = f"{fname}::{item.nodeid.split('::', 1)[1]}" \
            if "::" in item.nodeid else fname
        if fname in SLOW_FILES and short_id not in QUICK_KEEP:
            item.add_marker(slow)
