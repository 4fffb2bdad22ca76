"""Two-process jax.distributed simulation: checkpoint write discipline +
cross-host metric merge (VERDICT round-1 weak-point 7 / reference
semantics `third_party/recbole/trainer/trainer.py:294-295,630-652`).

Spawns two REAL processes (JAX_PLATFORMS=cpu) that rendezvous through a
local coordinator — the closest CPU-only analog of a 2-host TPU pod.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax
    from recbox_tpu.parallel.distributed import (
        initialize_distributed, merge_host_metrics, process_info)
    from recbox_tpu.training.checkpoint import load_checkpoint, save_checkpoint

    rank = int(sys.argv[1])
    initialize_distributed("127.0.0.1:{port}", num_processes=2,
                           process_id=rank)
    info = process_info()
    assert info["process_count"] == 2, info

    # 1. checkpoint: EVERY process calls save; only rank 0 may write.
    # DETERMINISTIC ordering: rank 1 saves FIRST and we assert no file
    # appears — a broken guard that lets both ranks write could otherwise
    # pass whenever rank 0's write happened to land last.
    state = {{"x": np.full(4, 7.0), "rank_of_writer": np.asarray(rank)}}
    path = {ckpt!r}
    from jax.experimental import multihost_utils
    if rank == 1:
        save_checkpoint(path, state)
    multihost_utils.sync_global_devices("rank1_tried")
    assert not os.path.exists(path), "rank 1 must not write checkpoints"
    if rank == 0:
        save_checkpoint(path, state)
    multihost_utils.sync_global_devices("ckpt_written")
    restored = load_checkpoint(path, {{"x": np.zeros(4),
                                      "rank_of_writer": np.asarray(9)}})
    assert int(restored["rank_of_writer"]) == 0, restored
    assert not os.path.exists(path + ".tmp")

    # 2. metric merge: weighted mean across hosts
    local = {{"AUC": 1.0}} if rank == 0 else {{"AUC": 0.0}}
    weight = 1.0 if rank == 0 else 3.0
    merged = merge_host_metrics(local, weight)
    assert abs(merged["AUC"] - 0.25) < 1e-9, merged

    # 3. Trainer.fit's eval path merges per-host shard metrics
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import LR
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import Trainer, TrainerConfig

    fm = FeatureMap("mh", (FeatureSpec("a", "categorical", vocab_size=8,
                                       embedding_dim=4),), labels=("y",))
    t = Trainer(LR(feature_map=fm),
                lambda o, b: binary_crossentropy(o, b["y"]),
                TrainerConfig(learning_rate=1e-2, monitor="AUC"))
    t.init({{"a": np.array([1, 2], np.int32),
            "y": np.array([1., 0.], np.float32)}})

    class ShardEval:
        def __call__(self, tr):
            self.last_sample_count = 2.0 if rank == 0 else 6.0
            return {{"AUC": 0.9 if rank == 0 else 0.5}}

    t.eval_fn = ShardEval()
    out = t._evaluate_and_checkpoint()
    expect = (0.9 * 2 + 0.5 * 6) / 8
    assert abs(out["AUC"] - expect) < 1e-6, out

    # 4. shard_batch assembles the GLOBAL batch from per-process locals:
    # 2 hosts x 4 local rows -> one 8-row global array holding BOTH
    # hosts' data (a plain device_put would treat each local batch as
    # the global value and drop half of every host's rows)
    from jax.sharding import Mesh
    from recbox_tpu.parallel.mesh import shard_batch
    mesh = Mesh(np.array(jax.devices()).reshape(2, 1), ("data", "model"))
    local = np.arange(4, dtype=np.float32) + (0.0 if rank == 0 else 10.0)
    global_arr = shard_batch({{"x": local}}, mesh)["x"]
    assert global_arr.shape == (8,), global_arr.shape
    total = float(jax.jit(lambda a: a.sum())(global_arr))
    assert abs(total - (6.0 + 46.0)) < 1e-6, total
    print("WORKER_OK", rank)
""")


def test_two_process_checkpoint_and_metric_merge(tmp_path):
    port = None
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _WORKER.format(repo=repo, port=port,
                            ckpt=str(tmp_path / "mh.ckpt"))
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "JAX_PLATFORM_NAME": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    procs = [subprocess.Popen([sys.executable, "-c", script, str(r)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for r in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out}"
        assert f"WORKER_OK {r}" in out
    # exactly one durable file, no stale tmp
    assert (tmp_path / "mh.ckpt").exists()
    assert not (tmp_path / "mh.ckpt.tmp").exists()
