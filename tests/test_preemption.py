"""Preemption-safe checkpointing: SIGTERM mid-fit saves durable state and
the re-exec'd process resumes from it (SURVEY §5.3 upgrade — the reference
has no failure/elastic story)."""

import os
import signal
import subprocess
import sys
import textwrap

import numpy as np

_WORKER = textwrap.dedent("""
    import os, signal, sys
    sys.path.insert(0, {repo!r})
    import numpy as np
    from recbox_tpu.data import ArrayLoader
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import LR
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import Trainer, TrainerConfig
    from recbox_tpu.utils.preemption import PreemptionGuard

    fm = FeatureMap("pg", (FeatureSpec("a", "categorical", vocab_size=32,
                                       embedding_dim=4),), labels=("y",))
    rng = np.random.default_rng(0)
    arrays = {{"a": rng.integers(1, 32, 4000).astype(np.int32),
              "y": (rng.random(4000) > 0.5).astype(np.float32)}}
    t = Trainer(LR(feature_map=fm),
                lambda o, b: binary_crossentropy(o, b["y"]),
                TrainerConfig(learning_rate=1e-2, epochs=50, monitor="AUC"))
    guard = PreemptionGuard(t, {ckpt!r}).install()

    class SelfPreempt:
        def __init__(self, inner):
            self.inner = inner
            self.steps = 0
        def __iter__(self):
            for b in self.inner:
                self.steps += 1
                if self.steps == 5:      # preempt mid-epoch
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b
        def peek_batch(self):
            return self.inner.peek_batch()

    t.fit(SelfPreempt(ArrayLoader(arrays, batch_size=64, drop_last=True)))
    print("SHOULD NOT REACH HERE")
""")

_RESUME = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import numpy as np
    from recbox_tpu.features import FeatureMap, FeatureSpec
    from recbox_tpu.models.ranking.ctr import LR
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.training import Trainer, TrainerConfig
    from recbox_tpu.utils.preemption import PreemptionGuard

    fm = FeatureMap("pg", (FeatureSpec("a", "categorical", vocab_size=32,
                                       embedding_dim=4),), labels=("y",))
    t = Trainer(LR(feature_map=fm),
                lambda o, b: binary_crossentropy(o, b["y"]),
                TrainerConfig(learning_rate=1e-2, monitor="AUC"))
    t.init({{"a": np.array([1, 2], np.int32),
            "y": np.array([1., 0.], np.float32)}})
    guard = PreemptionGuard(t, {ckpt!r})
    assert guard.has_checkpoint()
    assert guard.restore()
    # step counter restored to the preempted step (params/opt state are the
    # preempted ones; data-loader position intentionally is NOT trainer
    # state — the interrupted epoch replays from its first batch)
    assert t.step == 4, t.step
    print("RESUMED_OK", t.step)
""")


def test_sigterm_saves_and_resumes(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = str(tmp_path / "preempt.ckpt")
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "JAX_PLATFORM_NAME": "cpu"}
    p = subprocess.run(
        [sys.executable, "-c", _WORKER.format(repo=repo, ckpt=ckpt)],
        capture_output=True, text=True, env=env, timeout=300)
    assert p.returncode == 143, (p.returncode, p.stdout, p.stderr)
    assert "SHOULD NOT REACH HERE" not in p.stdout
    assert os.path.exists(ckpt)
    p2 = subprocess.run(
        [sys.executable, "-c", _RESUME.format(repo=repo, ckpt=ckpt)],
        capture_output=True, text=True, env=env, timeout=300)
    assert p2.returncode == 0, (p2.stdout, p2.stderr)
    assert "RESUMED_OK 4" in p2.stdout
