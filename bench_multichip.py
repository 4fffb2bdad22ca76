"""Mesh-parameterized training benchmark — ready for multi-chip hardware.

Same workload as bench.py (DeepFM at Criteo-regime shapes, packed trainer:
one row-gather + one row-scatter per step) jitted over a
Mesh(('data','model')) with the combined-grid table sharding
(`P(('data','model'), None)`) whose comm pattern is proven batch-scaled
(docs/ARCHITECTURE.md predicted-vs-counted table). The global batch scales
with the data axis (weak scaling — the production regime: R/Dd rows per
chip stays constant).

The sandbox has ONE real chip (multi-chip runs are hardware-blocked,
VERDICT round 2); this harness exists so the day a slice appears the
scaling-efficiency measurement is one command:

    python bench_multichip.py                      # all devices, model=2
    python bench_multichip.py --model-shards 4
    python bench_multichip.py --devices 4 --model-shards 1

Smoke mode (CPU, tiny shapes — correctness of the harness itself, NOT a
performance number; exercised by tools/roundcheck.py and the test suite):

    env PYTHONPATH= JAX_PLATFORMS=cpu python bench_multichip.py --smoke

Prints ONE JSON line: {"metric", "value", "unit", "mesh", "global_batch",
"per_chip_examples_per_sec", "scaling_efficiency_vs_bench"}; efficiency is
per-chip throughput over bench.py's single-chip last-healthy value (the
README ≥80% target).
"""

import argparse
import json
import sys
import time

FALLBACK_SINGLE_CHIP = 857_000.0   # round-2 healthy band midpoint


def _single_chip_baseline():
    """bench.py's last healthy on-chip value (bench_history.jsonl), falling
    back to the frozen round-2 midpoint when no history exists."""
    import bench
    last = bench._last_healthy()
    v = float(last.get("value", 0.0) or 0.0)
    return v if v > 0 else FALLBACK_SINGLE_CHIP


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="devices to use (default: all)")
    ap.add_argument("--model-shards", type=int, default=2)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU shapes; harness correctness only")
    args = ap.parse_args(argv)
    if args.model_shards < 1:
        ap.error("--model-shards must be >= 1")

    if args.smoke:
        import jax
        # must precede any backend initialization (devices() etc.)
        jax.config.update("jax_platform_name", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    import jax

    import bench
    from recbox_tpu.ops import binary_crossentropy
    from recbox_tpu.parallel import make_mesh
    from recbox_tpu.training import TrainerConfig
    from recbox_tpu.training.packed import PackedEmbeddingTrainer

    devices = jax.devices()
    n = args.devices or len(devices)
    devices = devices[:n]
    m = args.model_shards
    if n % m != 0:
        print(f"# --model-shards {m} does not divide {n} devices; "
              "falling back to model=1", file=sys.stderr)
        m = 1
    mesh = make_mesh(num_model_shards=m, devices=devices)
    n_data = n // m

    per_chip_batch = 64 if args.smoke else bench.BATCH_SIZE
    steps = 3 if args.smoke else args.steps
    batch_size = per_chip_batch * n_data       # weak scaling over 'data'
    model, batch = bench.criteo_workload(batch_size, smoke=args.smoke)
    cfg = TrainerConfig(learning_rate=1e-3, grad_clip_norm=10.0, epochs=1,
                        monitor="AUC")
    trainer = PackedEmbeddingTrainer(
        model, lambda o, b: binary_crossentropy(o, b["click"]), cfg,
        mesh=mesh)

    losses = trainer.train_steps_repeat(batch, steps)   # compile + warmup
    _ = float(losses[-1])
    best = float("inf")
    for _ in range(3 if args.smoke else 5):
        t0 = time.perf_counter()
        losses = trainer.train_steps_repeat(batch, steps)
        _ = float(losses[-1])                           # honest host sync
        best = min(best, time.perf_counter() - t0)

    examples_per_sec = steps * batch_size / best
    per_chip = examples_per_sec / n
    baseline = _single_chip_baseline()
    print(json.dumps({
        "metric": "deepfm_criteo_train_throughput_multichip",
        "value": round(examples_per_sec, 1),
        "unit": "examples/s",
        "mesh": {"data": n_data, "model": m, "devices": n},
        "global_batch": batch_size,
        "per_chip_examples_per_sec": round(per_chip, 1),
        "single_chip_baseline": baseline,
        "scaling_efficiency_vs_bench": round(per_chip / baseline, 4),
        "smoke": bool(args.smoke),
    }))


if __name__ == "__main__":
    sys.exit(main())
