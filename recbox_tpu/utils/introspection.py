"""Model/environment introspection.

Replaces recbole's module-hook FLOP counter and environment table
(`third_party/recbole/utils/utils.py:250-377` get_flops, `:380-430`
get_environment; `quick_start.py:82-83` logs FLOPs at startup) with XLA's
own cost analysis — exact for the compiled program instead of a per-module
estimate, and free (no forward pass needed).
"""

from __future__ import annotations

import platform
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

__all__ = ["estimate_cost", "count_params", "get_environment",
           "get_device_memory"]


def estimate_cost(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Lower `fn(*args)` and return XLA's cost analysis: flops,
    bytes accessed, peak memory estimate (keys vary by backend; missing
    entries come back as 0.0)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    cost = lowered.compile().cost_analysis() or {}
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", 0.0)),
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
        "optimal_seconds": float(cost.get("optimal_seconds", 0.0)),
    }


def count_params(params: Any) -> int:
    """Total trainable parameter count of a flax params pytree."""
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)
                   if hasattr(x, "shape")))


def get_environment() -> Dict[str, str]:
    """Runtime environment table (recbole get_environment analog)."""
    devs = jax.devices()
    return {
        "python": platform.python_version(),
        "jax": jax.__version__,
        "backend": devs[0].platform if devs else "none",
        "num_devices": str(len(devs)),
        "device_kind": devs[0].device_kind if devs else "none",
        "host_count": str(jax.process_count()),
    }


def get_device_memory(device=None) -> Dict[str, float]:
    """Device memory stats in GiB (recbole get_gpu_usage analog); empty dict
    when the backend doesn't expose memory_stats (e.g. CPU)."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        return {}
    gib = 1024 ** 3
    out = {}
    for key, name in (("bytes_in_use", "in_use_gib"),
                      ("bytes_limit", "limit_gib"),
                      ("peak_bytes_in_use", "peak_gib")):
        if key in stats:
            out[name] = stats[key] / gib
    return out
