"""Tracing / profiling helpers (SURVEY §5 tracing row).

The reference's only instrumentation is wall-clock + CUDA peak memory
(reference benchmark_utils.py:23-37). TPU equivalents:

  * ``trace(dir)`` — jax.profiler trace context; view with TensorBoard or
    xprof to see per-op device timelines and HBM traffic.
  * ``cost_analysis(fn, *args)`` — XLA's compiled cost model (flops, bytes
    accessed) for a jitted callable, the static side of roofline analysis.
  * ``roofline(fn, *args)`` — measured time vs XLA's byte estimate ->
    achieved GB/s to compare against the chip's HBM bandwidth.
"""

import contextlib
from typing import Any, Dict, Optional

import jax

from .harness import benchmark_chained

# v5e HBM bandwidth, GB/s (public spec: ~819 GB/s per chip)
V5E_HBM_GBPS = 819.0


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (TPU equivalent of torch.cuda timing)."""
    with jax.profiler.trace(log_dir):
        yield


def cost_analysis(fn, *args, **kwargs) -> Optional[Dict[str, Any]]:
    """flops / bytes accessed from XLA's compiled cost model."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    costs = compiled.cost_analysis()
    if not costs:
        return None
    if isinstance(costs, (list, tuple)):
        costs = costs[0]
    return dict(costs)


def roofline(fn, *args, num_iterations: int = 8) -> Dict[str, float]:
    """Measured achieved GB/s and flops/s for a jitted op, vs v5e peaks."""
    costs = cost_analysis(fn, *args) or {}
    t = benchmark_chained(fn, *args, num_iterations=num_iterations)
    bytes_accessed = float(costs.get("bytes accessed", 0.0))
    flops = float(costs.get("flops", 0.0))
    out = {
        "time_s": t.mean,
        "bytes_accessed": bytes_accessed,
        "flops": flops,
        "achieved_gbps": bytes_accessed / t.mean / 1e9 if t.mean else 0.0,
        "achieved_gflops": flops / t.mean / 1e9 if t.mean else 0.0,
    }
    out["hbm_fraction"] = out["achieved_gbps"] / V5E_HBM_GBPS
    return out
