"""Benchmark & measurement harness — TPU equivalent of the reference's
benchmark_utils (reference fft_conv_pytorch/benchmark_utils.py:12-63).

Reference -> TPU mapping (SURVEY §5 tracing/profiling):
  torch.cuda.synchronize()            -> jax.block_until_ready fencing
  torch.cuda.memory_stats peak bytes  -> jax Device.memory_stats()
  warm-up-dropping benchmark()        -> same protocol, plus a
                                         chained-perturbation timing mode that
                                         defeats async-dispatch/caching
                                         artifacts observed through the TPU
                                         tunnel (naive block_until_ready loops
                                         report impossible sub-ms times).
"""

import gc
import time
from contextlib import contextmanager
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Benchmark(NamedTuple):
    mean: float
    std: float

    def __repr__(self):
        return f"BenchmarkResult(mean: {self.mean:.3e}, std: {self.std:.3e})"

    def __str__(self):
        return f"({self.mean:.3e} ± {self.std:.3e}) s"


def _device_peak_bytes() -> float:
    """Peak device memory in GiB, 0.0 where the backend has no stats (CPU)."""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            return stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / 2**30
    except Exception:
        pass
    return 0.0


def hlo_peak_gib(fn: Callable, *args, **kwargs) -> float:
    """Peak memory of one ``fn(*args)`` call from compiled-HLO analysis.

    The reference reads the CUDA allocator's peak
    (reference benchmark_utils.py:23-37); through the axon TPU tunnel
    ``memory_stats()`` is empty, so this measures the XLA-reported footprint
    of the compiled executable instead: arguments + outputs + temp (live
    intermediate) buffers — the deterministic equivalent of peak allocated
    bytes for a single dispatch. Returns GiB, 0.0 when analysis is
    unavailable.
    """
    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        m = compiled.memory_analysis()
        if m is None:
            return 0.0
        total = (
            getattr(m, "argument_size_in_bytes", 0)
            + getattr(m, "output_size_in_bytes", 0)
            + getattr(m, "temp_size_in_bytes", 0)
        )
        return float(total) / 2**30
    except Exception:
        return 0.0


def peak_memory_gib(fn: Callable, *args, **kwargs) -> Tuple[float, str]:
    """(peak GiB, source): device allocator stats when available, else the
    compiled-HLO footprint of ``fn``."""
    dev = _device_peak_bytes()
    if dev > 0.0:
        return dev, "device_stats"
    return hlo_peak_gib(fn, *args, **kwargs), "hlo_analysis"


@contextmanager
def measure():
    """Times a block with device fencing; records wall time + peak GiB.

    Reference measure() (benchmark_utils.py:23-37) with CUDA sync/memory
    swapped for JAX equivalents.
    """
    gc.collect()
    jax.effects_barrier()
    result = dict()
    begin = time.perf_counter()
    try:
        yield result
    finally:
        jax.effects_barrier()
    result["time"] = time.perf_counter() - begin
    result["memory"] = _device_peak_bytes()


def benchmark(
    fn: Callable, *args, num_iterations: int = 10, **kwargs
) -> Tuple[Benchmark, Benchmark]:
    """Runs ``fn`` N times, drops iteration 0 as warm-up (compile), returns
    (time, memory) Benchmarks. Reference benchmark_utils.py:39-50.

    ``fn`` must block on its own result (or return a jax.Array, which we
    block on here).
    """
    times, memory = [], []
    for _ in range(num_iterations):
        with measure() as r:
            out = fn(*args, **kwargs)
            if out is not None:
                jax.block_until_ready(out)
        times.append(r.get("time"))
        memory.append(r.get("memory"))
    return (
        Benchmark(np.mean(times[1:]).item(), np.std(times[1:]).item()),
        Benchmark(np.mean(memory[1:]).item(), np.std(memory[1:]).item()),
    )


def benchmark_chained(
    fn: Callable,
    signal: jax.Array,
    *rest,
    num_iterations: int = 16,
    **kwargs,
) -> Benchmark:
    """Trustworthy steady-state timing for jitted ops.

    Perturbs the first argument each iteration with a value derived from the
    previous output, so no two dispatches are identical and the device must
    serialize real work — naive identical-input loops through the TPU tunnel
    report ~1000x-too-fast times (measured this session). The perturbation
    (one scalar multiply-add on the input) is negligible next to the FFT
    pipeline being timed.
    """
    out = fn(signal, *rest, **kwargs)
    jax.block_until_ready(out)  # warm-up / compile
    times = []
    eps = jnp.asarray(1e-7, signal.dtype)
    for i in range(num_iterations):
        # data-dependent, value-varying input: defeats any result caching
        sig_i = signal + eps * (i + 1) + jnp.real(out).ravel()[0] * 0
        jax.block_until_ready(sig_i)
        t0 = time.perf_counter()
        out = fn(sig_i, *rest, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return Benchmark(np.mean(times).item(), np.std(times).item())


def benchmark_fori(
    fn: Callable,
    signal: jax.Array,
    *rest,
    num_iterations: int = 20,
    min_work_s: float = 0.0,
    **kwargs,
) -> Benchmark:
    """Device-side loop timing: the only trustworthy mode through the TPU
    tunnel.

    Through the axon tunnel, ``block_until_ready`` returns before XLA ops
    actually execute (measured: "0.044 ms" for a 57-GFLOP conv — 1300
    TFLOP/s on a ~200 TFLOP/s chip), so host-side per-dispatch timing is
    meaningless. Here ``num_iterations`` calls run inside ONE jitted
    ``lax.fori_loop`` whose carry makes iteration i+1's input depend on
    iteration i's output (perturbed by out[0]*1e-30 — numerically
    negligible, but a true dependency XLA cannot elide), and we time the
    single dispatch end-to-end by fetching the scalar result to host.

    The dispatch + host-fetch round trip itself costs ~25 ms through the
    tunnel — an additive constant that would swamp ms-scale ops. We
    therefore time loops of N and 2N iterations and report
    (t(2N) - t(N)) / N: the fixed cost cancels exactly.
    """
    import jax.numpy as _jnp
    from jax import lax as _lax

    # The trip count is a TRACED argument: one compile covers the N and 2N
    # loops AND any adaptive re-measure below (a static count would compile
    # the full pipeline once per loop variant — fused-kernel pipelines take
    # 10-15 s each, and bench.py times ~20 (path, config) pairs).
    def loop(iters, x, *r):
        def body(_, carry):
            x, acc = carry
            out = fn(x, *r, **kwargs)
            # consume EVERY output element: reading just out[0] lets XLA
            # partially evaluate sliceable ops (a bare matmul timed as
            # ~0 ms that way — measured); a full reduction cannot be
            # sliced through.
            s = _jnp.sum(_jnp.real(out)) * 1e-30
            return (x + s, acc + s)

        _, acc = _lax.fori_loop(0, iters, body, (x, 0.0))
        return acc

    loop = jax.jit(loop)
    float(loop(_jnp.int32(num_iterations), signal, *rest))  # warm-up/compile

    def measure(iters):
        n = _jnp.int32(iters)
        n2 = _jnp.int32(2 * iters)
        t_n, t_2n = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(n, signal, *rest))  # host fetch = real barrier
            t_n.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(loop(n2, signal, *rest))
            t_2n.append(time.perf_counter() - t0)
        per_iter = (np.min(t_2n) - np.min(t_n)) / iters
        spread = (np.std(t_2n) + np.std(t_n)) / iters
        return per_iter, spread

    used = num_iterations
    per_iter, spread = measure(used)
    # Sub-ms ops: N iterations of differential work can be swamped by the
    # ~ms jitter on the ~25 ms tunnel dispatch (observed: the same config
    # timed 0.025-0.177 ms across reps at N=25). Re-measure with N scaled
    # so the differential term is at least ``min_work_s`` of device time
    # (same compiled loop — the trip count is traced).
    if min_work_s > 0 and per_iter * num_iterations < min_work_s:
        scaled = min(2000, int(np.ceil(min_work_s / max(per_iter, 1e-7))))
        if scaled > used:
            used = scaled
            per_iter, spread = measure(used)
    if per_iter <= 0:
        # Non-positive differential: the 2N loop timed FASTER than the N
        # loop — tunnel jitter swamped the work term at this N. Re-measure
        # once with the trip count scaled so the differential term is
        # >=0.25 s of device time (same compiled loop; the count is
        # traced), floored at DOUBLE the count that just failed — a noise
        # -derived |per_iter| must not shrink the retry below the attempt
        # it is retrying. If it is STILL non-positive, report NaN: callers
        # must record "unmeasurable", not a clamp — the old
        # max(per_iter, 1e-9) floor wrote three infinite-speedup garbage
        # rows into doc/benchmark_results.json (1D naive K=1, 1D
        # transpose K=1280, 1D fft_conv K=3840).
        scaled = min(2000, max(2 * used,
                               int(np.ceil(0.25 / max(abs(per_iter), 1e-7)))))
        per_iter, spread = measure(scaled)
        if per_iter <= 0:
            return Benchmark(float("nan"), float(spread))
    return Benchmark(float(per_iter), float(spread))


def _assert_almost_equal(x, y) -> bool:
    """Two-threshold accuracy bar (reference benchmark_utils.py:53-57)."""
    abs_error = np.abs(np.asarray(x) - np.asarray(y))
    assert abs_error.mean().item() < 5e-5
    assert abs_error.max().item() < 1e-4
    return True


def _gcd(x: int, y: int) -> int:
    """Reference benchmark_utils.py:60-63."""
    while y:
        x, y = y, x % y
    return x


def repo_cache_dir() -> str:
    """The repo-local persistent compile-cache dir (.jax_cache/,
    gitignored). One definition shared by bench.py and the sweep driver
    so the two tools can never drift onto different caches — repeat
    driver runs in the same workspace then skip the 10-30 s/config
    Mosaic compile bill (/tmp need not survive between rounds)."""
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")


def hbm_gbps(bytes_moved: int, seconds: float) -> float:
    """Achieved HBM bandwidth for a measured op (roofline reporting)."""
    return bytes_moved / seconds / 1e9 if seconds > 0 else float("inf")


def fft_conv_bytes(signal_shape, kernel_shape, out_shape, dtype_bytes=4) -> int:
    """Minimum HBM traffic of an ideally-fused FFT conv: read signal+kernel,
    write output. The roofline denominator for GB/s reporting."""
    total = (
        int(np.prod(signal_shape))
        + int(np.prod(kernel_shape))
        + int(np.prod(out_shape))
    )
    return total * dtype_bytes
