"""Tests for the benchmark/measurement harness (reference parity for
benchmark_utils.py:12-63 plus the TPU-specific additions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fft_conv_tpu.benchmark_utils import (
    Benchmark,
    _assert_almost_equal,
    _gcd,
    benchmark,
    benchmark_chained,
    fft_conv_bytes,
    hbm_gbps,
    measure,
)


def test_benchmark_namedtuple_formatting():
    b = Benchmark(mean=1.234e-3, std=5.6e-5)
    assert repr(b) == "BenchmarkResult(mean: 1.234e-03, std: 5.600e-05)"
    assert str(b) == "(1.234e-03 ± 5.600e-05) s"


def test_measure_records_time_and_memory():
    with measure() as r:
        jnp.ones((128, 128)).sum().block_until_ready()
    assert r["time"] > 0
    assert r["memory"] >= 0.0


def test_benchmark_drops_warmup():
    calls = []

    def fn():
        calls.append(1)
        return jnp.ones((8,))

    t, m = benchmark(fn, num_iterations=5)
    assert len(calls) == 5
    assert t.mean >= 0 and m.mean >= 0


def test_benchmark_chained_runs():
    sig = jnp.ones((2, 3, 64))
    ker = jnp.ones((4, 3, 9))
    from fft_conv_tpu import fft_conv

    t = benchmark_chained(fft_conv, sig, ker, num_iterations=4)
    assert t.mean > 0


def test_assert_almost_equal_thresholds():
    x = np.zeros(10, np.float32)
    assert _assert_almost_equal(x, x + 4e-5)  # mean 4e-5 < 5e-5, max < 1e-4
    with pytest.raises(AssertionError):
        _assert_almost_equal(x, x + 6e-5)  # mean above threshold
    y = x.copy()
    y[0] = 2e-4  # max above 1e-4, mean fine
    with pytest.raises(AssertionError):
        _assert_almost_equal(x, y)


def test_gcd():
    assert _gcd(12, 8) == 4
    assert _gcd(3, 2) == 1
    assert _gcd(7, 0) == 7


def test_roofline_helpers():
    assert hbm_gbps(1e9, 1.0) == pytest.approx(1.0)
    assert fft_conv_bytes((2, 3, 100), (4, 3, 10), (2, 4, 91)) == (600 + 120 + 728) * 4


def test_bench_py_streams_and_watchdog_survives_hangs():
    """The driver-survivability contract of bench.py (round 5): under a
    deadline that fires mid-run, the process must still have emitted a
    complete cumulative JSON record on stdout (partial=true, stage named)
    and exit 3 — a tail capture at SIGKILL time is always parseable."""
    import json
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, FFTCONV_BENCH_DEADLINE_S="3")
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu'); "
         "import bench; bench.main()"],
        cwd=root, env=env, capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 3, (proc.returncode, proc.stderr[-500:])
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stdout[-500:]
    record = json.loads(lines[-1])
    assert record["partial"] is True
    assert record["metric"].startswith("fft_conv_speedup")
    assert "stage" in record and "error" in record
