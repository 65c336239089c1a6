"""benchmark_utils alias — API-surface parity with the reference.

``from fft_conv_tpu.benchmark_utils import benchmark, _assert_almost_equal``
works exactly like the reference's
``fft_conv_pytorch.benchmark_utils`` (benchmark_utils.py:12-63). The
implementations live in ``fft_conv_tpu.bench.harness``.
"""

from .bench.harness import (
    Benchmark,
    _assert_almost_equal,
    _gcd,
    benchmark,
    benchmark_chained,
    fft_conv_bytes,
    hbm_gbps,
    measure,
)

__all__ = [
    "Benchmark",
    "measure",
    "benchmark",
    "benchmark_chained",
    "_assert_almost_equal",
    "_gcd",
    "hbm_gbps",
    "fft_conv_bytes",
]
