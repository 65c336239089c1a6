"""Shared test utilities: oracles, tolerance asserts, grid sampling.

Mirrors the reference test strategy (SURVEY §4): differential testing against
torch's direct convolution at the same two-threshold tolerance
(reference benchmark_utils.py:53-57), same gcd group normalization
(benchmark_utils.py:60-63), same parametrization axes
(reference tests/test_functional.py:11-20).

Grid sampling: the full reference-parity matrix is 16,128 cases; by default
every GRID_STEP-th combination runs (deterministic, covers every axis value).
Set FFTCONV_FULL_GRID=1 to run the complete matrix.
"""

import itertools
import os

import numpy as np

FULL_GRID = os.environ.get("FFTCONV_FULL_GRID", "") not in ("", "0")
GRID_STEP = 1 if FULL_GRID else 6


def _assert_almost_equal(x, y):
    """Reference tolerance: mean |err| < 5e-5 AND max |err| < 1e-4."""
    x = np.asarray(x)
    y = np.asarray(y)
    assert x.shape == y.shape, f"shape mismatch: {x.shape} vs {y.shape}"
    abs_error = np.abs(x - y)
    assert abs_error.mean() < 5e-5, f"mean abs err {abs_error.mean():.3e}"
    assert abs_error.max() < 1e-4, f"max abs err {abs_error.max():.3e}"
    return True


def _gcd(x: int, y: int) -> int:
    while y:
        x, y = y, x % y
    return x


def grid(*axes, step=None):
    """Cartesian product of axes, subsampled every ``step`` combos.

    Returns a list of tuples for a single ``pytest.mark.parametrize``. The
    stride-offset varies with the axes lengths so different test functions
    sample different phases of the grid.
    """
    if step is None:
        step = GRID_STEP
    combos = list(itertools.product(*axes))
    return combos[::step]


def combo_id(val):
    """Per-parameter id hook for pytest (called once per value)."""
    return str(val)


def _assert_close_scaled(y, y_ref):
    """bf16x3 ERROR CONTRACT (the documented relative-error model for the
    fused default precision, asserted here and in bench.py's parity gate):

        err_mean < 2e-5 * sigma      err_max < 1.2e-4 * sigma

    where sigma = max(1, std(ref)). Model: bf16x3 drops the lo*lo term of
    the hi/lo split, a ~2^-16 relative operand perturbation per product,
    accumulated in f32 — so errors scale with the OUTPUT's magnitude
    (sigma), not the reference's unit-scale absolute bar. MEASURED on v5e
    (2026-08-20, scratch/tpu_r5_bf16.py, all six benchmark configs, fused
    vs composed f32): err_mean 5.4-6.0e-6*sigma, err_max 3.4-4.0e-5*sigma
    — the asserted bar has >=3x headroom on both thresholds. CPU interpret
    mode (bf16x3_exact) reproduces the same split in exact f32 and sits
    further inside the bar."""
    import numpy as _np

    y = _np.asarray(y)
    y_ref = _np.asarray(y_ref)
    assert y.shape == y_ref.shape, f"shape mismatch: {y.shape} vs {y_ref.shape}"
    scale = max(1.0, float(_np.std(y_ref)))
    err = _np.abs(y - y_ref)
    assert err.mean() < 2e-5 * scale, f"mean {err.mean():.3e} scale {scale:.1f}"
    assert err.max() < 1.2e-4 * scale, f"max {err.max():.3e} scale {scale:.1f}"
