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
    """Scale-aware two-threshold bar for the fast (bf16x3) paths: the
    reference's 5e-5/1e-4 absolute bar assumes unit-scale outputs; these
    scale by std(ref)."""
    import numpy as _np

    y = _np.asarray(y)
    y_ref = _np.asarray(y_ref)
    assert y.shape == y_ref.shape, f"shape mismatch: {y.shape} vs {y_ref.shape}"
    scale = max(1.0, float(_np.std(y_ref)))
    err = _np.abs(y - y_ref)
    assert err.mean() < 5e-5 * scale, f"mean {err.mean():.3e} scale {scale:.1f}"
    assert err.max() < 2e-4 * scale, f"max {err.max():.3e} scale {scale:.1f}"
