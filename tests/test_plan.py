"""Planned-convolution API tests (ops/plan.py + kernels fused plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import fft_conv_tpu.ops.spectral as spectral
from fft_conv_tpu.ops import plan_fft_conv

from helpers import _assert_almost_equal


@pytest.fixture
def force_matmul_dft(monkeypatch):
    monkeypatch.setattr(
        spectral, "use_matmul_dft", lambda fft_shape, platform=None: True
    )


def test_plan_2d_spectral_branch(force_matmul_dft):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((6, 4, 5, 5)).astype(np.float32)
    b = rng.standard_normal((6,)).astype(np.float32)
    plan = plan_fft_conv(jnp.asarray(w), jnp.asarray(b), stride=2, padding=2,
                         signal_spatial=(40, 40))
    sig = rng.standard_normal((3, 4, 40, 40)).astype(np.float32)
    y_ref = F.conv2d(torch.tensor(sig), torch.tensor(w), torch.tensor(b),
                     stride=2, padding=2).numpy()
    _assert_almost_equal(plan(jnp.asarray(sig)), y_ref)
    # plans are shape-specialized
    with pytest.raises(ValueError):
        plan(jnp.ones((1, 4, 32, 32)))


def test_plan_3d_grouped_dilated(force_matmul_dft):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((4, 2, 3, 3, 3)).astype(np.float32)
    plan = plan_fft_conv(jnp.asarray(w), groups=2, dilation=2,
                         signal_spatial=(12, 12, 12))
    sig = rng.standard_normal((1, 4, 12, 12, 12)).astype(np.float32)
    y_ref = F.conv3d(torch.tensor(sig), torch.tensor(w), groups=2,
                     dilation=2).numpy()
    _assert_almost_equal(plan(jnp.asarray(sig)), y_ref)


def test_plan_plain_branch_long_axis():
    """Axes beyond the matmul range fall back to the jnp.fft plan."""
    rng = np.random.default_rng(2)
    w = rng.standard_normal((2, 2, 9)).astype(np.float32)
    plan = plan_fft_conv(jnp.asarray(w), signal_spatial=(4096,))
    sig = rng.standard_normal((1, 2, 4096)).astype(np.float32)
    y_ref = F.conv1d(torch.tensor(sig), torch.tensor(w)).numpy()
    _assert_almost_equal(plan(jnp.asarray(sig)), y_ref)
    with pytest.raises(ValueError):
        plan(jnp.ones((1, 2, 100)))


def test_plan_validates():
    w = jnp.ones((2, 2, 3, 3))
    with pytest.raises(ValueError):
        plan_fft_conv(w, signal_spatial=(16,))  # rank mismatch
    with pytest.raises(ValueError):
        plan_fft_conv(jnp.ones((1, 1, 9)), signal_spatial=(4,))  # K > input


def test_plan_kernel_too_large_spectral(force_matmul_dft):
    with pytest.raises(ValueError):
        plan_fft_conv(jnp.ones((1, 1, 9, 9)), signal_spatial=(4, 4))
