"""Checkpoint + profiling utility tests (SURVEY §5 aux subsystems)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fft_conv_tpu import fft_conv
from fft_conv_tpu.bench.profiling import cost_analysis, roofline
from fft_conv_tpu.nn import FFTConv2d, FFTConvTranspose1d
from fft_conv_tpu.utils.checkpoint import (
    load_checkpoint,
    module_state,
    save_checkpoint,
)

from helpers import _assert_almost_equal


def test_npz_roundtrip(tmp_path):
    layer = FFTConv2d(3, 8, 5, padding=2, key=jax.random.key(0))
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, layer)
    fresh = FFTConv2d(3, 8, 5, padding=2, key=jax.random.key(99))
    restored = load_checkpoint(path, fresh)
    assert np.array_equal(np.asarray(restored.weight), np.asarray(layer.weight))
    assert np.array_equal(np.asarray(restored.bias), np.asarray(layer.bias))


def test_torch_checkpoint_interop(tmp_path):
    """A torch Conv1d state dict restores into FFTConvTranspose-free layers
    and produces identical outputs — checkpoint interop both directions."""
    torch_layer = torch.nn.ConvTranspose1d(4, 6, 7, stride=2)
    state = {k: v.detach().numpy() for k, v in torch_layer.state_dict().items()}
    np.savez(tmp_path / "torch.npz", **state)
    layer = FFTConvTranspose1d(4, 6, 7, stride=2, key=jax.random.key(1))
    layer = load_checkpoint(str(tmp_path / "torch.npz"), layer)

    x = np.random.default_rng(0).standard_normal((2, 4, 20)).astype(np.float32)
    _assert_almost_equal(
        layer(jnp.asarray(x)), torch_layer(torch.tensor(x)).detach().numpy()
    )
    # and back out: module_state matches the torch layout bit-for-bit
    out_state = module_state(layer)
    assert np.array_equal(out_state["weight"], state["weight"])


def test_cost_analysis_reports_flops():
    sig = jnp.ones((1, 2, 256))
    ker = jnp.ones((2, 2, 16))
    costs = cost_analysis(lambda s, k: fft_conv(s, k), sig, ker)
    if costs is None:
        pytest.skip("backend reports no cost analysis")
    assert any("flops" in k for k in costs)


def test_roofline_runs():
    sig = jnp.ones((1, 2, 512))
    ker = jnp.ones((2, 2, 16))
    out = roofline(lambda s, k: fft_conv(s, k), sig, ker, num_iterations=3)
    assert out["time_s"] > 0
    assert out["achieved_gbps"] >= 0
