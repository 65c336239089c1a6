"""Experimental fused 2D Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from fft_conv_tpu import fft_conv
from fft_conv_tpu.kernels.fused2d import fft_conv2d_fused


def _assert_close_scaled(y, y_ref):
    y = np.asarray(y)
    y_ref = np.asarray(y_ref)
    assert y.shape == y_ref.shape
    scale = max(1.0, float(np.std(y_ref)))
    err = np.abs(y - y_ref)
    assert err.mean() < 5e-5 * scale
    assert err.max() < 2e-4 * scale


CONFIGS = [
    # (B, cin, cout, H, W, KH, KW, pad)
    (1, 2, 3, 200, 160, 10, 12, 0),
    (2, 4, 4, 300, 256, 34, 34, 5),
    (1, 1, 1, 130, 140, 3, 5, 0),
    (1, 3, 2, 129, 130, 16, 16, 0),   # odd sizes, stripe remainder
]


@pytest.mark.parametrize("b,cin,cout,h,w,kh,kw,pad", CONFIGS)
def test_fused2d_matches_torch(b, cin, cout, h, w, kh, kw, pad):
    rng = np.random.default_rng(kh + w)
    sig = rng.standard_normal((b, cin, h, w)).astype(np.float32)
    ker = rng.standard_normal((cout, cin, kh, kw)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    y = fft_conv2d_fused(jnp.asarray(sig), jnp.asarray(ker), jnp.asarray(bias),
                         padding=pad)
    y_ref = TF.conv2d(torch.tensor(sig), torch.tensor(ker), torch.tensor(bias),
                      padding=pad).numpy()
    _assert_close_scaled(y, y_ref)


def test_fused2d_gradients_match_composed():
    rng = np.random.default_rng(5)
    sig = jnp.asarray(rng.standard_normal((1, 2, 150, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 2, 9, 9)).astype(np.float32))
    gs, gw = jax.grad(
        lambda s, w_: (fft_conv2d_fused(s, w_) ** 2).mean(), argnums=(0, 1)
    )(sig, w)
    gs_ref, gw_ref = jax.grad(
        lambda s, w_: (fft_conv(s, w_, impl="xla") ** 2).mean(), argnums=(0, 1)
    )(sig, w)
    _assert_close_scaled(gs, gs_ref)
    _assert_close_scaled(gw, gw_ref)


def test_fused2d_validation():
    with pytest.raises(ValueError):
        fft_conv2d_fused(jnp.ones((1, 2, 100)), jnp.ones((2, 2, 3, 3)))
    with pytest.raises(ValueError):
        fft_conv2d_fused(jnp.ones((1, 2, 100, 100)), jnp.ones((2, 3, 3, 3)))
    with pytest.raises(ValueError):  # KH >= stripe height
        fft_conv2d_fused(jnp.ones((1, 1, 300, 300)), jnp.ones((1, 1, 130, 3)))
    with pytest.raises(ValueError):  # W beyond fused limit
        fft_conv2d_fused(jnp.ones((1, 1, 64, 2048)), jnp.ones((1, 1, 3, 3)))
