"""Differential tests for the tiled (overlap-save) spectral path.

Oracle: torch direct conv, same two-threshold tolerance as the reference
suite (reference benchmark_utils.py:53-57). The tiled path is exercised
directly (forced small tiles, multi-tile per axis) and through the
``impl="tiled"`` routing of fft_conv / fft_conv_transpose.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tf

import jax
import jax.numpy as jnp

from fft_conv_tpu.ops.functional import fft_conv, fft_conv_transpose
from fft_conv_tpu.ops.tiled import plan_tiles, tiled_valid_corr

from helpers import _assert_almost_equal, grid

_CONV = {1: tf.conv1d, 2: tf.conv2d, 3: tf.conv3d}
_CONV_T = {1: tf.conv_transpose1d, 2: tf.conv_transpose2d, 3: tf.conv_transpose3d}


@pytest.mark.parametrize(
    "ndim,size,k,tile",
    [
        (1, 300, 17, (26,)),
        (1, 300, 17, (64,)),
        (2, 70, 9, (24, 32)),
        (2, 65, 12, (20, 48)),
        (3, 40, 5, (16, 24, 12)),
    ],
)
def test_tiled_valid_corr_matches_torch(ndim, size, k, tile):
    rng = np.random.default_rng(ndim * 100 + k)
    x = rng.standard_normal((2, 3) + (size,) * ndim).astype(np.float32)
    w = rng.standard_normal((4, 3) + (k,) * ndim).astype(np.float32)
    ref = _CONV[ndim](torch.tensor(x), torch.tensor(w)).numpy()
    got = tiled_valid_corr(jnp.asarray(x), jnp.asarray(w), tile=tile)
    _assert_almost_equal(ref, np.asarray(got))


def test_tiled_groups_and_out_len():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 80, 77)).astype(np.float32)
    w = rng.standard_normal((4, 3, 11, 7)).astype(np.float32)
    ref = tf.conv2d(torch.tensor(x), torch.tensor(w), groups=2).numpy()
    got = tiled_valid_corr(jnp.asarray(x), jnp.asarray(w), groups=2, tile=(32, 24))
    _assert_almost_equal(ref, np.asarray(got))

    # out_len beyond the valid region == zero-extended signal (transpose crop)
    x1 = rng.standard_normal((2, 3, 50)).astype(np.float32)
    w1 = rng.standard_normal((5, 3, 9)).astype(np.float32)
    xz = np.pad(x1, ((0, 0), (0, 0), (0, 20)))
    ref = tf.conv1d(torch.tensor(xz), torch.tensor(w1)).numpy()[:, :, :55]
    got = tiled_valid_corr(jnp.asarray(x1), jnp.asarray(w1), out_len=(55,), tile=(32,))
    _assert_almost_equal(ref, np.asarray(got))


@pytest.mark.parametrize(
    "stride,padding,dilation,groups,pmode",
    grid(
        [1, 2], [0, 1, 3], [1, 2], [1, 3], ["constant", "reflect", "circular"],
        step=5,
    ),
)
def test_fft_conv_impl_tiled_2d(stride, padding, dilation, groups, pmode):
    rng = np.random.default_rng(stride * 7 + padding * 3 + dilation)
    x = rng.standard_normal((2, 3 * groups, 41, 38)).astype(np.float32)
    w = rng.standard_normal((2 * groups, 3, 5, 4)).astype(np.float32)
    b = rng.standard_normal((2 * groups,)).astype(np.float32)
    xt = torch.tensor(x)
    if pmode != "constant":
        tmode = {"reflect": "reflect", "circular": "circular"}[pmode]
        xt = tf.pad(xt, (padding, padding, padding, padding), mode=tmode)
        ref = tf.conv2d(
            xt, torch.tensor(w), torch.tensor(b), stride=stride,
            dilation=dilation, groups=groups,
        ).numpy()
    else:
        ref = tf.conv2d(
            xt, torch.tensor(w), torch.tensor(b), stride=stride,
            padding=padding, dilation=dilation, groups=groups,
        ).numpy()
    got = fft_conv(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride,
        padding=padding, dilation=dilation, groups=groups, padding_mode=pmode,
        impl="tiled",
    )
    _assert_almost_equal(ref, np.asarray(got))


@pytest.mark.parametrize(
    "stride,padding,output_padding,groups",
    grid([1, 2, 3], [0, 1, 2], [0, 1], [1, 2], step=3),
)
def test_fft_conv_transpose_impl_tiled(stride, padding, output_padding, groups):
    if output_padding >= stride:
        stride += output_padding
    rng = np.random.default_rng(stride * 5 + padding)
    x = rng.standard_normal((2, 4, 33, 29)).astype(np.float32)
    w = rng.standard_normal((4, 6 // groups, 4, 5)).astype(np.float32)
    b = rng.standard_normal((6,)).astype(np.float32)
    ref = tf.conv_transpose2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=stride,
        padding=padding, output_padding=output_padding, groups=groups,
    ).numpy()
    got = fft_conv_transpose(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride,
        padding=padding, output_padding=output_padding, groups=groups,
        impl="tiled",
    )
    _assert_almost_equal(ref, np.asarray(got))


def test_tiled_gradients_match_direct():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 3, 40, 36)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((2, 3, 5, 5)).astype(np.float32))

    def loss_tiled(w_):
        return jnp.sum(fft_conv(x, w_, impl="tiled") ** 2)

    def loss_xla(w_):
        return jnp.sum(fft_conv(x, w_, impl="xla") ** 2)

    g_tiled = jax.grad(loss_tiled)(w)
    g_xla = jax.grad(loss_xla)(w)
    np.testing.assert_allclose(
        np.asarray(g_tiled), np.asarray(g_xla), rtol=2e-4, atol=2e-3
    )


def test_plan_tiles_static_properties():
    # plan always returns fft sizes >= kernel and costs ordered sanely
    tile, tc, wc = plan_tiles((512, 512), (16, 16), (497, 497), (2, 8, 8))
    assert all(t >= 16 for t in tile)
    assert tc <= wc
    # 1D long-signal plan must tile (dense 32768-point DFT matrix is absurd)
    tile1, tc1, wc1 = plan_tiles((32768,), (256,), (32513,), (2, 8, 8))
    assert tile1[0] < 32768 and tc1 < wc1
