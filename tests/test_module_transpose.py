"""Module-layer tests: FFTConvTranspose{1,2,3}d vs torch.

Parity with reference tests/test_module_transpose.py:26-144 — both forward
and backward grids carry output_padding and keep configs legal via the
stride/dilation inflation trick (test_module_transpose.py:39-40).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fft_conv_tpu.nn import (
    FFTConvTranspose1d,
    FFTConvTranspose2d,
    FFTConvTranspose3d,
)

from helpers import _assert_almost_equal, _gcd, combo_id, grid

LAYERS = [FFTConvTranspose1d, FFTConvTranspose2d, FFTConvTranspose3d]

AXES = (
    [2, 3],        # in_channels
    [2, 3],        # out_channels
    [1, 2, 3],     # groups
    [2, 3],        # kernel_size
    [0, 1],        # padding
    [0, 1, 2],     # output_padding
    [1, 2],        # stride
    [1, 2],        # dilation
    [True],        # bias
    [1, 2, 3],     # ndim
    [7, 8],        # input_size
)
PARAMS = (
    "in_channels,out_channels,groups,kernel_size,padding,output_padding,"
    "stride,dilation,bias,ndim,input_size"
)


def _build(in_channels, out_channels, groups, kernel_size, padding,
           output_padding, stride, dilation, bias, ndim, seed):
    return LAYERS[ndim - 1](
        in_channels=in_channels,
        out_channels=out_channels,
        kernel_size=kernel_size,
        padding=padding,
        output_padding=output_padding,
        stride=stride,
        dilation=dilation,
        groups=groups,
        bias=bias,
        key=jax.random.key(seed),
    )


@pytest.mark.parametrize(PARAMS, grid(*AXES), ids=combo_id)
def test_fft_conv_transpose_module(
    in_channels, out_channels, groups, kernel_size, padding, output_padding,
    stride, dilation, bias, ndim, input_size,
):
    dilation += output_padding  # legality trick (reference :39-40)
    stride += output_padding
    torch_conv = getattr(F, f"conv_transpose{ndim}d")
    groups = _gcd(in_channels, _gcd(out_channels, groups))
    layer = _build(in_channels, out_channels, groups, kernel_size, padding,
                   output_padding, stride, dilation, bias, ndim, seed=input_size)

    rng = np.random.default_rng(
        hash((kernel_size, padding, output_padding, stride, dilation)) % 2**31
    )
    signal = rng.standard_normal((2, in_channels) + (input_size,) * ndim).astype(np.float32)

    y0 = layer(jnp.asarray(signal))
    y1 = torch_conv(
        torch.tensor(signal),
        torch.tensor(np.asarray(layer.weight)),
        bias=torch.tensor(np.asarray(layer.bias)) if bias else None,
        padding=padding, output_padding=output_padding, stride=stride,
        dilation=dilation, groups=groups,
    )
    _assert_almost_equal(y0, y1.numpy())


@pytest.mark.parametrize(PARAMS, grid(*AXES), ids=combo_id)
def test_fft_conv_transpose_module_backward(
    in_channels, out_channels, groups, kernel_size, padding, output_padding,
    stride, dilation, bias, ndim, input_size,
):
    dilation += output_padding
    stride += output_padding
    torch_conv = getattr(F, f"conv_transpose{ndim}d")
    groups = _gcd(in_channels, _gcd(out_channels, groups))
    layer = _build(in_channels, out_channels, groups, kernel_size, padding,
                   output_padding, stride, dilation, bias, ndim,
                   seed=input_size + 50)

    rng = np.random.default_rng(
        hash((kernel_size, padding, output_padding, stride, dilation, 9)) % 2**31
    )
    signal = rng.standard_normal((2, in_channels) + (input_size,) * ndim).astype(np.float32)

    grads = jax.grad(lambda m: m(jnp.asarray(signal)).sum())(layer)

    w1 = torch.tensor(np.asarray(layer.weight), requires_grad=True)
    b1 = torch.tensor(np.asarray(layer.bias), requires_grad=True) if bias else None
    torch_conv(torch.tensor(signal), w1, bias=b1, padding=padding,
               output_padding=output_padding, stride=stride, dilation=dilation,
               groups=groups).sum().backward()

    _assert_almost_equal(grads.weight, w1.grad.numpy())
    if bias:
        _assert_almost_equal(grads.bias, b1.grad.numpy())


def test_transpose_weight_layout_matches_torch():
    """Weight is (Cin, Cout/g, *k) — torch's transposed-conv convention."""
    layer = FFTConvTranspose2d(6, 4, 3, groups=2, key=jax.random.key(0))
    assert layer.weight.shape == (6, 2, 3, 3)


def test_transpose_rejects_nonzero_padding_mode():
    with pytest.raises(ValueError):
        FFTConvTranspose1d(3, 4, 5, padding_mode="reflect")


def test_transpose_state_dict_roundtrip_with_torch():
    torch_layer = torch.nn.ConvTranspose2d(3, 8, 3, stride=2, padding=1,
                                           output_padding=1)
    layer = FFTConvTranspose2d(3, 8, 3, stride=2, padding=1, output_padding=1,
                               key=jax.random.key(1))
    layer = layer.load_state_dict(
        {k: v.detach().numpy() for k, v in torch_layer.state_dict().items()}
    )
    x = np.random.default_rng(0).standard_normal((2, 3, 12, 12)).astype(np.float32)
    y0 = layer(jnp.asarray(x))
    y1 = torch_layer(torch.tensor(x)).detach().numpy()
    _assert_almost_equal(y0, y1)
