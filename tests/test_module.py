"""Module-layer tests: FFTConv{1,2,3}d vs torch direct conv.

Parity with reference tests/test_module.py:21-124 (module forward/backward
with the module's own weight/bias against F.conv{n}d), plus TPU-framework
extras: torch-compatible init statistics, state_dict interop, pytree
round-trip, and validation errors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fft_conv_tpu.nn import FFTConv1d, FFTConv2d, FFTConv3d

from helpers import _assert_almost_equal, _gcd, combo_id, grid

LAYERS = [FFTConv1d, FFTConv2d, FFTConv3d]

AXES = (
    [2, 3],        # in_channels
    [2, 3],        # out_channels
    [1, 2, 3],     # groups
    [2, 3],        # kernel_size
    [0, 1],        # padding
    [1, 2],        # stride
    [1, 2],        # dilation
    [True],        # bias
    [1, 2, 3],     # ndim
    [7, 8],        # input_size
)
PARAMS = "in_channels,out_channels,groups,kernel_size,padding,stride,dilation,bias,ndim,input_size"


def _build(in_channels, out_channels, groups, kernel_size, padding, stride,
           dilation, bias, ndim, seed):
    return LAYERS[ndim - 1](
        in_channels=in_channels,
        out_channels=out_channels,
        kernel_size=kernel_size,
        padding=padding,
        stride=stride,
        dilation=dilation,
        groups=groups,
        bias=bias,
        key=jax.random.key(seed),
    )


@pytest.mark.parametrize(PARAMS, grid(*AXES), ids=combo_id)
def test_fft_conv_module(
    in_channels, out_channels, groups, kernel_size, padding, stride, dilation,
    bias, ndim, input_size,
):
    torch_conv = getattr(F, f"conv{ndim}d")
    groups = _gcd(in_channels, _gcd(out_channels, groups))
    layer = _build(in_channels, out_channels, groups, kernel_size, padding,
                   stride, dilation, bias, ndim, seed=input_size)

    rng = np.random.default_rng(hash((kernel_size, padding, stride, dilation)) % 2**31)
    signal = rng.standard_normal((2, in_channels) + (input_size,) * ndim).astype(np.float32)

    y0 = layer(jnp.asarray(signal))
    y1 = torch_conv(
        torch.tensor(signal),
        torch.tensor(np.asarray(layer.weight)),
        bias=torch.tensor(np.asarray(layer.bias)) if bias else None,
        padding=padding, stride=stride, dilation=dilation, groups=groups,
    )
    _assert_almost_equal(y0, y1.numpy())


@pytest.mark.parametrize(PARAMS, grid(*AXES), ids=combo_id)
def test_fft_conv_module_backward(
    in_channels, out_channels, groups, kernel_size, padding, stride, dilation,
    bias, ndim, input_size,
):
    torch_conv = getattr(F, f"conv{ndim}d")
    groups = _gcd(in_channels, _gcd(out_channels, groups))
    layer = _build(in_channels, out_channels, groups, kernel_size, padding,
                   stride, dilation, bias, ndim, seed=input_size + 100)

    rng = np.random.default_rng(hash((kernel_size, padding, stride, dilation, 5)) % 2**31)
    signal = rng.standard_normal((2, in_channels) + (input_size,) * ndim).astype(np.float32)

    # The module is a pytree: differentiate the loss wrt the module itself.
    grads = jax.grad(lambda m: m(jnp.asarray(signal)).sum())(layer)

    w1 = torch.tensor(np.asarray(layer.weight), requires_grad=True)
    b1 = torch.tensor(np.asarray(layer.bias), requires_grad=True) if bias else None
    torch_conv(torch.tensor(signal), w1, bias=b1, padding=padding,
               stride=stride, dilation=dilation, groups=groups).sum().backward()

    _assert_almost_equal(grads.weight, w1.grad.numpy())
    if bias:
        _assert_almost_equal(grads.bias, b1.grad.numpy())


def test_init_matches_torch_statistics():
    """Default init is U(-1/sqrt(fan_in), 1/sqrt(fan_in)) like torch ConvNd."""
    layer = FFTConv2d(16, 32, 5, key=jax.random.key(0))
    fan_in = 16 * 5 * 5
    bound = 1.0 / np.sqrt(fan_in)
    w = np.asarray(layer.weight)
    assert w.shape == (32, 16, 5, 5)
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > 0.9 * bound  # actually fills the range
    b = np.asarray(layer.bias)
    assert np.abs(b).max() <= bound


def test_state_dict_roundtrip_with_torch():
    """state_dict layouts interop with torch.nn.Conv2d bit-for-bit."""
    torch_layer = torch.nn.Conv2d(3, 8, 3, padding=1)
    layer = FFTConv2d(3, 8, 3, padding=1, key=jax.random.key(1))
    layer = layer.load_state_dict(
        {k: v.detach().numpy() for k, v in torch_layer.state_dict().items()}
    )
    x = np.random.default_rng(0).standard_normal((2, 3, 12, 12)).astype(np.float32)
    y0 = layer(jnp.asarray(x))
    y1 = torch_layer(torch.tensor(x)).detach().numpy()
    _assert_almost_equal(y0, y1)
    # round back out
    sd = layer.state_dict()
    assert np.array_equal(np.asarray(sd["weight"]),
                          torch_layer.weight.detach().numpy())


def test_module_is_jittable_pytree():
    layer = FFTConv1d(3, 4, 5, key=jax.random.key(2))
    x = jnp.ones((2, 3, 32))
    fwd = jax.jit(lambda m, x: m(x))
    y = fwd(layer, x)
    assert y.shape == (2, 4, 28)
    leaves, treedef = jax.tree_util.tree_flatten(layer)
    layer2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert np.array_equal(np.asarray(layer2(x)), np.asarray(y))


def test_validation_errors():
    with pytest.raises(ValueError):
        FFTConv1d(3, 4, 5, groups=2)  # in_channels not divisible
    with pytest.raises(ValueError):
        FFTConv1d(4, 3, 5, groups=2)  # out_channels not divisible
    with pytest.raises(ValueError):
        FFTConv1d(4, 4, 5, padding_mode="bogus")
    layer = FFTConv2d(3, 4, 3)
    with pytest.raises(ValueError):
        layer(jnp.ones((3, 8, 8)))  # missing batch dim (reference nn.py:11)


def test_no_bias():
    layer = FFTConv1d(3, 4, 5, bias=False, key=jax.random.key(3))
    assert layer.bias is None
    y = layer(jnp.ones((2, 3, 16)))
    assert y.shape == (2, 4, 12)
