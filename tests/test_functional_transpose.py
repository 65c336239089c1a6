"""Differential tests: fft_conv_transpose vs torch (forward + backward).

Parity with reference tests/test_functional_transpose.py:11-124 — the
backward grid adds output_padding {0,1,2} and keeps configs legal via the
reference's stride/dilation inflation trick
(test_functional_transpose.py:86-87: torch requires
output_padding < max(stride, dilation)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fft_conv_tpu.functional import fft_conv_transpose, to_ntuple

from helpers import _assert_almost_equal, _gcd, combo_id, grid

FWD_AXES = (
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
FWD_PARAMS = "in_channels,out_channels,groups,kernel_size,padding,stride,dilation,bias,ndim,input_size"

BWD_AXES = (
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
BWD_PARAMS = (
    "in_channels,out_channels,groups,kernel_size,padding,output_padding,"
    "stride,dilation,bias,ndim,input_size"
)


def _make_case(in_channels, out_channels, groups, kernel_size, ndim, input_size, bias, seed):
    rng = np.random.default_rng(seed)
    dims = ndim * [input_size]
    signal = rng.standard_normal((2, in_channels, *dims)).astype(np.float32)
    k = to_ntuple(kernel_size, n=ndim)
    w = rng.standard_normal((in_channels, out_channels // groups, *k)).astype(np.float32)
    b = rng.standard_normal((out_channels,)).astype(np.float32) if bias else None
    return signal, w, b


@pytest.mark.parametrize(FWD_PARAMS, grid(*FWD_AXES), ids=combo_id)
def test_fft_conv_transpose_functional(
    in_channels, out_channels, groups, kernel_size, padding, stride, dilation,
    bias, ndim, input_size,
):
    torch_conv = getattr(F, f"conv_transpose{ndim}d")
    groups = _gcd(in_channels, _gcd(out_channels, groups))
    signal, w, b = _make_case(
        in_channels, out_channels, groups, kernel_size, ndim, input_size, bias,
        seed=hash((kernel_size, padding, stride, dilation, 2)) % 2**31,
    )
    kwargs = dict(padding=padding, stride=stride, dilation=dilation, groups=groups)

    y0 = fft_conv_transpose(jnp.asarray(signal), jnp.asarray(w),
                            None if b is None else jnp.asarray(b), **kwargs)
    y1 = torch_conv(torch.tensor(signal), torch.tensor(w),
                    None if b is None else torch.tensor(b), **kwargs)
    _assert_almost_equal(y0, y1.numpy())


@pytest.mark.parametrize(BWD_PARAMS, grid(*BWD_AXES), ids=combo_id)
def test_fft_conv_transpose_backward_functional(
    in_channels, out_channels, groups, kernel_size, padding, output_padding,
    stride, dilation, bias, ndim, input_size,
):
    torch_conv = getattr(F, f"conv_transpose{ndim}d")
    groups = _gcd(in_channels, _gcd(out_channels, groups))
    # Keep output_padding legal (reference test_functional_transpose.py:86-87)
    dilation = dilation + output_padding
    stride = stride + output_padding

    signal, w, b = _make_case(
        in_channels, out_channels, groups, kernel_size, ndim, input_size, bias,
        seed=hash((kernel_size, padding, output_padding, stride, dilation, 3)) % 2**31,
    )
    kwargs = dict(
        padding=padding, output_padding=output_padding, stride=stride,
        dilation=dilation, groups=groups,
    )

    def loss(w_, b_):
        return fft_conv_transpose(jnp.asarray(signal), w_, b_, **kwargs).sum()

    y0 = fft_conv_transpose(jnp.asarray(signal), jnp.asarray(w), jnp.asarray(b), **kwargs)
    gw, gb = jax.grad(loss, argnums=(0, 1))(jnp.asarray(w), jnp.asarray(b))

    w1 = torch.tensor(w, requires_grad=True)
    b1 = torch.tensor(b, requires_grad=True)
    y1 = torch_conv(torch.tensor(signal), w1, b1, **kwargs)
    y1.sum().backward()

    _assert_almost_equal(y0, y1.detach().numpy())
    _assert_almost_equal(gw, w1.grad.numpy())
    if bias:
        _assert_almost_equal(gb, b1.grad.numpy())
