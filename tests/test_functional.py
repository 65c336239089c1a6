"""Differential tests: fft_conv vs torch direct conv (forward + backward).

Parity with reference tests/test_functional.py:11-117 — same axes, same gcd
group normalization, same tolerance, gradients of weight and bias checked
against torch autograd.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fft_conv_tpu.functional import fft_conv, to_ntuple

from helpers import _assert_almost_equal, _gcd, combo_id, grid

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


def _make_case(in_channels, out_channels, groups, kernel_size, ndim, input_size, bias, seed):
    rng = np.random.default_rng(seed)
    dims = ndim * [input_size]
    signal = rng.standard_normal((2, in_channels, *dims)).astype(np.float32)
    k = to_ntuple(kernel_size, n=ndim)
    w = rng.standard_normal((out_channels, in_channels // groups, *k)).astype(np.float32)
    b = rng.standard_normal((out_channels,)).astype(np.float32) if bias else None
    return signal, w, b


@pytest.mark.parametrize(PARAMS, grid(*AXES), ids=combo_id)
def test_fft_conv_functional(
    in_channels, out_channels, groups, kernel_size, padding, stride, dilation,
    bias, ndim, input_size,
):
    torch_conv = getattr(F, f"conv{ndim}d")
    groups = _gcd(in_channels, _gcd(out_channels, groups))
    signal, w, b = _make_case(
        in_channels, out_channels, groups, kernel_size, ndim, input_size, bias,
        seed=hash((kernel_size, padding, stride, dilation)) % 2**31,
    )
    kwargs = dict(padding=padding, stride=stride, dilation=dilation, groups=groups)

    y0 = fft_conv(jnp.asarray(signal), jnp.asarray(w),
                  None if b is None else jnp.asarray(b), **kwargs)
    y1 = torch_conv(torch.tensor(signal), torch.tensor(w),
                    None if b is None else torch.tensor(b), **kwargs)
    _assert_almost_equal(y0, y1.numpy())


@pytest.mark.parametrize(PARAMS, grid(*AXES), ids=combo_id)
def test_fft_conv_backward_functional(
    in_channels, out_channels, groups, kernel_size, padding, stride, dilation,
    bias, ndim, input_size,
):
    torch_conv = getattr(F, f"conv{ndim}d")
    groups = _gcd(in_channels, _gcd(out_channels, groups))
    signal, w, b = _make_case(
        in_channels, out_channels, groups, kernel_size, ndim, input_size, bias,
        seed=hash((kernel_size, padding, stride, dilation, 1)) % 2**31,
    )
    kwargs = dict(padding=padding, stride=stride, dilation=dilation, groups=groups)

    # JAX gradients of sum(fft_conv) wrt weight and bias
    def loss(w_, b_):
        return fft_conv(jnp.asarray(signal), w_, b_, **kwargs).sum()

    gw, gb = jax.grad(loss, argnums=(0, 1))(jnp.asarray(w), jnp.asarray(b))

    # torch autograd oracle
    w1 = torch.tensor(w, requires_grad=True)
    b1 = torch.tensor(b, requires_grad=True)
    torch_conv(torch.tensor(signal), w1, b1, **kwargs).sum().backward()

    _assert_almost_equal(gw, w1.grad.numpy())
    if bias:
        _assert_almost_equal(gb, b1.grad.numpy())


def test_signal_gradient_matches_torch():
    """Also verify dL/dsignal (not covered by the reference grid)."""
    rng = np.random.default_rng(7)
    signal = rng.standard_normal((2, 3, 16)).astype(np.float32)
    w = rng.standard_normal((4, 3, 5)).astype(np.float32)

    gs = jax.grad(lambda s: fft_conv(s, jnp.asarray(w), padding=2).sum())(
        jnp.asarray(signal)
    )
    s1 = torch.tensor(signal, requires_grad=True)
    F.conv1d(s1, torch.tensor(w), padding=2).sum().backward()
    _assert_almost_equal(gs, s1.grad.numpy())


@pytest.mark.parametrize("padding_mode", ["reflect", "replicate", "circular"])
def test_padding_modes(padding_mode):
    """Non-constant padding modes match torch (reference functional.py:62)."""
    rng = np.random.default_rng(11)
    signal = rng.standard_normal((2, 3, 12, 12)).astype(np.float32)
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)

    x = torch.tensor(signal)
    x_padded = F.pad(x, [2, 2, 2, 2], mode=padding_mode)
    y1 = F.conv2d(x_padded, torch.tensor(w))
    y0 = fft_conv(jnp.asarray(signal), jnp.asarray(w), padding=2,
                  padding_mode=padding_mode)
    _assert_almost_equal(y0, y1.numpy())


@pytest.mark.parametrize("fft_policy", ["even", "pow2"])
@pytest.mark.parametrize("input_size", [7, 13, 16])
def test_fft_policy_equivalence(fft_policy, input_size):
    """pow2 FFT padding never changes the cropped valid region."""
    rng = np.random.default_rng(input_size)
    signal = rng.standard_normal((2, 3, input_size, input_size)).astype(np.float32)
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    y = fft_conv(jnp.asarray(signal), jnp.asarray(w), stride=2, padding=1,
                 fft_policy=fft_policy)
    y_ref = F.conv2d(torch.tensor(signal), torch.tensor(w), stride=2,
                     padding=1).numpy()
    _assert_almost_equal(y, y_ref)


def test_fft_policy_transpose_equivalence():
    from fft_conv_tpu.functional import fft_conv_transpose

    rng = np.random.default_rng(3)
    signal = rng.standard_normal((2, 3, 13)).astype(np.float32)
    w = rng.standard_normal((3, 4, 5)).astype(np.float32)
    y_ref = F.conv_transpose1d(torch.tensor(signal), torch.tensor(w),
                               stride=2, padding=1).numpy()
    for pol in ("even", "pow2"):
        y = fft_conv_transpose(jnp.asarray(signal), jnp.asarray(w), stride=2,
                               padding=1, fft_policy=pol)
        _assert_almost_equal(y, y_ref)


def test_bad_fft_policy_raises():
    with pytest.raises(ValueError):
        fft_conv(jnp.ones((1, 1, 16)), jnp.ones((1, 1, 3)),
                 fft_policy="bogus")


def test_bfloat16_runs():
    """bf16 inputs upcast to f32 spectra and return bf16."""
    rng = np.random.default_rng(3)
    signal = jnp.asarray(rng.standard_normal((2, 3, 32)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((4, 3, 5)).astype(np.float32)).astype(jnp.bfloat16)
    out = fft_conv(signal, w)
    assert out.dtype == jnp.bfloat16
    assert out.shape == (2, 4, 28)
