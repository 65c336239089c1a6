"""Edge cases the main grid doesn't cover: per-axis tuple arguments,
kernel_size=1, minimal spatial sizes, mixed odd/even axes.

The reference accepts int-or-iterable for every spatial argument
(reference utils.py:4-20 via functional.py:45-47, 103-107); these lock in
the tuple paths.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fft_conv_tpu import fft_conv, fft_conv_transpose

from helpers import _assert_almost_equal


def _np(rng, shape):
    return rng.standard_normal(shape).astype(np.float32)


def test_tuple_args_2d():
    rng = np.random.default_rng(0)
    sig = _np(rng, (2, 3, 11, 14))
    w = _np(rng, (4, 3, 2, 3))  # non-square kernel
    b = _np(rng, (4,))
    kwargs = dict(stride=(1, 2), padding=(0, 1), dilation=(2, 1))
    y = fft_conv(jnp.asarray(sig), jnp.asarray(w), jnp.asarray(b), **kwargs)
    y_ref = F.conv2d(torch.tensor(sig), torch.tensor(w), torch.tensor(b),
                     **kwargs).numpy()
    _assert_almost_equal(y, y_ref)


def test_tuple_args_3d_transpose():
    rng = np.random.default_rng(1)
    sig = _np(rng, (1, 2, 5, 6, 7))
    w = _np(rng, (2, 3, 2, 3, 2))
    b = _np(rng, (3,))
    kwargs = dict(stride=(2, 1, 3), padding=(1, 0, 1),
                  output_padding=(1, 0, 2), dilation=(1, 2, 1))
    y = fft_conv_transpose(jnp.asarray(sig), jnp.asarray(w), jnp.asarray(b),
                           **kwargs)
    y_ref = F.conv_transpose3d(torch.tensor(sig), torch.tensor(w),
                               torch.tensor(b), **kwargs).numpy()
    _assert_almost_equal(y, y_ref)


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_kernel_size_one(ndim):
    """K=1 degenerates to a channel mixer — the reference's k=1 sweep row."""
    rng = np.random.default_rng(2)
    sig = _np(rng, (2, 3) + (9,) * ndim)
    w = _np(rng, (4, 3) + (1,) * ndim)
    y = fft_conv(jnp.asarray(sig), jnp.asarray(w))
    y_ref = getattr(F, f"conv{ndim}d")(torch.tensor(sig), torch.tensor(w)).numpy()
    _assert_almost_equal(y, y_ref)


def test_input_size_one():
    sig = jnp.ones((1, 2, 1))
    w = jnp.ones((3, 2, 1))
    y = fft_conv(sig, w)
    assert y.shape == (1, 3, 1)
    assert np.allclose(np.asarray(y), 2.0)


def test_mixed_odd_even_axes():
    """Odd one axis, even the other — the interm_shape rounding bug farm."""
    rng = np.random.default_rng(3)
    sig = _np(rng, (2, 2, 7, 8))
    w = _np(rng, (3, 2, 3, 2))
    y = fft_conv(jnp.asarray(sig), jnp.asarray(w), padding=(1, 0))
    y_ref = F.conv2d(torch.tensor(sig), torch.tensor(w), padding=(1, 0)).numpy()
    _assert_almost_equal(y, y_ref)


def test_large_stride_exceeding_valid():
    """Stride larger than the valid region yields a single output sample."""
    rng = np.random.default_rng(4)
    sig = _np(rng, (1, 1, 10))
    w = _np(rng, (1, 1, 3))
    y = fft_conv(jnp.asarray(sig), jnp.asarray(w), stride=10)
    y_ref = F.conv1d(torch.tensor(sig), torch.tensor(w), stride=10).numpy()
    _assert_almost_equal(y, y_ref)
    assert y.shape == y_ref.shape == (1, 1, 1)


def test_batch_size_one_and_many():
    rng = np.random.default_rng(5)
    for batch in (1, 7):
        sig = _np(rng, (batch, 2, 16))
        w = _np(rng, (2, 2, 4))
        y = fft_conv(jnp.asarray(sig), jnp.asarray(w))
        y_ref = F.conv1d(torch.tensor(sig), torch.tensor(w)).numpy()
        _assert_almost_equal(y, y_ref)


def test_auto_impl_small_kernel_stays_composed():
    """auto keeps tiny kernels on the composed path (bitwise identical)."""
    rng = np.random.default_rng(6)
    sig = jnp.asarray(_np(rng, (1, 2, 4096)))
    w = jnp.asarray(_np(rng, (2, 2, 3)))
    assert np.array_equal(
        np.asarray(fft_conv(sig, w, impl="auto")),
        np.asarray(fft_conv(sig, w, impl="xla")),
    )


def test_rank_mismatch_raises():
    """A kernel whose rank doesn't match the signal's must fail fast with
    a clear ValueError (previously died deep in a spectral reshape)."""
    sig = jnp.zeros((2, 3, 32, 32))
    with pytest.raises(ValueError, match="kernel rank"):
        fft_conv(sig, jnp.zeros((4, 3, 5, 5, 2)))
    with pytest.raises(ValueError, match="kernel rank"):
        fft_conv_transpose(sig, jnp.zeros((3, 4, 5)))
    with pytest.raises(ValueError, match="batch, channels"):
        fft_conv(jnp.zeros((3, 32)), jnp.zeros((4, 3, 5)))
    with pytest.raises(ValueError, match="batch, channels"):
        fft_conv_transpose(jnp.zeros((3, 32)), jnp.zeros((3, 4, 5)))
