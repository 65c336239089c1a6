"""MXU DFT-matmul path tests (ops/spectral.py).

The path self-gates to TPU; here it is forced on to verify numerics on the
CPU backend against numpy FFT and torch direct conv.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import fft_conv_tpu.ops.spectral as spectral
from fft_conv_tpu.ops.spectral import (
    freq_domain_conv_matmul,
    irfftn_matmul,
    rfftn_matmul,
    use_matmul_dft,
)

from helpers import _assert_almost_equal


@pytest.fixture
def force_matmul_dft(monkeypatch):
    monkeypatch.setattr(
        spectral, "use_matmul_dft", lambda fft_shape, platform=None: True
    )


@pytest.mark.parametrize("shape,fft_shape", [
    ((2, 3, 24), (32,)),
    ((2, 3, 24, 17), (24, 18)),
    ((1, 2, 8, 9, 10), (8, 10, 12)),
])
def test_rfftn_matmul_vs_numpy(shape, fft_shape):
    """The module's convention halves the FIRST spatial axis (lane-width
    reasons — see rfftn_matmul docstring): numpy equivalent is rfftn with
    the first spatial axis listed last."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    fr, fi = rfftn_matmul(jnp.asarray(x), fft_shape)
    n = len(fft_shape)
    axes = tuple(range(-n + 1, 0)) + (-n,)  # rfft applies to axes[-1]
    s = fft_shape[1:] + (fft_shape[0],)
    ref = np.fft.rfftn(x, s=s, axes=axes)
    got = np.asarray(fr) + 1j * np.asarray(fi)
    assert np.abs(got - ref).max() < 1e-4


def test_irfftn_matmul_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 2, 20, 16)).astype(np.float32)
    fr, fi = rfftn_matmul(jnp.asarray(x), (20, 16))
    y = irfftn_matmul(fr, fi, (20, 16))
    assert np.abs(np.asarray(y) - x).max() < 1e-5


def test_irfftn_matmul_odd_axis():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 1, 15)).astype(np.float32)
    fr, fi = rfftn_matmul(jnp.asarray(x), (15,))
    y = irfftn_matmul(fr, fi, (15,))
    assert np.abs(np.asarray(y) - x).max() < 1e-5


def test_implicit_zero_padding_matches_explicit():
    """Row-sliced matrices == zero-padding the input (the kernel-FFT path)."""
    rng = np.random.default_rng(3)
    k = rng.standard_normal((4, 3, 5, 5)).astype(np.float32)
    fr, fi = rfftn_matmul(jnp.asarray(k), (32, 32))
    k_pad = np.pad(k, ((0, 0), (0, 0), (0, 27), (0, 27)))
    fr2, fi2 = rfftn_matmul(jnp.asarray(k_pad), (32, 32))
    assert np.abs(np.asarray(fr) - np.asarray(fr2)).max() < 1e-4
    assert np.abs(np.asarray(fi) - np.asarray(fi2)).max() < 1e-4


@pytest.mark.parametrize("ndim,size,groups", [(1, 33, 1), (2, 20, 2), (3, 9, 1)])
def test_forced_matmul_conv_matches_torch(force_matmul_dft, ndim, size, groups):
    from fft_conv_tpu import fft_conv

    rng = np.random.default_rng(ndim)
    sig = rng.standard_normal((2, 4) + (size,) * ndim).astype(np.float32)
    w = rng.standard_normal((6, 4 // groups) + (3,) * ndim).astype(np.float32)
    b = rng.standard_normal((6,)).astype(np.float32)
    y = fft_conv(jnp.asarray(sig), jnp.asarray(w), jnp.asarray(b),
                 stride=2, padding=1, dilation=2, groups=groups, impl="xla")
    y_ref = getattr(F, f"conv{ndim}d")(
        torch.tensor(sig), torch.tensor(w), torch.tensor(b),
        stride=2, padding=1, dilation=2, groups=groups,
    ).numpy()
    _assert_almost_equal(y, y_ref)


def test_forced_matmul_transpose_matches_torch(force_matmul_dft):
    from fft_conv_tpu import fft_conv_transpose

    rng = np.random.default_rng(9)
    sig = rng.standard_normal((2, 4, 14, 14)).astype(np.float32)
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    y = fft_conv_transpose(jnp.asarray(sig), jnp.asarray(w), stride=2,
                           padding=1, output_padding=1, impl="xla")
    y_ref = F.conv_transpose2d(torch.tensor(sig), torch.tensor(w), stride=2,
                               padding=1, output_padding=1).numpy()
    _assert_almost_equal(y, y_ref)


def test_forced_matmul_gradients(force_matmul_dft):
    from fft_conv_tpu import fft_conv

    rng = np.random.default_rng(5)
    sig = rng.standard_normal((1, 2, 12, 12)).astype(np.float32)
    w = rng.standard_normal((3, 2, 3, 3)).astype(np.float32)

    gw = jax.grad(lambda w_: fft_conv(jnp.asarray(sig), w_, impl="xla").sum())(
        jnp.asarray(w)
    )
    w1 = torch.tensor(w, requires_grad=True)
    F.conv2d(torch.tensor(sig), w1).sum().backward()
    _assert_almost_equal(gw, w1.grad.numpy())


def test_fourstep_axis_branch(force_matmul_dft, monkeypatch):
    """Scrambled-bin factorized DFT on large pow2 full-DFT axes: forward AND
    reversed-stage inverse (the inverse-order bug farm) round-trip through a
    real conv. The threshold is lowered so small test shapes take the
    branch."""
    monkeypatch.setattr(spectral, "_FOURSTEP_MIN", 16)
    from fft_conv_tpu import fft_conv

    rng = np.random.default_rng(17)
    sig = rng.standard_normal((1, 3, 24, 32)).astype(np.float32)  # axis1 pow2
    w = rng.standard_normal((4, 3, 5, 5)).astype(np.float32)
    y = fft_conv(jnp.asarray(sig), jnp.asarray(w), padding=2, impl="xla")
    y_ref = F.conv2d(torch.tensor(sig), torch.tensor(w), padding=2).numpy()
    _assert_almost_equal(y, y_ref)


def test_use_matmul_dft_gating():
    assert not use_matmul_dft((512, 512), platform="cpu")
    assert use_matmul_dft((512, 512), platform="tpu")
    assert not use_matmul_dft((4096,), platform="tpu")


def test_set_spectral_precision_validates():
    with pytest.raises(ValueError):
        spectral.set_spectral_precision("bogus")
