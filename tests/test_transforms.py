"""JAX-transform composition tests.

The reference gets composability from torch autograd alone (SURVEY §3.4);
a JAX-native framework must additionally compose with vmap / scan / remat /
jvp — these lock that in.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fft_conv_tpu import FFTConv1d, fft_conv, fft_conv_transpose

from helpers import _assert_almost_equal


def _rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_vmap_over_kernels():
    """vmap over a stack of kernels == python loop."""
    rng = np.random.default_rng(0)
    sig = _rand(rng, (2, 3, 32))
    kernels = _rand(rng, (5, 4, 3, 7))  # 5 different conv kernels

    batched = jax.vmap(lambda k: fft_conv(sig, k))(kernels)
    for i in range(5):
        _assert_almost_equal(batched[i], fft_conv(sig, kernels[i]))


def test_vmap_over_signals_extra_axis():
    rng = np.random.default_rng(1)
    sigs = _rand(rng, (4, 2, 3, 32))
    k = _rand(rng, (4, 3, 7))
    batched = jax.vmap(lambda s: fft_conv(s, k))(sigs)
    assert batched.shape == (4, 2, 4, 26)
    _assert_almost_equal(batched[2], fft_conv(sigs[2], k))


def test_scan_over_layers():
    """lax.scan over stacked layer weights (weight-tied deep stack)."""
    rng = np.random.default_rng(2)
    sig = _rand(rng, (2, 4, 64))
    weights = _rand(rng, (3, 4, 4, 5))  # 3 layers of (4, 4, 5)

    def step(x, w):
        return fft_conv(x, w, padding=2), None

    out_scan, _ = jax.lax.scan(step, sig, weights)
    out_loop = sig
    for i in range(3):
        out_loop = fft_conv(out_loop, weights[i], padding=2)
    _assert_almost_equal(out_scan, out_loop)


def test_remat_through_fft_conv():
    """jax.checkpoint (remat) — the HBM-saving idiom — preserves grads."""
    rng = np.random.default_rng(3)
    sig = _rand(rng, (2, 3, 64))
    w = _rand(rng, (4, 3, 9))

    def loss(w_):
        return (fft_conv(sig, w_, padding=4) ** 2).sum()

    g_plain = jax.grad(loss)(w)
    g_remat = jax.grad(jax.checkpoint(loss))(w)
    _assert_almost_equal(g_plain, g_remat)


def test_jvp_linearity_in_signal():
    """fft_conv is linear in the signal: jvp wrt signal == conv of tangent."""
    rng = np.random.default_rng(4)
    sig = _rand(rng, (1, 2, 48))
    tangent = _rand(rng, (1, 2, 48))
    w = _rand(rng, (3, 2, 5))
    _, jvp_out = jax.jvp(lambda s: fft_conv(s, w), (sig,), (tangent,))
    _assert_almost_equal(jvp_out, fft_conv(tangent, w))


def test_check_grads_numerical():
    """First-order numerical gradient check on both ops."""
    from jax.test_util import check_grads

    rng = np.random.default_rng(5)
    sig = _rand(rng, (1, 2, 12))
    w = _rand(rng, (2, 2, 3))
    check_grads(
        lambda s, k: fft_conv(s, k, stride=2, padding=1).sum(),
        (sig, w), order=1, modes=["rev"], atol=1e-2, rtol=1e-2,
    )
    wt = _rand(rng, (2, 3, 3))
    check_grads(
        lambda s, k: fft_conv_transpose(s, k, stride=2, padding=1).sum(),
        (sig, wt), order=1, modes=["rev"], atol=1e-2, rtol=1e-2,
    )


def test_grad_of_grad():
    """Second-order differentiation (hessian-vector style) works."""
    rng = np.random.default_rng(6)
    sig = _rand(rng, (1, 2, 16))
    w = _rand(rng, (2, 2, 3))

    def loss(w_):
        return (fft_conv(sig, w_) ** 3).sum()

    g = jax.grad(loss)(w)
    hvp = jax.grad(lambda w_: (jax.grad(loss)(w_) * g).sum())(w)
    assert np.isfinite(np.asarray(hvp)).all()


def test_module_under_vmap_ensemble():
    """An ensemble of modules via vmap over stacked pytree leaves."""
    rng = np.random.default_rng(7)
    layer = FFTConv1d(3, 4, 5, padding=2, key=jax.random.key(0))
    stacked = jax.tree_util.tree_map(
        lambda p: jnp.stack([p, p * 2.0]), layer
    )
    x = _rand(rng, (2, 3, 32))
    outs = jax.vmap(lambda m: m(x))(stacked)
    assert outs.shape == (2, 2, 4, 32)
    _assert_almost_equal(outs[0], layer(x))
