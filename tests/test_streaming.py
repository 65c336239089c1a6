"""Streaming conv tests: chunked == whole-signal causal convolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fft_conv_tpu.ops.streaming import (
    streaming_conv1d_init,
    streaming_conv1d_step,
)

from helpers import _assert_almost_equal


@pytest.mark.parametrize("dilation,groups", [(1, 1), (2, 1), (1, 2)])
def test_streaming_matches_causal_conv(dilation, groups):
    rng = np.random.default_rng(0)
    B, CIN, COUT, K, T = 2, 4, 6, 9, 50
    chunks = [rng.standard_normal((B, CIN, T)).astype(np.float32) for _ in range(4)]
    w = rng.standard_normal((COUT, CIN // groups, K)).astype(np.float32)
    b = rng.standard_normal((COUT,)).astype(np.float32)

    state = streaming_conv1d_init(B, CIN, K, dilation)
    outs = []
    for c in chunks:
        y, state = streaming_conv1d_step(
            state, jnp.asarray(c), jnp.asarray(w), jnp.asarray(b),
            dilation=dilation, groups=groups,
        )
        outs.append(np.asarray(y))
    streamed = np.concatenate(outs, axis=-1)

    # oracle: causal conv over the whole stream (left pad K_dil - 1)
    x = np.concatenate(chunks, axis=-1)
    k_dil = (K - 1) * dilation + 1
    x_pad = np.pad(x, ((0, 0), (0, 0), (k_dil - 1, 0)))
    y_ref = F.conv1d(torch.tensor(x_pad), torch.tensor(w), torch.tensor(b),
                     dilation=dilation, groups=groups).numpy()
    assert streamed.shape == y_ref.shape
    _assert_almost_equal(streamed, y_ref)


def test_streaming_under_scan():
    """The step composes with lax.scan (how a serving loop would run it)."""
    rng = np.random.default_rng(1)
    B, CIN, COUT, K, T, N = 1, 2, 3, 5, 16, 6
    chunks = jnp.asarray(rng.standard_normal((N, B, CIN, T)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((COUT, CIN, K)).astype(np.float32))

    def step(state, chunk):
        y, state = streaming_conv1d_step(state, chunk, w)
        return state, y

    state0 = streaming_conv1d_init(B, CIN, K)
    _, ys = jax.lax.scan(step, state0, chunks)
    streamed = np.moveaxis(np.asarray(ys), 0, -2).reshape(B, COUT, N * T)

    x = np.asarray(chunks).transpose(1, 2, 0, 3).reshape(B, CIN, N * T)
    x_pad = np.pad(x, ((0, 0), (0, 0), (K - 1, 0)))
    y_ref = F.conv1d(torch.tensor(x_pad), torch.tensor(np.asarray(w))).numpy()
    _assert_almost_equal(streamed, y_ref)


def test_streaming_state_validation():
    state = streaming_conv1d_init(1, 2, 5)
    with pytest.raises(ValueError):
        streaming_conv1d_step(state, jnp.ones((1, 2, 8)), jnp.ones((3, 2, 9)))


def test_streaming_is_differentiable():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((3, 2, 5)).astype(np.float32))
    chunk = jnp.asarray(rng.standard_normal((1, 2, 20)).astype(np.float32))
    state = streaming_conv1d_init(1, 2, 5)

    def loss(w_):
        y, _ = streaming_conv1d_step(state, chunk, w_)
        return (y ** 2).sum()

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
