"""Streaming (chunked, stateful) 1D FFT convolution.

The reference's headline use case is one huge device-resident signal
(README.md:29-30); production audio/serving pipelines instead see an
unbounded stream in chunks. This is the overlap-save recurrence as an
explicit functional state: carry the last K_dilated-1 input samples, emit
exactly one output per input sample (causal semantics — zero history before
the stream starts).

Pure-state JAX style: ``step`` is jittable, differentiable, and composes
with ``lax.scan`` over chunk sequences. On TPU, eligible chunks route
through the fused Pallas kernel automatically (ops.fft_conv impl="auto").
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.shapes import dilated_size
from .functional import fft_conv

State = jax.Array  # (B, Cin, K_dilated - 1) carried input history


def streaming_conv1d_init(
    batch: int, in_channels: int, kernel_size: int, dilation: int = 1,
    dtype=jnp.float32,
) -> State:
    """Zero history: the stream behaves as if preceded by silence."""
    k_dil = dilated_size(kernel_size, dilation)
    return jnp.zeros((batch, in_channels, k_dil - 1), dtype)


def streaming_conv1d_step(
    state: State,
    chunk: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    dilation: int = 1,
    groups: int = 1,
) -> Tuple[jax.Array, State]:
    """One streaming step: (state, chunk (B,Cin,T)) -> (y (B,Cout,T), state').

    Causal alignment: output sample t of the stream depends on input samples
    (t - K_dilated + 1 .. t). Concatenating all emitted chunks equals
    ``fft_conv(left_pad(x, K_dilated - 1), kernel)`` over the whole stream.
    """
    k_dil = dilated_size(kernel.shape[-1], dilation)
    if state.shape[-1] != k_dil - 1:
        raise ValueError(
            f"state carries {state.shape[-1]} samples, kernel needs {k_dil - 1}"
        )
    ext = jnp.concatenate([state, chunk], axis=-1)
    y = fft_conv(ext, kernel, bias, dilation=dilation, groups=groups)
    new_state = ext[..., ext.shape[-1] - (k_dil - 1):] if k_dil > 1 else state
    return y, new_state
