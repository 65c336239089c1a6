"""Torch-compatible parameter initialization.

The reference modules inherit their init from ``torch.nn.ConvNd``
(reference nn.py:42-63 — the subclass bodies are empty): weights use
``kaiming_uniform_(a=sqrt(5))`` and biases use ``U(-1/sqrt(fan_in),
1/sqrt(fan_in))``. With a = sqrt(5), kaiming-uniform's bound also reduces to
exactly ``1/sqrt(fan_in)``:

    gain  = sqrt(2 / (1 + a^2)) = sqrt(1/3)
    bound = sqrt(3) * gain / sqrt(fan_in) = 1 / sqrt(fan_in)

``fan_in`` follows torch's ``_calculate_fan_in_and_fan_out``: dim-1 of the
weight times the receptive field, i.e. (Cin/g)*prod(k) for conv weights
(Cout, Cin/g, *k) and (Cout/g)*prod(k) for transposed weights
(Cin, Cout/g, *k).
"""

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def conv_fan_in(weight_shape: Sequence[int]) -> int:
    receptive = 1
    for k in weight_shape[2:]:
        receptive *= k
    return weight_shape[1] * receptive


def init_conv_params(
    key: jax.Array,
    weight_shape: Sequence[int],
    use_bias: bool,
    out_channels: int,
    dtype=jnp.float32,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Returns (weight, bias-or-None) with torch ConvNd's default init."""
    fan_in = conv_fan_in(weight_shape)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    w_key, b_key = jax.random.split(key)
    weight = jax.random.uniform(
        w_key, tuple(weight_shape), dtype=jnp.float32, minval=-bound, maxval=bound
    ).astype(dtype)
    bias = None
    if use_bias:
        bias = jax.random.uniform(
            b_key, (out_channels,), dtype=jnp.float32, minval=-bound, maxval=bound
        ).astype(dtype)
    return weight, bias
