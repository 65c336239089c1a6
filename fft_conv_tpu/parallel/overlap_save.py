"""Overlap-save spatially-sharded FFT convolution (shard_map + ppermute).

The reference scales long signals only by doing one big device-local FFT
(README.md:29-30: a 2^20-sample signal). The TPU-native long-signal path
shards the innermost spatial axis across the mesh instead (SURVEY §5
long-context): each device FFT-convolves its local block plus a
(dilated_kernel - 1)-sample halo fetched from its right neighbor with a
single nearest-neighbor ``lax.ppermute`` over ICI — the conv analog of
blockwise/ring processing. No all-to-all, no distributed FFT.

Math (valid cross-correlation, innermost axis): output index i needs signal
[i, i + K - 1]. Device m holding block [mC, (m+1)C) therefore needs its block
plus the first K-1 samples of device m+1's block; it then computes exactly C
valid outputs. The global result is the concatenation, cropped to the true
valid length V = S - K + 1 (the last device's tail outputs past V are
garbage fed by the circular halo and are cropped away). Stride/bias are
applied globally afterwards — a strided slice over shards is cheap relative
to the FFTs.

This is also the intra-chip strategy for signals exceeding VMEM (SURVEY §7
hard parts): the same blocking runs inside the fused Pallas kernel.
"""

from functools import partial
from typing import Iterable, Optional, Union

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.functional import (
    _dilate_kernel,
    _freq_domain_conv,
    _pad_signal,
)
from ..utils.shapes import fft_even_shape, to_ntuple

IntOrTuple = Union[int, Iterable[int]]


def _local_overlap_save(block, kernel, axis_name, num_shards, halo, groups):
    """Per-device body: halo exchange + local valid FFT conv.

    block: (B, Cin, *spatial_local) — last axis is the sharded one.
    Returns (B, Cout, *valid_other, C) with C = local block length.
    """
    m = num_shards
    if halo > 0:
        # send my first `halo` samples to my LEFT neighbor (i receives from i+1)
        lead = lax.slice_in_dim(block, 0, halo, axis=-1)
        recv = lax.ppermute(
            lead, axis_name, perm=[(i, (i - 1) % m) for i in range(m)]
        )
        block = jnp.concatenate([block, recv], axis=-1)
    fft_shape = fft_even_shape(block.shape[2:])
    out = _freq_domain_conv(block, kernel, fft_shape, groups)
    # valid crop: every spatial dim [0 : s - k + 1); the last dim yields
    # exactly C = block_len - halo outputs.
    n = block.ndim - 2
    limits = list(out.shape[:2]) + [
        block.shape[2 + i] - kernel.shape[2 + i] + 1 for i in range(n)
    ]
    return lax.slice(out, [0] * out.ndim, limits)


def fft_conv_spatial_sharded(
    signal: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    dilation: IntOrTuple = 1,
    groups: int = 1,
    padding_mode: str = "constant",
    *,
    mesh: Mesh,
    axis_name: str = "spatial",
) -> jax.Array:
    """fft_conv with the innermost spatial axis sharded over ``axis_name``.

    Semantically identical to ``ops.fft_conv`` (same reference parity,
    functional.py:19-89); the innermost spatial axis is computed blockwise
    per device with halo exchange. The innermost padded axis length must be
    divisible by the mesh axis size (pad the signal or choose the mesh
    accordingly — an explicit error otherwise, no silent repartition).
    """
    n = signal.ndim - 2
    padding_ = to_ntuple(padding, n)
    stride_ = to_ntuple(stride, n)
    dilation_ = to_ntuple(dilation, n)
    axis_size = mesh.shape[axis_name]

    kernel = _dilate_kernel(kernel, dilation_)
    signal = _pad_signal(signal, padding_, padding_mode)

    s_last = signal.shape[-1]
    k_last = kernel.shape[-1]

    # Right-pad the sharded axis with zeros to a multiple of the axis size.
    # Appended zeros never reach the valid region [0, s - k + 1), which is
    # computed against the *original* padded length and cropped below.
    extra = (-s_last) % axis_size
    if extra:
        pad_cfg = [(0, 0, 0)] * (signal.ndim - 1) + [(0, extra, 0)]
        signal = lax.pad(signal, jnp.zeros((), signal.dtype), pad_cfg)

    if k_last - 1 > (s_last + extra) // axis_size:
        raise ValueError(
            f"halo (dilated kernel - 1 = {k_last - 1}) exceeds the local "
            f"block length {(s_last + extra) // axis_size}; use fewer shards "
            f"or the unsharded path"
        )

    in_specs = (
        P(*([None] * (signal.ndim - 1) + [axis_name])),  # signal: last dim
        P(),                                             # kernel replicated
    )
    out_specs = P(*([None] * (signal.ndim - 1) + [axis_name]))

    local = partial(
        _local_overlap_save,
        axis_name=axis_name,
        num_shards=axis_size,
        halo=k_last - 1,
        groups=groups,
    )
    # check_vma=False: with vma checking on (jax 0.9 default), reverse-mode
    # AD through the body fails — the cotangent carries varying-manual-axes
    # {V:model} while the traced output type is unannotated ("cotangent type
    # does not match function output", reproduced 2026-08-17 in
    # tests/test_sharding.py::test_sharded_gradients_match). Propagating vma
    # annotations through the FFT/custom_vjp pipeline isn't supported yet;
    # revisit when jax's vma-AD interaction stabilizes (doc/ROADMAP.md).
    # Re-checked round 4 (jax still 0.9.0): with check_vma=True the fused
    # impl now ALSO fails in forward pallas_call tracing, not just AD —
    # the flag stays off until a jax upgrade lands.
    out = jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(signal, kernel)

    # Global valid length on the sharded axis, then stride every dim.
    valid_last = s_last - k_last + 1
    limits = list(out.shape[:-1]) + [valid_last]
    out = lax.slice(
        out, [0] * out.ndim, limits, (1, 1) + stride_
    )

    if bias is not None:
        out = out + bias.astype(out.dtype).reshape((1, -1) + (1,) * n)
    return out
