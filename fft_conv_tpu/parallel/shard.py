"""Explicit-SPMD (shard_map) data/tensor-parallel FFT convolution.

Why shard_map and not automatic sharding propagation: XLA's SPMD partitioner
does not partition the FFT HLO — a batch-sharded operand gets ALL-GATHERED
in front of ``fft`` (observed in compiled HLO this session), turning
data-parallel scaling into replication. Under ``shard_map`` each device runs
the whole FFT pipeline on its local block, which is exactly the
embarrassingly-parallel decomposition FFT conv admits over (batch, groups,
out-channels) — zero collectives in forward (SURVEY §2.3 DP/TP rows), except
the optional in-channel-sharded mode which psums partial spectra.

Parallel modes composed by one mesh:
  * data axis   — batch sharding (always collective-free)
  * model axis  — one of:
      - out-channel sharding (groups == 1), collective-free
      - whole-group sharding (model divides groups), collective-free;
        signal's channel axis is sharded alongside
      - in-channel sharding (tp_mode="in", groups == 1): each device
        convolves its slice of in-channels, then one ``psum`` over the model
        axis reduces partial outputs (the MXU-contraction split of
        SURVEY §2.3 TP row)
"""

from functools import partial
from typing import Iterable, Optional, Union

import jax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.functional import fft_conv, fft_conv_transpose
from ..utils.shapes import to_ntuple

IntOrTuple = Union[int, Iterable[int]]


def _tp_plan(groups: int, cin: int, cout: int, model_size: int, tp_mode: str):
    """Returns (signal_channel_sharded, local_groups) and validates."""
    if tp_mode not in ("in", "out"):
        raise ValueError(f"tp_mode must be 'in' or 'out', got {tp_mode!r}")
    if model_size == 1:
        return False, groups
    if tp_mode == "in":
        if groups != 1:
            raise ValueError("tp_mode='in' supports groups == 1 only")
        if cin % model_size:
            raise ValueError(
                f"in_channels {cin} not divisible by model axis {model_size}"
            )
        return True, 1
    if groups == 1:
        if cout % model_size:
            raise ValueError(
                f"out_channels {cout} not divisible by model axis {model_size}"
            )
        return False, 1
    if groups % model_size:
        raise ValueError(
            f"groups ({groups}) must be divisible by the model axis size "
            f"({model_size}) for grouped tensor parallelism"
        )
    return True, groups // model_size


def fft_conv_sharded(
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
    data_axis: Optional[str] = "data",
    model_axis: Optional[str] = "model",
    tp_mode: str = "out",
    impl: str = "auto",
) -> jax.Array:
    """DP+TP fft_conv over a mesh. Semantics identical to ``ops.fft_conv``.

    signal (B, Cin, *s): B sharded over ``data_axis``; kernel
    (Cout, Cin/groups, *k): Cout (or Cin for tp_mode="in") sharded over
    ``model_axis``. Returns output sharded (data, model) over (B, Cout)
    — or replicated over model for tp_mode="in".

    ``impl`` selects each shard's local implementation exactly as in
    ``ops.fft_conv`` — batch/channel sharding never changes the local
    spatial shapes, so the fused Pallas kernels compose with DP/TP
    (validated on the 8-device CPU mesh in tests/test_sharding.py).
    """
    data = data_axis if data_axis and mesh.shape.get(data_axis, 1) > 1 else None
    model = model_axis if model_axis and mesh.shape.get(model_axis, 1) > 1 else None
    model_size = mesh.shape[model] if model else 1
    if data and signal.shape[0] % mesh.shape[data]:
        raise ValueError(
            f"batch {signal.shape[0]} not divisible by data axis "
            f"{mesh.shape[data]}"
        )
    sig_ch_sharded, local_groups = _tp_plan(
        groups, signal.shape[1], kernel.shape[0], model_size, tp_mode
    )

    n = signal.ndim - 2
    spatial = (None,) * n
    conv_kwargs = dict(
        stride=to_ntuple(stride, n),
        padding=to_ntuple(padding, n),
        dilation=to_ntuple(dilation, n),
        groups=local_groups,
        padding_mode=padding_mode,
        impl=impl,
    )

    if tp_mode == "in" and model:
        sig_spec = P(data, model, *spatial)
        ker_spec = P(None, model, *spatial)
        bias_spec = P(None)
        out_spec = P(data, None, *spatial)

        def body(s, k, b):
            out = fft_conv(s, k, None, **conv_kwargs)
            out = lax.psum(out, model)
            if b is not None:
                out = out + b.reshape((1, -1) + (1,) * n)
            return out
    else:
        sig_spec = P(data, model if sig_ch_sharded else None, *spatial)
        ker_spec = P(model, None, *spatial)
        bias_spec = P(model)
        out_spec = P(data, model, *spatial)

        def body(s, k, b):
            return fft_conv(s, k, b, **conv_kwargs)

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
    # Re-checked round 5 (2026-08-20, jax still 0.9.0): flipping the flag
    # True reproduces the same "cotangent type does not match function
    # output" TypeError in test_sharded_gradients_match — unchanged.
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(sig_spec, ker_spec, bias_spec),
        out_specs=out_spec,
        check_vma=False,
    )(signal, kernel, bias)


def fft_conv_transpose_sharded(
    signal: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    output_padding: IntOrTuple = 0,
    dilation: IntOrTuple = 1,
    groups: int = 1,
    *,
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    model_axis: Optional[str] = "model",
    impl: str = "auto",
) -> jax.Array:
    """DP+TP transposed fft_conv. Kernel layout (Cin, Cout/g, *k) means TP
    shards dim 1 (out-channels within each group) when groups == 1, or whole
    groups on dim 0 otherwise (mirroring ``fft_conv_sharded``); ``impl``
    selects the per-shard implementation as in ``ops.fft_conv_transpose``."""
    data = data_axis if data_axis and mesh.shape.get(data_axis, 1) > 1 else None
    model = model_axis if model_axis and mesh.shape.get(model_axis, 1) > 1 else None
    model_size = mesh.shape[model] if model else 1
    cin, cout_g = kernel.shape[0], kernel.shape[1]
    if data and signal.shape[0] % mesh.shape[data]:
        raise ValueError(
            f"batch {signal.shape[0]} not divisible by data axis "
            f"{mesh.shape[data]}"
        )

    n = signal.ndim - 2
    spatial = (None,) * n
    local_groups = groups
    if model:
        if groups == 1:
            if cout_g % model_size:
                raise ValueError(
                    f"out_channels {cout_g} not divisible by model axis "
                    f"{model_size}"
                )
            sig_spec = P(data, None, *spatial)
            ker_spec = P(None, model, *spatial)
        else:
            if groups % model_size:
                raise ValueError(
                    f"groups ({groups}) must be divisible by model axis "
                    f"({model_size})"
                )
            # whole groups: Cin rows of a group stay together (dim 0 sharding)
            sig_spec = P(data, model, *spatial)
            ker_spec = P(model, None, *spatial)
            local_groups = groups // model_size
    else:
        sig_spec = P(data, None, *spatial)
        ker_spec = P(None, None, *spatial)
    bias_spec = P(model) if model else P(None)
    out_spec = P(data, model, *spatial)

    conv_kwargs = dict(
        stride=to_ntuple(stride, n),
        padding=to_ntuple(padding, n),
        output_padding=to_ntuple(output_padding, n),
        dilation=to_ntuple(dilation, n),
        groups=local_groups,
        impl=impl,
    )

    def body(s, k, b):
        return fft_conv_transpose(s, k, b, **conv_kwargs)

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
    # Re-checked round 5 (2026-08-20, jax still 0.9.0): flipping the flag
    # True reproduces the same "cotangent type does not match function
    # output" TypeError in test_sharded_gradients_match — unchanged.
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(sig_spec, ker_spec, bias_spec),
        out_specs=out_spec,
        check_vma=False,
    )(signal, kernel, bias)
