"""Mesh + sharding helpers: batch-DP and channel-TP for FFT convolution.

The reference has no distributed code at all (SURVEY §2.3 — grep-verified:
no torch.distributed/NCCL/MPI anywhere). These are the TPU-native
parallelism strategies designed for this framework:

  * data parallel   — shard the signal's batch axis. FFT conv is
    embarrassingly parallel over batch: zero cross-chip collectives; XLA
    just runs the identical program per shard over ICI-connected chips.
  * tensor parallel — shard the kernel's out_channels axis (and the bias).
    Each chip computes its slice of the per-bin channel matmul on its MXU;
    in_channels stay replicated so again no collectives in forward.

No hand-written communication backend exists or is needed: the "backend" is
``jax.sharding.Mesh`` + ``NamedSharding`` annotations compiled by XLA
(collectives, were any needed, ride ICI). See overlap_save.py for the one
strategy that does communicate (spatial sharding, ppermute halos).
"""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = 1,
    model: int = 1,
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Builds a (data, model, spatial) mesh over the given (or all) devices.

    Any axis of size 1 still exists in the mesh — specs can always name it.
    """
    if devices is None:
        devices = jax.devices()
    n = data * model * spatial
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices, only {len(devices)} available"
        )
    mesh_devices = np.asarray(devices[:n]).reshape(data, model, spatial)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS, "spatial"))


def conv_input_specs(mesh: Mesh) -> Tuple[NamedSharding, NamedSharding, NamedSharding]:
    """(signal, kernel, bias) shardings for combined DP+TP FFT conv.

    signal (B, Cin, *s): batch over 'data', channels/spatial replicated.
    kernel (Cout, Cin/g, *k): out-channels over 'model'.
    bias (Cout,): over 'model', aligned with the kernel shards.
    """
    sig = NamedSharding(mesh, P(DATA_AXIS))
    ker = NamedSharding(mesh, P(MODEL_AXIS))
    bias = NamedSharding(mesh, P(MODEL_AXIS))
    return sig, ker, bias


def conv_output_spec(mesh: Mesh) -> NamedSharding:
    """Output (B, Cout, *s): batch over 'data', out-channels over 'model'."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def shard_conv_inputs(signal, kernel, bias, mesh: Mesh):
    """Places (signal, kernel, bias) with DP+TP shardings on the mesh."""
    sig_s, ker_s, bias_s = conv_input_specs(mesh)
    signal = jax.device_put(signal, sig_s)
    kernel = jax.device_put(kernel, ker_s)
    if bias is not None:
        bias = jax.device_put(bias, bias_s)
    return signal, kernel, bias


def transpose_input_specs(mesh: Mesh) -> Tuple[NamedSharding, NamedSharding, NamedSharding]:
    """(signal, kernel, bias) shardings for DP+TP transposed FFT conv.

    Transposed kernels are (Cin, Cout/g, *k) (reference functional.py:109-114)
    so the TP axis is dim 1; bias stays (Cout,) on 'model'.
    """
    sig = NamedSharding(mesh, P(DATA_AXIS))
    ker = NamedSharding(mesh, P(None, MODEL_AXIS))
    bias = NamedSharding(mesh, P(MODEL_AXIS))
    return sig, ker, bias
