"""Distributed tests on a virtual 8-device CPU mesh.

The multi-device analog of a fake backend (SURVEY §4 implication): sharded
execution must match single-device execution exactly or to FFT tolerance,
and the compiled programs must use the collectives we designed (none for
DP/TP, ppermute only for overlap-save).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fft_conv_tpu import fft_conv, fft_conv_transpose
from fft_conv_tpu.parallel import (
    fft_conv_sharded,
    fft_conv_spatial_sharded,
    fft_conv_transpose_sharded,
    make_mesh,
    shard_conv_inputs,
    transpose_input_specs,
)

from helpers import _assert_almost_equal, _assert_close_scaled

requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@requires_8_devices
@pytest.mark.parametrize("stride,padding,dilation,groups", [
    (1, 0, 1, 1),
    (2, 3, 2, 1),
    (1, 4, 1, 3),
    (3, 1, 1, 2),
])
def test_overlap_save_matches_single_device_1d(stride, padding, dilation, groups):
    rng = np.random.default_rng(0)
    mesh = make_mesh(spatial=8)
    sig = _rand(rng, (2, 6, 512))
    w = _rand(rng, (6, 6 // groups, 17))
    b = _rand(rng, (6,))
    y_ref = fft_conv(sig, w, b, stride=stride, padding=padding,
                     dilation=dilation, groups=groups)
    y = fft_conv_spatial_sharded(sig, w, b, stride=stride, padding=padding,
                                 dilation=dilation, groups=groups, mesh=mesh)
    assert y.shape == y_ref.shape
    _assert_almost_equal(y, y_ref)


@requires_8_devices
def test_overlap_save_matches_single_device_2d():
    rng = np.random.default_rng(1)
    mesh = make_mesh(spatial=8)
    sig = _rand(rng, (2, 3, 24, 64))
    w = _rand(rng, (4, 3, 5, 5))
    b = _rand(rng, (4,))
    y_ref = fft_conv(sig, w, b, padding=2)
    y = fft_conv_spatial_sharded(sig, w, b, padding=2, mesh=mesh)
    _assert_almost_equal(y, y_ref)


@requires_8_devices
def test_overlap_save_non_divisible_length_auto_pads():
    rng = np.random.default_rng(2)
    mesh = make_mesh(spatial=8)
    sig = _rand(rng, (1, 2, 509))  # 509 not divisible by 8
    w = _rand(rng, (3, 2, 9))
    y_ref = fft_conv(sig, w)
    y = fft_conv_spatial_sharded(sig, w, mesh=mesh)
    _assert_almost_equal(y, y_ref)


@requires_8_devices
def test_overlap_save_halo_too_large_raises():
    mesh = make_mesh(spatial=8)
    sig = jnp.ones((1, 1, 64))  # blocks of 8
    w = jnp.ones((1, 1, 33))    # halo 32 > 8
    with pytest.raises(ValueError):
        fft_conv_spatial_sharded(sig, w, mesh=mesh)


@requires_8_devices
def test_overlap_save_gradients_match():
    rng = np.random.default_rng(3)
    mesh = make_mesh(spatial=8)
    sig = _rand(rng, (2, 3, 256))
    w = _rand(rng, (4, 3, 17))
    b = _rand(rng, (4,))
    g = jax.grad(lambda w_: fft_conv_spatial_sharded(sig, w_, b, mesh=mesh).sum())(w)
    g_ref = jax.grad(lambda w_: fft_conv(sig, w_, b).sum())(w)
    _assert_almost_equal(g, g_ref)


@requires_8_devices
def test_dp_tp_sharded_forward_exact():
    """Batch-DP + channel-TP: bitwise equal to single-device, sharded output."""
    rng = np.random.default_rng(4)
    mesh = make_mesh(data=4, model=2)
    sig = _rand(rng, (8, 6, 256))
    w = _rand(rng, (8, 6, 33))
    b = _rand(rng, (8,))
    y_ref = fft_conv(sig, w, b, padding=16)
    ssig, sker, sb = shard_conv_inputs(sig, w, b, mesh)
    y = fft_conv(ssig, sker, sb, padding=16)
    assert np.array_equal(np.asarray(y), np.asarray(y_ref))
    assert y.sharding.spec == jax.sharding.PartitionSpec("data", "model")


@requires_8_devices
def test_dp_shard_map_forward_collective_free():
    """Pure batch-DP forward must be collective-free (SURVEY §2.3 DP row).

    Uses the explicit shard_map path: XLA's automatic partitioner cannot
    partition the FFT HLO and inserts an all-gather instead (observed), which
    is why fft_conv_sharded exists.
    """
    mesh = make_mesh(data=8)
    sig = jnp.ones((8, 4, 128))
    w = jnp.ones((4, 4, 9))
    b = jnp.ones((4,))
    hlo = (
        jax.jit(lambda s, w, b: fft_conv_sharded(s, w, b, mesh=mesh))
        .lower(sig, w, b).compile().as_text()
    )
    for coll in ("all-reduce", "all-gather", "all-to-all", "collective-permute",
                 "reduce-scatter"):
        assert coll not in hlo, f"unexpected {coll} in DP forward"


@requires_8_devices
@pytest.mark.parametrize("groups,tp_mode", [(1, "out"), (2, "out"), (1, "in")])
def test_dp_tp_shard_map_matches(groups, tp_mode):
    """Explicit DP+TP shard_map execution matches single-device fft_conv."""
    rng = np.random.default_rng(6)
    mesh = make_mesh(data=4, model=2)
    sig = _rand(rng, (8, 6, 256))
    w = _rand(rng, (8, 6 // groups, 33))
    b = _rand(rng, (8,))
    y_ref = fft_conv(sig, w, b, padding=16, groups=groups)
    y = fft_conv_sharded(sig, w, b, padding=16, groups=groups, mesh=mesh,
                         tp_mode=tp_mode)
    _assert_almost_equal(y, y_ref)


@requires_8_devices
@pytest.mark.parametrize("groups", [1, 2])
def test_transpose_shard_map_matches(groups):
    rng = np.random.default_rng(7)
    mesh = make_mesh(data=4, model=2)
    sig = _rand(rng, (8, 6, 64))
    w = _rand(rng, (6, 8 // groups, 9))
    b = _rand(rng, (8,))
    y_ref = fft_conv_transpose(sig, w, b, stride=2, groups=groups)
    y = fft_conv_transpose_sharded(sig, w, b, stride=2, groups=groups, mesh=mesh)
    _assert_almost_equal(y, y_ref)



@requires_8_devices
@pytest.mark.parametrize("impl", ["fused", "tiled"])
def test_dp_tp_shard_map_fused_impl_matches(impl):
    """The fast local paths (fused Pallas kernel in interpret mode on CPU,
    tiled overlap-save) compose with DP+TP shard_map: batch/out-channel
    sharding never changes a shard's local spatial shapes."""
    rng = np.random.default_rng(9)
    mesh = make_mesh(data=4, model=2)
    sig = _rand(rng, (8, 6, 256))
    w = _rand(rng, (8, 6, 33))
    b = _rand(rng, (8,))
    y_ref = fft_conv(sig, w, b, padding=16, impl="xla")
    y = fft_conv_sharded(sig, w, b, padding=16, mesh=mesh, impl=impl)
    assert y.shape == y_ref.shape
    _assert_close_scaled(y, y_ref)


@requires_8_devices
def test_dp_tp_shard_map_fused2d_matches():
    rng = np.random.default_rng(10)
    mesh = make_mesh(data=2, model=2)
    sig = _rand(rng, (4, 4, 96, 160))
    w = _rand(rng, (4, 4, 5, 5))
    b = _rand(rng, (4,))
    y_ref = fft_conv(sig, w, b, padding=2, impl="xla")
    y = fft_conv_sharded(sig, w, b, padding=2, mesh=mesh, impl="fused")
    assert y.shape == y_ref.shape
    _assert_close_scaled(y, y_ref)


@requires_8_devices
def test_transpose_shard_map_fused_impl_matches():
    rng = np.random.default_rng(11)
    mesh = make_mesh(data=2, model=2)
    sig = _rand(rng, (4, 6, 128))
    w = _rand(rng, (6, 8, 9))
    b = _rand(rng, (8,))
    y_ref = fft_conv_transpose(sig, w, b, impl="xla")
    y = fft_conv_transpose_sharded(sig, w, b, mesh=mesh, impl="fused")
    assert y.shape == y_ref.shape
    _assert_close_scaled(y, y_ref)


@requires_8_devices
def test_sharded_fused_gradients_match():
    """custom_vjp of the fused kernel under shard_map (backward runs the
    composed path per shard)."""
    rng = np.random.default_rng(12)
    mesh = make_mesh(data=4, model=2)
    sig = _rand(rng, (8, 6, 256))
    w = _rand(rng, (8, 6, 33))
    b = _rand(rng, (8,))
    g = jax.grad(
        lambda w_: fft_conv_sharded(sig, w_, b, mesh=mesh, impl="fused").sum()
    )(w)
    g_ref = jax.grad(lambda w_: fft_conv(sig, w_, b, impl="xla").sum())(w)
    _assert_close_scaled(g, g_ref)


@requires_8_devices
def test_sharded_gradients_match():
    rng = np.random.default_rng(8)
    mesh = make_mesh(data=4, model=2)
    sig = _rand(rng, (8, 6, 256))
    w = _rand(rng, (8, 6, 33))
    b = _rand(rng, (8,))
    g = jax.grad(lambda w_: fft_conv_sharded(sig, w_, b, mesh=mesh).sum())(w)
    g_ref = jax.grad(lambda w_: fft_conv(sig, w_, b).sum())(w)
    _assert_almost_equal(g, g_ref)


@requires_8_devices
def test_overlap_save_uses_only_ppermute():
    """Overlap-save halo exchange is a single nearest-neighbor permute."""
    mesh = make_mesh(spatial=8)
    sig = jnp.ones((1, 2, 512))
    w = jnp.ones((3, 2, 9))
    hlo = (
        jax.jit(lambda s, w: fft_conv_spatial_sharded(s, w, mesh=mesh))
        .lower(sig, w).compile().as_text()
    )
    assert "collective-permute" in hlo
    for coll in ("all-to-all", "reduce-scatter"):
        assert coll not in hlo, f"unexpected {coll} in overlap-save"


@requires_8_devices
def test_tp_transpose_sharded_forward():
    rng = np.random.default_rng(5)
    mesh = make_mesh(data=2, model=2)
    sig = _rand(rng, (4, 6, 64))
    w = _rand(rng, (6, 8, 9))  # (Cin, Cout/g=8, k) groups=1
    b = _rand(rng, (8,))
    y_ref = fft_conv_transpose(sig, w, b, stride=2)
    sig_s, ker_s, bias_s = transpose_input_specs(mesh)
    y = fft_conv_transpose(
        jax.device_put(sig, sig_s), jax.device_put(w, ker_s),
        jax.device_put(b, bias_s), stride=2,
    )
    _assert_almost_equal(y, y_ref)
