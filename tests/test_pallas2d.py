"""Fused 2D Pallas tile-kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from fft_conv_tpu import fft_conv
from fft_conv_tpu.kernels.fused2d import (
    fft_conv2d_fused,
    fft_conv_transpose2d_fused,
    tile_plan_2d,
)

from helpers import _assert_close_scaled



CONFIGS = [
    # (B, cin, cout, H, W, KH, KW, pad)
    (1, 2, 3, 200, 160, 10, 12, 0),
    (2, 4, 4, 300, 256, 34, 34, 5),
    (1, 1, 1, 130, 140, 3, 5, 0),
    (1, 3, 2, 129, 130, 16, 16, 0),   # odd sizes, partial last tiles
    (2, 8, 8, 180, 170, 16, 16, 2),   # benchmark-like channel counts
    (1, 8, 3, 140, 260, 7, 9, 0),     # cin=8, uneven cout, wide W (nt2>2)
]


@pytest.mark.parametrize("b,cin,cout,h,w,kh,kw,pad", CONFIGS)
def test_fused2d_matches_torch(b, cin, cout, h, w, kh, kw, pad):
    rng = np.random.default_rng(kh + w)
    sig = rng.standard_normal((b, cin, h, w)).astype(np.float32)
    ker = rng.standard_normal((cout, cin, kh, kw)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    y = fft_conv2d_fused(jnp.asarray(sig), jnp.asarray(ker), jnp.asarray(bias),
                         padding=pad)
    y_ref = TF.conv2d(torch.tensor(sig), torch.tensor(ker), torch.tensor(bias),
                      padding=pad).numpy()
    _assert_close_scaled(y, y_ref)


@pytest.mark.parametrize(
    "stride,dilation,groups,pmode",
    [
        ((2, 1), 1, 1, "constant"),
        (1, (1, 2), 1, "constant"),
        (1, 1, 2, "constant"),
        (1, 1, 1, "reflect"),
        ((2, 3), 2, 2, "circular"),
    ],
)
def test_fused2d_arg_surface(stride, dilation, groups, pmode):
    rng = np.random.default_rng(7)
    pad = 3
    sig = rng.standard_normal((2, 4, 160, 150)).astype(np.float32)
    ker = rng.standard_normal((4, 4 // groups, 9, 7)).astype(np.float32)
    xt = torch.tensor(sig)
    tmode = {"constant": None, "reflect": "reflect", "circular": "circular"}[pmode]
    if tmode is None:
        ref = TF.conv2d(xt, torch.tensor(ker), stride=stride, padding=pad,
                        dilation=dilation, groups=groups).numpy()
    else:
        xt = TF.pad(xt, (pad, pad, pad, pad), mode=tmode)
        ref = TF.conv2d(xt, torch.tensor(ker), stride=stride,
                        dilation=dilation, groups=groups).numpy()
    y = fft_conv2d_fused(
        jnp.asarray(sig), jnp.asarray(ker), padding=pad, padding_mode=pmode,
        stride=stride, dilation=dilation, groups=groups,
    )
    _assert_close_scaled(y, ref)


@pytest.mark.parametrize("version", ["v2", "v3"])
@pytest.mark.parametrize("mac_mode", ["loop", "kara"])
@pytest.mark.parametrize("groups", [1, 2])
def test_fused2d_versions_and_mac_modes(version, mac_mode, groups):
    """Full (kernel-generation x MAC-strategy) matrix vs the torch oracle:
    the switches only restructure MXU/VPU work, never the math. Grouped
    configs exercise the per-group kara accumulators and the v3 padded-
    row spectra slices."""
    import fft_conv_tpu.kernels.fused2d as f2

    rng = np.random.default_rng(11)
    sig = rng.standard_normal((2, 4, 170, 180)).astype(np.float32)
    ker = rng.standard_normal((4, 4 // groups, 12, 16)).astype(np.float32)
    bias = rng.standard_normal((4,)).astype(np.float32)
    ref = TF.conv2d(torch.tensor(sig), torch.tensor(ker),
                    torch.tensor(bias), padding=2, groups=groups).numpy()
    f2.set_fused2d_kernel(version)
    f2.set_fused2d_mac(mac_mode)
    try:
        y = fft_conv2d_fused(
            jnp.asarray(sig), jnp.asarray(ker), jnp.asarray(bias),
            padding=2, groups=groups,
        )
    finally:
        f2.set_fused2d_kernel("v2")
        f2.set_fused2d_mac("loop")
    _assert_close_scaled(y, ref)


@pytest.mark.parametrize("dbuf", [False, True])
def test_fused2d_dbuf_matches_torch(dbuf):
    """The ping-pong x prefetch (default on; measured -16/-18% on v5e,
    scratch/tpu_r4_2ddbuf.py) only changes WHEN each cell's H-window
    lands in VMEM, never the math — both settings must match the torch
    oracle on a multi-cell (nt1>1, nt2>1) grid."""
    import fft_conv_tpu.kernels.fused2d as f2

    rng = np.random.default_rng(31)
    sig = rng.standard_normal((2, 3, 300, 260)).astype(np.float32)
    ker = rng.standard_normal((4, 3, 16, 16)).astype(np.float32)
    bias = rng.standard_normal((4,)).astype(np.float32)
    ref = TF.conv2d(torch.tensor(sig), torch.tensor(ker),
                    torch.tensor(bias), padding=2).numpy()
    f2.set_fused2d_dbuf(dbuf)
    try:
        y = fft_conv2d_fused(
            jnp.asarray(sig), jnp.asarray(ker), jnp.asarray(bias),
            padding=2,
        )
    finally:
        f2.set_fused2d_dbuf(True)
    _assert_close_scaled(y, ref)


@pytest.mark.parametrize("pad", [0, 2, 5])
def test_fused2d_transpose_matches_torch(pad):
    rng = np.random.default_rng(pad)
    sig = rng.standard_normal((2, 3, 140, 130)).astype(np.float32)
    ker = rng.standard_normal((3, 2, 5, 4)).astype(np.float32)
    bias = rng.standard_normal((2,)).astype(np.float32)
    ref = TF.conv_transpose2d(
        torch.tensor(sig), torch.tensor(ker), torch.tensor(bias), padding=pad
    ).numpy()
    y = fft_conv_transpose2d_fused(
        jnp.asarray(sig), jnp.asarray(ker), jnp.asarray(bias), padding=pad
    )
    _assert_close_scaled(y, ref)


def test_fused2d_gradients_match_composed():
    rng = np.random.default_rng(5)
    sig = jnp.asarray(rng.standard_normal((1, 2, 150, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 2, 9, 9)).astype(np.float32))
    gs, gw = jax.grad(
        lambda s, w_: (fft_conv2d_fused(s, w_) ** 2).mean(), argnums=(0, 1)
    )(sig, w)
    gs_ref, gw_ref = jax.grad(
        lambda s, w_: (fft_conv(s, w_, impl="xla") ** 2).mean(), argnums=(0, 1)
    )(sig, w)
    _assert_close_scaled(gs, gs_ref)
    _assert_close_scaled(gw, gw_ref)


def test_fused2d_grouped_gradients():
    rng = np.random.default_rng(6)
    sig = jnp.asarray(rng.standard_normal((1, 4, 140, 130)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((4, 2, 7, 5)).astype(np.float32))
    gs, gw = jax.grad(
        lambda s, w_: (fft_conv2d_fused(s, w_, groups=2) ** 2).mean(),
        argnums=(0, 1),
    )(sig, w)
    gs_ref, gw_ref = jax.grad(
        lambda s, w_: (fft_conv(s, w_, groups=2, impl="xla") ** 2).mean(),
        argnums=(0, 1),
    )(sig, w)
    _assert_close_scaled(gs, gs_ref)
    _assert_close_scaled(gw, gw_ref)


def test_tile_plan_properties():
    plan = tile_plan_2d(16, 16, 8, 8)
    assert plan is not None
    t1, v1, nb1, t2, v2 = plan
    # K1 <= 65: one full 128-wide MXU contraction; V1 8-aligned
    assert t1 == 128 and v1 == 112
    assert nb1 == t1 // 2 + 1
    assert t2 in (128, 256) and v2 == t2 - 15
    # big K1: T1 rounds up in whole 128-contractions (small channels so
    # the NB1-scaled spectra budget is not the binding constraint)
    t1b, v1b, _, _, _ = tile_plan_2d(100, 16, 2, 2)
    assert t1b == 256 and v1b == (t1b - 100 + 1) // 8 * 8
    # spectra budget exceeded -> no plan
    assert tile_plan_2d(3, 3, 256, 256) is None


def test_fused2d_validation():
    with pytest.raises(ValueError):
        fft_conv2d_fused(jnp.ones((1, 2, 100)), jnp.ones((2, 2, 3, 3)))
    with pytest.raises(ValueError):
        fft_conv2d_fused(jnp.ones((1, 2, 100, 100)), jnp.ones((2, 3, 3, 3)))
    with pytest.raises(ValueError):  # kernel larger than input
        fft_conv2d_fused(jnp.ones((1, 1, 30, 300)), jnp.ones((1, 1, 130, 3)))


def test_fused2d_fits_width_budget():
    """Per-cell VMEM scales with image width (nt2): very wide images must
    be rejected by the routing gate (composed fallback, not a compile
    failure)."""
    from fft_conv_tpu.kernels.fused2d import fused2d_fits

    assert fused2d_fits(16, 16, 8, 8, (512, 512), cin_total=8)
    assert not fused2d_fits(16, 16, 16, 8, (256, 65536), cin_total=16)


def test_fused2d_strict_precision_absolute_bar():
    """set_fused2d_precision("highest") meets the reference's ABSOLUTE
    5e-5/1e-4 bar (reference benchmark_utils.py:53-57)."""
    from helpers import _assert_almost_equal

    from fft_conv_tpu.kernels.fused2d import set_fused2d_precision

    rng = np.random.default_rng(33)
    # reference-comparable output scale (the absolute bar assumes it: the
    # reference grid convolves 2-3 channels with 2-3-tap kernels)
    sig = rng.standard_normal((1, 2, 200, 180)).astype(np.float32)
    w = rng.standard_normal((2, 2, 5, 5)).astype(np.float32)
    b = rng.standard_normal((2,)).astype(np.float32)
    set_fused2d_precision("highest")
    try:
        y = fft_conv2d_fused(
            jnp.asarray(sig), jnp.asarray(w), jnp.asarray(b), padding=3
        )
    finally:
        set_fused2d_precision("bf16x3")
    y_ref = TF.conv2d(
        torch.tensor(sig), torch.tensor(w), torch.tensor(b), padding=3
    ).numpy()
    _assert_almost_equal(y, y_ref)


def test_plan_fft_conv2d_wide_image_rejected():
    """plan_fft_conv2d gates on the full per-cell VMEM budget (which
    scales with image width), not just the tile plan (ADVICE r2 medium)."""
    from fft_conv_tpu.kernels.fused2d import fused2d_fits, plan_fft_conv2d

    w = jnp.ones((8, 8, 16, 16), jnp.float32)
    # tile plan exists, but the wide image busts the per-cell budget
    assert tile_plan_2d(16, 16, 8, 8) is not None
    assert not fused2d_fits(16, 16, 8, 8, (256, 65536))
    with pytest.raises(ValueError):
        plan_fft_conv2d(w, signal_hw=(256, 65536))


@pytest.mark.parametrize("stride,dilation,groups,op", [
    ((2, 2), 1, 1, (1, 0)), ((2, 3), 2, 1, (1, 2)), ((2, 2), 1, 2, 0),
])
def test_fused2d_transpose_full_surface(stride, dilation, groups, op):
    """Widened fused 2D transposed conv matches torch conv_transpose2d
    (VERDICT r2 item 4)."""
    rng = np.random.default_rng(42)
    cin, cout_g = 4, 2
    sig = rng.standard_normal((1, cin, 60, 70)).astype(np.float32)
    w = rng.standard_normal((cin, cout_g, 9, 11)).astype(np.float32)
    b = rng.standard_normal((cout_g * groups,)).astype(np.float32)
    y = fft_conv_transpose2d_fused(
        jnp.asarray(sig), jnp.asarray(w), jnp.asarray(b), padding=(2, 3),
        stride=stride, dilation=dilation, groups=groups, output_padding=op,
    )
    y_ref = TF.conv_transpose2d(
        torch.tensor(sig), torch.tensor(w), torch.tensor(b), padding=(2, 3),
        stride=stride, dilation=dilation, groups=groups, output_padding=op,
    ).numpy()
    assert y.shape == y_ref.shape
    _assert_close_scaled(y, y_ref)


def test_fused2d_bf16_serving_mode():
    """set_fused2d_precision("bf16") stays within bf16-rounding error of
    the reference (opt-in serving mode; loose bar by design)."""
    from fft_conv_tpu.kernels.fused2d import set_fused2d_precision

    rng = np.random.default_rng(38)
    sig = rng.standard_normal((1, 2, 200, 180)).astype(np.float32)
    w = rng.standard_normal((2, 2, 5, 5)).astype(np.float32)
    b = rng.standard_normal((2,)).astype(np.float32)
    set_fused2d_precision("bf16")
    try:
        y = fft_conv2d_fused(
            jnp.asarray(sig), jnp.asarray(w), jnp.asarray(b), padding=3
        )
    finally:
        set_fused2d_precision("bf16x3")
    y_ref = TF.conv2d(
        torch.tensor(sig), torch.tensor(w), torch.tensor(b), padding=3
    ).numpy()
    scale = max(1.0, float(np.std(y_ref)))
    err = np.abs(np.asarray(y) - y_ref)
    assert err.mean() < 5e-3 * scale
    assert err.max() < 5e-2 * scale
