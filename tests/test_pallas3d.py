"""Fused 3D Pallas whole-volume kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from fft_conv_tpu import fft_conv
from fft_conv_tpu.kernels.fused3d import (
    fft_conv3d_fused,
    fft_conv_transpose3d_fused,
    plan_3d,
    plan_3d_blocked,
)

from helpers import _assert_close_scaled



CONFIGS = [
    # (B, cin, cout, D, H, W, KD, KH, KW, pad)
    (1, 2, 3, 20, 24, 16, 3, 5, 4, 0),
    (2, 4, 4, 32, 32, 32, 4, 4, 4, 2),
    (1, 1, 1, 10, 14, 12, 2, 3, 5, 0),
    (1, 2, 2, 17, 19, 21, 5, 7, 3, 0),   # odd sizes
    (1, 1, 2, 24, 16, 16, 9, 3, 3, 1),   # KD=9: v4 hop edge (hop == 8)
    (1, 2, 2, 30, 16, 12, 11, 3, 3, 0),  # KD=11: tap-domain fallback path
    (1, 2, 2, 40, 32, 32, 8, 5, 5, 0),   # benchmark-like, KD=8 v4
]


def test_plan_3d_mode_selection():
    assert plan_3d(2, 2, 30, 16, 12, 9, 3, 3)[0] == "v4"
    assert plan_3d(2, 2, 30, 16, 12, 11, 3, 3)[0] == "tap"


@pytest.mark.parametrize("b,cin,cout,d,h,w,kd,kh,kw,pad", CONFIGS)
def test_fused3d_matches_torch(b, cin, cout, d, h, w, kd, kh, kw, pad):
    rng = np.random.default_rng(d + kh)
    sig = rng.standard_normal((b, cin, d, h, w)).astype(np.float32)
    ker = rng.standard_normal((cout, cin, kd, kh, kw)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    ref = TF.conv3d(
        torch.tensor(sig), torch.tensor(ker), torch.tensor(bias), padding=pad
    ).numpy()
    got = fft_conv3d_fused(
        jnp.asarray(sig), jnp.asarray(ker), jnp.asarray(bias), padding=pad
    )
    _assert_close_scaled(got, ref)


@pytest.mark.parametrize("stride,dilation", [(2, 1), (1, 2), ((2, 1, 3), 1)])
def test_fused3d_stride_dilation(stride, dilation):
    rng = np.random.default_rng(5)
    sig = rng.standard_normal((1, 2, 18, 20, 16)).astype(np.float32)
    ker = rng.standard_normal((3, 2, 3, 3, 3)).astype(np.float32)
    ref = TF.conv3d(
        torch.tensor(sig), torch.tensor(ker), stride=stride, dilation=dilation
    ).numpy()
    got = fft_conv3d_fused(
        jnp.asarray(sig), jnp.asarray(ker), stride=stride, dilation=dilation
    )
    _assert_close_scaled(got, ref)


def test_fused3d_padding_modes():
    rng = np.random.default_rng(6)
    sig = rng.standard_normal((1, 2, 12, 14, 12)).astype(np.float32)
    ker = rng.standard_normal((2, 2, 3, 3, 3)).astype(np.float32)
    for mode, tmode in [("reflect", "reflect"), ("replicate", "replicate"),
                        ("circular", "circular")]:
        tsig = torch.nn.functional.pad(
            torch.tensor(sig), (2, 2, 2, 2, 2, 2), mode=tmode
        )
        ref = TF.conv3d(tsig, torch.tensor(ker)).numpy()
        got = fft_conv3d_fused(
            jnp.asarray(sig), jnp.asarray(ker), padding=2, padding_mode=mode
        )
        _assert_close_scaled(got, ref)


def test_fused3d_gradients_match_composed():
    rng = np.random.default_rng(7)
    sig = jnp.asarray(rng.standard_normal((1, 2, 16, 16, 16)).astype(np.float32))
    ker = jnp.asarray(rng.standard_normal((2, 2, 3, 3, 3)).astype(np.float32))
    g = jax.grad(lambda k: fft_conv3d_fused(sig, k).sum())(ker)
    g_ref = jax.grad(lambda k: fft_conv(sig, k, impl="xla").sum())(ker)
    _assert_close_scaled(g, g_ref)
    gx = jax.grad(lambda s: fft_conv3d_fused(s, ker).sum())(sig)
    gx_ref = jax.grad(lambda s: fft_conv(s, ker, impl="xla").sum())(sig)
    _assert_close_scaled(gx, gx_ref)


@pytest.mark.parametrize("groups,kd", [(2, 3), (3, 3), (2, 11)])
def test_fused3d_groups(groups, kd):
    # kd=11 exercises the grouped tap-path MAC; kd=3 the grouped v4 MAC
    rng = np.random.default_rng(groups + kd)
    sig = rng.standard_normal((1, 6, 2 * kd + 4, 12, 10)).astype(np.float32)
    ker = rng.standard_normal((6, 6 // groups, kd, 3, 3)).astype(np.float32)
    bias = rng.standard_normal((6,)).astype(np.float32)
    mode = plan_3d(6, 6, 2 * kd + 4, 12, 10, kd, 3, 3, groups)[0]
    assert mode == ("tap" if kd > 9 else "v4")
    ref = TF.conv3d(
        torch.tensor(sig), torch.tensor(ker), torch.tensor(bias),
        groups=groups,
    ).numpy()
    got = fft_conv3d_fused(
        jnp.asarray(sig), jnp.asarray(ker), jnp.asarray(bias), groups=groups
    )
    _assert_close_scaled(got, ref)


@pytest.mark.parametrize("groups", [1, 2])
def test_fused3d_mac_kara_matches_loop(groups):
    """The kara MAC only restructures VPU summation in the v4 body; it
    must match the loop MAC and the torch oracle to the scale-aware bar
    (grouped configs exercise the per-group kara accumulators)."""
    from fft_conv_tpu.kernels.fused3d import set_fused3d_mac

    rng = np.random.default_rng(23)
    sig = rng.standard_normal((1, 4, 20, 16, 14)).astype(np.float32)
    ker = rng.standard_normal((4, 4 // groups, 5, 3, 3)).astype(np.float32)
    bias = rng.standard_normal((4,)).astype(np.float32)
    assert plan_3d(4, 4, 20, 16, 14, 5, 3, 3, groups)[0] == "v4"
    ref = TF.conv3d(torch.tensor(sig), torch.tensor(ker),
                    torch.tensor(bias), groups=groups).numpy()
    set_fused3d_mac("kara")
    try:
        got = fft_conv3d_fused(
            jnp.asarray(sig), jnp.asarray(ker), jnp.asarray(bias),
            groups=groups,
        )
    finally:
        set_fused3d_mac("loop")
    _assert_close_scaled(got, ref)


@pytest.mark.parametrize("groups", [1, 2])
def test_fused3d_inline_spectra_matches_loop(groups):
    """Inline mode moves the kernel-spectra computation into grid cell 0
    of the v4 kernel (identical all-matmul math at HIGHEST precision);
    it must match the torch oracle to the same bar. Shapes here pass
    ``_inline_fits_v4``; too-big shapes (e.g. the 64^3 benchmark shape,
    133.74M > the 128M vmem cap measured on v5e) silently fall back to
    the XLA-side spectra path — also asserted."""
    from fft_conv_tpu.kernels.fused3d import (
        _inline_fits_v4,
        set_fused3d_inline,
    )

    assert not _inline_fits_v4(8, 8, 64, 64, 64, 8, 8, 8, 1)
    rng = np.random.default_rng(29)
    sig = rng.standard_normal((1, 4, 20, 16, 14)).astype(np.float32)
    ker = rng.standard_normal((4, 4 // groups, 5, 3, 3)).astype(np.float32)
    bias = rng.standard_normal((4,)).astype(np.float32)
    assert plan_3d(4, 4, 20, 16, 14, 5, 3, 3, groups)[0] == "v4"
    assert _inline_fits_v4(4, 4, 20, 16, 14, 5, 3, 3, groups)
    ref = TF.conv3d(torch.tensor(sig), torch.tensor(ker),
                    torch.tensor(bias), groups=groups).numpy()
    set_fused3d_inline(True)
    try:
        got = fft_conv3d_fused(
            jnp.asarray(sig), jnp.asarray(ker), jnp.asarray(bias),
            groups=groups,
        )
    finally:
        set_fused3d_inline(False)
    _assert_close_scaled(got, ref)


@pytest.mark.parametrize("dbuf,kany", [(True, False), ("par", False),
                                       (False, True)])
def test_fused3d_staging_modes_match_torch(dbuf, kany):
    """DMA-staging variants of the v4 kernel (per-channel x copies waited
    in-loop / all-up-front "par", and ANY-space kernel spectra "kany" —
    all measured slower on v5e, scratch/tpu_r4_3dkany.py, kept as
    future-hardware toggles) only reorder HBM traffic, never the math."""
    from fft_conv_tpu.kernels.fused3d import (
        set_fused3d_dbuf,
        set_fused3d_kany,
    )

    rng = np.random.default_rng(37)
    sig = rng.standard_normal((1, 4, 20, 16, 14)).astype(np.float32)
    ker = rng.standard_normal((4, 4, 5, 3, 3)).astype(np.float32)
    bias = rng.standard_normal((4,)).astype(np.float32)
    assert plan_3d(4, 4, 20, 16, 14, 5, 3, 3, 1)[0] == "v4"
    ref = TF.conv3d(torch.tensor(sig), torch.tensor(ker),
                    torch.tensor(bias)).numpy()
    set_fused3d_dbuf(dbuf)
    set_fused3d_kany(kany)
    try:
        got = fft_conv3d_fused(
            jnp.asarray(sig), jnp.asarray(ker), jnp.asarray(bias)
        )
    finally:
        set_fused3d_dbuf(False)
        set_fused3d_kany(False)
    _assert_close_scaled(got, ref)


@pytest.mark.parametrize("xpack", ["d2", "d0", "h2", "pk"])
@pytest.mark.parametrize("groups", [1, 2])
def test_fused3d_xpack_matches_torch(xpack, groups):
    """The xpack modes only change where the d-pair/h reordering of x
    happens (wrapper XLA transpose vs in-kernel outer swaps + lane roll,
    staged through the dead XD region when the carve fits); the math is
    identical, so every mode must hit the torch oracle to the same bar."""
    from fft_conv_tpu.kernels import fused3d
    from fft_conv_tpu.kernels.fused3d import set_fused3d_xpack

    default_xpack = fused3d._XPACK3D
    rng = np.random.default_rng(31)
    sig = rng.standard_normal((1, 4, 20, 16, 14)).astype(np.float32)
    ker = rng.standard_normal((4, 4 // groups, 5, 3, 3)).astype(np.float32)
    bias = rng.standard_normal((4,)).astype(np.float32)
    assert plan_3d(4, 4, 20, 16, 14, 5, 3, 3, groups)[0] == "v4"
    ref = TF.conv3d(torch.tensor(sig), torch.tensor(ker),
                    torch.tensor(bias), groups=groups).numpy()
    set_fused3d_xpack(xpack)
    try:
        got = fft_conv3d_fused(
            jnp.asarray(sig), jnp.asarray(ker), jnp.asarray(bias),
            groups=groups,
        )
    finally:
        set_fused3d_xpack(default_xpack)
    _assert_close_scaled(got, ref)


def test_fused3d_grouped_gradients_match_composed():
    rng = np.random.default_rng(17)
    sig = jnp.asarray(
        rng.standard_normal((1, 4, 14, 12, 10)).astype(np.float32))
    ker = jnp.asarray(
        rng.standard_normal((4, 2, 3, 3, 3)).astype(np.float32))
    g = jax.grad(lambda k: fft_conv3d_fused(sig, k, groups=2).sum())(ker)
    g_ref = jax.grad(
        lambda k: fft_conv(sig, k, groups=2, impl="xla").sum())(ker)
    _assert_close_scaled(g, g_ref)
    gx = jax.grad(lambda s: fft_conv3d_fused(s, ker, groups=2).sum())(sig)
    gx_ref = jax.grad(
        lambda s: fft_conv(s, ker, groups=2, impl="xla").sum())(sig)
    _assert_close_scaled(gx, gx_ref)


def test_fused3d_wide_w_blocked():
    # W > 64 rides wrapper overlap-save W-blocking (plan_3d itself misses)
    rng = np.random.default_rng(8)
    s = rng.standard_normal((2, 2, 10, 8, 200)).astype(np.float32)
    k = rng.standard_normal((3, 2, 2, 2, 7)).astype(np.float32)
    assert plan_3d(2, 3, 10, 8, 200, 2, 2, 7) is None
    plan, nwb, hop = plan_3d_blocked(2, 3, 10, 8, 200, 2, 2, 7)
    assert nwb == 4 and hop == 58
    ref = TF.conv3d(torch.tensor(s), torch.tensor(k)).numpy()
    got = fft_conv3d_fused(jnp.asarray(s), jnp.asarray(k))
    _assert_close_scaled(got, ref)
    # exact multi-block coverage edge: ow a multiple of the hop
    s2 = rng.standard_normal((1, 1, 8, 8, 64 + 58)).astype(np.float32)
    k2 = rng.standard_normal((1, 1, 2, 2, 7)).astype(np.float32)
    ref2 = TF.conv3d(torch.tensor(s2), torch.tensor(k2)).numpy()
    got2 = fft_conv3d_fused(jnp.asarray(s2), jnp.asarray(k2))
    _assert_close_scaled(got2, ref2)


TCONFIGS = [
    # (B, cin, cout, D, H, W, K, stride, pad, op, dil, groups)
    (1, 2, 3, 10, 12, 10, 3, 1, 0, 0, 1, 1),
    (2, 2, 2, 8, 9, 10, 4, 2, 1, 1, 1, 1),
    (1, 4, 4, 7, 8, 9, 3, 1, 0, 0, 2, 2),
    (1, 2, 2, 12, 14, 64, 8, 1, 0, 0, 1, 1),  # stuffed W = 78 > 64: blocked
]


@pytest.mark.parametrize("b,cin,cout,d,h,w,k,st,pad,op,dil,groups", TCONFIGS)
def test_fused3d_transpose_matches_torch(
    b, cin, cout, d, h, w, k, st, pad, op, dil, groups
):
    rng = np.random.default_rng(d + k + st)
    sig = rng.standard_normal((b, cin, d, h, w)).astype(np.float32)
    ker = rng.standard_normal(
        (cin, cout // groups, k, k, k)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    ref = TF.conv_transpose3d(
        torch.tensor(sig), torch.tensor(ker), torch.tensor(bias),
        stride=st, padding=pad, output_padding=op, dilation=dil,
        groups=groups,
    ).numpy()
    got = fft_conv_transpose3d_fused(
        jnp.asarray(sig), jnp.asarray(ker), jnp.asarray(bias),
        stride=st, padding=pad, output_padding=op, dilation=dil,
        groups=groups,
    )
    _assert_close_scaled(got, ref)


def test_fused3d_transpose_impl_fused_dispatch():
    from fft_conv_tpu import fft_conv_transpose

    rng = np.random.default_rng(9)
    sig = rng.standard_normal((1, 2, 10, 12, 10)).astype(np.float32)
    ker = rng.standard_normal((2, 3, 3, 3, 3)).astype(np.float32)
    ref = TF.conv_transpose3d(torch.tensor(sig), torch.tensor(ker)).numpy()
    got = fft_conv_transpose(jnp.asarray(sig), jnp.asarray(ker), impl="fused")
    _assert_close_scaled(got, ref)


def test_fused3d_kernel_too_large_raises():
    with pytest.raises(ValueError):
        fft_conv3d_fused(jnp.ones((1, 1, 4, 4, 4)), jnp.ones((1, 1, 6, 3, 3)))


def test_fused3d_bf16_serving_mode():
    """set_fused3d_precision("bf16") stays within bf16-rounding error of
    the reference (opt-in serving mode; loose bar by design)."""
    from fft_conv_tpu.kernels.fused3d import set_fused3d_precision

    rng = np.random.default_rng(39)
    sig = rng.standard_normal((1, 4, 14, 12, 10)).astype(np.float32)
    ker = rng.standard_normal((4, 4, 3, 3, 3)).astype(np.float32)
    bias = rng.standard_normal((4,)).astype(np.float32)
    set_fused3d_precision("bf16")
    try:
        y = fft_conv3d_fused(
            jnp.asarray(sig), jnp.asarray(ker), jnp.asarray(bias)
        )
    finally:
        set_fused3d_precision("bf16x3")
    ref = TF.conv3d(
        torch.tensor(sig), torch.tensor(ker), torch.tensor(bias)
    ).numpy()
    scale = max(1.0, float(np.std(ref)))
    err = np.abs(np.asarray(y) - ref)
    assert err.mean() < 5e-3 * scale
    assert err.max() < 5e-2 * scale
