"""Fused Pallas kernel tests (interpret mode on CPU; real-TPU perf is
bench.py's job).

Strategy per SURVEY §4: forward parity of the fused kernel against BOTH the
composed-XLA path and torch direct conv. Tolerances are scale-aware: fp32
FFT error grows with output RMS (the composed path and the reference's own
cuFFT path behave identically — measured this session: at output RMS ~56,
composed-vs-torch max err is 6.3e-4), so thresholds scale by max(1, rms).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from fft_conv_tpu import fft_conv
from fft_conv_tpu.kernels.fourstep import (
    four_step_fft,
    four_step_ifft,
    split_factors,
)
from fft_conv_tpu.kernels.fused1d import (
    choose_fft_size,
    fft_conv1d_fused,
    fft_conv_transpose1d_fused,
    fused_split,
)

from helpers import _assert_close_scaled


# ---------------------------------------------------------------- four-step
@pytest.mark.parametrize("n1,n2", [(16, 128), (64, 64), (128, 128)])
def test_four_step_matches_numpy_fft(n1, n2):
    n = n1 * n2
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    d = np.asarray(four_step_fft(jnp.asarray(x).astype(jnp.complex64), n1, n2))
    x_ref = np.fft.fft(x)
    # descramble: X[k1 + n1*k2] = d[k1, k2]
    rec = np.empty(n, complex)
    k1g, k2g = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    rec[(k1g + n1 * k2g).ravel()] = d.ravel()
    rel = np.abs(rec - x_ref).max() / np.abs(x_ref).max()
    assert rel < 1e-5


def test_four_step_roundtrip():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(
        np.complex64
    )
    d = four_step_fft(jnp.asarray(x), 32, 128)
    xr = np.asarray(four_step_ifft(d, 32, 128))
    assert np.abs(xr - x).max() < 1e-4


def test_split_factors():
    assert split_factors(16384) == (128, 128)
    assert split_factors(8192) == (128, 64)
    assert fused_split(8192) == (64, 128)
    with pytest.raises(ValueError):
        split_factors(1000)


def test_choose_fft_size_policy():
    # cost model (N1 + c) * N/V: small K prefers small N (cheap stage 1,
    # low redundancy either way); large K needs large N (v5e-measured:
    # K=3840 at N=4096 is 7x slower than at N=8192)
    assert choose_fft_size(3840, 32768, 8, 8) == 8192
    assert choose_fft_size(1024, 32768, 8, 8) == 4096
    assert choose_fft_size(256, 32768, 8, 8) == 2048
    # huge channel counts exceed the VMEM spectra budget -> no fused config
    assert choose_fft_size(128, 2**20, 128, 128) is None


# ---------------------------------------------------------------- fused conv
CONFIGS = [
    # (B, cin, cout, L, K, pad)
    (2, 8, 8, 8192, 384, 0),
    (1, 3, 2, 5000, 128, 64),
    (2, 2, 4, 3000, 200, 0),
    (1, 4, 4, 2100, 130, 10),   # multi-block with remainder
    (2, 1, 1, 4096, 512, 0),    # single channel
]


@pytest.mark.parametrize("b,cin,cout,l,k,pad", CONFIGS)
def test_fused_matches_torch(b, cin, cout, l, k, pad):
    rng = np.random.default_rng(k + l)
    sig = rng.standard_normal((b, cin, l)).astype(np.float32)
    w = rng.standard_normal((cout, cin, k)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    y = fft_conv1d_fused(jnp.asarray(sig), jnp.asarray(w), jnp.asarray(bias),
                         padding=pad)
    y_ref = TF.conv1d(torch.tensor(sig), torch.tensor(w), torch.tensor(bias),
                      padding=pad).numpy()
    _assert_close_scaled(y, y_ref)


@pytest.mark.parametrize("b,cin,cout,l,k,pad", CONFIGS[:3])
def test_fused_matches_composed(b, cin, cout, l, k, pad):
    """Bit-tolerance parity with the composed-XLA path (SURVEY §4)."""
    rng = np.random.default_rng(k)
    sig = rng.standard_normal((b, cin, l)).astype(np.float32)
    w = rng.standard_normal((cout, cin, k)).astype(np.float32)
    y = fft_conv1d_fused(jnp.asarray(sig), jnp.asarray(w), padding=pad)
    y_ref = fft_conv(jnp.asarray(sig), jnp.asarray(w), padding=pad)
    _assert_close_scaled(y, y_ref)


@pytest.mark.parametrize("groups", [2, 3])
def test_fused_groups(groups):
    """Grouped MAC: static per-group in-channel slices in the kernel."""
    rng = np.random.default_rng(groups)
    cin, cout = 3 * groups, 2 * groups
    sig = rng.standard_normal((2, cin, 4000)).astype(np.float32)
    w = rng.standard_normal((cout, cin // groups, 120)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    y = fft_conv1d_fused(jnp.asarray(sig), jnp.asarray(w), jnp.asarray(bias),
                         groups=groups)
    y_ref = TF.conv1d(torch.tensor(sig), torch.tensor(w), torch.tensor(bias),
                      groups=groups).numpy()
    _assert_close_scaled(y, y_ref)


def test_fused_groups_gradients():
    rng = np.random.default_rng(7)
    sig = jnp.asarray(rng.standard_normal((2, 4, 3000)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((6, 2, 100)).astype(np.float32))

    def loss_fused(s, w_):
        return (fft_conv1d_fused(s, w_, groups=2) ** 2).mean()

    def loss_composed(s, w_):
        return (fft_conv(s, w_, groups=2, impl="xla") ** 2).mean()

    gs, gw = jax.grad(loss_fused, argnums=(0, 1))(sig, w)
    gs_ref, gw_ref = jax.grad(loss_composed, argnums=(0, 1))(sig, w)
    _assert_close_scaled(gs, gs_ref)
    _assert_close_scaled(gw, gw_ref)


@pytest.mark.parametrize("stride,dilation", [(2, 1), (1, 2), (3, 2)])
def test_fused_stride_dilation(stride, dilation):
    """Stride/dilation as wrapper transforms around the fused kernel."""
    rng = np.random.default_rng(stride * 10 + dilation)
    sig = rng.standard_normal((2, 3, 4000)).astype(np.float32)
    w = rng.standard_normal((4, 3, 100)).astype(np.float32)
    bias = rng.standard_normal((4,)).astype(np.float32)
    y = fft_conv1d_fused(jnp.asarray(sig), jnp.asarray(w), jnp.asarray(bias),
                         padding=30, stride=stride, dilation=dilation)
    y_ref = TF.conv1d(torch.tensor(sig), torch.tensor(w), torch.tensor(bias),
                      padding=30, stride=stride, dilation=dilation).numpy()
    _assert_close_scaled(y, y_ref)


@pytest.mark.parametrize("mode", ["reflect", "circular", "replicate"])
def test_fused_padding_modes(mode):
    """Padding modes apply in the wrapper, so all are fused-eligible."""
    rng = np.random.default_rng(42)
    sig = rng.standard_normal((1, 2, 3000)).astype(np.float32)
    w = rng.standard_normal((3, 2, 128)).astype(np.float32)
    y = fft_conv(jnp.asarray(sig), jnp.asarray(w), padding=64,
                 padding_mode=mode, impl="fused")
    x_p = TF.pad(torch.tensor(sig), (64, 64), mode=mode)
    y_ref = TF.conv1d(x_p, torch.tensor(w)).numpy()
    _assert_close_scaled(y, y_ref)


def test_impl_fused_stride_dispatch():
    """The dispatcher routes strided/dilated 1D to the fused path now."""
    rng = np.random.default_rng(3)
    sig = jnp.asarray(rng.standard_normal((1, 2, 3000)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 2, 130)).astype(np.float32))
    y_f = fft_conv(sig, w, stride=2, dilation=2, impl="fused")
    y_x = fft_conv(sig, w, stride=2, dilation=2, impl="xla")
    _assert_close_scaled(y_f, y_x)
    # grouped dispatch goes fused too now
    y_g = fft_conv(sig, jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 1, 130)).astype(np.float32)), groups=2, impl="fused")
    assert y_g.shape == (1, 4, 2871)


def test_fused_gradients_match_composed():
    """custom_vjp backward (pair of composed FFT convs) vs AD of composed."""
    rng = np.random.default_rng(5)
    sig = jnp.asarray(rng.standard_normal((2, 3, 2200)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((4, 3, 150)).astype(np.float32))

    def loss_fused(s, w_):
        return (fft_conv1d_fused(s, w_, padding=8) ** 2).mean()

    def loss_composed(s, w_):
        return (fft_conv(s, w_, padding=8) ** 2).mean()

    gs, gw = jax.grad(loss_fused, argnums=(0, 1))(sig, w)
    gs_ref, gw_ref = jax.grad(loss_composed, argnums=(0, 1))(sig, w)
    _assert_close_scaled(gs, gs_ref)
    _assert_close_scaled(gw, gw_ref)


def test_fused_is_jittable():
    rng = np.random.default_rng(6)
    sig = jnp.asarray(rng.standard_normal((1, 2, 3000)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((2, 2, 128)).astype(np.float32))
    y0 = fft_conv1d_fused(sig, w)
    y1 = jax.jit(fft_conv1d_fused)(sig, w)
    # eager and jit compile separately; f32 reduction order differs across
    # the bf16x3 split's three partial dots (rel ~5e-7 at |out|~70)
    assert np.allclose(np.asarray(y0), np.asarray(y1), atol=1e-4)


def test_fused_fallback_small_or_unsupported():
    # channel counts too large for resident spectra -> composed fallback
    rng = np.random.default_rng(7)
    sig = jnp.asarray(rng.standard_normal((1, 64, 4096)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 64, 128)).astype(np.float32))
    y = fft_conv1d_fused(sig, w)
    y_ref = fft_conv(sig, w)
    _assert_close_scaled(y, y_ref)


@pytest.mark.parametrize("pad", [0, 3])
def test_fused_transpose_matches_torch(pad):
    rng = np.random.default_rng(11)
    sig = rng.standard_normal((2, 3, 3000)).astype(np.float32)
    w = rng.standard_normal((3, 4, 160)).astype(np.float32)  # (Cin, Cout, K)
    bias = rng.standard_normal((4,)).astype(np.float32)
    y = fft_conv_transpose1d_fused(
        jnp.asarray(sig), jnp.asarray(w), jnp.asarray(bias), padding=pad
    )
    y_ref = TF.conv_transpose1d(
        torch.tensor(sig), torch.tensor(w), torch.tensor(bias), padding=pad
    ).numpy()
    _assert_close_scaled(y, y_ref)


def test_fused_transpose_validation():
    with pytest.raises(ValueError):
        fft_conv_transpose1d_fused(jnp.ones((1, 2, 100)), jnp.ones((3, 2, 5)))
    # padding >= kernel_size is VALID (torch accepts it); parity-checked
    rng = np.random.default_rng(17)
    sig = rng.standard_normal((1, 2, 100)).astype(np.float32)
    w = rng.standard_normal((2, 3, 5)).astype(np.float32)
    y = fft_conv_transpose1d_fused(jnp.asarray(sig), jnp.asarray(w), padding=5)
    y_ref = TF.conv_transpose1d(torch.tensor(sig), torch.tensor(w),
                                padding=5).numpy()
    _assert_close_scaled(y, y_ref)
    with pytest.raises(ValueError):  # non-positive output length
        fft_conv_transpose1d_fused(
            jnp.ones((1, 2, 10)), jnp.ones((2, 3, 5)), padding=50
        )


def test_plan_fft_conv1d():
    """Planned conv (precomputed spectrum) matches torch and differentiates."""
    from fft_conv_tpu.kernels.fused1d import plan_fft_conv1d

    rng = np.random.default_rng(21)
    sig = rng.standard_normal((2, 3, 5000)).astype(np.float32)
    w = rng.standard_normal((4, 3, 200)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    plan = plan_fft_conv1d(jnp.asarray(w), jnp.asarray(b), padding=16,
                           signal_length=5000)
    y_ref = TF.conv1d(torch.tensor(sig), torch.tensor(w), torch.tensor(b),
                      padding=16).numpy()
    _assert_close_scaled(plan(jnp.asarray(sig)), y_ref)
    g = jax.grad(lambda s: (plan(s) ** 2).mean())(jnp.asarray(sig))
    assert np.isfinite(np.asarray(g)).all()


def test_impl_dispatcher():
    """fft_conv(impl=...) routes correctly; 'fused' forces the Pallas path
    (on CPU it still runs, via the interpreter), 'xla' never does."""
    rng = np.random.default_rng(12)
    sig = jnp.asarray(rng.standard_normal((1, 2, 3000)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 2, 130)).astype(np.float32))
    y_xla = fft_conv(sig, w, impl="xla")
    y_fused = fft_conv(sig, w, impl="fused")
    _assert_close_scaled(y_fused, y_xla)
    # auto on CPU -> composed (bitwise identical to xla)
    y_auto = fft_conv(sig, w, impl="auto")
    assert np.array_equal(np.asarray(y_auto), np.asarray(y_xla))
    # 3D routes to the fused whole-volume kernel (groups=1)
    s3 = jnp.asarray(rng.standard_normal((1, 2, 16, 16, 16)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal((3, 2, 5, 5, 5)).astype(np.float32))
    _assert_close_scaled(
        fft_conv(s3, w3, impl="fused"), fft_conv(s3, w3, impl="xla")
    )
    # 3D grouped is fused-eligible since round 4 (group-sliced MACs)
    sg = jnp.asarray(
        rng.standard_normal((1, 4, 16, 16, 16)).astype(np.float32))
    wg = jnp.asarray(rng.standard_normal((4, 2, 3, 3, 3)).astype(np.float32))
    _assert_close_scaled(
        fft_conv(sg, wg, groups=2, impl="fused"),
        fft_conv(sg, wg, groups=2, impl="xla"),
    )
    with pytest.raises(ValueError):
        fft_conv(sig, w, impl="bogus")


def test_impl_dispatcher_transpose():
    from fft_conv_tpu import fft_conv_transpose

    rng = np.random.default_rng(13)
    sig = jnp.asarray(rng.standard_normal((1, 2, 3000)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((2, 3, 130)).astype(np.float32))
    y_xla = fft_conv_transpose(sig, w, padding=4, impl="xla")
    y_fused = fft_conv_transpose(sig, w, padding=4, impl="fused")
    _assert_close_scaled(y_fused, y_xla)
    # widened surface (round 3): stride/dilation/groups/output_padding all
    # ride the fused kernel via wrapper stuffing
    for kwargs in (
        dict(stride=2, output_padding=1),
        dict(stride=2, padding=3, dilation=2, output_padding=1),
    ):
        y_x = fft_conv_transpose(sig, w, impl="xla", **kwargs)
        y_f = fft_conv_transpose(sig, w, impl="fused", **kwargs)
        _assert_close_scaled(y_f, y_x)


def test_module_impl_knob():
    from fft_conv_tpu.nn import FFTConv1d

    layer = FFTConv1d(2, 3, 130, impl="fused", key=jax.random.key(0))
    x = jnp.ones((1, 2, 3000))
    layer_x = FFTConv1d(2, 3, 130, impl="xla", key=jax.random.key(0))
    _assert_close_scaled(layer(x), layer_x(x))
    with pytest.raises(ValueError):
        FFTConv1d(2, 3, 130, impl="bogus")


def test_fused_validation_errors():
    with pytest.raises(ValueError):
        fft_conv1d_fused(jnp.ones((1, 2, 100, 100)), jnp.ones((2, 2, 3)))
    with pytest.raises(ValueError):
        fft_conv1d_fused(jnp.ones((1, 2, 100)), jnp.ones((2, 3, 5)))
    with pytest.raises(ValueError):
        fft_conv1d_fused(jnp.ones((1, 1, 16)), jnp.ones((1, 1, 64)))


def test_choose_fft_size_batch_budget():
    """Batch-merged cells scale VMEM with B: over-budget batches must get
    no fused config (auto then falls back composed instead of a Mosaic
    allocation failure)."""
    assert choose_fft_size(256, 32768, 8, 8, batch=2) is not None
    assert choose_fft_size(256, 32768, 8, 8, batch=4096) is None


def test_fused_strict_precision_absolute_bar():
    """Under set_fused_precision("highest") the fused kernel meets the
    reference's ABSOLUTE 5e-5/1e-4 bar (reference benchmark_utils.py:53-57)
    — pinning that the default bf16x3's scaled tolerance is a precision-mode
    choice, not a capability loss."""
    from helpers import _assert_almost_equal

    from fft_conv_tpu.kernels.fused1d import set_fused_precision

    rng = np.random.default_rng(31)
    sig = rng.standard_normal((2, 3, 4000)).astype(np.float32)
    w = rng.standard_normal((4, 3, 160)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    set_fused_precision("highest")
    try:
        y = fft_conv1d_fused(
            jnp.asarray(sig), jnp.asarray(w), jnp.asarray(b), padding=8
        )
    finally:
        set_fused_precision("bf16x3")
    y_ref = TF.conv1d(
        torch.tensor(sig), torch.tensor(w), torch.tensor(b), padding=8
    ).numpy()
    _assert_almost_equal(y, y_ref)


@pytest.mark.parametrize("mac_mode", ["stacked", "kara", "bcast"])
@pytest.mark.parametrize("groups", [1, 3])
def test_fused1d_mac_modes_match_loop(mac_mode, groups):
    """Every alternative per-bin MAC strategy must match the default
    "loop" MAC to the repo's scale-aware bar — the mode switch only
    reorders VPU summation, never the math (reassociation shifts results
    by ~1e-6 relative). Grouped configs exercise the per-group stacked
    slices ("bcast" falls back to "loop" internally for groups>1 — still
    must produce the same result)."""
    from fft_conv_tpu.kernels.fused1d import set_fused1d_mac

    rng = np.random.default_rng(7)
    sig = jnp.asarray(rng.standard_normal((2, 6, 4000)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((6, 6 // groups, 160)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((6,)).astype(np.float32))
    y_loop = np.asarray(fft_conv1d_fused(sig, w, b, groups=groups))
    set_fused1d_mac(mac_mode)
    try:
        y_alt = np.asarray(fft_conv1d_fused(sig, w, b, groups=groups))
    finally:
        set_fused1d_mac("loop")
    scale = max(1.0, float(np.abs(y_loop).max()))
    err = np.abs(y_alt - y_loop)
    assert err.mean() < 5e-5 * scale and err.max() < 1e-4 * scale, (
        f"mean {err.mean():.3e} max {err.max():.3e} scale {scale:.1f}"
    )


def test_plan_fft_conv1d_runtime_batch_fallback():
    """A plan built with a small batch hint, called with a VMEM-busting
    batch, must fall back to the composed path (correct output), not die
    in Mosaic (VERDICT r2 item 5)."""
    from fft_conv_tpu.kernels.fused1d import cell_fits, plan_fft_conv1d

    rng = np.random.default_rng(32)
    w = rng.standard_normal((8, 8, 200)).astype(np.float32)
    plan = plan_fft_conv1d(jnp.asarray(w), signal_length=5000, max_batch=1)
    big_b = 128
    # the regression premise: this batch busts every candidate's budget
    assert not cell_fits(2048, big_b, 8, 8)
    sig = rng.standard_normal((big_b, 8, 5000)).astype(np.float32)
    y = plan(jnp.asarray(sig))
    y_ref = fft_conv(jnp.asarray(sig), jnp.asarray(w), impl="xla")
    assert y.shape == y_ref.shape
    err = np.abs(np.asarray(y) - np.asarray(y_ref))
    scale = max(1.0, float(np.asarray(y_ref).std()))
    assert err.max() < 2e-4 * scale


@pytest.mark.parametrize("stride,dilation,groups,op", [
    (2, 1, 1, 0), (2, 1, 1, 1), (3, 2, 1, 2), (2, 1, 2, 1),
])
def test_fused_transpose_full_surface(stride, dilation, groups, op):
    """Widened fused transposed conv (stride/dilation/groups/
    output_padding) matches torch conv_transpose1d (VERDICT r2 item 4)."""
    rng = np.random.default_rng(41)
    cin, cout_g = 4, 3
    sig = rng.standard_normal((2, cin, 1500)).astype(np.float32)
    w = rng.standard_normal((cin, cout_g, 80)).astype(np.float32)
    b = rng.standard_normal((cout_g * groups,)).astype(np.float32)
    y = fft_conv_transpose1d_fused(
        jnp.asarray(sig), jnp.asarray(w), jnp.asarray(b), padding=5,
        stride=stride, dilation=dilation, groups=groups, output_padding=op,
    )
    y_ref = TF.conv_transpose1d(
        torch.tensor(sig), torch.tensor(w), torch.tensor(b), padding=5,
        stride=stride, dilation=dilation, groups=groups, output_padding=op,
    ).numpy()
    assert y.shape == y_ref.shape
    _assert_close_scaled(y, y_ref)


def test_fused_bf16_serving_mode():
    """set_fused_precision("bf16") (single-pass dots, the opt-in serving
    mode) stays within ~bf16 operand-rounding error of the reference —
    a much looser bar than the parity-grade bf16x3/highest modes, by
    design (see the precision-mode notes in kernels/fused1d.py)."""
    from fft_conv_tpu.kernels.fused1d import set_fused_precision

    rng = np.random.default_rng(37)
    sig = rng.standard_normal((2, 3, 4000)).astype(np.float32)
    w = rng.standard_normal((4, 3, 160)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    set_fused_precision("bf16")
    try:
        y = fft_conv1d_fused(
            jnp.asarray(sig), jnp.asarray(w), jnp.asarray(b), padding=8
        )
    finally:
        set_fused_precision("bf16x3")
    y_ref = TF.conv1d(
        torch.tensor(sig), torch.tensor(w), torch.tensor(b), padding=8
    ).numpy()
    scale = max(1.0, float(np.std(y_ref)))
    err = np.abs(np.asarray(y) - y_ref)
    assert err.mean() < 5e-3 * scale
    assert err.max() < 5e-2 * scale
    with pytest.raises(ValueError):
        set_fused_precision("fp8")
