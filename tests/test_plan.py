"""Planned-convolution API tests (ops/plan.py + kernels fused plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import fft_conv_tpu.ops.spectral as spectral
from fft_conv_tpu import fft_conv
from fft_conv_tpu.ops import plan_fft_conv, plan_fft_conv_transpose

from helpers import _assert_almost_equal


@pytest.fixture
def force_matmul_dft(monkeypatch):
    monkeypatch.setattr(
        spectral, "use_matmul_dft", lambda fft_shape, platform=None: True
    )


def test_plan_2d_spectral_branch(force_matmul_dft):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((6, 4, 5, 5)).astype(np.float32)
    b = rng.standard_normal((6,)).astype(np.float32)
    plan = plan_fft_conv(jnp.asarray(w), jnp.asarray(b), stride=2, padding=2,
                         signal_spatial=(40, 40))
    sig = rng.standard_normal((3, 4, 40, 40)).astype(np.float32)
    y_ref = F.conv2d(torch.tensor(sig), torch.tensor(w), torch.tensor(b),
                     stride=2, padding=2).numpy()
    _assert_almost_equal(plan(jnp.asarray(sig)), y_ref)
    # plans are shape-specialized
    with pytest.raises(ValueError):
        plan(jnp.ones((1, 4, 32, 32)))


def test_plan_3d_grouped_dilated(force_matmul_dft):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((4, 2, 3, 3, 3)).astype(np.float32)
    plan = plan_fft_conv(jnp.asarray(w), groups=2, dilation=2,
                         signal_spatial=(12, 12, 12))
    sig = rng.standard_normal((1, 4, 12, 12, 12)).astype(np.float32)
    y_ref = F.conv3d(torch.tensor(sig), torch.tensor(w), groups=2,
                     dilation=2).numpy()
    _assert_almost_equal(plan(jnp.asarray(sig)), y_ref)


def test_plan_plain_branch_long_axis():
    """Axes beyond the matmul range fall back to the jnp.fft plan (with
    the kernel's conjugated rfftn spectrum baked at plan time)."""
    rng = np.random.default_rng(2)
    w = rng.standard_normal((2, 2, 9)).astype(np.float32)
    plan = plan_fft_conv(jnp.asarray(w), signal_spatial=(4096,))
    sig = rng.standard_normal((1, 2, 4096)).astype(np.float32)
    y_ref = F.conv1d(torch.tensor(sig), torch.tensor(w)).numpy()
    _assert_almost_equal(plan(jnp.asarray(sig)), y_ref)
    with pytest.raises(ValueError):
        plan(jnp.ones((1, 2, 100)))


def test_plan_plain_branch_full_arg_surface():
    """The baked jnp.fft plan honors stride/padding/dilation/groups/bias."""
    rng = np.random.default_rng(3)
    w = rng.standard_normal((4, 2, 7)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    plan = plan_fft_conv(
        jnp.asarray(w), jnp.asarray(b), stride=3, padding=5, dilation=2,
        groups=2, signal_spatial=(4096,),
    )
    sig = rng.standard_normal((2, 4, 4096)).astype(np.float32)
    y_ref = F.conv1d(
        torch.tensor(sig), torch.tensor(w), torch.tensor(b), stride=3,
        padding=5, dilation=2, groups=2,
    ).numpy()
    _assert_almost_equal(plan(jnp.asarray(sig)), y_ref)


def test_plan_validates():
    w = jnp.ones((2, 2, 3, 3))
    with pytest.raises(ValueError):
        plan_fft_conv(w, signal_spatial=(16,))  # rank mismatch
    with pytest.raises(ValueError):
        plan_fft_conv(jnp.ones((1, 1, 9)), signal_spatial=(4,))  # K > input


def test_plan_kernel_too_large_spectral(force_matmul_dft):
    with pytest.raises(ValueError):
        plan_fft_conv(jnp.ones((1, 1, 9, 9)), signal_spatial=(4, 4))


def test_plan_fft_conv2d_fused_matches():
    """Baked-spectra 2D fused plan (interpret on CPU) matches fft_conv."""
    from fft_conv_tpu.kernels.fused2d import plan_fft_conv2d

    rng = np.random.default_rng(20)
    sig = jnp.asarray(rng.standard_normal((1, 2, 150, 160)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 2, 9, 11)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((3,)).astype(np.float32))
    fn = plan_fft_conv2d(w, b, padding=(4, 5), signal_hw=(150, 160))
    y = fn(sig)
    y_ref = fft_conv(sig, w, b, padding=(4, 5), impl="xla")
    assert y.shape == y_ref.shape
    err = np.abs(np.asarray(y) - np.asarray(y_ref))
    scale = max(1.0, float(np.asarray(y_ref).std()))
    assert err.mean() < 5e-5 * scale and err.max() < 2e-4 * scale
    # gradient w.r.t. the signal flows through the planned core
    g = jax.grad(lambda s: fn(s).sum())(sig)
    g_ref = jax.grad(lambda s: fft_conv(s, w, b, padding=(4, 5), impl="xla").sum())(sig)
    gerr = np.abs(np.asarray(g) - np.asarray(g_ref))
    gscale = max(1.0, float(np.asarray(g_ref).std()))
    assert gerr.max() < 2e-4 * gscale
    # wrong spatial shape rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        fn(jnp.zeros((1, 2, 64, 64)))


def test_plan_fft_conv3d_fused_matches():
    """Baked-spectra 3D fused plan (interpret on CPU) matches fft_conv,
    on both the v4 (KD <= 9) and tap-fallback (KD > 9) kernel modes."""
    from fft_conv_tpu.kernels.fused3d import plan_3d, plan_fft_conv3d

    rng = np.random.default_rng(21)
    for kd, seed in ((4, 0), (11, 1)):
        d = 30
        sig = jnp.asarray(
            rng.standard_normal((1, 2, d, 24, 20)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((2, 2, kd, 5, 3)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((2,)).astype(np.float32))
        mode = plan_3d(2, 2, d + 2, 24 + 2, 20 + 2, kd, 5, 3)[0]
        assert mode == ("v4" if kd <= 9 else "tap")
        fn = plan_fft_conv3d(w, b, padding=1, signal_dhw=(d, 24, 20))
        y = fn(sig)
        y_ref = fft_conv(sig, w, b, padding=1, impl="xla")
        assert y.shape == y_ref.shape
        err = np.abs(np.asarray(y) - np.asarray(y_ref))
        scale = max(1.0, float(np.asarray(y_ref).std()))
        assert err.mean() < 5e-5 * scale and err.max() < 2e-4 * scale
        # gradient w.r.t. the signal flows through the planned core
        g = jax.grad(lambda s: fn(s).sum())(sig)
        g_ref = jax.grad(
            lambda s: fft_conv(s, w, b, padding=1, impl="xla").sum())(sig)
        gerr = np.abs(np.asarray(g) - np.asarray(g_ref))
        gscale = max(1.0, float(np.asarray(g_ref).std()))
        assert gerr.max() < 2e-4 * gscale
    # wrong spatial shape rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        fn(jnp.zeros((1, 2, 8, 8, 8)))


def test_plan_fft_conv3d_wide_w_blocked():
    """The 3D fused serving plan covers W-overlap-save blocked shapes."""
    from fft_conv_tpu.kernels.fused3d import plan_3d, plan_fft_conv3d

    rng = np.random.default_rng(11)
    w = rng.standard_normal((2, 2, 3, 3, 5)).astype(np.float32)
    b = rng.standard_normal((2,)).astype(np.float32)
    assert plan_3d(2, 2, 12, 12, 100, 3, 3, 5) is None  # W > one lane half
    plan = plan_fft_conv3d(jnp.asarray(w), jnp.asarray(b),
                           signal_dhw=(12, 12, 100))
    sig = rng.standard_normal((1, 2, 12, 12, 100)).astype(np.float32)
    y_ref = F.conv3d(torch.tensor(sig), torch.tensor(w),
                     torch.tensor(b)).numpy()
    y = np.asarray(plan(jnp.asarray(sig)))
    assert y.shape == y_ref.shape
    err = np.abs(y - y_ref)
    scale = max(1.0, float(y_ref.std()))
    assert err.mean() < 5e-5 * scale and err.max() < 2e-4 * scale


# ---------------------------------------------------------------------------
# plan_fft_conv_transpose — baked kernel-side transform for serving
# (reference functional.py:92-176; the flip/group-swap/dilate at :109-114 is
# the per-call work the plan amortizes)


def test_plan_transpose_spectral_full_arg_surface(force_matmul_dft):
    """matmul-DFT tier: stride/padding/output_padding/dilation/groups/bias."""
    rng = np.random.default_rng(30)
    w = rng.standard_normal((4, 2, 5, 5)).astype(np.float32)  # (Cin, Cout/g, k)
    b = rng.standard_normal((4,)).astype(np.float32)
    plan = plan_fft_conv_transpose(
        jnp.asarray(w), jnp.asarray(b), stride=2, padding=2,
        output_padding=1, dilation=2, groups=2, signal_spatial=(20, 18),
    )
    sig = rng.standard_normal((2, 4, 20, 18)).astype(np.float32)
    y_ref = F.conv_transpose2d(
        torch.tensor(sig), torch.tensor(w), torch.tensor(b), stride=2,
        padding=2, output_padding=1, dilation=2, groups=2,
    ).numpy()
    y = np.asarray(plan(jnp.asarray(sig)))
    assert y.shape == y_ref.shape
    _assert_almost_equal(y, y_ref)
    with pytest.raises(ValueError):
        plan(jnp.ones((1, 4, 16, 16)))  # shape-specialized
    with pytest.raises(ValueError):
        plan(jnp.ones((1, 2, 20, 18)))  # wrong in_channels


def test_plan_transpose_long_axis():
    """Long-axis tier: the conjugated rfftn spectrum of the TRANSFORMED
    kernel is baked once; per call only signal transforms run."""
    rng = np.random.default_rng(31)
    w = rng.standard_normal((2, 3, 9)).astype(np.float32)
    plan = plan_fft_conv_transpose(
        jnp.asarray(w), stride=2, padding=3, signal_spatial=(2048,),
    )
    sig = rng.standard_normal((1, 2, 2048)).astype(np.float32)
    y_ref = F.conv_transpose1d(
        torch.tensor(sig), torch.tensor(w), stride=2, padding=3,
    ).numpy()
    y = np.asarray(plan(jnp.asarray(sig)))
    assert y.shape == y_ref.shape
    _assert_almost_equal(y, y_ref)


def test_plan_transpose_matches_functional_3d(force_matmul_dft):
    """3D tier (fused gate off, mirroring the functional auto route)."""
    from fft_conv_tpu import fft_conv_transpose

    rng = np.random.default_rng(32)
    w = jnp.asarray(rng.standard_normal((2, 2, 3, 3, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2,)).astype(np.float32))
    plan = plan_fft_conv_transpose(
        w, b, stride=2, padding=1, signal_spatial=(10, 10, 10),
    )
    sig = jnp.asarray(
        rng.standard_normal((1, 2, 10, 10, 10)).astype(np.float32))
    y_ref = fft_conv_transpose(sig, w, b, stride=2, padding=1, impl="xla")
    y = plan(sig)
    assert y.shape == y_ref.shape
    _assert_almost_equal(np.asarray(y), np.asarray(y_ref))


def test_plan_transpose_validates():
    with pytest.raises(ValueError):
        plan_fft_conv_transpose(jnp.ones((2, 2, 3, 3)), signal_spatial=(16,))
    with pytest.raises(ValueError):
        plan_fft_conv_transpose(jnp.ones((3, 2, 3)), groups=2,
                                signal_spatial=(16,))  # Cin % groups
