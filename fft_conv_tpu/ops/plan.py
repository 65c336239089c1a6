"""Planned N-d FFT convolution: precomputed kernel spectra for serving.

The reference re-plans cuFFT on every call (and its benchmark clears the
plan cache, generate_benchmark_plot.py:51). Here a plan is an explicit
object: the kernel's spectrum is computed once and the returned callable
only transforms the signal — for the 2D benchmark shape that removes
~0.3 ms (~20%) from every inference call (measured v5e).

Plan tiers, most to least specialized:
  1. 1D/2D/3D stride-1 dilation-1 groups=1 configs with a fitting fused
     plan get the fused Pallas plans with baked in-kernel-layout spectra
     (kernels.fused{1,2,3}d.plan_fft_conv{1,2,3}d).
  2. Everything else on matmul-DFT-eligible (short-axis) shapes — any
     stride/dilation/groups/padding_mode — bakes the kernel's split-re/im
     matmul-DFT spectra and serves the composed spectral pipeline.
  3. Long-axis shapes (jnp.fft path) bake the kernel's conjugated rfftn
     spectrum once and run the signal-side FFTs per call.
"""

from typing import Iterable, Optional, Union

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.shapes import (
    conv_transpose_output_shape,
    fft_even_shape,
    to_ntuple,
)
from . import functional as F
from . import spectral
from .spectral import irfftn_matmul, rfftn_matmul, spectral_contract_split

IntOrTuple = Union[int, Iterable[int]]


def plan_fft_conv(
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    dilation: IntOrTuple = 1,
    groups: int = 1,
    padding_mode: str = "constant",
    *,
    signal_spatial: Iterable[int],
    max_batch: int = 1,
    _fused: bool = True,
) -> "callable":
    """Returns a jitted ``fn(signal) -> out`` with the kernel baked in.

    ``signal_spatial`` fixes the spatial shape the plan serves (plans are
    shape-specialized, like FFT plans everywhere). Batch size stays free;
    ``max_batch`` sizes the fused 1D plan's VMEM budget for the expected
    batch (the planned callable still re-checks the runtime batch and
    falls back to the composed path — see kernels.fused1d.plan_fft_conv1d).
    """
    n = kernel.ndim - 2
    stride_ = to_ntuple(stride, n)
    padding_ = to_ntuple(padding, n)
    dilation_ = to_ntuple(dilation, n)
    signal_spatial = tuple(signal_spatial)
    if len(signal_spatial) != n:
        raise ValueError(
            f"signal_spatial must have {n} dims, got {len(signal_spatial)}"
        )

    # 1D fused fast path
    if (
        _fused
        and n == 1
        and stride_ == (1,)
        and dilation_ == (1,)
        and groups == 1
        and padding_mode in ("constant", "zeros")
        and jax.devices()[0].platform == "tpu"
    ):
        from ..kernels.fused1d import choose_fft_size, plan_fft_conv1d

        l_pad = signal_spatial[0] + 2 * padding_[0]
        if choose_fft_size(
            kernel.shape[-1], l_pad, kernel.shape[1], kernel.shape[0],
            batch=max_batch,
        ) is not None:
            return plan_fft_conv1d(
                kernel, bias, padding=padding_[0],
                signal_length=signal_spatial[0], max_batch=max_batch,
            )

    # 2D fused fast path (tile kernel with baked per-tile spectra)
    if (
        _fused
        and n == 2
        and stride_ == (1, 1)
        and dilation_ == (1, 1)
        and groups == 1
        and jax.devices()[0].platform == "tpu"
    ):
        from ..kernels.fused2d import fused2d_fits, plan_fft_conv2d

        # gate on the full per-cell VMEM budget (scales with image width),
        # not just the tile plan — a wide image must route composed here
        # instead of failing Mosaic compilation at call time
        padded_hw = (
            signal_spatial[0] + 2 * padding_[0],
            signal_spatial[1] + 2 * padding_[1],
        )
        if fused2d_fits(
            kernel.shape[2], kernel.shape[3], kernel.shape[1],
            kernel.shape[0], padded_hw,
        ):
            return plan_fft_conv2d(
                kernel, bias, padding=padding_, padding_mode=padding_mode,
                signal_hw=signal_spatial,
            )

    # 3D fused fast path (whole-volume kernel with baked spectra)
    if (
        _fused
        and n == 3
        and stride_ == (1, 1, 1)
        and dilation_ == (1, 1, 1)
        and groups == 1
        and jax.devices()[0].platform == "tpu"
    ):
        from ..kernels.fused3d import plan_3d_blocked, plan_fft_conv3d

        padded = tuple(
            s + 2 * p for s, p in zip(signal_spatial, padding_)
        )
        cout, cin, kd, kh, kw = kernel.shape
        if (
            kd <= padded[0] and kh <= padded[1] and kw <= padded[2]
            and plan_3d_blocked(cin, cout, *padded, kd, kh, kw) is not None
        ):
            return plan_fft_conv3d(
                kernel, bias, padding=padding_, padding_mode=padding_mode,
                signal_dhw=signal_spatial,
            )

    kernel = F._dilate_kernel(kernel.astype(jnp.float32), dilation_)
    padded_spatial = tuple(
        s + 2 * p for s, p in zip(signal_spatial, padding_)
    )
    valid = tuple(
        ps - ks + 1 for ps, ks in zip(padded_spatial, kernel.shape[2:])
    )
    if any(v <= 0 for v in valid):
        raise ValueError("Kernel size can't be greater than actual input size")
    fft_shape = fft_even_shape(padded_spatial)

    if not spectral.use_matmul_dft(fft_shape):
        # long-axis shapes (jnp.fft path): bake the kernel's conjugated
        # rfftn spectrum once; per call only the signal-side transforms run
        axes = tuple(range(-n, 0))
        ker_fr = jax.device_put(
            jnp.conj(jnp.fft.rfftn(kernel, s=fft_shape, axes=axes))
        )

        @jax.jit
        def plain(signal):
            if signal.shape[2:] != signal_spatial:
                raise ValueError(
                    f"plan serves spatial shape {signal_spatial}, "
                    f"got {signal.shape[2:]}"
                )
            in_dtype = signal.dtype
            x = F._pad_signal(signal, padding_, padding_mode)
            x = x.astype(jnp.float32)
            sig_fr = jnp.fft.rfftn(x, s=fft_shape, axes=axes)
            out_fr = F._spectral_contract(sig_fr, ker_fr, groups)
            out = jnp.fft.irfftn(out_fr, s=fft_shape, axes=axes)
            out = lax.slice(
                out,
                (0, 0) + (0,) * n,
                out.shape[:2] + valid,
                (1, 1) + stride_,
            )
            if bias is not None:
                out = out + bias.astype(out.dtype).reshape(
                    (1, -1) + (1,) * n
                )
            return out.astype(in_dtype)

        return plain

    kr, ki = rfftn_matmul(kernel, fft_shape)
    kr = jax.device_put(kr)
    ki = jax.device_put(ki)

    @jax.jit
    def planned(signal):
        if signal.shape[2:] != signal_spatial:
            raise ValueError(
                f"plan serves spatial shape {signal_spatial}, "
                f"got {signal.shape[2:]}"
            )
        in_dtype = signal.dtype
        x = F._pad_signal(signal, padding_, padding_mode).astype(jnp.float32)
        sr, si = rfftn_matmul(x, fft_shape)
        out_r, out_i = spectral_contract_split(sr, si, kr, ki, groups)
        out = irfftn_matmul(out_r, out_i, fft_shape)
        out = lax.slice(
            out,
            (0, 0) + (0,) * n,
            out.shape[:2] + valid,
            (1, 1) + stride_,
        )
        if bias is not None:
            out = out + bias.astype(out.dtype).reshape((1, -1) + (1,) * n)
        return out.astype(in_dtype)

    return planned


def plan_fft_conv_transpose(
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    output_padding: IntOrTuple = 0,
    dilation: IntOrTuple = 1,
    groups: int = 1,
    *,
    signal_spatial: Iterable[int],
    max_batch: int = 1,
) -> "callable":
    """Planned transposed convolution: ``fn(signal) -> out`` with the
    TRANSFORMED kernel's spectra baked at plan time.

    The reference treats transposed conv as fully first-class
    (functional.py:92-176) but re-flips, re-group-swaps, re-dilates and
    re-transforms the kernel on every call (functional.py:109-114). This
    plan performs that whole kernel-side transform ONCE — flip spatial
    taps, (Cin, Cout/g) -> (Cout, Cin/g), dilate — and then delegates to
    ``plan_fft_conv`` on the stuffed full-correlation geometry, so all
    three serving tiers (fused Pallas plans, matmul-DFT baked spectra,
    long-axis rfftn baked spectra) apply unchanged. Per call only the
    signal-side work runs: one interior-stuffing ``lax.pad``, the planned
    forward transforms/contract/inverse, and a border crop.

    Args match ``torch.nn.functional.conv_transpose{1,2,3}d``:
    kernel (Cin, Cout/groups, *k), signal (B, Cin, *signal_spatial).
    """
    n = kernel.ndim - 2
    stride_ = to_ntuple(stride, n)
    padding_ = to_ntuple(padding, n)
    output_padding_ = to_ntuple(output_padding, n)
    dilation_ = to_ntuple(dilation, n)
    signal_spatial = tuple(signal_spatial)
    if len(signal_spatial) != n:
        raise ValueError(
            f"signal_spatial must have {n} dims, got {len(signal_spatial)}"
        )
    cin = kernel.shape[0]
    if cin % groups:
        raise ValueError(
            f"in_channels {cin} must be divisible by groups {groups}"
        )
    k_spatial = kernel.shape[2:]

    # kernel-side transform, done once: flip taps + swap the (Cin, Cout/g)
    # layout to (Cout, Cin/g) + dilate — reference functional.py:109-114,
    # the exact per-call work a plan amortizes
    ker = F._transpose_kernel_layout(
        kernel.astype(jnp.float32), groups, dilation_)
    k_dil = ker.shape[2:]

    out_shape = conv_transpose_output_shape(
        signal_spatial, k_spatial, stride_, padding_, output_padding_,
        dilation_,
    )
    if any(o <= 0 for o in out_shape):
        raise ValueError(
            f"transposed-conv output shape {out_shape} is non-positive for "
            f"signal_spatial={signal_spatial}"
        )
    # stuffed full-correlation extent: left pad k_dil-1, interior stride-1,
    # right pad k_dil-1 + output_padding; a VALID correlation on this
    # yields out + 2*padding columns, cropped [p : p+out) below
    full_spatial = tuple(
        (s - 1) * t + 1 + 2 * (k - 1) + op
        for s, t, k, op in zip(
            signal_spatial, stride_, k_dil, output_padding_
        )
    )
    # 3D keeps the fused tier off: the fused 3D transpose measured a wash
    # vs composed on the stuffed volume (see ops/functional.py n==3
    # transpose gate + doc/ROADMAP.md); flip both gates together
    inner = plan_fft_conv(
        ker, bias, stride=1, padding=0, dilation=1, groups=groups,
        signal_spatial=full_spatial, max_batch=max_batch,
        _fused=(n != 3),
    )
    stuff_cfg = [(0, 0, 0), (0, 0, 0)] + [
        (k - 1, k - 1 + op, t - 1)
        for k, t, op in zip(k_dil, stride_, output_padding_)
    ]
    crop_lo = (0, 0) + padding_
    crop_hi_spatial = tuple(p + o for p, o in zip(padding_, out_shape))

    @jax.jit
    def planned_t(signal):
        if signal.shape[2:] != signal_spatial:
            raise ValueError(
                f"plan serves spatial shape {signal_spatial}, "
                f"got {signal.shape[2:]}"
            )
        if signal.shape[1] != cin:
            raise ValueError(
                f"plan serves in_channels {cin}, got {signal.shape[1]}"
            )
        x = lax.pad(signal, jnp.zeros((), signal.dtype), stuff_cfg)
        out = inner(x)
        return lax.slice(out, crop_lo, out.shape[:2] + crop_hi_spatial)

    return planned_t
