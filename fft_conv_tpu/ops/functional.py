"""FFT-domain convolution / transposed convolution — composed-XLA path.

This is the correctness-reference implementation of the framework: pure
``jnp.fft`` + ``jnp.einsum`` + ``jax.lax`` ops, fully jittable, differentiable
via JAX AD, and shardable via pjit. The fused Pallas kernels
(``fft_conv_tpu.kernels``) must match this path bit-tolerantly.

Semantics match the reference exactly (cited per step):
  - fft_conv:            /root/reference/fft_conv_pytorch/functional.py:19-89
  - fft_conv_transpose:  /root/reference/fft_conv_pytorch/functional.py:92-176
  - complex_matmul:      /root/reference/fft_conv_pytorch/functional.py:11-16

TPU-first design notes (not a torch translation):
  * Dilation zero-stuffing and transposed-conv signal stuffing use
    ``lax.pad`` with *interior* padding — a single XLA op instead of the
    reference's zero-alloc + strided scatter (functional.py:49-57, 126-139).
  * Crop-and-stride uses a single strided ``lax.slice`` (static shapes).
  * All shape arithmetic is static Python (see utils.shapes) so XLA sees
    fixed shapes and can tile the frequency-domain contraction onto the MXU.
  * bfloat16/float16 inputs are computed in float32 frequency domain
    (complex64) and cast back — FFT twiddle accuracy requires fp32.
"""

from functools import partial
from typing import Iterable, Optional, Union

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.shapes import (
    conv_transpose_output_shape,
    dilated_size,
    fft_even_shape,
    next_pow2,
    to_ntuple,
)

# Composed-path FFT length policy:
#   "even" — reference parity: round each padded spatial size up to even
#            (reference functional.py:64-66). Relies on the backend FFT
#            handling arbitrary (mixed-radix / Bluestein) lengths well.
#   "pow2" — round up to the next power of two. Mathematically identical
#            for the cropped valid region (appended zeros never wrap into
#            it); preferable on backends whose FFT is slow at awkward sizes.
# Module-level default, overridable per call via fft_policy=.
DEFAULT_FFT_POLICY = "even"


def _fft_length(s: int, policy: str) -> int:
    if policy == "even":
        return (s + 1) // 2 * 2
    if policy == "pow2":
        return next_pow2(s)
    raise ValueError(f"unknown fft_policy: {policy!r}")

IntOrTuple = Union[int, Iterable[int]]

# torch F.pad vocabulary -> jnp.pad vocabulary. Accept both spellings.
_PAD_MODES = {
    "constant": "constant",
    "zeros": "constant",
    "reflect": "reflect",
    "replicate": "edge",
    "edge": "edge",
    "circular": "wrap",
    "wrap": "wrap",
}


def complex_matmul(
    a: jax.Array,
    b: jax.Array,
    groups: int = 1,
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """Per-frequency-bin grouped channel contraction.

    ``a``: (B, Cin, *freq) complex, ``b``: (Cout, Cin/groups, *freq) complex.
    Returns (B, Cout, *freq). Equivalent to the reference einsum
    ``bgi...,goi...->bgo...`` (functional.py:11-16). Each frequency bin is an
    independent (B, Cin/g) @ (Cin/g, Cout/g) complex matmul; XLA lowers the
    complex dot to real MXU matmuls and tiles the freq axes onto lanes.

    ``precision`` defaults to HIGHEST: the TPU MXU's default bf16 passes give
    ~1e-2 error on fp32 spectra, far outside the 5e-5/1e-4 accuracy bar
    (reference benchmark_utils.py:53-57); full-f32 accumulation restores it.
    """
    batch = a.shape[0]
    a = a.reshape(batch, groups, a.shape[1] // groups, *a.shape[2:])
    b = b.reshape(groups, b.shape[0] // groups, b.shape[1], *b.shape[2:])
    out = jnp.einsum("bgi...,goi...->bgo...", a, b, precision=precision)
    return out.reshape(batch, groups * out.shape[2], *out.shape[3:])


# Per-bin matmuls smaller than this run as a VPU multiply+reduce, which XLA
# fuses straight into the surrounding FFTs (bandwidth-optimal for the small
# channel counts typical of FFT-conv workloads). Larger contractions use the
# MXU einsum in ``complex_matmul``.
_MXU_CONTRACT_THRESHOLD = 4096


def _spectral_contract(sig_fr: jax.Array, ker_fr: jax.Array, groups: int) -> jax.Array:
    """Grouped per-frequency-bin contraction, TPU-shape aware.

    Math identical to ``complex_matmul`` (reference functional.py:11-16).
    Two lowerings:
      * tiny channels — broadcast multiply + sum over Cin/g on the VPU; XLA
        fuses it with rfft/irfft, so spectra never round-trip HBM twice.
      * large channels — MXU einsum, fenced with ``optimization_barrier``:
        XLA:TPU pathologically hangs (>9 min compile) when it tries to fuse a
        524k-batch dot into 2^20-point FFTs; the barrier keeps the dot a
        standalone op (measured: full pipeline then compiles in ~9 s).
    """
    batch, cin = sig_fr.shape[0], sig_fr.shape[1]
    cout = ker_fr.shape[0]
    cin_g, cout_g = cin // groups, cout // groups
    freq = sig_fr.shape[2:]
    if batch * cin_g * cout_g <= _MXU_CONTRACT_THRESHOLD:
        a = sig_fr.reshape(batch, groups, 1, cin_g, *freq)
        b = ker_fr.reshape(1, groups, cout_g, cin_g, *freq)
        return jnp.sum(a * b, axis=3).reshape(batch, cout, *freq)
    a, b = lax.optimization_barrier((sig_fr, ker_fr))
    out = complex_matmul(a, b, groups=groups)
    return lax.optimization_barrier(out)


def _dilate_kernel(kernel: jax.Array, dilation) -> jax.Array:
    """Zero-stuff the kernel's spatial dims: size (k-1)*d + 1, taps at step d.

    Matches reference functional.py:49-57 via XLA interior padding.
    """
    if all(d == 1 for d in dilation):
        return kernel
    config = [(0, 0, 0), (0, 0, 0)] + [(0, 0, d - 1) for d in dilation]
    return lax.pad(kernel, jnp.zeros((), kernel.dtype), config)


def _transpose_kernel_layout(kernel: jax.Array, groups: int,
                             dilation_) -> jax.Array:
    """The transposed conv's kernel-side transform, shared by the
    composed path, the fused-3D wrapper, and the serving plan: flip the
    spatial taps, swap the (Cin, Cout/g) group layout to (Cout, Cin/g),
    and dilate — reference functional.py:109-114. One definition so a
    future group-layout fix cannot diverge across the three callers."""
    k_spatial = kernel.shape[2:]
    kernel = jnp.flip(kernel, axis=tuple(range(2, kernel.ndim)))
    cin, cout_per_g = kernel.shape[0], kernel.shape[1]
    kernel = kernel.reshape(groups, cin // groups, cout_per_g, *k_spatial)
    kernel = jnp.swapaxes(kernel, 1, 2)
    kernel = kernel.reshape(groups * cout_per_g, cin // groups, *k_spatial)
    return _dilate_kernel(kernel, dilation_)


def _pad_signal(signal: jax.Array, padding, padding_mode: str) -> jax.Array:
    """Symmetric spatial padding (reference functional.py:60-62)."""
    if all(p == 0 for p in padding):
        return signal
    mode = _PAD_MODES.get(padding_mode)
    if mode is None:
        raise ValueError(f"Unsupported padding_mode: {padding_mode!r}")
    pad_width = [(0, 0), (0, 0)] + [(p, p) for p in padding]
    return jnp.pad(signal, pad_width, mode=mode)


def _freq_domain_conv(signal, kernel, fft_shape, groups):
    """rfftn(signal) x conj(rfftn(kernel)) -> irfftn, the shared hot core.

    Conjugating the kernel spectrum makes this cross-correlation, matching
    torch's "convolution" convention (reference functional.py:68-75).

    Two lowerings, chosen at trace time: short axes on TPU run the MXU
    DFT-matmul pipeline (ops/spectral.py — XLA's Fft HLO is ~50x off
    roofline at 512^2); long axes use jnp.fft.
    """
    from .spectral import freq_domain_conv_matmul, use_matmul_dft

    n = len(fft_shape)
    in_dtype = signal.dtype
    if in_dtype in (jnp.bfloat16, jnp.float16):
        signal = signal.astype(jnp.float32)
        kernel = kernel.astype(jnp.float32)
    if use_matmul_dft(fft_shape):
        return freq_domain_conv_matmul(
            signal, kernel, fft_shape, groups
        ).astype(in_dtype)
    axes = tuple(range(-n, 0))
    sig_fr = jnp.fft.rfftn(signal, s=fft_shape, axes=axes)
    ker_fr = jnp.conj(jnp.fft.rfftn(kernel, s=fft_shape, axes=axes))
    out_fr = _spectral_contract(sig_fr, ker_fr, groups)
    out = jnp.fft.irfftn(out_fr, s=fft_shape, axes=axes)
    return out.astype(in_dtype)


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def fft_conv(
    signal: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    dilation: IntOrTuple = 1,
    groups: int = 1,
    padding_mode: str = "constant",
    impl: str = "auto",
    fft_policy: Optional[str] = None,
) -> jax.Array:
    """N-d convolution via FFT; fast for large kernels.

    Args match ``torch.nn.functional.conv{1,2,3}d`` plus ``padding_mode``:
      signal: (B, Cin, *spatial); kernel: (Cout, Cin/groups, *k);
      bias: (Cout,) or None.

    ``impl``: "auto" (on TPU, routes to the fused Pallas kernels — 1D and
    2D, any stride/dilation/groups/padding mode with a fitting plan — or
    the tiled overlap-save path where its cost model wins; composed XLA
    otherwise), "xla" (always composed), "fused" (require the Pallas
    path; ValueError if the config doesn't qualify), "tiled" (force
    overlap-save tiling; falls back to composed when the plan is
    degenerate).

    Reference semantics: functional.py:19-89, step-for-step:
    normalize args -> dilate kernel -> pad signal -> even-rounded circular
    FFT -> per-bin grouped complex matmul -> inverse FFT -> crop valid
    region with stride -> add bias.
    """
    if signal.ndim < 3:
        raise ValueError(
            f"signal must be (batch, channels, *spatial) with >=1 spatial "
            f"dim; got shape {tuple(signal.shape)}"
        )
    if kernel.ndim != signal.ndim:
        raise ValueError(
            f"kernel rank {kernel.ndim} != signal rank {signal.ndim}; "
            f"expected (out_channels, in_channels/groups, *k) matching the "
            f"signal's spatial rank"
        )
    n = signal.ndim - 2
    stride_ = to_ntuple(stride, n)
    padding_ = to_ntuple(padding, n)
    dilation_ = to_ntuple(dilation, n)

    if padding_mode not in _PAD_MODES:
        raise ValueError(f"Unsupported padding_mode: {padding_mode!r}")
    if signal.shape[1] % groups or kernel.shape[0] % groups:
        raise ValueError(
            f"in_channels {signal.shape[1]} and out_channels "
            f"{kernel.shape[0]} must both be divisible by groups {groups}"
        )
    if signal.shape[1] // groups != kernel.shape[1]:
        raise ValueError(
            f"kernel expects {kernel.shape[1]} in-channels per group, signal "
            f"has {signal.shape[1]} / groups {groups}"
        )
    if impl not in ("auto", "xla", "fused", "tiled"):
        raise ValueError(f"unknown impl: {impl!r}")
    if impl in ("auto", "fused"):
        # padding modes are applied in the wrapper before the kernel runs,
        # so every supported mode is fused-eligible
        eligible = n in (1, 2, 3)
        if impl == "fused" and not eligible:
            raise ValueError("impl='fused' requires 1D/2D/3D input")
        # No small-kernel cutoff: the round-4 full crossover sweep (v5e,
        # doc/benchmark_results.json) measured fused faster than composed
        # at EVERY small-kernel point the old prod(K)<64 gate excluded —
        # 2D k=4 0.57 ms fused vs 4.51 composed, 2D k=1 0.32 vs 2.41,
        # 3D k=1 0.91 vs 1.32, 1D k=1 0.067 vs 0.084 — so auto routes
        # fused whenever a plan fits, at any kernel size.
        if eligible and n == 1 and (impl == "fused" or _on_tpu()):
            from ..kernels.fused1d import choose_fft_size, fft_conv1d_fused

            l_pad = signal.shape[-1] + 2 * padding_[0]
            k_dil = dilated_size(kernel.shape[-1], dilation_[0])
            if choose_fft_size(
                k_dil, l_pad, signal.shape[1] // groups, kernel.shape[0],
                batch=signal.shape[0],
            ) is not None:
                return fft_conv1d_fused(
                    signal, kernel, bias, padding=padding_[0],
                    padding_mode=padding_mode,
                    stride=stride_[0], dilation=dilation_[0], groups=groups,
                )
            if impl == "fused":
                raise ValueError(
                    "no fused FFT configuration fits this shape (kernel "
                    "spectra exceed the VMEM budget or signal too small)"
                )
        if eligible and n == 2 and (impl == "fused" or _on_tpu()):
            from ..kernels.fused2d import fft_conv2d_fused, fused2d_fits

            k_dil = [
                dilated_size(k, d)
                for k, d in zip(kernel.shape[2:], dilation_)
            ]
            padded = [
                s + 2 * p for s, p in zip(signal.shape[2:], padding_)
            ]
            fits = fused2d_fits(
                k_dil[0], k_dil[1], signal.shape[1] // groups,
                kernel.shape[0], tuple(padded), cin_total=signal.shape[1],
            )
            if fits:
                return fft_conv2d_fused(
                    signal, kernel, bias, padding=padding_,
                    padding_mode=padding_mode, stride=stride_,
                    dilation=dilation_, groups=groups,
                )
            if impl == "fused":
                raise ValueError(
                    "no fused 2D FFT configuration fits this shape"
                )
        if eligible and n == 3 and (impl == "fused" or _on_tpu()):
            from ..kernels.fused3d import fft_conv3d_fused, plan_3d_blocked

            k_dil = [
                dilated_size(k, dd)
                for k, dd in zip(kernel.shape[2:], dilation_)
            ]
            padded = [
                s + 2 * p for s, p in zip(signal.shape[2:], padding_)
            ]
            blocked = plan_3d_blocked(
                signal.shape[1], kernel.shape[0], padded[0], padded[1],
                padded[2], k_dil[0], k_dil[1], k_dil[2], groups,
            )
            # auto routes single-block plans only (the W-overlap-save
            # multi-block path is available via impl="fused" but has not
            # yet beaten the composed path in TPU measurement for plain
            # conv shapes — wide-W routing is re-evaluated per round)
            if blocked is not None and (impl == "fused" or blocked[1] == 1):
                return fft_conv3d_fused(
                    signal, kernel, bias, padding=padding_,
                    padding_mode=padding_mode, stride=stride_,
                    dilation=dilation_, groups=groups,
                )
            if impl == "fused":
                raise ValueError(
                    "no fused 3D FFT configuration fits this shape"
                )

    use_tiled = impl == "tiled" or (
        impl == "auto" and _on_tpu() and _tiling_wins_here(
            signal, kernel, stride_, padding_, dilation_, groups
        )
    )
    return _fft_conv(
        signal,
        kernel,
        bias,
        stride_,
        padding_,
        dilation_,
        int(groups),
        padding_mode,
        fft_policy or DEFAULT_FFT_POLICY,
        use_tiled,
    )


def _tiling_wins_here(signal, kernel, stride_, padding_, dilation_, groups):
    """Static routing: overlap-save tiling vs one whole-signal transform."""
    from .tiled import tiling_wins

    k_dil = tuple(
        dilated_size(k, d) for k, d in zip(kernel.shape[2:], dilation_)
    )
    padded = tuple(
        s + 2 * p for s, p in zip(signal.shape[2:], padding_)
    )
    if any(s - k + 1 <= 0 for s, k in zip(padded, k_dil)):
        return False  # invalid config: let the standard path raise
    valid = tuple(s - k + 1 for s, k in zip(padded, k_dil))
    return tiling_wins(
        padded, k_dil, valid, (signal.shape[0], signal.shape[1], kernel.shape[0])
    )


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def _fft_conv(
    signal, kernel, bias, stride_, padding_, dilation_, groups, padding_mode,
    fft_policy, use_tiled=False,
):
    n = signal.ndim - 2
    kernel = _dilate_kernel(kernel, dilation_)
    signal = _pad_signal(signal, padding_, padding_mode)

    valid = [
        signal.shape[2 + i] - kernel.shape[2 + i] + 1 for i in range(n)
    ]
    if any(v <= 0 for v in valid):
        raise ValueError(
            f"Kernel size can't be greater than actual input size: padded "
            f"input spatial {signal.shape[2:]} vs (dilated) kernel "
            f"{kernel.shape[2:]}"
        )

    if use_tiled:
        from .tiled import plan_tiles, untiled_shape

        # degenerate plan (every axis untiled) means overlap-save buys
        # nothing: a single whole-axis dense DFT matmul would be strictly
        # worse than the FFT transform below (e.g. a 32768-point axis whose
        # kernel exceeds every tile candidate) — fall through
        tile, _, _ = plan_tiles(
            signal.shape[2:], kernel.shape[2:], tuple(valid),
            (signal.shape[0], signal.shape[1], kernel.shape[0]),
        )
        use_tiled = tile != untiled_shape(
            signal.shape[2:], kernel.shape[2:], tuple(valid)
        )

    if use_tiled:
        from .tiled import tiled_valid_corr

        out = tiled_valid_corr(signal, kernel, groups, out_len=tuple(valid))
        out = lax.slice(
            out, (0, 0) + (0,) * n, out.shape, (1, 1) + stride_
        )
    else:
        # FFT length per policy (reference parity: even rounding,
        # functional.py:64-66): circular transform at >= signal length; the
        # crop below never touches wraparound.
        fft_shape = tuple(_fft_length(s, fft_policy) for s in signal.shape[2:])
        out = _freq_domain_conv(signal, kernel, fft_shape, groups)
        # Crop to the valid region [0 : s-k+1 : stride] (functional.py:76-82).
        out = lax.slice(
            out,
            start_indices=(0, 0) + (0,) * n,
            limit_indices=out.shape[:2] + tuple(valid),
            strides=(1, 1) + stride_,
        )

    if bias is not None:
        out = out + bias.astype(out.dtype).reshape((1, -1) + (1,) * n)
    return out


def fft_conv_transpose(
    signal: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    output_padding: IntOrTuple = 0,
    dilation: IntOrTuple = 1,
    groups: int = 1,
    impl: str = "auto",
    fft_policy: Optional[str] = None,
) -> jax.Array:
    """N-d transposed convolution via FFT.

    Args match ``torch.nn.functional.conv_transpose{1,2,3}d``:
      signal: (B, Cin, *spatial); kernel: (Cin, Cout/groups, *k)
      (transposed-conv weight convention); bias: (Cout,) or None.

    ``impl``: "auto" / "xla" / "fused" / "tiled" as in ``fft_conv`` (the
    fused path qualifies at 1D/2D, unit stride/dilation/groups, zero
    output_padding).

    Reference semantics: functional.py:92-176. Kernel flip + group transpose
    turns transposed conv into a regular FFT correlation; signal interior
    zero-stuffing implements stride-upsampling plus the left full-conv pad;
    the ``padding`` argument *removes* border from the result.
    """
    if signal.ndim < 3:
        raise ValueError(
            f"signal must be (batch, channels, *spatial) with >=1 spatial "
            f"dim; got shape {tuple(signal.shape)}"
        )
    if kernel.ndim != signal.ndim:
        raise ValueError(
            f"kernel rank {kernel.ndim} != signal rank {signal.ndim}; "
            f"expected (in_channels, out_channels/groups, *k) matching the "
            f"signal's spatial rank"
        )
    n = signal.ndim - 2
    stride_ = to_ntuple(stride, n)
    padding_ = to_ntuple(padding, n)
    output_padding_ = to_ntuple(output_padding, n)
    dilation_ = to_ntuple(dilation, n)

    if signal.shape[1] != kernel.shape[0]:
        raise ValueError(
            f"signal in_channels {signal.shape[1]} != kernel dim 0 "
            f"{kernel.shape[0]} (transposed-conv layout is (Cin, Cout/g, *k))"
        )
    if kernel.shape[0] % groups:
        raise ValueError(
            f"in_channels {kernel.shape[0]} must be divisible by groups "
            f"{groups}"
        )
    if impl not in ("auto", "xla", "fused", "tiled"):
        raise ValueError(f"unknown impl: {impl!r}")
    if impl in ("auto", "fused"):
        # the fused transposed path interior-stuffs the signal in its
        # wrapper, so any stride/dilation/groups/output_padding qualifies
        eligible = n in (1, 2, 3)
        if impl == "fused" and not eligible:
            raise ValueError("impl='fused' requires 1D/2D/3D input")
        k_dil = tuple(
            dilated_size(k, dd) for k, dd in zip(kernel.shape[2:], dilation_)
        )
        # the internal full correlation runs on the stuffed signal:
        # (s-1)*stride + 1, padded k_dil-1 per side (+ output_padding)
        full_spatial = tuple(
            (s - 1) * t + 1 + 2 * (kd - 1) + op
            for s, t, kd, op in zip(
                signal.shape[2:], stride_, k_dil, output_padding_
            )
        )
        cout_total = kernel.shape[1] * groups
        if eligible and n == 1 and (impl == "fused" or _on_tpu()):
            from ..kernels.fused1d import (
                choose_fft_size,
                fft_conv_transpose1d_fused,
            )

            if choose_fft_size(
                k_dil[0], full_spatial[0], signal.shape[1] // groups,
                cout_total, batch=signal.shape[0],
            ) is not None:
                return fft_conv_transpose1d_fused(
                    signal, kernel, bias, padding=padding_[0],
                    stride=stride_[0], dilation=dilation_[0], groups=groups,
                    output_padding=output_padding_[0],
                )
            if impl == "fused":
                raise ValueError("no fused FFT configuration fits this shape")
        if eligible and n == 2 and (impl == "fused" or _on_tpu()):
            from ..kernels.fused2d import (
                fft_conv_transpose2d_fused,
                fused2d_fits,
            )

            if fused2d_fits(
                k_dil[0], k_dil[1], signal.shape[1] // groups, cout_total,
                full_spatial, cin_total=signal.shape[1],
            ):
                return fft_conv_transpose2d_fused(
                    signal, kernel, bias, padding=padding_, stride=stride_,
                    dilation=dilation_, groups=groups,
                    output_padding=output_padding_,
                )
            if impl == "fused":
                raise ValueError("no fused 2D FFT configuration fits this shape")
        if eligible and n == 3 and (impl == "fused" or _on_tpu()):
            from ..kernels.fused3d import (
                fft_conv_transpose3d_fused,
                plan_3d_blocked,
            )

            blocked = plan_3d_blocked(
                signal.shape[1], cout_total, full_spatial[0],
                full_spatial[1], full_spatial[2], k_dil[0], k_dil[1],
                k_dil[2], groups,
            )
            # the stuffed full-correlation volume's W exceeds one lane
            # half at typical 3D shapes, so this path is W-overlap-save
            # blocked; auto keeps composed until the blocked path beats
            # it in TPU measurement (re-evaluated per round)
            if blocked is not None and impl == "fused":
                return fft_conv_transpose3d_fused(
                    signal, kernel, bias, padding=padding_, stride=stride_,
                    dilation=dilation_, groups=groups,
                    output_padding=output_padding_,
                )
            if impl == "fused":
                raise ValueError(
                    "no fused 3D FFT configuration fits this shape"
                )

    use_tiled = impl == "tiled" or (
        impl == "auto" and _on_tpu() and _tiling_wins_transpose(
            signal, kernel, stride_, padding_, output_padding_, dilation_,
            groups,
        )
    )
    return _fft_conv_transpose(
        signal,
        kernel,
        bias,
        stride_,
        padding_,
        output_padding_,
        dilation_,
        int(groups),
        fft_policy or DEFAULT_FFT_POLICY,
        use_tiled,
    )


def _tiling_wins_transpose(
    signal, kernel, stride_, padding_, output_padding_, dilation_, groups
):
    from .tiled import tiling_wins

    k_dil = tuple(
        dilated_size(k, d) for k, d in zip(kernel.shape[2:], dilation_)
    )
    stuffed = tuple(
        (s - 1) * t + 1 + (k - 1)
        for s, t, k in zip(signal.shape[2:], stride_, k_dil)
    )
    out_shape = conv_transpose_output_shape(
        signal.shape[2:], kernel.shape[2:], stride_, padding_,
        output_padding_, dilation_,
    )
    out_full = tuple(o + p for o, p in zip(out_shape, padding_))
    cout = kernel.shape[1] * groups
    return tiling_wins(
        stuffed, k_dil, out_full, (signal.shape[0], signal.shape[1], cout)
    )


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def _fft_conv_transpose(
    signal, kernel, bias, stride_, padding_, output_padding_, dilation_, groups,
    fft_policy, use_tiled=False,
):
    n = signal.ndim - 2
    k_spatial = kernel.shape[2:]

    kernel = _transpose_kernel_layout(kernel, groups, dilation_)
    k_dil = kernel.shape[2:]

    # Interior-stuff the signal: size (s-1)*t + 1 + (k_dil-1), elements at
    # offset k_dil-1 step t — reference functional.py:126-139 as one lax.pad.
    zero = jnp.zeros((), signal.dtype)
    config = [(0, 0, 0), (0, 0, 0)] + [
        (k - 1, 0, t - 1) for k, t in zip(k_dil, stride_)
    ]
    signal_ = lax.pad(signal, zero, config)

    out_shape = conv_transpose_output_shape(
        signal.shape[2:], k_spatial, stride_, padding_, output_padding_, dilation_
    )

    if use_tiled:
        from .tiled import plan_tiles, untiled_shape

        # degenerate plan (every axis untiled) — whole-axis dense DFTs are
        # strictly worse than the FFT path below; fall through (see _fft_conv)
        out_full = tuple(o + p for o, p in zip(out_shape, padding_))
        tile, _, _ = plan_tiles(
            signal_.shape[2:], kernel.shape[2:], out_full,
            (signal_.shape[0], signal_.shape[1], kernel.shape[0]),
        )
        use_tiled = tile != untiled_shape(
            signal_.shape[2:], kernel.shape[2:], out_full
        )

    if use_tiled:
        from .tiled import tiled_valid_corr

        # outputs [0 : out+p) of the zero-extended correlation, then drop
        # the first p per dim — padding removes border (functional.py:163-169)
        out = tiled_valid_corr(signal_, kernel, groups, out_len=out_full)
        out = lax.slice(
            out,
            start_indices=(0, 0) + tuple(padding_),
            limit_indices=out.shape[:2] + out_full,
        )
    else:
        # FFT length >= linear-conv length s + k - 1, rounded per policy. The
        # "even" rounding reproduces the reference exactly: (s+k-1+1)//2*2 ==
        # (s+k)//2*2 (functional.py:143).
        fft_shape = tuple(
            _fft_length(s + k - 1, fft_policy)
            for s, k in zip(signal_.shape[2:], k_dil)
        )
        out = _freq_domain_conv(signal_, kernel, fft_shape, groups)

        # Crop [p : out+p] per dim (functional.py:163-169).
        out = lax.slice(
            out,
            start_indices=(0, 0) + tuple(padding_),
            limit_indices=out.shape[:2]
            + tuple(s + p for s, p in zip(out_shape, padding_)),
        )

    if bias is not None:
        out = out + bias.astype(out.dtype).reshape((1, -1) + (1,) * n)
    return out
