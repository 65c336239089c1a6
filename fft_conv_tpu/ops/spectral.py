"""DFT-as-matmul: frequency transforms on the MXU for short axes.

XLA's Fft HLO on TPU is far off the roofline for the 2D/3D benchmark sizes
(measured: 5.4 ms flat for the whole composed conv at 512x512 where the
ideal is ~0.1 ms). For axes up to ~2k, a dense DFT matrix multiply is
MXU-native and wins despite the O(N^2) flops — the same reasoning as the
fused 1D kernel's four-step factorization (kernels/fourstep.py), applied
axis-by-axis in plain XLA so it composes with every fft_conv feature
(groups, stride, dilation, N-d).

All arithmetic is split re/im f32 (no complex dtypes: the axon TPU runtime
rejects small-shape complex ops, and split-real gives explicit control of
matmul precision). The pipeline:

    rfft on the last axis (rectangular real->half-spectrum matmuls)
    full complex DFT per remaining axis (square matmuls)
    grouped channel MAC (broadcast-mul+sum, VPU)
    inverse DFT per non-last axis, inverse rfft on the last axis
    (hermitian-weighted rectangular matmuls, real output)

Replaces torch.fft.rfftn/irfftn (reference functional.py:6, 68-75) for
short-axis shapes; jnp.fft remains the path for long axes.
"""

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Axes at most this long use DFT matmuls on TPU (all-or-nothing per call).
MATMUL_DFT_MAX = 2048

# Matmul precision for the spectral matmuls. HIGHEST = full f32; outside
# Pallas, HIGH (bf16x3) is also available as a speed knob.
_PRECISION = lax.Precision.HIGHEST


def set_spectral_precision(mode: str) -> None:
    """"highest" (full f32, default) | "high" (bf16x3, ~2x faster).

    Clears JAX's compilation caches: the precision is read at trace time, so
    already-compiled fft_conv executables would otherwise keep the old mode.
    """
    global _PRECISION
    table = {"highest": lax.Precision.HIGHEST, "high": lax.Precision.HIGH}
    if mode not in table:
        raise ValueError(f"unknown spectral precision mode: {mode!r}")
    if table[mode] != _PRECISION:
        _PRECISION = table[mode]
        jax.clear_caches()

_LETTERS = "abcdefghijk"


@lru_cache(maxsize=None)
def _rfft_mats(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(Fr, Fi) with shape (n, n//2+1): X[k] = sum_t x[t] e^{-2pi i tk/n}."""
    t = np.arange(n)[:, None]
    k = np.arange(n // 2 + 1)[None, :]
    ang = -2.0 * np.pi * t * k / n
    return (
        np.ascontiguousarray(np.cos(ang), np.float32),
        np.ascontiguousarray(np.sin(ang), np.float32),
    )


@lru_cache(maxsize=None)
def _irfft_mats(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(Cr, Ci) with shape (n//2+1, n): y = Xr @ Cr + Xi @ Ci.

    Hermitian expansion of the one-sided spectrum: interior bins weighted 2,
    DC and (even-n) Nyquist weighted 1; imaginary parts of DC/Nyquist are
    ignored (rows zeroed), matching irfft semantics.
    """
    nb = n // 2 + 1
    k = np.arange(nb)[:, None]
    t = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * t / n
    w = np.full((nb, 1), 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    cr = w * np.cos(ang) / n
    ci = -w * np.sin(ang) / n
    ci[0] = 0.0
    if n % 2 == 0:
        ci[-1] = 0.0
    return (
        np.ascontiguousarray(cr, np.float32),
        np.ascontiguousarray(ci, np.float32),
    )


@lru_cache(maxsize=None)
def _dft_mats(n: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Square complex DFT matrix (split), inverse includes the 1/n."""
    j = np.arange(n)
    sign = 2.0 if inverse else -2.0
    ang = sign * np.pi * np.outer(j, j) / n
    scale = (1.0 / n) if inverse else 1.0
    return (
        np.ascontiguousarray(np.cos(ang) * scale, np.float32),
        np.ascontiguousarray(np.sin(ang) * scale, np.float32),
    )


def _axis_einsum(x: jax.Array, mat: jax.Array, axis: int) -> jax.Array:
    """Contract ``axis`` of x with dim 0 of mat, keeping the axis in place."""
    subs = _LETTERS[: x.ndim]
    a = subs[axis]
    spec = f"{subs},{a}z->{subs.replace(a, 'z')}"
    return jnp.einsum(spec, x, mat, precision=_PRECISION)


# Full-DFT axes at least this long use the two-factor (four-step)
# decomposition instead of a dense DFT matrix. Measured on v5e: despite 10x
# fewer flops at N=512, the small-factor contractions (32/16) waste the MXU
# and the extra twiddle/reshape passes make it NET SLOWER than the dense
# matrix (2.49 ms vs 1.66 ms for the 2D K=34 conv) — so it only engages
# beyond the current use_matmul_dft range, i.e. it is kept (correct, tested)
# for a future extension of the matmul path to longer axes.
_FOURSTEP_MIN = 4096


def _fourstep_factors(n: int) -> Optional[Tuple[int, int]]:
    """Most-square power-of-two split, or None if n isn't a pow2 >= min."""
    if n < _FOURSTEP_MIN or n & (n - 1):
        return None
    log = n.bit_length() - 1
    n1 = 1 << ((log + 1) // 2)
    return n1, n // n1


@lru_cache(maxsize=None)
def _fourstep_mats(n1: int, n2: int, inverse: bool):
    """Split f1/f2/twiddle factor matrices (f32) for a length-n1*n2 DFT."""
    n = n1 * n2
    j1 = np.arange(n1)
    j2 = np.arange(n2)
    sign = 2.0 if inverse else -2.0
    a1 = sign * np.pi * np.outer(j1, j1) / n1
    a2 = sign * np.pi * np.outer(j2, j2) / n2
    at = sign * np.pi * np.outer(j1, j2) / n
    scale = 1.0 / n if inverse else 1.0
    return tuple(
        np.ascontiguousarray(m, np.float32)
        for m in (
            np.cos(a1), np.sin(a1),
            np.cos(a2) * scale, np.sin(a2) * scale,
            np.cos(at), np.sin(at),
        )
    )


def _axis_fourstep(xr, xi, axis, n, inverse, in_len=None):
    """Two-factor DFT of one axis; bins come out SCRAMBLED along the axis.

    Scrambling is harmless for convolution: both operands pass through the
    same transform, the MAC is elementwise, and the inverse (same
    factorization, conjugate matrices) unscrambles. Real rfft/irfft axes
    keep natural order, so only full-DFT axes ever scramble.

    ``in_len`` < n declares trailing zeros (implicit padding): only
    ceil(in_len/n2) input rows are nonzero, so stage 1 contracts a
    row-sliced factor matrix — the kernel-spectrum fast path.
    """
    n1, n2 = _fourstep_factors(n)
    f1r, f1i, f2r, f2i, twr, twi = (
        jnp.asarray(m) for m in _fourstep_mats(n1, n2, inverse)
    )
    rows = n1
    if not inverse and in_len is not None and in_len < n:
        rows = -(-in_len // n2)
        pad = [(0, 0)] * xr.ndim
        pad[axis] = (0, rows * n2 - in_len)
        xr = jnp.pad(xr, pad)
        xi = jnp.pad(xi, pad)
        f1r = f1r[:rows]
        f1i = f1i[:rows]

    # split the axis (row-major, free) into (rows, n2)
    def split(a):
        return a.reshape(*a.shape[:axis], rows, n2, *a.shape[axis + 1:])

    def cmul_mat(ar, ai, mr, mi, ax):
        re = _axis_einsum(ar, mr, ax) - _axis_einsum(ai, mi, ax)
        im = _axis_einsum(ar, mi, ax) + _axis_einsum(ai, mr, ax)
        return re, im

    xr, xi = split(xr), split(xi)
    # twiddle tw[k1, j2] broadcast across the other dims
    shape = [1] * xr.ndim
    shape[axis], shape[axis + 1] = n1, n2
    tr = twr.reshape(shape)
    ti = twi.reshape(shape)

    if not inverse:
        # forward: contract j1 -> k1, twiddle[k1, j2], contract j2 -> k2
        yr, yi = cmul_mat(xr, xi, f1r, f1i, axis)
        zr = yr * tr - yi * ti
        zi = yr * ti + yi * tr
        wr, wi = cmul_mat(zr, zi, f2r, f2i, axis + 1)
    else:
        # inverse reverses the stage order: contract k2 -> j2 first, then
        # the conjugate twiddle (still indexed [k1, j2]), then k1 -> j1.
        yr, yi = cmul_mat(xr, xi, f2r, f2i, axis + 1)
        zr = yr * tr - yi * ti
        zi = yr * ti + yi * tr
        wr, wi = cmul_mat(zr, zi, f1r, f1i, axis)

    def merge(a):
        return a.reshape(*a.shape[:axis], n, *a.shape[axis + 2:])

    return merge(wr), merge(wi)


def _complex_axis_dft(xr, xi, axis, n, inverse, in_len=None):
    # Large pow2 axes: factorized transform (used for signal AND kernel so
    # their scrambled bin orders stay identical).
    if _fourstep_factors(n) is not None:
        return _axis_fourstep(xr, xi, axis, n, inverse, in_len=in_len)
    mr, mi = _dft_mats(n, inverse)
    if in_len is not None and in_len < n:
        # implicit zero-padding: only the first in_len rows contribute
        mr, mi = mr[:in_len], mi[:in_len]
    mr = jnp.asarray(mr)
    mi = jnp.asarray(mi)
    yr = _axis_einsum(xr, mr, axis) - _axis_einsum(xi, mi, axis)
    yi = _axis_einsum(xr, mi, axis) + _axis_einsum(xi, mr, axis)
    return yr, yi


def _contract_append(x: jax.Array, mat: jax.Array, pos: int) -> jax.Array:
    """Contract position ``pos`` of x with dim 0 of mat; bins APPEND last.

    The rotation primitive: keeping the contracted axis in place forces XLA
    into a transpose-matmul-transpose (measured 0.271 ms at (2,8,512,512) x
    (512,512) HIGHEST on v5e); removing it and appending the result axis is
    matmul-natural (0.179 ms; 0.040 ms when pos is already last).

    (A VPU broadcast-multiply-sum for tiny contractions was tried for the
    row-sliced kernel matrices and measured 3.4x SLOWER than the einsum on
    v5e — XLA materializes the broadcast — so everything stays on the MXU.)
    """
    subs = _LETTERS[: x.ndim]
    a = subs[pos]
    out = subs.replace(a, "") + "z"
    return jnp.einsum(f"{subs},{a}z->{out}", x, mat, precision=_PRECISION)


def _cmul_contract_append(xr, xi, mr, mi, pos):
    yr = _contract_append(xr, mr, pos) - _contract_append(xi, mi, pos)
    yi = _contract_append(xr, mi, pos) + _contract_append(xi, mr, pos)
    return yr, yi


def rfftn_matmul(x: jax.Array, fft_shape) -> Tuple[jax.Array, jax.Array]:
    """Split re/im one-sided N-d DFT over the trailing len(fft_shape) axes.

    Rotation pipeline: every step contracts the CURRENT first spatial
    position and appends its bins last, so after n steps the bin axes sit
    in natural order with zero explicit transposes. The one-sided (real)
    transform is the first step — it must act while the data is still real
    (per-axis hermitian symmetry doesn't survive other axes' transforms).

    Implicit zero-padding: the DFT matrices are row-sliced to the actual
    axis length — for a KxK kernel in an S^2 transform this cuts the matmul
    flops by S/K per axis (~30x for the 2D benchmark kernels).

    Bin order/placement is internal: the MAC is elementwise and the inverse
    mirrors the forward, so only this module needs to agree with itself.
    """
    n = len(fft_shape)
    x = x.astype(jnp.float32)
    first = x.ndim - n

    fr, fi = (jnp.asarray(m[: x.shape[first]]) for m in _rfft_mats(fft_shape[0]))
    in_lens = [x.shape[first + i] for i in range(n)]
    xr = _contract_append(x, fr, first)
    xi = _contract_append(x, fi, first)
    for i in range(1, n):
        # the axis to transform has rotated to position ``first``
        nlen = fft_shape[i]
        mr, mi = _dft_mats(nlen, inverse=False)
        if in_lens[i] < nlen:
            mr, mi = mr[: in_lens[i]], mi[: in_lens[i]]
        xr, xi = _cmul_contract_append(
            xr, xi, jnp.asarray(mr), jnp.asarray(mi), first
        )
    return xr, xi


def irfftn_matmul(xr: jax.Array, xi: jax.Array, fft_shape) -> jax.Array:
    """Inverse of rfftn_matmul: real output of shape (..., *fft_shape).

    Mirrors the rotation: full-DFT bins invert first (each sits at position
    first+1 when its turn comes), the one-sided axis inverts last (valid
    only once every other axis is back in the time domain), then one
    moveaxis restores the spatial order (none needed for 1D).
    """
    n = len(fft_shape)
    first = xr.ndim - n
    for i in range(1, n):
        mr, mi = _dft_mats(fft_shape[i], inverse=True)
        xr, xi = _cmul_contract_append(
            xr, xi, jnp.asarray(mr), jnp.asarray(mi),
            first + 1 if n > 1 else first,
        )
    cr, ci = (jnp.asarray(m) for m in _irfft_mats(fft_shape[0]))
    out = _contract_append(xr, cr, first) + _contract_append(xi, ci, first)
    if n > 1:
        out = jnp.moveaxis(out, -1, first)
    return out


def spectral_contract_split(sig_r, sig_i, ker_r, ker_i, groups: int):
    """Grouped per-bin MAC on split spectra, kernel conjugated in-place.

    (xr + i xi) * conj(kr + i ki) summed over Cin/g — the split-real form of
    ops.functional._spectral_contract's small-channel branch.
    """
    batch, cin = sig_r.shape[0], sig_r.shape[1]
    cout = ker_r.shape[0]
    cin_g, cout_g = cin // groups, cout // groups
    freq = sig_r.shape[2:]

    def reshape_sig(a):
        return a.reshape(batch, groups, 1, cin_g, *freq)

    def reshape_ker(a):
        return a.reshape(1, groups, cout_g, cin_g, *freq)

    xr, xi = reshape_sig(sig_r), reshape_sig(sig_i)
    kr, ki = reshape_ker(ker_r), reshape_ker(ker_i)
    out_r = jnp.sum(xr * kr + xi * ki, axis=3).reshape(batch, cout, *freq)
    out_i = jnp.sum(xi * kr - xr * ki, axis=3).reshape(batch, cout, *freq)
    return out_r, out_i


def freq_domain_conv_matmul(signal, kernel, fft_shape, groups) -> jax.Array:
    """Full MXU-DFT pipeline: rfftn -> conj-MAC -> irfftn, split-real.

    The MAC runs on spectra with the trailing bin axes FLATTENED (a free
    reshape — they are contiguous): the VPU then sees a full-lane minor
    dimension instead of the last bin axis (e.g. 33 lanes of 128 for a 64^3
    transform — a 4x elementwise slowdown, measured on v5e).
    """
    in_dtype = signal.dtype
    sig_r, sig_i = rfftn_matmul(signal, fft_shape)
    ker_r, ker_i = rfftn_matmul(kernel, fft_shape)
    freq = sig_r.shape[2:]

    def flat(a):
        return a.reshape(*a.shape[:2], -1)

    out_r, out_i = spectral_contract_split(
        flat(sig_r), flat(sig_i), flat(ker_r), flat(ker_i), groups
    )
    out_r = out_r.reshape(*out_r.shape[:2], *freq)
    out_i = out_i.reshape(*out_i.shape[:2], *freq)
    out = irfftn_matmul(out_r, out_i, fft_shape)
    return out.astype(in_dtype)


def use_matmul_dft(fft_shape, platform: Optional[str] = None) -> bool:
    """True when every axis is short enough and we're on TPU."""
    if platform is None:
        platform = jax.devices()[0].platform
    return platform == "tpu" and max(fft_shape) <= MATMUL_DFT_MAX
