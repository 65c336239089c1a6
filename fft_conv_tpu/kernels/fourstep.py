"""Four-step (Bailey/Monarch) FFT factorization: FFT-as-matmuls.

The TPU has no fast scalar butterfly path — its FLOPs live in the 128x128
MXU. A length-N = N1*N2 DFT factors into two dense matmuls with an
elementwise twiddle between (the decomposition FlashFFTConv uses on GPU
tensor cores; here shaped for the MXU):

    row-major A[j1, j2] = x[j1*N2 + j2]
    B = F_N1 @ A                (contract j1 -> k1)
    C = B  * tw,  tw[k1, j2] = exp(-2*pi*i * k1*j2 / N)
    D = C @ F_N2                (contract j2 -> k2)
    X[k1 + N1*k2] = D[k1, k2]   (scrambled order)

Convolution never needs the natural order: multiply two *identically
scrambled* spectra bin-wise and run the inverse pipeline
(conj matrices / conj twiddle, 1/N1, 1/N2 scaling). This module provides the
matrices and a jnp reference implementation — used to precompute kernel
spectra for the fused Pallas kernel (fused1d.py) and as its test oracle.

Replaces (TPU-natively) what cuFFT does under the reference's
torch.fft.rfftn (reference functional.py:6, 68-75).
"""

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def fft_factor_matrices(n1: int, n2: int) -> Tuple[np.ndarray, ...]:
    """(f1, f2, tw) complex128 numpy DFT factors for N = n1*n2."""
    n = n1 * n2
    j1 = np.arange(n1)
    j2 = np.arange(n2)
    f1 = np.exp(-2j * np.pi * np.outer(j1, j1) / n1)
    f2 = np.exp(-2j * np.pi * np.outer(j2, j2) / n2)
    tw = np.exp(-2j * np.pi * np.outer(j1, j2) / n)
    return f1, f2, tw


def split_factors(n: int) -> Tuple[int, int]:
    """N -> (N1, N2), the most-square power-of-two split (N1 >= N2)."""
    if n & (n - 1):
        raise ValueError(f"four-step FFT size must be a power of two, got {n}")
    log = n.bit_length() - 1
    n1 = 1 << ((log + 1) // 2)
    return n1, n // n1


def four_step_fft(x: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """Scrambled-order DFT of the last axis (length n1*n2), complex in/out.

    Returns shape (..., n1, n2) with X[k1 + n1*k2] = out[..., k1, k2].
    """
    f1, f2, tw = fft_factor_matrices(n1, n2)
    f1 = jnp.asarray(f1, jnp.complex64)
    f2 = jnp.asarray(f2, jnp.complex64)
    tw = jnp.asarray(tw, jnp.complex64)
    a = x.reshape(*x.shape[:-1], n1, n2)
    b = jnp.einsum("ab,...bn->...an", f1, a)
    c = b * tw
    return jnp.einsum("...ab,bn->...an", c, f2)


def four_step_ifft(d: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """Inverse of four_step_fft: (..., n1, n2) scrambled -> (..., n1*n2)."""
    f1, f2, tw = fft_factor_matrices(n1, n2)
    f1c = jnp.asarray(np.conj(f1) / n1, jnp.complex64)
    f2c = jnp.asarray(np.conj(f2) / n2, jnp.complex64)
    twc = jnp.asarray(np.conj(tw), jnp.complex64)
    c = jnp.einsum("...ab,bn->...an", d, f2c)
    b = c * twc
    a = jnp.einsum("ab,...bn->...an", f1c, b)
    return a.reshape(*d.shape[:-2], n1 * n2)


def four_step_fft_real(
    x: jnp.ndarray, n1: int, n2: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scrambled DFT of a REAL last axis in split re/im f32 arithmetic.

    No complex dtypes anywhere: the axon TPU runtime rejects complex
    reshape/einsum at small shapes (UNIMPLEMENTED, observed this session),
    and split-real is what the Pallas kernel uses anyway. Returns (re, im)
    each shaped (..., n1, n2).
    """
    f1, f2, tw = fft_factor_matrices(n1, n2)
    f1r = jnp.asarray(f1.real, jnp.float32)
    f1i = jnp.asarray(f1.imag, jnp.float32)
    f2r = jnp.asarray(f2.real, jnp.float32)
    f2i = jnp.asarray(f2.imag, jnp.float32)
    twr = jnp.asarray(tw.real, jnp.float32)
    twi = jnp.asarray(tw.imag, jnp.float32)
    hi = jax.lax.Precision.HIGHEST

    a = x.astype(jnp.float32).reshape(*x.shape[:-1], n1, n2)
    br = jnp.einsum("ab,...bn->...an", f1r, a, precision=hi)
    bi = jnp.einsum("ab,...bn->...an", f1i, a, precision=hi)
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    dr = (
        jnp.einsum("...ab,bn->...an", cr, f2r, precision=hi)
        - jnp.einsum("...ab,bn->...an", ci, f2i, precision=hi)
    )
    di = (
        jnp.einsum("...ab,bn->...an", cr, f2i, precision=hi)
        + jnp.einsum("...ab,bn->...an", ci, f2r, precision=hi)
    )
    return dr, di


def kernel_spectrum(
    kernel: jnp.ndarray, n: int, n1: int, n2: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conjugated scrambled spectrum of a conv kernel, laid out for the
    fused Pallas MAC.

    kernel: (Cout, Cin, K) real -> (kr, ki) each (Cout, n1, Cin, n2) f32.
    Conjugation makes the bin-wise product a cross-correlation, matching
    torch's conv convention (reference functional.py:71 `.conj()`).
    """
    cout, cin, k = kernel.shape
    padded = jnp.pad(kernel.astype(jnp.float32), ((0, 0), (0, 0), (0, n - k)))
    dr, di = four_step_fft_real(padded, n1, n2)  # (Co, Ci, n1, n2)
    dr = jnp.transpose(dr, (0, 2, 1, 3))  # (Cout, n1, Cin, n2)
    di = jnp.transpose(-di, (0, 2, 1, 3))  # conjugate
    return dr, di
