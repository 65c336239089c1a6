"""Example: 3D stencil filtering over volumes (CT denoise / PSF blur).

3D is where direct convolution's cost explodes (K^3 taps per output): an
8^3 stencil is 512 MACs per voxel. FFTConv3d routes to the fused
whole-volume Pallas kernel on TPU (overlap-save DFT-16 along depth,
lane-packed slabs — 5.6x over XLA's direct conv3d at 64^3), and to the
composed XLA path elsewhere. Same numbers either way.

Run: python examples/volume_stencil_3d.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from fft_conv_tpu import FFTConv3d, fft_conv


def gaussian_psf(channels: int, size: int) -> np.ndarray:
    """(channels, 1, size, size, size) separable Gaussian blur kernels
    of increasing width — a multi-scale smoothing bank."""
    g = np.mgrid[:size, :size, :size] - size // 2
    r2 = (g**2).sum(axis=0)
    out = []
    for i in range(channels):
        sigma = 0.6 + 0.5 * i
        k = np.exp(-r2 / (2 * sigma**2))
        out.append(k / k.sum())
    return np.stack(out)[:, None].astype(np.float32)


def main():
    rng = np.random.default_rng(0)
    volumes = jnp.asarray(
        rng.standard_normal((2, 1, 64, 64, 64)), jnp.float32)
    psf = jnp.asarray(gaussian_psf(4, 7))  # 343-element stencils

    # functional API: torch conv3d semantics, 'same' output via padding
    smoothed = jax.jit(lambda s, k: fft_conv(s, k, padding=3))(volumes, psf)
    print("multi-scale smoothing:", smoothed.shape)  # (2, 4, 64, 64, 64)

    # module API: a learnable 3D layer with the same cost profile
    layer = FFTConv3d(1, 4, 7, padding=3, key=jax.random.key(0))
    y = jax.jit(layer)(volumes)
    print("FFTConv3d forward:    ", y.shape)

    # gradients flow through the same fast path (custom_vjp on TPU)
    g = jax.jit(jax.grad(lambda m, s: (m(s) ** 2).mean()))(layer, volumes)
    print("grad weight shape:    ", g.weight.shape)


if __name__ == "__main__":
    main()
