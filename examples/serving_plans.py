"""Example: serving with precomputed convolution plans.

The reference re-plans cuFFT (and re-flips/re-transforms transposed-conv
kernels) on every call; here a plan is an explicit object. ``plan_fft_conv``
bakes the kernel's spectra once and the returned jitted callable only
transforms the signal — on TPU the fused 3D plan serves ~25% faster than
the cold call, and the 1D transposed plan ~35% faster (doc/ROADMAP.md
round-5 measurements). Shape-specialized, like FFT plans everywhere: one
plan per served signal geometry.

A typical inference server builds the plans at model-load time (one per
(layer, input-shape) pair) and calls them per request.

Run: python examples/serving_plans.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from fft_conv_tpu.ops import plan_fft_conv, plan_fft_conv_transpose


def main():
    rng = np.random.default_rng(0)

    # --- forward conv: a 2D filter bank served at a fixed image size ----
    bank = jnp.asarray(rng.standard_normal((8, 3, 15, 15)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    conv = plan_fft_conv(bank, bias, padding=7, signal_spatial=(256, 256))

    images = jnp.asarray(rng.standard_normal((4, 3, 256, 256)), jnp.float32)
    feats = conv(images)                  # batch stays free
    print("planned conv:", images.shape, "->", feats.shape)

    # --- transposed conv: a stride-2 upsampler head --------------------
    # kernel layout (Cin, Cout/groups, kh, kw), torch conv_transpose2d
    up_k = jnp.asarray(rng.standard_normal((8, 3, 4, 4)), jnp.float32)
    up = plan_fft_conv_transpose(
        up_k, stride=2, padding=1, signal_spatial=(128, 128))
    small = jnp.asarray(rng.standard_normal((4, 8, 128, 128)), jnp.float32)
    big = up(small)
    print("planned transpose:", small.shape, "->", big.shape)

    # plans are ordinary jitted callables: compose them under one jit
    @jax.jit
    def head(x):
        return up(jnp.tanh(conv(x))[:, :8, :128, :128])

    print("composed pipeline:", head(images).shape)

    # shape-specialization is enforced loudly
    try:
        conv(jnp.zeros((1, 3, 64, 64)))
    except ValueError as e:
        print("wrong shape rejected:", e)


if __name__ == "__main__":
    main()
