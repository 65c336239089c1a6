"""Stage-by-stage TPU profile of the composed 2D/3D spectral path."""
import numpy as np
import jax
import jax.numpy as jnp

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.ops import spectral as S
from fft_conv_tpu.ops.functional import fft_conv

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform)


def prof(name, fn, *args, iters=20):
    t = benchmark_fori(jax.jit(fn), *args, num_iterations=iters).mean
    print(f"  {name:34s} {t*1e3:8.3f} ms")
    return t


for ndim, size, k in [(2, 512, 16), (2, 512, 34), (3, 64, 8)]:
    fft_shape = (size,) * ndim
    sig = jnp.asarray(rng.standard_normal((2, 8) + (size,) * ndim).astype(np.float32))
    ker = jnp.asarray(rng.standard_normal((8, 8) + (k,) * ndim).astype(np.float32))
    print(f"== {ndim}D L={size} K={k} fft={fft_shape}")

    sr, si = jax.jit(lambda x: S.rfftn_matmul(x, fft_shape))(sig)
    kr, ki = jax.jit(lambda x: S.rfftn_matmul(x, fft_shape))(ker)
    or_, oi = S.spectral_contract_split(sr, si, kr, ki, 1)

    prof("rfftn(signal)", lambda x: S.rfftn_matmul(x, fft_shape)[0], sig)
    prof("rfftn(kernel)", lambda x: S.rfftn_matmul(x, fft_shape)[0], ker)
    prof("MAC", lambda a, b, c, d: S.spectral_contract_split(a, b, c, d, 1)[0],
         sr, si, kr, ki)
    prof("irfftn", lambda a, b: S.irfftn_matmul(a, b, fft_shape), or_, oi)
    prof("full fft_conv xla", lambda s, w: fft_conv(s, w, impl="xla"), sig, ker)
    S.set_spectral_precision("high")
    prof("full fft_conv xla HIGH", lambda s, w: fft_conv(s, w, impl="xla"),
         sig, ker)
    S.set_spectral_precision("highest")
