"""TPU sweep: tiled_valid_corr tile sizes at the benchmark configs."""
import numpy as np
import jax
import jax.numpy as jnp

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.ops.tiled import tiled_valid_corr
from fft_conv_tpu.ops import spectral as S

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform)

CASES = [
    (2, 512, 16, [(128, 128), (160, 160), (192, 192), (256, 256), (254, 254)]),
    (2, 512, 34, [(160, 160), (192, 192), (256, 256), (286, 286)]),
    (3, 64, 8, [(32, 32, 32), (48, 48, 48), (64, 32, 32), (64, 64, 32),
                (39, 39, 39)]),
]

for ndim, size, k, tiles in CASES:
    sig = jnp.asarray(rng.standard_normal((2, 8) + (size,) * ndim).astype(np.float32))
    ker = jnp.asarray(rng.standard_normal((8, 8) + (k,) * ndim).astype(np.float32))
    print(f"== {ndim}D L={size} K={k}")
    for tile in tiles:
        for prec in ("highest", "high"):
            S.set_spectral_precision(prec)
            try:
                fn = jax.jit(lambda s, w, t=tile: tiled_valid_corr(s, w, tile=t))
                t = benchmark_fori(fn, sig, ker, num_iterations=20).mean
                print(f"  tile={tile} {prec:8s} {t*1e3:8.3f} ms")
            except Exception as e:
                print(f"  tile={tile} {prec:8s} FAIL {str(e)[:80]}")
    S.set_spectral_precision("highest")
