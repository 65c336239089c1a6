"""TPU eval: tiled-path timing + accuracy at the benchmark configs."""
import numpy as np
import torch
import torch.nn.functional as tf
import jax
import jax.numpy as jnp

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.ops.functional import fft_conv
from fft_conv_tpu.ops import spectral as S
from fft_conv_tpu.kernels.fused1d import fft_conv1d_fused

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform)

CONV = {1: tf.conv1d, 2: tf.conv2d, 3: tf.conv3d}

import sys
CASES = {"2d": [(2, 512, 16), (2, 512, 34), (3, 64, 8)],
         "1d": [(1, 32768, 256), (1, 32768, 1024), (1, 32768, 3840)]}
for ndim, size, k in CASES[sys.argv[1]]:
    x = rng.standard_normal((2, 8) + (size,) * ndim).astype(np.float32)
    w = rng.standard_normal((8, 8) + (k,) * ndim).astype(np.float32)
    ref = CONV[ndim](torch.tensor(x), torch.tensor(w)).numpy()
    sig, ker = jnp.asarray(x), jnp.asarray(w)
    print(f"== {ndim}D L={size} K={k}")
    for prec in ("highest", "bf16x3"):
        S.set_spectral_precision(prec)
        fn = jax.jit(lambda s, w_: fft_conv(s, w_, impl="tiled"))
        got = np.asarray(fn(sig, ker))
        err = np.abs(ref - got)
        t = benchmark_fori(fn, sig, ker, num_iterations=20).mean
        print(f"  tiled {prec:8s} {t*1e3:7.3f} ms   mean|e| {err.mean():.2e} "
              f"max|e| {err.max():.2e}")
    S.set_spectral_precision("highest")
    if ndim == 1:
        got = np.asarray(fft_conv1d_fused(sig, ker))
        err = np.abs(ref - got)
        t = benchmark_fori(jax.jit(fft_conv1d_fused), sig, ker,
                           num_iterations=20).mean
        print(f"  fused1d        {t*1e3:7.3f} ms   mean|e| {err.mean():.2e} "
              f"max|e| {err.max():.2e}")
