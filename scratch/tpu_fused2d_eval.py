"""TPU eval: fused 2D tile kernel vs composed/tiled at benchmark configs."""
import numpy as np
import torch
import torch.nn.functional as tf
import jax
import jax.numpy as jnp

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels.fused2d import fft_conv2d_fused
from fft_conv_tpu.kernels.fused2d import set_fused2d_precision

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform)

for k in (16, 34, 46):
    x = rng.standard_normal((2, 8, 512, 512)).astype(np.float32)
    w = rng.standard_normal((8, 8, k, k)).astype(np.float32)
    ref = tf.conv2d(torch.tensor(x), torch.tensor(w)).numpy()
    sig, ker = jnp.asarray(x), jnp.asarray(w)
    print(f"== 2D L=512 K={k}")
    for prec in ("highest", "bf16x3"):
        set_fused2d_precision(prec)
        fn = jax.jit(lambda s, w_: fft_conv2d_fused(s, w_))
        got = np.asarray(fn(sig, ker))
        err = np.abs(ref - got)
        t = benchmark_fori(fn, sig, ker, num_iterations=20).mean
        print(f"  fused2d {prec:8s} {t*1e3:7.3f} ms  mean|e| {err.mean():.2e} "
              f"max|e| {err.max():.2e}")
    set_fused2d_precision("highest")
