"""TPU probe: compile time + runtime + accuracy of the rewritten fused2d."""
import sys
import time

import numpy as np
import torch
import torch.nn.functional as tf
import jax
import jax.numpy as jnp

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels.fused2d import fft_conv2d_fused

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)

for k in (16, 34):
    x = rng.standard_normal((2, 8, 512, 512)).astype(np.float32)
    w = rng.standard_normal((8, 8, k, k)).astype(np.float32)
    ref = tf.conv2d(torch.tensor(x), torch.tensor(w)).numpy()
    sig, ker = jnp.asarray(x), jnp.asarray(w)
    fn = jax.jit(lambda s, w_: fft_conv2d_fused(s, w_))
    t0 = time.perf_counter()
    lowered = fn.lower(sig, ker)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"K={k}: trace/lower {t1-t0:.1f}s  compile {t2-t1:.1f}s", flush=True)
    got = np.asarray(compiled(sig, ker))
    err = np.abs(ref - got)
    t = benchmark_fori(fn, sig, ker, num_iterations=20).mean
    print(f"K={k}: fused2d {t*1e3:7.3f} ms  mean|e| {err.mean():.2e} "
          f"max|e| {err.max():.2e}", flush=True)
