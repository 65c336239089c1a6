"""TPU probe: compile + runtime + accuracy of fused3d at the benchmark
config (64^3, B=2, 8->8, K=8)."""
import time

import numpy as np
import torch
import torch.nn.functional as tf
import jax
import jax.numpy as jnp

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels.fused3d import fft_conv3d_fused

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)

x = rng.standard_normal((2, 8, 64, 64, 64)).astype(np.float32)
w = rng.standard_normal((8, 8, 8, 8, 8)).astype(np.float32)
ref = tf.conv3d(torch.tensor(x), torch.tensor(w)).numpy()
sig, ker = jnp.asarray(x), jnp.asarray(w)

fn = jax.jit(lambda s, w_: fft_conv3d_fused(s, w_))
t0 = time.perf_counter()
lowered = fn.lower(sig, ker)
t1 = time.perf_counter()
print(f"trace/lower {t1-t0:.1f}s", flush=True)
compiled = lowered.compile()
t2 = time.perf_counter()
print(f"compile {t2-t1:.1f}s", flush=True)
got = np.asarray(compiled(sig, ker))
err = np.abs(ref - got)
sc = max(1.0, float(ref.std()))
print(f"accuracy: mean|e| {err.mean():.2e} max|e| {err.max():.2e} "
      f"scale {sc:.1f}", flush=True)
t = benchmark_fori(fn, sig, ker, num_iterations=20, min_work_s=0.02).mean
print(f"fused3d {t*1e3:7.3f} ms", flush=True)
