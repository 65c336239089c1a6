"""TPU sweep: fused2d H-FFT length T1 x kernel size (bf16x3)."""
import numpy as np
import torch
import torch.nn.functional as tf
import jax
import jax.numpy as jnp

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused2d
from fft_conv_tpu.kernels.fused2d import fft_conv2d_fused

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)

for k in (16, 34, 46):
    x = rng.standard_normal((2, 8, 512, 512)).astype(np.float32)
    w = rng.standard_normal((8, 8, k, k)).astype(np.float32)
    ref = tf.conv2d(torch.tensor(x), torch.tensor(w)).numpy()
    sig, ker = jnp.asarray(x), jnp.asarray(w)
    print(f"== 2D L=512 K={k}", flush=True)
    for t1 in (128, 8 * ((128 + k - 1 + 7) // 8), 192, 256):
        fused2d._T1_OVERRIDE = t1
        fused2d._fused2d_call.cache_clear()
        if fused2d.tile_plan_2d(k, k, 8, 8) is None:
            continue
        fn = jax.jit(lambda s, w_: fft_conv2d_fused(s, w_))
        got = np.asarray(fn(sig, ker))
        err = np.abs(ref - got)
        sc = max(1.0, float(ref.std()))
        ok = err.mean() < 5e-5 * sc and err.max() < 2e-4 * sc
        ts = [benchmark_fori(fn, sig, ker, num_iterations=24,
                             min_work_s=0.03).mean for _ in range(2)]
        print(f"  T1={t1:3d} " + " ".join(f"{t*1e3:7.3f}" for t in ts)
              + f" ms  acc_ok={ok}", flush=True)
    fused2d._T1_OVERRIDE = None
    fused2d._fused2d_call.cache_clear()
