"""TPU sweep: fused1d precision (highest vs bf16x3) x FFT size at the
1D benchmark configs; accuracy vs torch + benchmark_fori timing (x3 reps
to gauge tunnel timing stability)."""
import numpy as np
import torch
import torch.nn.functional as tf
import jax
import jax.numpy as jnp

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused1d
from fft_conv_tpu.kernels.fused1d import fft_conv1d_fused, set_fused_precision

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)
ORIG_SIZES = fused1d._FFT_SIZES

for k in (256, 1024, 3840):
    x = rng.standard_normal((2, 8, 32768)).astype(np.float32)
    w = rng.standard_normal((8, 8, k)).astype(np.float32)
    ref = tf.conv1d(torch.tensor(x), torch.tensor(w)).numpy()
    sig, ker = jnp.asarray(x), jnp.asarray(w)
    print(f"== 1D L=32768 K={k}", flush=True)
    for prec in ("highest", "bf16x3"):
        set_fused_precision(prec)
        for n in (2048, 4096, 8192):
            fused1d._FFT_SIZES = (n,)
            if fused1d.choose_fft_size(k, 32768, 8, 8) != n:
                continue
            fn = jax.jit(lambda s, w_: fft_conv1d_fused(s, w_))
            got = np.asarray(fn(sig, ker))
            err = np.abs(ref - got)
            ts = [benchmark_fori(fn, sig, ker, num_iterations=25).mean
                  for _ in range(3)]
            print(f"  {prec:8s} N={n:5d} "
                  + " ".join(f"{t*1e3:7.3f}" for t in ts)
                  + f" ms  mean|e| {err.mean():.2e} max|e| {err.max():.2e}",
                  flush=True)
        fused1d._FFT_SIZES = ORIG_SIZES
    set_fused_precision("highest")
