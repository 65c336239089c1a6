"""Round-4 measurement: 2D tile kernel v2 vs v3 (stacked re/im rows) on v5e.

One TPU job; run twice (FFTCONV_2D_KERNEL=v2 / v3) or rely on the in-process
setter + fresh jit below. Decision input for the _KERNEL2D_VERSION default.

Usage: timeout 1200 python -u scratch/tpu_r4_2dv3.py
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import fft_conv_tpu.kernels.fused2d as f2  # noqa: E402
from fft_conv_tpu.bench.harness import benchmark_fori  # noqa: E402
from fft_conv_tpu.ops.functional import fft_conv  # noqa: E402

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

for k in (16, 34):
    sig = jnp.asarray(
        rng.standard_normal((2, 8, 512, 512)).astype(np.float32))
    ker = jnp.asarray(rng.standard_normal((8, 8, k, k)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    ref = np.asarray(fft_conv(sig, ker, bias, impl="xla"))
    for version in ("v2", "v3"):
        f2.set_fused2d_kernel(version)

        def fn(s, w, b):
            return f2.fft_conv2d_fused(s, w, b)

        out = jax.jit(fn)(sig, ker, bias)
        jax.block_until_ready(out)
        err = np.abs(np.asarray(out) - ref)
        scale = max(1.0, float(np.abs(ref).max()))
        ok = err.mean() < 5e-5 * scale and err.max() < 1e-4 * scale
        t = min(
            benchmark_fori(fn, sig, ker, bias, num_iterations=25,
                           min_work_s=0.2).mean
            for _ in range(2)
        )
        print(f"K={k:2d} {version}: {t*1e3:7.3f} ms  parity_ok={ok} "
              f"(mean {err.mean():.2e} max {err.max():.2e})", flush=True)
