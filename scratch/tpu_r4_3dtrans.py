"""Round-4 measurement: fused (W-blocked) vs composed 3D transposed conv
at the reference benchmark shape (64^3, B=2, 8->8 ch, K in {2,4,6,8}).

Decision input for the auto-routing gate in ops/functional.py
(fft_conv_transpose n==3 branch) and the bench sweep's transpose row.

Usage: timeout 2400 python -u scratch/tpu_r4_3dtrans.py
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from fft_conv_tpu.bench.harness import benchmark_fori  # noqa: E402
from fft_conv_tpu.kernels.fused3d import (  # noqa: E402
    fft_conv_transpose3d_fused,
)
from fft_conv_tpu.ops.functional import fft_conv_transpose  # noqa: E402

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

sig = jnp.asarray(rng.standard_normal((2, 8, 64, 64, 64)).astype(np.float32))
bias = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))

for k in (8, 4, 2, 6):
    ker = jnp.asarray(
        rng.standard_normal((8, 8, k, k, k)).astype(np.float32))

    def composed(s, w, b):
        return fft_conv_transpose(s, w, b, impl="xla")

    def fused(s, w, b):
        return fft_conv_transpose3d_fused(s, w, b)

    ref = np.asarray(jax.jit(composed)(sig, ker, bias))
    out = jax.jit(fused)(sig, ker, bias)
    jax.block_until_ready(out)
    err = np.abs(np.asarray(out) - ref)
    scale = max(1.0, float(np.abs(ref).max()))
    ok = err.mean() < 5e-5 * scale and err.max() < 1e-4 * scale
    tc = min(
        benchmark_fori(composed, sig, ker, bias, num_iterations=25,
                       min_work_s=0.2).mean for _ in range(2))
    tf = min(
        benchmark_fori(fused, sig, ker, bias, num_iterations=25,
                       min_work_s=0.2).mean for _ in range(2))
    print(f"K={k}: composed {tc*1e3:7.3f} ms  fused {tf*1e3:7.3f} ms "
          f"({tc/tf:.2f}x)  parity_ok={ok} "
          f"(mean {err.mean():.2e} max {err.max():.2e})", flush=True)
