"""Round-4 measurement: 3D v4/v5 pointwise MAC loop vs kara on v5e.

Benchmark shape 64^3 K=8^3 (B=2, 8->8). Decision input for _MAC3D_MODE.
Usage: timeout 2400 python -u scratch/tpu_r4_3dmac.py
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import fft_conv_tpu.kernels.fused3d as f3  # noqa: E402
from fft_conv_tpu.bench.harness import benchmark_fori  # noqa: E402
from fft_conv_tpu.ops.functional import fft_conv  # noqa: E402

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

sig = jnp.asarray(
    rng.standard_normal((2, 8, 64, 64, 64)).astype(np.float32))
ker = jnp.asarray(rng.standard_normal((8, 8, 8, 8, 8)).astype(np.float32))
bias = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
ref = np.asarray(fft_conv(sig, ker, bias, impl="xla"))

for mac in ("loop", "kara"):
    f3.set_fused3d_mac(mac)

    def fn(s, w, b):
        return f3.fft_conv3d_fused(s, w, b)

    try:
        out = jax.jit(fn)(sig, ker, bias)
        jax.block_until_ready(out)
        err = np.abs(np.asarray(out) - ref)
        scale = max(1.0, float(np.abs(ref).max()))
        ok = err.mean() < 5e-5 * scale and err.max() < 1e-4 * scale
        t = min(
            benchmark_fori(fn, sig, ker, bias, num_iterations=25,
                           min_work_s=0.2).mean
            for _ in range(2))
        print(f"{mac:4s}: {t*1e3:7.3f} ms  parity_ok={ok} "
              f"(mean {err.mean():.2e} max {err.max():.2e})", flush=True)
    except Exception as e:
        print(f"{mac:4s}: FAILED {type(e).__name__}: {e}", flush=True)
f3.set_fused3d_mac("loop")
