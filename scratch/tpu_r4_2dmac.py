"""Round-4 measurement: 2D tile kernel (version x MAC strategy) on v5e.

Supersedes tpu_r4_2dv3.py: one job sweeps v2/v3 x loop/kara at the
benchmark shape. Decision input for _KERNEL2D_VERSION and _MAC2D_MODE.

Usage: timeout 2400 python -u scratch/tpu_r4_2dmac.py
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
        for mac in ("loop", "kara"):
            f2.set_fused2d_kernel(version)
            f2.set_fused2d_mac(mac)

            def fn(s, w, b):
                return f2.fft_conv2d_fused(s, w, b)

            try:
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
                print(f"K={k:2d} {version}/{mac:4s}: {t*1e3:7.3f} ms  "
                      f"parity_ok={ok} (mean {err.mean():.2e} "
                      f"max {err.max():.2e})", flush=True)
            except Exception as e:
                print(f"K={k:2d} {version}/{mac:4s}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
f2.set_fused2d_kernel("v2")
f2.set_fused2d_mac("loop")
