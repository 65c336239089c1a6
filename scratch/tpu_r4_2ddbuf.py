"""TPU probe (r4): 2D v2 tile kernel ping-pong x prefetch A/B at the
512^2 benchmark shapes (K=16, 34). The kernel's per-cell serial
start+wait DMA moves ~26 MB of overlapped H-windows across 10 grid
cells; dbuf=True streams cell li+1's window under cell li's compute
(one extra ~2.6 MB VMEM slot)."""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused2d as Z2
import fft_conv_tpu.ops.functional as F

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)

B, CIN, COUT, L = 2, 8, 8, 512
for K in (16, 34):
    x = jnp.asarray(
        rng.standard_normal((B, CIN, L, L)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((COUT, CIN, K, K)).astype(np.float32) / K)
    ref = jax.block_until_ready(
        jax.jit(lambda s, k: F.fft_conv(s, k, impl="xla"))(x, w))
    for dbuf in (False, True):
        Z2.set_fused2d_dbuf(dbuf)
        fn = jax.jit(lambda s, k: F.fft_conv(s, k, impl="fused"))
        try:
            out = jax.block_until_ready(fn(x, w))
        except Exception as e:
            print(f"K={K} dbuf={dbuf!s:5} FAILED: {str(e)[:120]}",
                  flush=True)
            continue
        err = float(jnp.max(jnp.abs(out - ref)))
        t = min(benchmark_fori(fn, x, w).mean for _ in range(3))
        print(f"K={K:2d} dbuf={dbuf!s:5} {t*1e3:7.3f} ms  "
              f"maxerr={err:.2e}", flush=True)

Z2.set_fused2d_dbuf(True)  # measured winner (both K): now the default
