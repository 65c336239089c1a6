"""TPU probe: v4 x-pack layout A/B ("h" vs "d2" vs "d0").

tpu_r4_barrier.py localized a ~0.14 ms in-context penalty to the "h"
pack (the h-relocating 6D transpose costs 5x its standalone time when
it shares a jit program with the Mosaic call, barrier-immune). "d2"
keeps h in place (small s<->h transpose; kernel outer-swaps each
channel slab); "d0" is pure pad+reshape (2x input HBM bytes; kernel
de-interleaves d-pairs with a leading split + outer swaps + lane roll).

Measures parity vs composed + e2e benchmark_fori at the bench shape.
"""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused3d as Z
from fft_conv_tpu.ops import functional as F

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)

B, CIN, COUT, L, K = 2, 8, 8, 64, 8
x = jnp.asarray(rng.standard_normal((B, CIN, L, L, L)).astype(np.float32))
w = jnp.asarray(
    rng.standard_normal((COUT, CIN, K, K, K)).astype(np.float32) / K**1.5)

ref = jax.block_until_ready(jax.jit(lambda a, k: F.fft_conv(
    a, k, impl="xla"))(x, w))

for mode in ("h", "h2", "pk"):
    Z.set_fused3d_xpack(mode)
    fn = jax.jit(lambda a: Z.fft_conv3d_fused(a, w))
    import time
    t0 = time.time()
    try:
        out = jax.block_until_ready(fn(x))
    except Exception as e:  # VMEM alloc fail (d0 cannot carve at 64^3)
        print(f"{mode:3s} FAILED: {str(e)[:200]}", flush=True)
        continue
    dt = time.time() - t0
    err = float(jnp.abs(out - ref).max() / jnp.abs(ref).std())
    t = min(benchmark_fori(fn, x, num_iterations=20,
                           min_work_s=0.2).mean for _ in range(3))
    print(f"{mode:3s} compile {dt:5.0f}s  relerr {err:.2e}  "
          f"e2e {t*1e3:7.4f} ms", flush=True)
Z.set_fused3d_xpack("h")
