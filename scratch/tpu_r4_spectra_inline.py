"""TPU A/B: in-kernel v4 kernel-spectra (inline) vs the XLA-side
spectra path, end-to-end fft_conv3d_fused at the benchmark shape
(64^3, B=2, 8->8ch, K=8^3). Also checks on-chip parity vs composed."""
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

ref = jax.jit(lambda a, k: F.fft_conv(a, k, impl="xla"))
r = jax.block_until_ready(ref(x, w))

for inline in (False, True):
    Z.set_fused3d_inline(inline)
    fn = jax.jit(lambda a, k: Z.fft_conv3d_fused(a, k))
    out = jax.block_until_ready(fn(x, w))
    err = float(jnp.max(jnp.abs(out - r)))
    scale = float(jnp.std(r))
    t = min(benchmark_fori(fn, x, w, num_iterations=20,
                           min_work_s=0.2).mean for _ in range(3))
    print(f"inline={inline}: {t*1e3:.4f} ms  max|err|={err:.3e} "
          f"(std(ref)={scale:.1f})", flush=True)
Z.set_fused3d_inline(True)
