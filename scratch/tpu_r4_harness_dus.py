"""TPU probe: benchmark_fori chain-op overhead. The loop carry
`x + s` rewrites the full input per iteration (16 MB at the 2D/3D
benchmark shapes ~= 40 us) inside BOTH the fft and direct timings.
A one-element dynamic-update-slice carry keeps the iteration i ->
i+1 dependency XLA cannot elide while touching O(1) bytes. This
probe measures rows both ways to quantify the contamination."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused3d as Z
from fft_conv_tpu.ops import functional as F

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)


def benchmark_dus(fn, signal, *rest, num_iterations=20):
    def loop(iters, x, *r):
        def body(_, carry):
            x, acc = carry
            out = fn(x, *r)
            s = jnp.sum(jnp.real(out)) * 1e-30
            x = lax.dynamic_update_index_in_dim(
                x, x[0] + s, 0, axis=0)
            return (x, acc + s)

        _, acc = lax.fori_loop(0, iters, body, (x, 0.0))
        return acc

    loop = jax.jit(loop)
    float(loop(jnp.int32(num_iterations), signal, *rest))

    def measure(iters):
        n, n2 = jnp.int32(iters), jnp.int32(2 * iters)
        t_n, t_2n = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(n, signal, *rest))
            t_n.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(loop(n2, signal, *rest))
            t_2n.append(time.perf_counter() - t0)
        return (np.min(t_2n) - np.min(t_n)) / iters

    return measure(num_iterations)


CASES = []

B = 2
x3 = jnp.asarray(rng.standard_normal((B, 8, 64, 64, 64)).astype(np.float32))
w3 = jnp.asarray(rng.standard_normal((8, 8, 8, 8, 8)).astype(np.float32) / 22.6)
CASES.append(("3d fused", lambda a, k: Z.fft_conv3d_fused(a, k), x3, w3))
CASES.append(("3d direct", lambda a, k: lax.conv_general_dilated(
    a, k, (1, 1, 1), "VALID"), x3, w3))

x2 = jnp.asarray(rng.standard_normal((B, 8, 512, 512)).astype(np.float32))
w2 = jnp.asarray(rng.standard_normal((8, 8, 16, 16)).astype(np.float32) / 16)
CASES.append(("2d fused K16", lambda a, k: F.fft_conv(a, k, impl="fused"),
              x2, w2))
CASES.append(("2d direct K16", lambda a, k: lax.conv_general_dilated(
    a, k, (1, 1), "VALID"), x2, w2))

x1 = jnp.asarray(rng.standard_normal((B, 8, 32768)).astype(np.float32))
w1 = jnp.asarray(rng.standard_normal((8, 8, 256)).astype(np.float32) / 16)
CASES.append(("1d fused K256", lambda a, k: F.fft_conv(a, k, impl="fused"),
              x1, w1))
CASES.append(("1d direct K256", lambda a, k: lax.conv_general_dilated(
    a, k, (1,), "VALID"), x1, w1))

for name, fn, x, w in CASES:
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(x, w))
    t_old = min(benchmark_fori(jfn, x, w, num_iterations=20,
                               min_work_s=0.2).mean for _ in range(2))
    t_new = min(benchmark_dus(jfn, x, w, num_iterations=20)
                for _ in range(2))
    print(f"{name:16s} old {t_old*1e3:8.4f} ms   dus {t_new*1e3:8.4f} ms"
          f"   delta {(t_old-t_new)*1e6:7.1f} us", flush=True)
