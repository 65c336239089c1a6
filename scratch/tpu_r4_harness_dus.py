"""TPU A/B (round-4, take 2): benchmark_fori carry strategies.

The harness carry `x + s` rewrites the FULL input every iteration
(~16 MB at the 2D/3D benchmark shapes ~ 20-40 us of HBM traffic)
inside BOTH the fft and direct timings — per-iteration overhead the
t(2N)-t(N) differencing can NOT cancel (it scales with N). A
one-element dynamic-update-slice carry keeps the iteration i -> i+1
dependency XLA cannot elide while touching O(1) bytes.

Take 1 ran with num_iterations=20 and no min_work floor; at the 1D
shapes (0.05 ms/iter) the differencing noise floor (~70 us) swamped
the signal and produced a negative reading. This version uses the
bench.py-grade settings (min_work_s scaling, best-of-5) on every row,
and also times the DIRECT rows both ways (the ratio correction needs
both sides).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels.fused1d import fft_conv1d_fused
from fft_conv_tpu.kernels.fused2d import fft_conv2d_fused
from fft_conv_tpu.kernels.fused3d import fft_conv3d_fused

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)


def benchmark_dus(fn, signal, *rest, num_iterations=20, min_work_s=0.2):
    """benchmark_fori with a one-element DUS carry instead of x + s."""
    def loop(iters, x, *r):
        def body(_, carry):
            x, acc = carry
            out = fn(x, *r)
            s = jnp.sum(jnp.real(out)) * 1e-30
            flat = x.reshape(-1)
            flat = lax.dynamic_update_index_in_dim(
                flat, flat[0] + s, 0, axis=0)
            return (flat.reshape(x.shape), acc + s)

        _, acc = lax.fori_loop(0, iters, body, (x, 0.0))
        return acc

    loop = jax.jit(loop)
    t0 = time.perf_counter()
    float(loop(jnp.int32(num_iterations), signal, *rest))
    t_warm = time.perf_counter() - t0

    iters = num_iterations
    if min_work_s and t_warm > 0:
        per = t_warm / num_iterations
        if per * iters < min_work_s:
            iters = int(np.ceil(min_work_s / max(per, 1e-9)))

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

    return min(measure(iters) for _ in range(5))


CASES = []
B = 2

x1 = jnp.asarray(rng.standard_normal((B, 8, 32768)).astype(np.float32))
w1 = jnp.asarray(rng.standard_normal((8, 8, 256)).astype(np.float32) / 16)
CASES.append(("1d fused K256", lambda a, k: fft_conv1d_fused(a, k), x1, w1))
CASES.append(("1d direct K256", lambda a, k: lax.conv_general_dilated(
    a, k, (1,), "VALID"), x1, w1))

x2 = jnp.asarray(rng.standard_normal((B, 8, 512, 512)).astype(np.float32))
w2 = jnp.asarray(rng.standard_normal((8, 8, 16, 16)).astype(np.float32) / 16)
CASES.append(("2d fused K16", lambda a, k: fft_conv2d_fused(a, k), x2, w2))
CASES.append(("2d direct K16", lambda a, k: lax.conv_general_dilated(
    a, k, (1, 1), "VALID"), x2, w2))

x3 = jnp.asarray(rng.standard_normal((B, 8, 64, 64, 64)).astype(np.float32))
w3 = jnp.asarray(
    rng.standard_normal((8, 8, 8, 8, 8)).astype(np.float32) / 22.6)
CASES.append(("3d fused K8", lambda a, k: fft_conv3d_fused(a, k), x3, w3))
CASES.append(("3d direct K8", lambda a, k: lax.conv_general_dilated(
    a, k, (1, 1, 1), "VALID"), x3, w3))

for name, fn, xx, ww in CASES:
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(xx, ww))
    t_old = min(benchmark_fori(jfn, xx, ww, num_iterations=20,
                               min_work_s=0.2).mean for _ in range(5))
    t_dus = benchmark_dus(jfn, xx, ww)
    print(f"{name:16s} old {t_old*1e3:8.4f} ms   dus {t_dus*1e3:8.4f} ms"
          f"   delta {(t_old-t_dus)*1e6:7.1f} us", flush=True)
