"""TPU A/B (round-4, corrected): in-kernel v4 kernel-spectra (inline)
vs the XLA-side spectra path, end-to-end fft_conv3d_fused at the
benchmark shape (64^3, B=2, 8->8ch, K=8^3).

The first run of this probe was invalid: the stashed _plan_v4 change
counted the inline temporaries UNCONDITIONALLY, which pushed the v4
cell estimate past the 96 MiB budget and silently rerouted BOTH A/B
arms to the tap kernel (1.27 ms) — neither arm ever ran the v4 kernel.
This version asserts the plan mode per arm, forces v4 for inline=True
by raising the budget (the honest estimate rejects it; the question is
whether Mosaic's liveness-aware allocation actually fits), and adds a
weight-chained timing loop: benchmark_fori's carry chains only x, so
anything depending only on w (the XLA-side spectra!) is loop-invariant
and hoisted — the w-chained loop is the training-step reality where
spectra are recomputed every call.
"""
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

B, CIN, COUT, L, K = 2, 8, 8, 64, 8
x = jnp.asarray(rng.standard_normal((B, CIN, L, L, L)).astype(np.float32))
w = jnp.asarray(
    rng.standard_normal((COUT, CIN, K, K, K)).astype(np.float32) / K**1.5)

ref = jax.jit(lambda a, k: F.fft_conv(a, k, impl="xla"))
r = jax.block_until_ready(ref(x, w))


def benchmark_fori_w(fn, signal, weight, num_iterations=20):
    """benchmark_fori variant that chains BOTH x and w through the carry,
    so weight-dependent work (kernel spectra) cannot be hoisted."""
    def loop(iters, x, k):
        def body(_, carry):
            x, k, acc = carry
            out = fn(x, k)
            s = jnp.sum(jnp.real(out)) * 1e-30
            return (x + s, k + s, acc + s)

        _, _, acc = lax.fori_loop(0, iters, body, (x, k, 0.0))
        return acc

    loop = jax.jit(loop)
    float(loop(jnp.int32(num_iterations), signal, weight))

    def measure(iters):
        n, n2 = jnp.int32(iters), jnp.int32(2 * iters)
        t_n, t_2n = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(n, signal, weight))
            t_n.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(loop(n2, signal, weight))
            t_2n.append(time.perf_counter() - t0)
        return (np.min(t_2n) - np.min(t_n)) / iters

    return min(measure(num_iterations) for _ in range(3))


for inline, budget in ((False, None), (True, 160 * 2**20)):
    Z.set_fused3d_inline(inline)
    if budget is not None:
        Z._VOL_VMEM_BUDGET = budget
        Z.plan_3d.cache_clear()
        Z._fused3d_call_v4.cache_clear()
    plan = Z.plan_3d(CIN, COUT, L, L, L, K, K, K, 1)
    print(f"inline={inline}: plan={plan and plan[0]}", flush=True)
    if plan is None or plan[0] != "v4":
        print("  -> not v4, skipping", flush=True)
        continue
    fn = jax.jit(lambda a, k: Z.fft_conv3d_fused(a, k))
    t0 = time.time()
    out = jax.block_until_ready(fn(x, w))
    print(f"  compile+run {time.time() - t0:.1f} s", flush=True)
    err = float(jnp.max(jnp.abs(out - r)))
    t_x = min(benchmark_fori(fn, x, w, num_iterations=20,
                             min_work_s=0.2).mean for _ in range(3))
    t_w = benchmark_fori_w(fn, x, w, num_iterations=20)
    print(f"  x-chained {t_x*1e3:.4f} ms  w-chained {t_w*1e3:.4f} ms  "
          f"max|err|={err:.3e} (std(ref)={float(jnp.std(r)):.1f})",
          flush=True)
Z.set_fused3d_inline(False)
