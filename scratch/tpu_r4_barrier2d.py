"""TPU probe: 2D analog of tpu_r4_barrier.py — stage decomposition of
fft_conv2d_fused at the benchmark shapes (512^2, B=2, 8->8ch, K=16/34,
matching bench.py). Measures pack / kernel / unpack standalone,
pack+kernel with and without an optimization_barrier between them,
and e2e.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused2d as Z
from fft_conv_tpu.ops.tiled import _window_axis

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)

for K in (16, 34):
    B, CIN, COUT, L = 2, 8, 8, 512
    t1, v1, nb1, t2, v2 = Z.tile_plan_2d(K, K, CIN, COUT)
    oh = ow = L - K + 1
    nt1 = -(-oh // v1)
    nt2 = -(-ow // v2)
    need_h = (nt1 - 1) * v1 + t1

    x = jnp.asarray(
        rng.standard_normal((B, CIN, L, L)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((COUT, CIN, K, K)).astype(np.float32) / K)

    def pack(xv):
        xq = jnp.pad(xv, ((0, 0), (0, 0), (0, need_h - L), (0, 0)))
        xq = _window_axis(xq, 3, t2, v2, nt2)
        return xq.transpose(0, 1, 3, 2, 4)

    def unpack(o):
        o = o[:, :, :, :, :, :v2]
        o = o.transpose(0, 3, 1, 2, 4, 5).reshape(
            B, COUT, nt1 * v1, nt2 * v2)
        return o[:, :, :oh, :ow]

    kr, ki = jax.jit(
        lambda k_: Z._kernel_spectra_2d(k_, t1, nb1, t2))(w)
    mats = [jnp.asarray(m) for m in Z._mats_2d(t1, nb1, t2, v1)]
    call = Z._fused2d_call(
        B, nt1, nt2, t1, nb1, t2, v1, v2, CIN, COUT, 1,
        Z._PRECISION_2D, False, "v2", "loop")

    xp = jax.block_until_ready(jax.jit(pack)(x))
    ok = jax.block_until_ready(jax.jit(lambda a: call(a, kr, ki, *mats))(xp))

    bar = lax.optimization_barrier
    STAGES = [
        ("x-pack", pack, x),
        ("kernel", lambda a: call(a, kr, ki, *mats), xp),
        ("out-unpack", unpack, ok),
        ("pack+kern", lambda a: call(pack(a), kr, ki, *mats), x),
        ("pack|B|kern", lambda a: call(bar(pack(a)), kr, ki, *mats), x),
        ("full", lambda a: unpack(call(pack(a), kr, ki, *mats)), x),
        ("full|B|",
         lambda a: unpack(bar(call(bar(pack(a)), kr, ki, *mats))), x),
        ("e2e fused", lambda a: Z.fft_conv2d_fused(a, w), x),
    ]
    print(f"--- K={K}", flush=True)
    for name, fn, arg in STAGES:
        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(arg))
        t = min(benchmark_fori(jfn, arg, num_iterations=20,
                               min_work_s=0.2).mean for _ in range(3))
        print(f"{name:12s} {t*1e3:7.4f} ms", flush=True)
