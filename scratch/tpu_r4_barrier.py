"""TPU probe: can optimization_barrier recover the wrapper-stage gap?

tpu_r4_wrapper_stages.py measured (v5e 2026-08-19, 64^3 K=8^3):
  x-pack 0.027 / kernel 0.618 / out-unpack 0.054 ms standalone
  (sum 0.699), but pack+kernel fused in ONE jit reads 0.750 ms —
  a ~0.10 ms penalty just for sharing a computation with the Mosaic
  call; e2e is ~0.94 ms, so ~0.24 ms total is fusion/dispatch loss.

Hypothesis: XLA fuses the pad+6D-transpose into a slow loop fusion
when its consumer is an opaque custom call (standalone it lowers to a
fast transpose/copy kernel). lax.optimization_barrier between the
stages should force the standalone lowering.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused3d as Z

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)

B, CIN, COUT, L, K = 2, 8, 8, 64, 8
_, nbh, nbhp, pp, nbd, vdp = Z.plan_3d(CIN, COUT, L, L, L, K, K, K)
vh = L - K + 1
od = oh = ow = L - K + 1
TW = Z._TW

x = jnp.asarray(rng.standard_normal((B, CIN, L, L, L)).astype(np.float32))
w = jnp.asarray(
    rng.standard_normal((COUT, CIN, K, K, K)).astype(np.float32) / K**1.5)


def pack(xv):
    xq = jnp.pad(xv, ((0, 0), (0, 0), (0, 2 * pp - L), (0, 0),
                      (0, TW - L if L < TW else 0)))
    xq = xq.reshape(B, CIN, pp, 2, L, TW)
    xq = jnp.transpose(xq, (0, 4, 1, 2, 3, 5))
    return xq.reshape(B, L, CIN * pp, 2 * TW)


def unpack(o):
    o = o.reshape(B, vh, COUT, vdp, 2, TW)
    o = jnp.transpose(o, (0, 2, 3, 4, 1, 5))
    o = o.reshape(B, COUT, 2 * vdp, vh, TW)
    return o[:, :, :od, :oh, :ow]


kr, ki = jax.jit(
    lambda k_: Z._kernel_spectra_v4(k_, L, nbh, nbhp))(w)
mats = [jnp.asarray(m) for m in Z._mats_v4(L, vh, nbd, pp)]
call = Z._fused3d_call_v4(B, CIN, COUT, L, nbh, nbhp, pp, nbd, vdp, vh,
                          Z._PRECISION_3D, False, 1, "loop", Z._DBUF3D,
                          False, 0, 0)

xp = jax.block_until_ready(jax.jit(pack)(x))
ok = jax.block_until_ready(jax.jit(lambda a: call(a, kr, ki, *mats))(xp))


def bar(a):
    return lax.optimization_barrier(a)


STAGES = [
    ("pack+kern", lambda a: call(pack(a), kr, ki, *mats), x),
    ("pack|B|kern", lambda a: call(bar(pack(a)), kr, ki, *mats), x),
    ("kern|B|unpk", lambda a: unpack(bar(call(a, kr, ki, *mats))), xp),
    ("full|B|", lambda a: unpack(bar(call(bar(pack(a)), kr, ki, *mats))), x),
    ("e2e fused", lambda a: Z.fft_conv3d_fused(a, w), x),
]
for name, fn, arg in STAGES:
    import time
    t0 = time.time()
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(arg))
    print(f"[compile {name}: {time.time()-t0:.0f}s]", flush=True)
    t = min(benchmark_fori(jfn, arg, num_iterations=20,
                           min_work_s=0.2).mean for _ in range(3))
    print(f"{name:12s} {t*1e3:7.4f} ms", flush=True)
