"""TPU probe (r4): (1) v4 kernel double-buffered x-staging A/B (DMA was
0.169 ms of the 0.59 ms kernel in the stage ablation); (2) v5 wrapper gap
attribution — incremental jits from kernel-only to the full fft_conv e2e
(e2e 0.946 - kernel 0.59 = ~0.36 ms; isolated pack/spectra/unpack only
account for 0.13 of it — find where the rest lives in-graph)."""
import numpy as np
import jax
import jax.numpy as jnp

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused3d as Z
import fft_conv_tpu.ops.functional as F

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)

B, CIN, COUT, L, K = 2, 8, 8, 64, 8
x = jnp.asarray(rng.standard_normal((B, CIN, L, L, L)).astype(np.float32))
w = jnp.asarray(
    rng.standard_normal((COUT, CIN, K, K, K)).astype(np.float32) / K**1.5)

plan = Z.plan_3d(CIN, COUT, L, L, L, K, K, K)
assert plan[0] == "v4", plan
_, nbh, nbhp, pp, nbd, vdp = plan
vh = L - K + 1
od = oh = ow = L - K + 1
mats = [jnp.asarray(m) for m in Z._mats_v4(L, vh, nbd, pp)]
kr, ki = jax.jit(lambda k: Z._kernel_spectra_v4(k, L, nbh, nbhp))(w)
(kr, ki) = jax.block_until_ready((kr, ki))


def pack(a):
    a = jnp.pad(a, ((0, 0), (0, 0), (0, 2 * pp - L), (0, 0), (0, 0)))
    a = a.reshape(B, CIN, pp, 2, L, Z._TW)
    a = jnp.transpose(a, (0, 4, 1, 2, 3, 5))
    return a.reshape(B, L, CIN * pp, 2 * Z._TW)


def unpack(o):
    o = o.reshape(B, vh, COUT, vdp, 2, Z._TW)
    o = jnp.transpose(o, (0, 2, 3, 4, 1, 5))
    o = o.reshape(B, COUT, 2 * vdp, vh, Z._TW)
    return o[:, :, :od, :oh, :ow]


xp = jax.block_until_ready(jax.jit(pack)(x))


def run(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t = min(benchmark_fori(f, *args).mean for _ in range(2))
    print(f"  {name:36s} {t*1e3:8.3f} ms", flush=True)
    return t


# ---- (1) kernel-only baseline. dbuf=True is a MEASURED OOM (131.8M /
# 128M VMEM — the 44.4M register-spill allocation leaves no headroom for
# the interleaved DMA waits' longer live ranges); only False is runnable.
call = Z._fused3d_call_v4(B, CIN, COUT, L, nbh, nbhp, pp, nbd, vdp,
                          vh, "bf16x3", False, 1, "loop", False)
run("kernel-only dbuf=False",
    lambda a, r, i, c=call: c(a, r, i, *mats), xp, kr, ki)

# ---- (2) incremental wrapper attribution (dbuf=False)
run("pack+kernel",
    lambda s, r, i: call(pack(s), r, i, *mats), x, kr, ki)
run("pack+kernel+unpack",
    lambda s, r, i: unpack(call(pack(s), r, i, *mats)), x, kr, ki)
run("_fused3d_forward (spectra in-graph)",
    lambda s, k: Z._fused3d_forward(s, k, (od, oh, ow)), x, w)
run("fft_conv e2e impl=fused",
    lambda s, k: F.fft_conv(s, k, impl="fused"), x, w)
run("fft_conv e2e impl=auto",
    lambda s, k: F.fft_conv(s, k), x, w)
