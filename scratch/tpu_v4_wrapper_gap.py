"""HISTORICAL (round-3 v4 era): frozen against commit b8e3b7a — the v5 batch-channel
rewrite changed _mats_v4 (12 stacked mats) and the kernel x layout, so this
probe no longer runs at HEAD. Kept as the measured-evidence record cited in
ROADMAP/ARCHITECTURE. Superseded by tpu_fused3d_v5_ablate.py.

TPU probe: where the ~0.57 ms between the v4 kernel (0.834 ms ablated)
and fft_conv3d_fused end-to-end (1.404 ms) goes. Times each XLA wrapper
stage (pack, kernel spectra, unpack) and the pallas call alone."""
import numpy as np
import jax
import jax.numpy as jnp

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused3d as Z

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)

B, CIN, COUT, D, H, W, K = 2, 8, 8, 64, 64, 64, 8
x = jnp.asarray(rng.standard_normal((B, CIN, D, H, W)).astype(np.float32))
w = jnp.asarray(
    rng.standard_normal((COUT, CIN, K, K, K)).astype(np.float32))
plan = Z.plan_3d(CIN, COUT, D, H, W, K, K, K)
print("plan:", plan, flush=True)
_, nbh, nbhp, pp, nbd, vdp = plan
vh = H - K + 1
od, oh, ow = D - K + 1, H - K + 1, W - K + 1
mats = [jnp.asarray(m) for m in Z._mats_v4(H, vh, nbd, pp)]
call = Z._fused3d_call_v4(B, CIN, COUT, H, nbh, nbhp, pp, nbd, vdp, vh,
                          Z._PRECISION_3D, False)


def pack(s):
    xx = jnp.pad(s, ((0, 0), (0, 0), (0, 2 * pp - D), (0, 0), (0, 0)))
    xx = xx.reshape(B, CIN, pp, 2, H, Z._TW)
    xx = jnp.transpose(xx, (0, 1, 4, 2, 3, 5))
    return xx.reshape(B, CIN, H, pp, 2 * Z._TW)


def spectra(k_):
    return Z._kernel_spectra_v4(k_, H, nbh, nbhp)


def unpack(o):
    o = o.reshape(B, COUT, vh, vdp, 2, Z._TW)
    o = jnp.transpose(o, (0, 1, 3, 4, 2, 5))
    o = o.reshape(B, COUT, 2 * vdp, vh, Z._TW)
    return o[:, :, :od, :oh, :ow]


xp = jax.jit(pack)(x)
kr, ki = jax.jit(spectra)(w)
raw = jax.jit(lambda a, r, i: call(a, r, i, *mats))(xp, kr, ki)


def prof(name, fn, *args):
    t = min(benchmark_fori(jax.jit(fn), *args, num_iterations=20,
                           min_work_s=0.05).mean for _ in range(2))
    print(f"  {name:28s} {t*1e3:8.3f} ms", flush=True)
    return t


prof("full fft_conv3d_fused", Z.fft_conv3d_fused, x, w)
prof("_fused3d_forward", lambda s, k_: Z._fused3d_forward(
    s, k_, (od, oh, ow)), x, w)
prof("pallas call only", lambda a, r, i: call(a, r, i, *mats), xp, kr, ki)
prof("pack only", pack, x)
prof("spectra only (+add)", lambda k_: (lambda ri: ri[0] + ri[1])(
    spectra(k_)), w)
prof("unpack only", unpack, raw)
prof("pack+call+unpack", lambda s, r, i: unpack(
    call(pack(s), r, i, *mats)), x, kr, ki)
