"""TPU stage profile of fused3d v3 at the benchmark config (64^3, B=2,
8->8, K=8^3): kernel-only vs XLA pack/unpack vs kernel-spectra einsums,
to locate the gap between the ~0.45 ms VPU-MAC floor and the measured
full-path time."""
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
nbh, vdp, pages = plan
me, mr = Z._tap_counts(K)
vh = H - K + 1
od, oh, ow = D - K + 1, H - K + 1, W - K + 1
print(f"plan nbh={nbh} vdp={vdp} pages={pages} me={me} mr={mr}", flush=True)


def pack(xx):
    xx = jnp.pad(
        xx, ((0, 0), (0, 0), (0, 2 * pages - D), (0, 0), (0, 0)))
    xx = xx.reshape(B, CIN, pages, 2, H, Z._TW)
    xx = jnp.transpose(xx, (0, 1, 4, 2, 3, 5))
    return xx.reshape(B, CIN, H, pages, 2 * Z._TW)


def unpack(out):
    out = out.reshape(B, COUT, vh, vdp, 2, Z._TW)
    out = jnp.transpose(out, (0, 1, 3, 4, 2, 5))
    out = out.reshape(B, COUT, 2 * vdp, vh, Z._TW)
    return out[:, :, :od, :oh, :ow]


def spectra(ww):
    return Z._kernel_spectra_3d(ww, H, nbh)[0]


xp = jax.jit(pack)(x)
kr, ki = jax.jit(lambda ww: Z._kernel_spectra_3d(ww, H, nbh))(w)
mats = [jnp.asarray(m) for m in Z._mats_3d(H, vh)]
call = Z._fused3d_call(B, CIN, COUT, H, nbh, pages, vdp, vh, me, mr,
                       Z._PRECISION_3D, False)
out_raw = jax.jit(lambda a, b, c: call(a, b, c, *mats))(xp, kr, ki)


def prof(name, fn, *args, iters=20):
    t = min(
        benchmark_fori(jax.jit(fn), *args, num_iterations=iters,
                       min_work_s=0.05).mean
        for _ in range(2)
    )
    print(f"  {name:22s} {t*1e3:8.3f} ms", flush=True)
    return t


prof("pack (XLA)", pack, x)
prof("spectra (XLA)", spectra, w)
prof("kernel only", lambda a, b, c: call(a, b, c, *mats), xp, kr, ki)
prof("unpack (XLA)", unpack, out_raw)
prof("full fused", lambda s, k_: Z.fft_conv3d_fused(s, k_), x, w)
