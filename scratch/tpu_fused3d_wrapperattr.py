"""TPU probe: attribute the fused3d v4 wrapper overhead (e2e 1.105 ms -
kernel 0.592 ms = 0.513 ms): kernel spectra, input pack, output unpack."""
import numpy as np
import jax
import jax.numpy as jnp

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused3d as Z

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)

B, CIN, COUT, L, K = 2, 8, 8, 64, 8
x = jnp.asarray(rng.standard_normal((B, CIN, L, L, L)).astype(np.float32))
w = jnp.asarray(
    rng.standard_normal((COUT, CIN, K, K, K)).astype(np.float32) / K**1.5)

_, nbh, nbhp, pages, nbd, vdp = Z.plan_3d(CIN, COUT, L, L, L, K, K, K)
vh = L - K + 1

spec = jax.jit(
    lambda k: sum(Z._kernel_spectra_v4(k, L, nbh, nbhp)))
jax.block_until_ready(spec(w))
t_s = benchmark_fori(spec, w).mean
print(f"spectra-only: {t_s*1e3:.3f} ms", flush=True)


def pack(a):
    a = jnp.pad(a, ((0, 0), (0, 0), (0, 2 * pages - L), (0, 0), (0, 0)))
    a = a.reshape(B, CIN, pages, 2, L, Z._TW)
    a = jnp.transpose(a, (0, 4, 1, 2, 3, 5))
    return a.reshape(B, L, CIN * pages, 2 * Z._TW)


packj = jax.jit(pack)
jax.block_until_ready(packj(x))
t_p = benchmark_fori(packj, x).mean
print(f"pack-only: {t_p*1e3:.3f} ms", flush=True)

ob = jnp.asarray(
    rng.standard_normal((B, vh, COUT * vdp, 128)).astype(np.float32))


def unpack(o):
    o = o.reshape(B, vh, COUT, vdp, 2, Z._TW)
    o = jnp.transpose(o, (0, 2, 3, 4, 1, 5))
    o = o.reshape(B, COUT, 2 * vdp, vh, Z._TW)
    od = L - K + 1
    return o[:, :, :od, :, :od]


unpackj = jax.jit(unpack)
jax.block_until_ready(unpackj(ob))
t_u = benchmark_fori(unpackj, ob).mean
print(f"unpack-only: {t_u*1e3:.3f} ms", flush=True)
print(f"sum spectra+pack+unpack: {(t_s+t_p+t_u)*1e3:.3f} ms "
      f"(gap to 0.513: {(0.513e-3-t_s-t_p-t_u)*1e3:.3f} ms)", flush=True)
