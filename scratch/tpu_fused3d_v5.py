"""TPU probe: fused3d v4 batch-channel (stacked matmul) kernel.

Measures end-to-end fused path, kernel-only (pallas_call on packed
inputs), the composed baseline, and checks TPU parity vs composed."""
import numpy as np
import jax
import jax.numpy as jnp

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused3d as Z
from fft_conv_tpu.ops import functional as F

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)

B, CIN, COUT, L, K = 2, 8, 8, 64, 8
x = jnp.asarray(rng.standard_normal((B, CIN, L, L, L)).astype(np.float32))
w = jnp.asarray(
    rng.standard_normal((COUT, CIN, K, K, K)).astype(np.float32) / K**1.5)

plan = Z.plan_3d(CIN, COUT, L, L, L, K, K, K)
print("plan:", plan, flush=True)
assert plan[0] == "v4"
_, nbh, nbhp, pages, nbd, vdp = plan
vh = L - K + 1

fused = jax.jit(lambda a, b: Z.fft_conv3d_fused(a, b))
composed = jax.jit(lambda a, b: F.fft_conv(a, b, impl="xla"))

out_f = np.asarray(jax.block_until_ready(fused(x, w)))
out_c = np.asarray(jax.block_until_ready(composed(x, w)))
err = np.abs(out_f - out_c)
scale = max(1.0, float(np.std(out_c)))
print(f"parity: mean={err.mean():.3e} max={err.max():.3e} "
      f"scale={scale:.2f}", flush=True)
assert err.max() < 2e-4 * scale, "TPU parity FAILED"

t_f = benchmark_fori(fused, x, w).mean
t_c = benchmark_fori(composed, x, w).mean
print(f"end-to-end fused: {t_f*1e3:.3f} ms   composed: {t_c*1e3:.3f} ms",
      flush=True)

# kernel-only: pre-pack inputs, time just the pallas_call
xpad = jnp.pad(x, ((0, 0), (0, 0), (0, 2 * pages - L), (0, 0), (0, 0)))
xp = xpad.reshape(B, CIN, pages, 2, L, Z._TW)
xp = jnp.transpose(xp, (0, 4, 1, 2, 3, 5)).reshape(
    B, L, CIN * pages, 2 * Z._TW)
kr, ki = jax.jit(lambda k: Z._kernel_spectra_v4(k, L, nbh, nbhp))(w)
mats = [jnp.asarray(m) for m in Z._mats_v4(L, vh, nbd, pages)]
call = Z._fused3d_call_v4(
    B, CIN, COUT, L, nbh, nbhp, pages, nbd, vdp, vh,
    Z._PRECISION_3D, False)
kern = jax.jit(lambda a, r, i: call(a, r, i, *mats))
jax.block_until_ready(kern(xp, kr, ki))
t_k = benchmark_fori(kern, xp, kr, ki).mean
print(f"kernel-only: {t_k*1e3:.3f} ms", flush=True)

# spectra-only
spec = jax.jit(lambda k: Z._kernel_spectra_v4(k, L, nbh, nbhp))
t_s = benchmark_fori(spec, w).mean
print(f"spectra-only: {t_s*1e3:.3f} ms", flush=True)
