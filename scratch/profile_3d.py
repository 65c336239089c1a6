"""3D-only stage profile + jnp.fft alternative probe (TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.ops import spectral as S
from fft_conv_tpu.ops.functional import fft_conv

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)
fft_shape = (64, 64, 64)
sig = jnp.asarray(rng.standard_normal((2, 8, 64, 64, 64)).astype(np.float32))
ker = jnp.asarray(rng.standard_normal((8, 8, 8, 8, 8)).astype(np.float32))


def prof(name, fn, *args, iters=20):
    t = benchmark_fori(jax.jit(fn), *args, num_iterations=iters,
                       min_work_s=0.02).mean
    print(f"  {name:30s} {t*1e3:8.3f} ms", flush=True)
    return t


sr, si = jax.jit(lambda x: S.rfftn_matmul(x, fft_shape))(sig)
kr, ki = jax.jit(lambda x: S.rfftn_matmul(x, fft_shape))(ker)
or_, oi = S.spectral_contract_split(sr, si, kr, ki, 1)

prof("rfftn(signal)", lambda x: S.rfftn_matmul(x, fft_shape)[0], sig)
prof("rfftn(kernel)", lambda x: S.rfftn_matmul(x, fft_shape)[0], ker)
prof("MAC", lambda a, b, c, d: S.spectral_contract_split(a, b, c, d, 1)[0],
     sr, si, kr, ki)
prof("irfftn", lambda a, b: S.irfftn_matmul(a, b, fft_shape), or_, oi)
prof("full fft_conv xla", lambda s, w: fft_conv(s, w, impl="xla"), sig, ker)


def conv_jnpfft(s, w):
    axes = (-3, -2, -1)
    sf = jnp.fft.rfftn(s, s=fft_shape, axes=axes)
    wf = jnp.conj(jnp.fft.rfftn(w, s=fft_shape, axes=axes))
    of = jnp.einsum("bi...,oi...->bo...", sf, wf)
    out = jnp.fft.irfftn(of, s=fft_shape, axes=axes)
    return out[:, :, :57, :57, :57]


try:
    prof("jnp.fft composed", conv_jnpfft, sig, ker)
except Exception as e:
    print("  jnp.fft composed failed:", type(e).__name__, str(e)[:100])
