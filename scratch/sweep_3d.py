"""TPU sweep: 3D spectral pipeline variants at 64^3 K=8, B=2, 8->8."""
import numpy as np
import torch
import torch.nn.functional as tf
import jax
import jax.numpy as jnp
from jax import lax

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.ops import spectral as S

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform)

x = rng.standard_normal((2, 8, 64, 64, 64)).astype(np.float32)
w = rng.standard_normal((8, 8, 8, 8, 8)).astype(np.float32)
ref = tf.conv3d(torch.tensor(x), torch.tensor(w)).numpy()
sig, ker = jnp.asarray(x), jnp.asarray(w)
FFT = (64, 64, 64)


def crop(out):
    return out[:, :, :57, :57, :57]


# ---- variant 1: current rfftn rotation ----
def v1(s, k):
    sr, si = S.rfftn_matmul(s, FFT)
    kr, ki = S.rfftn_matmul(k, FFT)
    orr, oi = S.spectral_contract_split(sr, si, kr, ki, 1)
    return crop(S.irfftn_matmul(orr, oi, FFT))


# ---- variant 3: all-full-complex append rotation (aligned minors) ----
def _full_mats(n, inverse):
    mr, mi = S._dft_mats(n, inverse)
    return jnp.asarray(mr), jnp.asarray(mi)


def fftn_full(xr, xi, fft_shape, in_lens):
    n = len(fft_shape)
    first = xr.ndim - n
    for i in range(n):
        mr, mi = S._dft_mats(fft_shape[i], inverse=False)
        if in_lens[i] < fft_shape[i]:
            mr, mi = mr[: in_lens[i]], mi[: in_lens[i]]
        mr, mi = jnp.asarray(mr), jnp.asarray(mi)
        if xi is None:
            yr = S._contract_append(xr, mr, first)
            yi = S._contract_append(xr, mi, first)
        else:
            yr = S._contract_append(xr, mr, first) - S._contract_append(xi, mi, first)
            yi = S._contract_append(xr, mi, first) + S._contract_append(xi, mr, first)
        xr, xi = yr, yi
    return xr, xi


def ifftn_full_real(xr, xi, fft_shape):
    n = len(fft_shape)
    first = xr.ndim - n
    for i in range(n):
        mr, mi = S._dft_mats(fft_shape[i], inverse=True)
        mr, mi = jnp.asarray(mr), jnp.asarray(mi)
        if i < n - 1:
            yr = S._contract_append(xr, mr, first) - S._contract_append(xi, mi, first)
            yi = S._contract_append(xr, mi, first) + S._contract_append(xi, mr, first)
            xr, xi = yr, yi
        else:  # real output only
            xr = S._contract_append(xr, mr, first) - S._contract_append(xi, mi, first)
    return xr


def v3(s, k):
    sr, si = fftn_full(s.astype(jnp.float32), None, FFT, [64, 64, 64])
    kr, ki = fftn_full(k.astype(jnp.float32), None, FFT, [8, 8, 8])
    orr, oi = S.spectral_contract_split(sr, si, kr, ki, 1)
    return crop(ifftn_full_real(orr, oi, FFT))


for name, fn in [("v1 rfftn rotation", v1), ("v3 full-complex aligned", v3)]:
    for prec in ("highest", "high"):
        S.set_spectral_precision(prec)
        j = jax.jit(fn)
        got = np.asarray(j(sig, ker))
        err = np.abs(ref - got)
        t = benchmark_fori(j, sig, ker, num_iterations=20).mean
        print(f"  {name:26s} {prec:8s} {t*1e3:7.3f} ms  mean|e| {err.mean():.2e} max|e| {err.max():.2e}")
    S.set_spectral_precision("highest")
