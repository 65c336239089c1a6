"""TPU sweep v2: 3D composed-path variants at 64^3 K=8, B=2, 8->8.

v1: current rotation pipeline (ops/spectral.py) — baseline.
v4: explicit-transpose chain — every contraction is on the MINOR axis
    (matmul-natural, ~4.5x cheaper per einsum than the rotation's
    first-position contraction), paying explicit swapaxes between stages.
Each at spectral precision highest and bf16x3 (barrier-fenced).
"""
import numpy as np
import torch
import torch.nn.functional as tf
import jax
import jax.numpy as jnp
from jax import lax

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.ops import spectral as S

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)

x = rng.standard_normal((2, 8, 64, 64, 64)).astype(np.float32)
w = rng.standard_normal((8, 8, 8, 8, 8)).astype(np.float32)
ref = tf.conv3d(torch.tensor(x), torch.tensor(w)).numpy()
sig, ker = jnp.asarray(x), jnp.asarray(w)
N = 64


def crop(out):
    return out[:, :, :57, :57, :57]


def v1(s, k):
    sr, si = S.rfftn_matmul(s, (N, N, N))
    kr, ki = S.rfftn_matmul(k, (N, N, N))
    orr, oi = S.spectral_contract_split(sr, si, kr, ki, 1)
    return crop(S.irfftn_matmul(orr, oi, (N, N, N)))


def es(a, m):
    return S._einsum_p("...w,wz->...z", a, m)


def cmul_minor(ar, ai, mr, mi):
    re = es(ar, mr) - es(ai, mi)
    im = es(ar, mi) + es(ai, mr)
    return re, im


def v4(s, k):
    fr_s, fi_s = (jnp.asarray(m) for m in S._dft_mats(N, inverse=False))

    def fwd(x, klen=None):
        mr, mi = fr_s, fi_s
        if klen is not None:
            mr, mi = mr[:klen], mi[:klen]
        # W
        ar, ai = es(x, mr), es(x, mi)          # (B,C,D,H,ZW)
        ar, ai = jnp.swapaxes(ar, -1, -2), jnp.swapaxes(ai, -1, -2)  # (B,C,D,ZW,H)
        # H
        ar, ai = cmul_minor(ar, ai, mr, mi)     # (B,C,D,ZW,ZH)
        ar, ai = jnp.moveaxis(ar, 2, 4), jnp.moveaxis(ai, 2, 4)      # (B,C,ZW,ZH,D)
        # D
        ar, ai = cmul_minor(ar, ai, mr, mi)     # (B,C,ZW,ZH,ZD)
        return ar, ai

    sr, si = fwd(s)
    kr, ki = fwd(k, klen=8)
    orr, oi = S.spectral_contract_split(sr, si, kr, ki, 1)
    ir, ii = (jnp.asarray(m) for m in S._dft_mats(N, inverse=True))
    # inverse D
    orr, oi = cmul_minor(orr, oi, ir, ii)       # (B,C,ZW,ZH,D)
    orr, oi = jnp.moveaxis(orr, 4, 2), jnp.moveaxis(oi, 4, 2)        # (B,C,D,ZW,ZH)
    # inverse H
    orr, oi = cmul_minor(orr, oi, ir, ii)       # (B,C,D,ZW,H)
    orr, oi = jnp.swapaxes(orr, -1, -2), jnp.swapaxes(oi, -1, -2)    # (B,C,D,H,ZW)
    # inverse W (real output)
    out = es(orr, ir) - es(oi, ii)
    return crop(out)


for name, fn in [("v1 rotation", v1), ("v4 minor+transpose", v4)]:
    for prec in ("highest", "bf16x3"):
        S.set_spectral_precision(prec)
        j = jax.jit(fn)
        got = np.asarray(j(sig, ker))
        err = np.abs(ref - got)
        t = benchmark_fori(j, sig, ker, num_iterations=20, min_work_s=0.02).mean
        print(f"  {name:22s} {prec:8s} {t*1e3:7.3f} ms  mean|e| {err.mean():.2e}"
              f" max|e| {err.max():.2e}", flush=True)
    S.set_spectral_precision("highest")
