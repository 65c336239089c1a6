"""TPU probe: kernel-spectra formulation variants for fused3d v4.

Current chain (0.323 ms): 2 H-einsums, 4 W-einsums, 4 D-einsums, neg,
reshape, pad. Variants cut materializations: pad folded into the H
factor rows, re/im pair produced by ONE stacked einsum with the
conjugation baked into the transform tensor."""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused3d as Z
from fft_conv_tpu.ops.spectral import _dft_mats, _rfft_mats

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)

CIN = COUT = 8
H, K = 64, 8
NBH = H // 2 + 1
NBHP = -(-NBH // 8) * 8
w = jnp.asarray(
    rng.standard_normal((COUT, CIN, K, K, K)).astype(np.float32))

kr0, ki0 = jax.jit(lambda k: Z._kernel_spectra_v4(k, H, NBH, NBHP))(w)


def variant_a(kernel, h=H, nbh=NBH, nbhp=NBHP, prec=lax.Precision.HIGHEST):
    """Pad folded into fr rows; one stacked D einsum; neg folded in."""
    cout, cin, kd, kh, kw = kernel.shape
    fr, fi = _rfft_mats(h)
    frm = np.zeros((nbhp, kh), np.float32)
    fim = np.zeros((nbhp, kh), np.float32)
    frm[:nbh] = fr[:kh].T
    fim[:nbh] = fi[:kh].T
    frm = jnp.asarray(frm)
    fim = jnp.asarray(fim)
    wr, wi = _dft_mats(Z._TW, inverse=False)
    wr_s = jnp.asarray(wr[:kw], jnp.float32)
    wi_s = jnp.asarray(wi[:kw], jnp.float32)
    k = kernel.astype(jnp.float32)
    ar = jnp.einsum("nk,ocdkw->ocdnw", frm, k, precision=prec)
    ai = jnp.einsum("nk,ocdkw->ocdnw", fim, k, precision=prec)
    br = (
        jnp.einsum("ocdnw,wz->ocdnz", ar, wr_s, precision=prec)
        - jnp.einsum("ocdnw,wz->ocdnz", ai, wi_s, precision=prec)
    )
    bi = (
        jnp.einsum("ocdnw,wz->ocdnz", ar, wi_s, precision=prec)
        + jnp.einsum("ocdnw,wz->ocdnz", ai, wr_s, precision=prec)
    )
    b2 = jnp.stack([br, bi])                       # (2, O, C, D, NBHP, Z)
    ds = np.arange(kd)[:, None, None]
    fd = np.arange(8)[None, :, None] + 8 * np.arange(2)[None, None, :]
    dm = np.exp(-2j * np.pi * ds * fd / 16)        # (KD, 8, 2)
    t = np.zeros((2, 2, kd, 8, 2), np.float32)    # [p_out, q_in, d, f, s]
    t[0, 0] = dm.real                              # kr = br*dr - bi*di
    t[0, 1] = -dm.imag
    t[1, 0] = -dm.imag                             # ki = -(br*di + bi*dr)
    t[1, 1] = -dm.real                             # (conj folded)
    tm = jnp.asarray(t)
    out = jnp.einsum("pqdfs,qocdnz->pfconsz", tm, b2, precision=prec)
    out = out.reshape(2, 8, cin, cout, nbhp, 128)
    return out[0], out[1]


def check(name, fn):
    kr, ki = jax.jit(fn)(w)
    e = max(float(jnp.abs(kr - kr0).max()), float(jnp.abs(ki - ki0).max()))
    print(f"  {name}: max|err| vs current = {e:.2e}", flush=True)


def prof(name, fn):
    f = jax.jit(lambda k: (lambda ri: ri[0] + ri[1])(fn(k)))
    t = min(benchmark_fori(f, w, num_iterations=50,
                           min_work_s=0.05).mean for _ in range(2))
    print(f"  {name:34s} {t*1e3:8.3f} ms", flush=True)


check("variant_a", variant_a)
check("variant_a HIGH", lambda k: variant_a(k, prec="high"))
prof("current", lambda k: Z._kernel_spectra_v4(k, H, NBH, NBHP))
prof("A: pad-folded + stacked D", variant_a)
prof("A @ precision=high", lambda k: variant_a(k, prec="high"))


# --- attribution + bf16x3 dot algorithm ---
X3 = jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3


def hw_only(kernel, prec=lax.Precision.HIGHEST):
    cout, cin, kd, kh, kw = kernel.shape
    fr, fi = _rfft_mats(H)
    frj = jnp.asarray(fr[:kh].T, jnp.float32)
    fij = jnp.asarray(fi[:kh].T, jnp.float32)
    wr, wi = _dft_mats(Z._TW, inverse=False)
    wr_s = jnp.asarray(wr[:kw], jnp.float32)
    wi_s = jnp.asarray(wi[:kw], jnp.float32)
    k = kernel.astype(jnp.float32)
    ar = jnp.einsum("nk,ocdkw->ocdnw", frj, k, precision=prec)
    ai = jnp.einsum("nk,ocdkw->ocdnw", fij, k, precision=prec)
    br = (
        jnp.einsum("ocdnw,wz->ocdnz", ar, wr_s, precision=prec)
        - jnp.einsum("ocdnw,wz->ocdnz", ai, wi_s, precision=prec)
    )
    bi = (
        jnp.einsum("ocdnw,wz->ocdnz", ar, wi_s, precision=prec)
        + jnp.einsum("ocdnw,wz->ocdnz", ai, wr_s, precision=prec)
    )
    return br, bi


check("variant_a @X3", lambda k: variant_a(k, prec=X3))
prof("H+W only @HIGHEST", hw_only)
prof("H+W only @X3", lambda k: hw_only(k, prec=X3))
prof("A @X3", lambda k: variant_a(k, prec=X3))
prof("current @X3", lambda k: Z._kernel_spectra_v4(k, H, NBH, NBHP))
