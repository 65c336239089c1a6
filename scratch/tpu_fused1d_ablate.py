"""TPU ablation of the fused1d kernel stages at the K=256 benchmark row
(N=2048, n1=16, n2=128, nblk=19, B=2, 8->8): cumulative variants write the
last enabled stage's block to out_ref so Mosaic can't DCE it. Attributes
the 84 us between DMA / stage-1 / twiddle+stage-2 / MAC / inverse."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused1d as F1
from fft_conv_tpu.kernels.fused1d import _dot, _mm_right

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)

B, CIN, COUT, L, K = 2, 8, 8, 32768, 256
N = 2048
n1, n2 = F1.fused_split(N)
v = ((N - K + 1) // n2) * n2
v1 = v // n2
vrow = v // n2
v_total = L - K + 1
nblk = -(-v_total // v)
precision = F1._PRECISION_MODE
print(f"N={N} n1={n1} n2={n2} v1={v1} nblk={nblk} prec={precision}",
      flush=True)

x = rng.standard_normal((B, CIN, L)).astype(np.float32)
w = rng.standard_normal((COUT, CIN, K)).astype(np.float32)
need = (nblk - 1) * v + N
x_ext = jnp.pad(jnp.asarray(x), ((0, 0), (0, 0), (0, need - L)))
x4 = x_ext.reshape(B, CIN, need // n2, n2)
kr, ki = jax.jit(lambda k_: F1.kernel_spectrum(k_, N, n1, n2))(jnp.asarray(w))
# frozen TWO-SIDED factor consts: this probe measures the pre-one-sided
# kernel body (the evidence base for the round-3 redesign); the library's
# _factor_consts is one-sided now and no longer fits this body
from fft_conv_tpu.kernels.fourstep import fft_factor_matrices as _ffm
_f1, _f2, _tw = _ffm(n1, n2)
_if1, _if2 = np.conj(_f1) / n1, np.conj(_f2) / n2
consts = [jnp.asarray(np.ascontiguousarray(part, np.float32))
          for m in (_f1, _f2, _tw, _if1, _if2)
          for part in (m.real, m.imag)]


def make_body(stages):
    def body(x_hbm, kr_ref, ki_ref,
             f1r, f1i, f2r, f2i, twr, twi, if1r, if1i, if2r, if2i,
             out_ref, x_vmem, dma_sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[:, :, pl.ds(i * vrow, n1), :], x_vmem, dma_sem)
        dma.start()
        dma.wait()
        a = x_vmem[...]
        if stages == 0:
            out_ref[0] = jnp.transpose(a, (2, 0, 1, 3))[:v1] * 0.5
            return
        dn_s1 = (((1,), (2,)), ((), ()))
        br = _dot(f1r[...], a, dn_s1, precision)
        bi = _dot(f1i[...], a, dn_s1, precision)
        if stages == 1:
            out_ref[0] = (br + bi)[:v1]
            return
        tr = twr[...][:, None, None, :]
        ti = twi[...][:, None, None, :]
        cr = br * tr - bi * ti
        ci = br * ti + bi * tr
        dr, di = _mm_right(cr, ci, f2r[...], f2i[...], precision)
        if stages == 2:
            out_ref[0] = (dr + di)[:v1]
            return
        yr_parts, yi_parts = [], []
        for o in range(COUT):
            kr_o = kr_ref[o][:, None, :, :]
            ki_o = ki_ref[o][:, None, :, :]
            yr_parts.append(
                jnp.sum(dr * kr_o - di * ki_o, axis=2, keepdims=True))
            yi_parts.append(
                jnp.sum(dr * ki_o + di * kr_o, axis=2, keepdims=True))
        yr = jnp.concatenate(yr_parts, axis=2)
        yi = jnp.concatenate(yi_parts, axis=2)
        if stages == 3:
            out_ref[0] = (yr + yi)[:v1]
            return
        er, ei = _mm_right(yr, yi, if2r[...], if2i[...], precision)
        gr = er * tr + ei * ti
        gi = ei * tr - er * ti
        if stages == 4:
            out_ref[0] = (gr + gi)[:v1]
            return
        dn = (((1,), (0,)), ((), ()))
        out_real = (
            _dot(if1r[...], gr, dn, precision)
            - _dot(if1i[...], gi, dn, precision)
        )
        out_ref[0] = out_real[:v1]

    return body


def make_call(stages):
    mat_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    grid_spec = pl.GridSpec(
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((COUT, n1, CIN, n2), lambda j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((COUT, n1, CIN, n2), lambda j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [mat_spec() for _ in range(10)],
        out_specs=pl.BlockSpec(
            (1, v1, B, COUT, n2), lambda j: (j, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((B, CIN, n1, n2), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        make_body(stages),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk, v1, B, COUT, n2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )


names = ["dma-only", "+stage1", "+tw+stage2", "+MAC", "+inv1+tw", "full"]
prev = 0.0
for s in range(6):
    call = make_call(s)
    fn = jax.jit(lambda a, r, i_: call(a, r, i_, *consts))
    jax.block_until_ready(fn(x4, kr, ki))
    t = min(benchmark_fori(fn, x4, kr, ki, num_iterations=25,
                           min_work_s=0.2).mean for _ in range(2))
    print(f"{names[s]:12s} {t*1e3:7.4f} ms  (+{(t-prev)*1e3:6.4f})",
          flush=True)
    prev = t
