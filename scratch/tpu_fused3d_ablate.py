"""TPU ablation of fused3d v3 kernel stages at the benchmark config.

Builds kernel variants with stages disabled (fwd transforms / tap MAC /
inverse transforms) to attribute the 0.93 ms kernel-only time. Scratch-ref
writes keep disabled-stage inputs alive (no DCE of refs in Mosaic)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused3d as Z
from fft_conv_tpu.kernels.fused1d import _dot

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)

B, CIN, COUT, D, H, W, K = 2, 8, 8, 64, 64, 64, 8
nbh, vdp, pages = Z.plan_3d(CIN, COUT, D, H, W, K, K, K)
me, mr = Z._tap_counts(K)
vh = H - K + 1
precision = Z._PRECISION_3D
cin, cout, h = CIN, COUT, H
maxoff = max(me - 1, mr - 1 if mr else 0)
wrows = -(-(8 + maxoff) // 8) * 8


def make_body(fwd=True, mac=True, inv=True):
    def body(x_hbm, kr_ref, ki_ref,
             frm, fim, bwr, bwi, bur, bui, crm, cim,
             out_ref, x_vmem, sr_s, si_s, rr_s, ri_s, ar_s, ai_s, dma_sem):
        b = pl.program_id(0)
        dma = pltpu.make_async_copy(x_hbm.at[b], x_vmem, dma_sem)
        dma.start()
        dma.wait()
        dn_lead = (((1,), (0,)), ((), ()))
        dn_min3 = (((2,), (0,)), ((), ()))
        fr_, fi_ = frm[...], fim[...]
        bwr_, bwi_ = bwr[...], bwi[...]
        bur_, bui_ = bur[...], bui[...]
        cr_, ci_ = crm[...], cim[...]

        if fwd:
            for c in range(cin):
                xc = x_vmem[c]
                hr = _dot(fr_, xc, dn_lead, precision)
                hi = _dot(fi_, xc, dn_lead, precision)
                sr = (_dot(hr, bwr_, dn_min3, precision)
                      - _dot(hi, bwi_, dn_min3, precision))
                si = (_dot(hr, bwi_, dn_min3, precision)
                      + _dot(hi, bwr_, dn_min3, precision))
                sr_s[c] = sr
                si_s[c] = si
                if mr:
                    rr_s[c] = pltpu.roll(sr, Z._TW, axis=2)
                    ri_s[c] = pltpu.roll(si, Z._TW, axis=2)

        if mac:
            nv8 = vdp // 8

            def mac_block(idx, carry):
                n = idx // nv8
                v8 = (idx % nv8) * 8
                xw_sr = sr_s[:, n, pl.dslice(v8, wrows), :]
                xw_si = si_s[:, n, pl.dslice(v8, wrows), :]
                if mr:
                    xw_rr = rr_s[:, n, pl.dslice(v8, wrows), :]
                    xw_ri = ri_s[:, n, pl.dslice(v8, wrows), :]
                kn_r = kr_ref[n]
                kn_i = ki_ref[n]
                for o in range(cout):
                    yr = yi = None
                    for t in range(me + mr):
                        if t < me:
                            xr = xw_sr[:, t:t + 8, :]
                            xi = xw_si[:, t:t + 8, :]
                        else:
                            xr = xw_rr[:, t - me:t - me + 8, :]
                            xi = xw_ri[:, t - me:t - me + 8, :]
                        kro = kn_r[:, t, o][:, None, :]
                        kio = kn_i[:, t, o][:, None, :]
                        tr = jnp.sum(xr * kro - xi * kio, axis=0)
                        ti = jnp.sum(xr * kio + xi * kro, axis=0)
                        yr = tr if yr is None else yr + tr
                        yi = ti if yi is None else yi + ti
                    ar_s[o, n, pl.dslice(v8, 8), :] = yr
                    ai_s[o, n, pl.dslice(v8, 8), :] = yi
                return carry

            jax.lax.fori_loop(0, nbh * nv8, mac_block, 0)
        else:
            ar_s[...] = jnp.zeros((cout, nbh, vdp, 128), jnp.float32)
            ai_s[...] = jnp.zeros((cout, nbh, vdp, 128), jnp.float32)

        if inv:
            def per_out(o, carry):
                yr = ar_s[o]
                yi = ai_s[o]
                er = (_dot(yr, bur_, dn_min3, precision)
                      - _dot(yi, bui_, dn_min3, precision))
                ei = (_dot(yr, bui_, dn_min3, precision)
                      + _dot(yi, bur_, dn_min3, precision))
                out = (_dot(cr_, er, dn_lead, precision)
                       + _dot(ci_, ei, dn_lead, precision))
                out_ref[0, o] = out
                return carry
            jax.lax.fori_loop(0, cout, per_out, 0)
        else:
            out_ref[...] = jnp.zeros((1, cout, vh, vdp, 128), jnp.float32)
    return body


taps = me + mr
mat_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731


def make_call(**kw):
    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((nbh, cin, taps, cout, 128),
                         lambda b_: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbh, cin, taps, cout, 128),
                         lambda b_: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [mat_spec() for _ in range(8)],
        out_specs=pl.BlockSpec((1, cout, vh, vdp, 128),
                               lambda b_: (b_, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cin, h, pages, 128), jnp.float32),
            pltpu.VMEM((cin, nbh, pages, 128), jnp.float32),
            pltpu.VMEM((cin, nbh, pages, 128), jnp.float32),
            pltpu.VMEM((cin, nbh, pages, 128), jnp.float32),
            pltpu.VMEM((cin, nbh, pages, 128), jnp.float32),
            pltpu.VMEM((cout, nbh, vdp, 128), jnp.float32),
            pltpu.VMEM((cout, nbh, vdp, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        make_body(**kw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, cout, vh, vdp, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )


x = jnp.asarray(
    rng.standard_normal((B, CIN, H, pages, 128)).astype(np.float32))
kr = jnp.asarray(rng.standard_normal(
    (nbh, cin, taps, cout, 128)).astype(np.float32))
ki = jnp.asarray(rng.standard_normal(
    (nbh, cin, taps, cout, 128)).astype(np.float32))
mats = [jnp.asarray(m) for m in Z._mats_3d(H, vh)]


def prof(name, call):
    fn = jax.jit(lambda a, b_, c: call(a, b_, c, *mats))
    t = min(benchmark_fori(fn, x, kr, ki, num_iterations=20,
                           min_work_s=0.05).mean for _ in range(2))
    print(f"  {name:28s} {t*1e3:8.3f} ms", flush=True)
    return t


prof("full kernel", make_call())
prof("no MAC (fwd+inv)", make_call(mac=False))
prof("no inv (fwd+mac)", make_call(inv=False))
prof("no fwd (mac+inv)", make_call(fwd=False))
prof("DMA only", make_call(fwd=False, mac=False, inv=False))
