"""HISTORICAL (round-3 v4 era): frozen against commit b8e3b7a — the v5 batch-channel
rewrite changed _mats_v4 (12 stacked mats) and the kernel x layout, so this
probe no longer runs at HEAD. Kept as the measured-evidence record cited in
ROADMAP/ARCHITECTURE. Superseded by tpu_fused3d_v5_ablate.py.

TPU ablation of fused3d v4 kernel stages at the benchmark config."""
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
plan = Z.plan_3d(CIN, COUT, D, H, W, K, K, K)
assert plan[0] == "v4"
_, nbh, nbhp, pp, nbd, vdp = plan
vh = H - K + 1
precision = Z._PRECISION_3D
cin, cout, h = CIN, COUT, H
r_ = 8 * nbd
nch = nbhp // 8
_TW = Z._TW
print(f"plan nbh={nbh} nbhp={nbhp} pp={pp} nbd={nbd} vdp={vdp} R={r_}",
      flush=True)


def make_body(fwd=True, mac=True, inv=True, fwd_dmat=True, fwd_bfly=True):
    def body(x_hbm, kr_ref, ki_ref,
             frm, fim, bwr, bwi, bur, bui, crm, cim,
             wdr, wdi, twfr, twfi, twvr, twvi, widr, widi,
             out_ref, x_stage, str_s, sti_s, xdr_s, xdi_s, yr_s, yi_s,
             dma_sem):
        b = pl.program_id(0)
        dn_lead = (((1,), (0,)), ((), ()))
        dn_min3 = (((2,), (0,)), ((), ()))
        fr_, fi_ = frm[...], fim[...]
        bwr_, bwi_ = bwr[...], bwi[...]
        bur_, bui_ = bur[...], bui[...]
        cr_, ci_ = crm[...], cim[...]
        wdr_, wdi_ = wdr[...], wdi[...]
        twfr_, twfi_ = twfr[...], twfi[...]
        twvr_, twvi_ = twvr[...], twvi[...]
        widr_, widi_ = widr[...], widi[...]
        lmask = lax.broadcasted_iota(jnp.int32, (r_, nbhp, 128), 2) < _TW

        def copy_in(c, slot):
            return pltpu.make_async_copy(
                x_hbm.at[b, c], x_stage.at[slot], dma_sem.at[slot])

        if fwd:
            copy_in(0, 0).start()

            def fwd_channel(c, carry):
                @pl.when(c + 1 < cin)
                def _():
                    copy_in(c + 1, (c + 1) % 2).start()
                copy_in(c, c % 2).wait()
                xc = x_stage[c % 2]
                hr = _dot(fr_, xc, dn_lead, precision)
                hi = _dot(fi_, xc, dn_lead, precision)
                sr = (_dot(hr, bwr_, dn_min3, precision)
                      - _dot(hi, bwi_, dn_min3, precision))
                si = (_dot(hr, bwi_, dn_min3, precision)
                      + _dot(hi, bwr_, dn_min3, precision))
                str_s[...] = jnp.swapaxes(sr, 0, 1)
                sti_s[...] = jnp.swapaxes(si, 0, 1)
                if fwd_dmat:
                    gr = (_dot(wdr_, str_s[...], dn_lead, precision)
                          - _dot(wdi_, sti_s[...], dn_lead, precision))
                    gi = (_dot(wdr_, sti_s[...], dn_lead, precision)
                          + _dot(wdi_, str_s[...], dn_lead, precision))
                else:
                    gr = jnp.zeros((r_, nbhp, 128), jnp.float32)
                    gi = gr
                if fwd_bfly:
                    rr = pltpu.roll(gr, _TW, axis=2)
                    ri = pltpu.roll(gi, _TW, axis=2)
                    er = jnp.where(lmask, gr, rr)
                    ei = jnp.where(lmask, gi, ri)
                    our = jnp.where(lmask, rr, gr)
                    oui = jnp.where(lmask, ri, gi)
                    xdr_s[c] = er + twfr_ * our - twfi_ * oui
                    xdi_s[c] = ei + twfr_ * oui + twfi_ * our
                else:
                    xdr_s[c] = gr
                    xdi_s[c] = gi
                return carry

            jax.lax.fori_loop(0, cin, fwd_channel, 0)

        if mac:
            def mac_it(it, carry):
                f8 = it // nch
                ch = (it % nch) * 8
                kr_blk = kr_ref[f8, :, :, pl.dslice(ch, 8), :]
                ki_blk = ki_ref[f8, :, :, pl.dslice(ch, 8), :]
                xr_blk = xdr_s[:, pl.dslice(f8 * nbd, nbd),
                               pl.dslice(ch, 8), :]
                xi_blk = xdi_s[:, pl.dslice(f8 * nbd, nbd),
                               pl.dslice(ch, 8), :]
                for o in range(cout):
                    ar = ai = None
                    for c in range(cin):
                        kro = kr_blk[c, o][None]
                        kio = ki_blk[c, o][None]
                        tr = xr_blk[c] * kro - xi_blk[c] * kio
                        ti = xr_blk[c] * kio + xi_blk[c] * kro
                        ar = tr if ar is None else ar + tr
                        ai = ti if ai is None else ai + ti
                    yr_s[o, pl.dslice(f8 * nbd, nbd),
                         pl.dslice(ch, 8), :] = ar
                    yi_s[o, pl.dslice(f8 * nbd, nbd),
                         pl.dslice(ch, 8), :] = ai
                return carry

            jax.lax.fori_loop(0, 8 * nch, mac_it, 0)
        else:
            yr_s[...] = jnp.zeros((cout, r_, nbhp, 128), jnp.float32)
            yi_s[...] = jnp.zeros((cout, r_, nbhp, 128), jnp.float32)

        if inv:
            def per_out(o, carry):
                yr = yr_s[o]
                yi = yi_s[o]
                rr = pltpu.roll(yr, _TW, axis=2)
                ri = pltpu.roll(yi, _TW, axis=2)
                ur = yr + rr
                ui = yi + ri
                dr = yr - rr
                di = yi - ri
                vr = dr * twvr_ - di * twvi_
                vi = dr * twvi_ + di * twvr_
                pr = jnp.where(lmask, ur, vr)
                pi = jnp.where(lmask, ui, vi)
                zr = (_dot(widr_, pr, dn_lead, precision)
                      - _dot(widi_, pi, dn_lead, precision))
                zi = (_dot(widr_, pi, dn_lead, precision)
                      + _dot(widi_, pr, dn_lead, precision))
                er = (_dot(zr, bur_, dn_min3, precision)
                      - _dot(zi, bui_, dn_min3, precision))
                ei = (_dot(zr, bui_, dn_min3, precision)
                      + _dot(zi, bur_, dn_min3, precision))
                ert = jnp.swapaxes(er, 0, 1)
                eit = jnp.swapaxes(ei, 0, 1)
                out = (_dot(cr_, ert[:nbh], dn_lead, precision)
                       + _dot(ci_, eit[:nbh], dn_lead, precision))
                out_ref[0, o] = out
                return carry

            jax.lax.fori_loop(0, cout, per_out, 0)
        else:
            out_ref[...] = jnp.zeros((1, cout, vh, vdp, 128), jnp.float32)
    return body


mat_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
spec_block = lambda: pl.BlockSpec(  # noqa: E731
    (8, cin, cout, nbhp, 128), lambda b_: (0, 0, 0, 0, 0),
    memory_space=pltpu.VMEM)


def make_call(**kw):
    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  spec_block(), spec_block()]
        + [mat_spec() for _ in range(16)],
        out_specs=pl.BlockSpec((1, cout, vh, vdp, 128),
                               lambda b_: (b_, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, h, pp, 128), jnp.float32),
            pltpu.VMEM((pp, nbhp, 128), jnp.float32),
            pltpu.VMEM((pp, nbhp, 128), jnp.float32),
            pltpu.VMEM((cin, r_, nbhp, 128), jnp.float32),
            pltpu.VMEM((cin, r_, nbhp, 128), jnp.float32),
            pltpu.VMEM((cout, r_, nbhp, 128), jnp.float32),
            pltpu.VMEM((cout, r_, nbhp, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        make_body(**kw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, cout, vh, vdp, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )


x = jnp.asarray(rng.standard_normal((B, CIN, H, pp, 128)).astype(np.float32))
kr = jnp.asarray(
    rng.standard_normal((8, cin, cout, nbhp, 128)).astype(np.float32))
ki = jnp.asarray(
    rng.standard_normal((8, cin, cout, nbhp, 128)).astype(np.float32))
mats = [jnp.asarray(m) for m in Z._mats_v4(H, vh, nbd, pp)]


def prof(name, call):
    fn = jax.jit(lambda a, b_, c: call(a, b_, c, *mats))
    t = min(benchmark_fori(fn, x, kr, ki, num_iterations=20,
                           min_work_s=0.05).mean for _ in range(2))
    print(f"  {name:28s} {t*1e3:8.3f} ms", flush=True)
    return t


prof("full kernel", make_call())
prof("no MAC", make_call(mac=False))
prof("no inv", make_call(inv=False))
prof("no fwd", make_call(fwd=False))
prof("fwd w/o D-matmul", make_call(fwd_dmat=False, fwd_bfly=False))
prof("fwd w/o butterfly", make_call(fwd_bfly=False))
prof("base (DMA/out only)", make_call(fwd=False, mac=False, inv=False))
