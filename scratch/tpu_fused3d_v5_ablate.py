"""TPU ablation of the fused3d v5 (batch-channel) kernel stages at the
64^3 K=8^3 benchmark shape. Cumulative variants; each writes a slice of
its last live intermediate to out_ref so Mosaic can't DCE the stages.
Attributes the 0.59 ms kernel: DMA / H fwd / W fwd+transpose / D fwd +
butterfly / MAC / D inv + W inv / H inv."""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused3d as Z
from fft_conv_tpu.kernels.fused1d import _dot

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)

B, CIN, COUT, L, K = 2, 8, 8, 64, 8
_, nbh, nbhp, pp, nbd, vdp = Z.plan_3d(CIN, COUT, L, L, L, K, K, K)
vh = L - K + 1
h = L
cin, cout = CIN, COUT
r_ = 8 * nbd
nch = nbhp // 8
precision = Z._PRECISION_3D
print(f"nbh={nbh} nbhp={nbhp} pp={pp} nbd={nbd} vdp={vdp}", flush=True)

x = rng.standard_normal((B, CIN, L, L, L)).astype(np.float32)
w = rng.standard_normal((COUT, CIN, K, K, K)).astype(np.float32) / K**1.5
xpad = jnp.pad(jnp.asarray(x),
               ((0, 0), (0, 0), (0, 2 * pp - L), (0, 0), (0, 0)))
xp = xpad.reshape(B, CIN, pp, 2, L, Z._TW)
xp = jnp.transpose(xp, (0, 4, 1, 2, 3, 5)).reshape(B, L, CIN * pp, 128)
kr, ki = jax.jit(lambda k_: Z._kernel_spectra_v4(k_, L, nbh, nbhp))(
    jnp.asarray(w))
mats = [jnp.asarray(m) for m in Z._mats_v4(L, vh, nbd, pp)]


def make_body(stages):
    def body(x_hbm, kr_ref, ki_ref,
             f2m, bwr, bwi, bur, bui, g2m, twfr, twfi, twvr, twvi, w2m,
             cr2m, out_ref, tr_s, xd_s, y_s, dma_sem):
        b = pl.program_id(0)
        dn_lead = (((1,), (0,)), ((), ()))
        dn_min3 = (((2,), (0,)), ((), ()))
        f2_ = f2m[...]
        bwr_, bwi_ = bwr[...], bwi[...]
        bur_, bui_ = bur[...], bui[...]
        g2_, w2_ = g2m[...], w2m[...]
        twfr_, twfi_ = twfr[...], twfi[...]
        twvr_, twvi_ = twvr[...], twvi[...]
        cr2_ = cr2m[...]
        lmask = lax.broadcasted_iota(jnp.int32, (r_, nbhp, 128), 2) < Z._TW

        dma = pltpu.make_async_copy(
            x_hbm.at[b],
            xd_s.at[pl.dslice(0, h), pl.dslice(0, cin * pp), :],
            dma_sem,
        )
        dma.start()
        dma.wait()
        if stages == 0:
            out_ref[0] = xd_s[
                pl.dslice(0, vh), pl.dslice(0, cout * vdp), :]
            return

        a = _dot(f2_, xd_s[pl.dslice(0, h), pl.dslice(0, cin * pp), :],
                 dn_lead, precision)
        if stages == 1:
            out_ref[0] = a[:vh, :cout * vdp, :]
            return

        for c in range(cin):
            ac = a[:, c * pp:(c + 1) * pp, :]
            b1 = _dot(ac, bwr_, dn_min3, precision)
            b2 = _dot(ac, bwi_, dn_min3, precision)
            src = b1[:nbhp] - b2[nbhp:]
            sic = b2[:nbhp] + b1[nbhp:]
            tr_s[pl.dslice(0, pp), pl.dslice(c * nbhp, nbhp), :] = (
                jnp.swapaxes(src, 0, 1))
            tr_s[pl.dslice(pp, pp), pl.dslice(c * nbhp, nbhp), :] = (
                jnp.swapaxes(sic, 0, 1))
        if stages == 2:
            out_ref[0] = tr_s[
                pl.dslice(0, vh), pl.dslice(0, cout * vdp), :]
            return

        g = _dot(g2_,
                 tr_s[pl.dslice(0, 2 * pp), pl.dslice(0, cin * nbhp), :],
                 dn_lead, precision)
        for c in range(cin):
            gr = g[:r_, c * nbhp:(c + 1) * nbhp, :]
            gi = g[r_:, c * nbhp:(c + 1) * nbhp, :]
            rr = pltpu.roll(gr, Z._TW, axis=2)
            ri = pltpu.roll(gi, Z._TW, axis=2)
            er = jnp.where(lmask, gr, rr)
            ei = jnp.where(lmask, gi, ri)
            our = jnp.where(lmask, rr, gr)
            oui = jnp.where(lmask, ri, gi)
            xd_s[pl.dslice(0, r_), pl.dslice(c * nbhp, nbhp), :] = (
                er + twfr_ * our - twfi_ * oui)
            xd_s[pl.dslice(r_, r_), pl.dslice(c * nbhp, nbhp), :] = (
                ei + twfr_ * oui + twfi_ * our)
        if stages == 3:
            out_ref[0] = xd_s[
                pl.dslice(0, vh), pl.dslice(0, cout * vdp), :]
            return

        def mac_it(it, carry):
            f8 = it // nch
            ch = (it % nch) * 8
            xs = []
            for c in range(cin):
                xs.append((
                    xd_s[pl.dslice(f8 * nbd, nbd),
                         pl.dslice(c * nbhp + ch, 8), :],
                    xd_s[pl.dslice(r_ + f8 * nbd, nbd),
                         pl.dslice(c * nbhp + ch, 8), :],
                ))
            for o in range(cout):
                ar = ai = None
                for c in range(cin):
                    xr, xi = xs[c]
                    kro = kr_ref[f8, c, o, pl.dslice(ch, 8), :][None]
                    kio = ki_ref[f8, c, o, pl.dslice(ch, 8), :][None]
                    tr = xr * kro - xi * kio
                    ti = xr * kio + xi * kro
                    ar = tr if ar is None else ar + tr
                    ai = ti if ai is None else ai + ti
                y_s[pl.dslice(f8 * nbd, nbd),
                    pl.dslice(o * nbhp + ch, 8), :] = ar
                y_s[pl.dslice(r_ + f8 * nbd, nbd),
                    pl.dslice(o * nbhp + ch, 8), :] = ai
            return carry

        jax.lax.fori_loop(0, 8 * nch, mac_it, 0)
        if stages == 4:
            out_ref[0] = y_s[
                pl.dslice(0, vh), pl.dslice(0, cout * vdp), :]
            return

        for o in range(cout):
            yr = y_s[pl.dslice(0, r_), pl.dslice(o * nbhp, nbhp), :]
            yi = y_s[pl.dslice(r_, r_), pl.dslice(o * nbhp, nbhp), :]
            rr = pltpu.roll(yr, Z._TW, axis=2)
            ri = pltpu.roll(yi, Z._TW, axis=2)
            ur = yr + rr
            ui = yi + ri
            dr = yr - rr
            di = yi - ri
            vr = dr * twvr_ - di * twvi_
            vi = dr * twvi_ + di * twvr_
            y_s[pl.dslice(0, r_), pl.dslice(o * nbhp, nbhp), :] = (
                jnp.where(lmask, ur, vr))
            y_s[pl.dslice(r_, r_), pl.dslice(o * nbhp, nbhp), :] = (
                jnp.where(lmask, ui, vi))
        z = _dot(w2_, y_s[...], dn_lead, precision)
        if stages == 5:
            out_ref[0] = z[:vh, :cout * vdp, :]
            return

        for o in range(cout):
            zo = z[:, o * nbhp:(o + 1) * nbhp, :]
            b1 = _dot(zo, bur_, dn_min3, precision)
            b2 = _dot(zo, bui_, dn_min3, precision)
            ero = b1[:vdp] - b2[vdp:]
            eio = b2[:vdp] + b1[vdp:]
            tr_s[pl.dslice(0, nbhp), pl.dslice(o * vdp, vdp), :] = (
                jnp.swapaxes(ero, 0, 1))
            tr_s[pl.dslice(nbhp, nbhp), pl.dslice(o * vdp, vdp), :] = (
                jnp.swapaxes(eio, 0, 1))
        if stages == 6:
            out_ref[0] = tr_s[
                pl.dslice(0, vh), pl.dslice(0, cout * vdp), :]
            return

        out_ref[0] = _dot(
            cr2_,
            tr_s[pl.dslice(0, 2 * nbhp), pl.dslice(0, cout * vdp), :],
            dn_lead, precision,
        )

    return body


def make_call(stages):
    mat_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    spec_block = lambda: pl.BlockSpec(  # noqa: E731
        (8, cin, cout, nbhp, 128), lambda b_: (0, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            spec_block(), spec_block(),
        ] + [mat_spec() for _ in range(12)],
        out_specs=pl.BlockSpec(
            (1, vh, cout * vdp, 128), lambda b_: (b_, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((max(2 * pp, 2 * nbhp),
                        max(cin * nbhp, cout * vdp), 128), jnp.float32),
            pltpu.VMEM((max(2 * r_, h),
                        max(cin * nbhp, cin * pp), 128), jnp.float32),
            pltpu.VMEM((2 * r_, cout * nbhp, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        make_body(stages),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, vh, cout * vdp, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )


names = ["dma", "+H fwd", "+W fwd+T", "+D fwd+bfly", "+MAC",
         "+inv bfly+D", "+inv W+T", "full"]
prev = 0.0
for s in range(8):
    call = make_call(s)
    fn = jax.jit(lambda a, r, i_: call(a, r, i_, *mats))
    jax.block_until_ready(fn(xp, kr, ki))
    t = min(benchmark_fori(fn, xp, kr, ki, num_iterations=20,
                           min_work_s=0.2).mean for _ in range(2))
    print(f"{names[s]:12s} {t*1e3:7.4f} ms  (+{(t-prev)*1e3:6.4f})",
          flush=True)
    prev = t
