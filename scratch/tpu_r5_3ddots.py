"""Round-5 probe: fused3d v5 dot-schedule restructurings at 64^3 K=8^3.

The v5 kernel spends ~0.59 ms in dots vs ~0.26 ms bf16x3-MXU ideal
(ROADMAP lever 1). Variants measured here, e2e Pallas kernel only
(same harness as scratch/tpu_fused3d_v5_ablate.py):

  base    production schedule: per-channel fwd H dot + 2-dot W stages
  hfold   ONE H-fwd dot over the full channel-stacked width (the
          ablation harness's schedule; production chunks per channel)
  nstack  W fwd/inv minor dots run ONCE per chunk against the
          N-stacked [bwr | bwi] (128, 256) factor; halves the minor-dot
          dispatch count (b1/b2 come back as lane-tile slices)
  hf+ns   hfold + nstack
  chunk2  fwd/inv elementwise+transpose chunks process 2 channels per
          iteration (fewer, larger minor dots + fewer transposes)
  all     hfold + nstack + chunk2

Parity: every variant's output is compared to base (identical math
order for nstack => expect ~0 err; chunk/hfold reorder adds only
rounding). Usage: timeout 3000 python -u scratch/tpu_r5_3ddots.py
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")

from fft_conv_tpu.bench.harness import benchmark_fori  # noqa: E402
from fft_conv_tpu.kernels import fused3d as Z  # noqa: E402
from fft_conv_tpu.kernels.fused1d import _dot  # noqa: E402

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
base_mats = [jnp.asarray(m) for m in Z._mats_v4(L, vh, nbd, pp)]
# N-stacked W factors: [bwr | bwi] and [bur | bui], (128, 256)
(f2m, bwr, bwi, bur, bui, g2m, twfr, twfi, twvr, twvi, w2m, cr2m) = base_mats
bw2 = jnp.concatenate([bwr, bwi], axis=1)
bu2 = jnp.concatenate([bur, bui], axis=1)
mats = base_mats + [bw2, bu2]


def make_body(hfold, nstack, chunk):
    def body(x_hbm, kr_ref, ki_ref,
             f2ref, bwrr, bwir, burr, buir, g2r, twfrr, twfir, twvrr,
             twvir, w2r, cr2r, bw2r, bu2r, out_ref, tr_s, xd_s, y_s,
             dma_sem):
        b = pl.program_id(0)
        dn_lead = (((1,), (0,)), ((), ()))
        dn_min3 = (((2,), (0,)), ((), ()))
        f2_ = f2ref[...]
        bwr_, bwi_ = bwrr[...], bwir[...]
        bur_, bui_ = burr[...], buir[...]
        bw2_, bu2_ = bw2r[...], bu2r[...]
        g2_, w2_ = g2r[...], w2r[...]
        twfr_, twfi_ = twfrr[...], twfir[...]
        twvr_, twvi_ = twvrr[...], twvir[...]
        cr2_ = cr2r[...]
        lmask = lax.broadcasted_iota(jnp.int32, (r_, nbhp, 128), 2) < Z._TW

        dma = pltpu.make_async_copy(
            x_hbm.at[b],
            xd_s.at[pl.dslice(0, h), pl.dslice(0, cin * pp), :],
            dma_sem,
        )
        dma.start()
        dma.wait()

        # fwd H + W + transpose into D-leading stacked layout
        if hfold:
            a = _dot(f2_, xd_s[pl.dslice(0, h), pl.dslice(0, cin * pp), :],
                     dn_lead, precision)
        for c0 in range(0, cin, chunk):
            nc = min(chunk, cin - c0)
            if hfold:
                ac = a[:, c0 * pp:(c0 + nc) * pp, :]
            else:
                xc = xd_s[pl.dslice(0, h), pl.dslice(c0 * pp, nc * pp), :]
                ac = _dot(f2_, xc, dn_lead, precision)
            if nstack:
                b12 = _dot(ac, bw2_, dn_min3, precision)
                b1 = b12[:, :, :128]
                b2 = b12[:, :, 128:]
            else:
                b1 = _dot(ac, bwr_, dn_min3, precision)
                b2 = _dot(ac, bwi_, dn_min3, precision)
            src = b1[:nbhp] - b2[nbhp:]
            sic = b2[:nbhp] + b1[nbhp:]
            for j in range(nc):
                c = c0 + j
                tr_s[pl.dslice(0, pp), pl.dslice(c * nbhp, nbhp), :] = (
                    jnp.swapaxes(src[:, j * pp:(j + 1) * pp, :], 0, 1))
                tr_s[pl.dslice(pp, pp), pl.dslice(c * nbhp, nbhp), :] = (
                    jnp.swapaxes(sic[:, j * pp:(j + 1) * pp, :], 0, 1))

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

        # inverse W + transpose back into H-leading stacked layout
        for o0 in range(0, cout, chunk):
            nc = min(chunk, cout - o0)
            zo = z[:, o0 * nbhp:(o0 + nc) * nbhp, :]
            if nstack:
                b12 = _dot(zo, bu2_, dn_min3, precision)
                b1 = b12[:, :, :128]
                b2 = b12[:, :, 128:]
            else:
                b1 = _dot(zo, bur_, dn_min3, precision)
                b2 = _dot(zo, bui_, dn_min3, precision)
            ero = b1[:vdp] - b2[vdp:]
            eio = b2[:vdp] + b1[vdp:]
            for j in range(nc):
                o = o0 + j
                tr_s[pl.dslice(0, nbhp), pl.dslice(o * vdp, vdp), :] = (
                    jnp.swapaxes(ero[:, j * nbhp:(j + 1) * nbhp, :], 0, 1))
                tr_s[pl.dslice(nbhp, nbhp), pl.dslice(o * vdp, vdp), :] = (
                    jnp.swapaxes(eio[:, j * nbhp:(j + 1) * nbhp, :], 0, 1))

        out_ref[0] = _dot(
            cr2_,
            tr_s[pl.dslice(0, 2 * nbhp), pl.dslice(0, cout * vdp), :],
            dn_lead, precision,
        )

    return body


def make_call(hfold, nstack, chunk):
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
        ] + [mat_spec() for _ in range(14)],
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
        make_body(hfold, nstack, chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, vh, cout * vdp, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )


import os
_ONLY = os.environ.get("DOTS_ONLY", "")
VARIANTS = [
    ("base", (False, False, 1)),
    ("hfold", (True, False, 1)),
    ("nstack", (False, True, 1)),
    ("hf+ns", (True, True, 1)),
    ("chunk2", (False, False, 2)),
    ("all", (True, True, 2)),
]
if _ONLY:
    keep = _ONLY.split(",")
    VARIANTS = [v for v in VARIANTS if v[0] in keep or v[0] == "base"]

ref_out = None
for name, (hf, ns, ck) in VARIANTS:
    try:
        call = make_call(hf, ns, ck)
        fn = jax.jit(lambda a, r, i_: call(a, r, i_, *mats))
        out = np.asarray(fn(xp, kr, ki))
        if ref_out is None:
            ref_out = out
        err = np.abs(out - ref_out).max()
        t = min(benchmark_fori(fn, xp, kr, ki, num_iterations=20,
                               min_work_s=0.2).mean for _ in range(2))
        print(f"{name:8s} {t*1e3:7.4f} ms  maxerr={err:.3e}", flush=True)
    except Exception as e:
        print(f"{name:8s} FAILED {type(e).__name__}: {e}", flush=True)
