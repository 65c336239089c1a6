"""Fused 2D FFT convolution — Pallas TPU tile kernel.

v2 design (round 2): 2D overlap-save TILES, not whole-W stripes. Each
(batch, tile-row, tile-col) grid cell runs the entire pipeline in VMEM:

    DMA (Cin, T1, T2) window -> H-axis one-sided DFT (rect MXU matmul) ->
    W-axis full DFT (square MXU matmuls) -> per-out-channel MAC over Cin
    (VPU) -> inverse W DFT -> inverse H irfft, valid rows only ->
    write (V1, Cout, T2) block

Why tiles beat whole-image transforms: a dense DFT matmul costs O(T) per
output sample per axis, so T=128-256 tiles do ~3-4x fewer matmul flops than
the 512-point transforms of the composed path at the benchmark sizes
(reference doc/scripts/generate_benchmark_plot.py:139-148), and the fused
pipeline eliminates every HBM spectra round trip on top. All matmul minor
dims are exactly T2 in {128, 256} lanes — no layout padding anywhere.

Tile geometry: the H FFT length T1 is a whole number of 128-lane MXU
contractions (128 for K1 <= 65), V1 = T1-K1+1 rounded down to 8 (H
windows overlap by K1-1; one-sided: NB1 = T1//2+1 bins); W uses the
smallest T2 in {128, 256} whose valid width V2 = T2-K2+1 keeps the
overlap redundancy sane. Kernel spectra (Cout, Cin/g, NB1, T2) stay
VMEM-resident across all grid cells; eligibility (``fused2d_fits``)
budgets both the resident spectra and the width-scaled per-cell VMEM.

Stride/dilation/groups/padding modes are wrapper transformations around the
unit-stride kernel, exactly as in fused1d.py. Gradients via jax.custom_vjp
with the composed ops as backward (backward of valid cross-correlation is a
pair of FFT convs — SURVEY §3.4).
"""

import os
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import functional as F
from ..ops.spectral import _dft_mats, _irfft_mats, _rfft_mats
from ..utils.shapes import to_ntuple
from . import fused1d
from .fused1d import _dot

# resident kernel-spectra budget (bytes): Cout*NB1*(Cin/g)*T2*8 must fit
_KER_VMEM_BUDGET = 8 * 2**20

# 2D kernel matmul precision. Default bf16x3 (hi/lo split, 3 bf16 MXU passes
# per dot): measured on v5e 2026-08-16 vs full-f32 HIGHEST at the 512^2
# benchmark — 0.524 ms vs 0.781 ms (K=16), 0.704 vs 1.002 (K=34) — with
# relative error ~1.3e-6 (abs mean 2.7e-4 at |out|~200), far inside the
# 5e-5/1e-4 test bar at unit scales.
_PRECISION_2D = "bf16x3"


def set_fused2d_precision(mode: str) -> None:
    """Selects the 2D kernel's matmul precision
    ("highest" | "bf16x3" | "bf16" — see fused1d's mode notes).

    Independent of the 1D kernel's ``fused1d.set_fused_precision`` — each
    fused kernel has its own switch (see the precision note in README)."""
    global _PRECISION_2D
    if mode not in ("highest", "bf16x3", "bf16"):
        raise ValueError(f"unknown fused precision mode: {mode!r}")
    if mode != _PRECISION_2D:
        _PRECISION_2D = mode
        _fused2d_call.cache_clear()


# Tile-kernel generation: "v3" (round 4) stacks re/im into the ROWS of the
# same 2D dots — the H-forward emits [hr; hi] from one f2=[fr; fi] matmul,
# the W-forward runs 2 stacked dots instead of 4, and the inverse runs
# H-first on the stacked [yr; yi] (4 dots at M=V1 instead of 4 at M=NB1 +
# 2 at M=V1; transform order commutes). Rows padded NB1 -> NB1P (multiple
# of 8) keep every stack slice sublane-aligned with zero copies. The MAC
# is UNCHANGED from v2 (per-(o, c) elementwise FMA — the round-3
# batch-channel port that also changed the MAC lost 75%). Pipeline-cycle
# model (M+K per dot): ~25% fewer matmul cycles and ~40% fewer dot
# dispatches per tile at the 512^2 K=16 benchmark shape. Default set by
# TPU measurement (v5e): see the routing note added after the round-4
# sweep. FFTCONV_2D_KERNEL overrides for measurement runs.
_KERNEL2D_VERSION = os.environ.get("FFTCONV_2D_KERNEL", "v2")


def set_fused2d_kernel(version: str) -> None:
    """Selects the 2D tile-kernel generation ("v2" | "v3")."""
    global _KERNEL2D_VERSION
    if version not in ("v2", "v3"):
        raise ValueError(f"unknown fused2d kernel version: {version!r}")
    if version != _KERNEL2D_VERSION:
        _KERNEL2D_VERSION = version
        _fused2d_call.cache_clear()


# Per-bin MAC strategy (the named round-4 "2D MAC" lever — the largest
# remaining VPU block of the tile cell):
#   "loop" — per-(o, c) 4-mult complex FMA: 8 block-ops per (o, c) pair
#   "kara" — 3-mult Karatsuba with THREE separate accumulators (m1 = sum
#            dr*kr, m2 = sum di*ki, m3 = sum (dr+di)*(kr+ki); yr = m1-m2,
#            yi = m3-m1-m2 on the reduced blocks): 6 block-ops per pair
#            + amortized dsum/combine — ~19% fewer VPU block-ops at the
#            benchmark Cin=Cout=8. ksum spectra are an extra XLA-side
#            input (kr+ki, computed once per call / baked in plans).
# Default decided by v5e measurement (scratch/tpu_r4_2dmac.py).
_MAC2D_MODE = "loop"


def set_fused2d_mac(mode: str) -> None:
    """Selects the 2D kernel's per-bin MAC strategy ("loop" | "kara")."""
    global _MAC2D_MODE
    if mode not in ("loop", "kara"):
        raise ValueError(f"unknown fused 2D MAC mode: {mode!r}")
    if mode != _MAC2D_MODE:
        _MAC2D_MODE = mode
        _fused2d_call.cache_clear()


# 2-slot ping-pong x staging (v2 kernel): cell li computes from slot
# li%2 while cell li+1's H-window streams into the other slot, hiding
# the per-cell serial DMA (x windows re-read (K1-1)-row overlaps, so the
# benchmark 512^2 shape moves ~26 MB of x across 10 cells). Cost: one
# extra (Cin, nt2, T1, T2) VMEM slot (~2.6 MB at the benchmark shape).
# Default ON: measured on v5e 2026-08-19 (scratch/tpu_r4_2ddbuf.py) at
# 512^2 B=2 8->8ch — 0.464 vs 0.566 ms at K=16 (-18%), 0.587 vs 0.698
# at K=34 (-16%), identical parity.
_DBUF2D = True


def set_fused2d_dbuf(on: bool) -> None:
    """Toggles the v2 kernel's ping-pong x prefetch (default on)."""
    global _DBUF2D
    if bool(on) != _DBUF2D:
        _DBUF2D = bool(on)
        _fused2d_call.cache_clear()


def _mac_2d(drs, dis, dsum, kr_ref, ki_ref, ks_ref, o, opg, cpg, mac_mode):
    """Per-bin grouped complex MAC over in-channels -> (yr, yi) for out-
    channel ``o``. See _MAC2D_MODE for the two strategies."""
    go = o // opg
    if mac_mode == "kara":
        m1 = m2 = m3 = None
        for cg in range(cpg):
            c = go * cpg + cg
            p1 = drs[c] * kr_ref[o, cg]
            p2 = dis[c] * ki_ref[o, cg]
            p3 = dsum[c] * ks_ref[o, cg]
            m1 = p1 if m1 is None else m1 + p1
            m2 = p2 if m2 is None else m2 + p2
            m3 = p3 if m3 is None else m3 + p3
        return m1 - m2, m3 - m1 - m2
    yr = yi = None
    for cg in range(cpg):
        c = go * cpg + cg
        kro = kr_ref[o, cg]
        kio = ki_ref[o, cg]
        tr = drs[c] * kro - dis[c] * kio
        ti = drs[c] * kio + dis[c] * kro
        yr = tr if yr is None else yr + tr
        yi = ti if yi is None else yi + ti
    return yr, yi
_T2_CANDIDATES = (128, 256)
# benchmarking hook: force the H FFT length (None = heuristic)
_T1_OVERRIDE = None
# per-cell live-VMEM budget: the x scratch (Cin, nt2, T1, T2) and out
# block (V1, Cout, nt2, T2) both scale with image WIDTH via nt2; gate so
# wide images fall back to the composed path instead of failing to
# compile (vmem_limit is 110 MiB)
_CELL2D_VMEM_BUDGET = 72 * 2**20


def fused2d_fits(
    k1: int, k2: int, cin_g: int, cout: int, padded_hw, cin_total=None
) -> bool:
    """True when the fused 2D kernel both has a tile plan AND its per-cell
    VMEM (which scales with image width) fits. The routing gate for
    impl="auto" — must be checked with the PADDED spatial shape.
    ``cin_total`` is the full channel count (the x scratch holds every
    group); defaults to ``cin_g``."""
    plan = tile_plan_2d(k1, k2, cin_g, cout)
    if plan is None:
        return False
    t1, v1, nb1, t2, v2 = plan
    hp, wp = padded_hw
    if k1 > hp or k2 > wp:
        return False
    ow = wp - k2 + 1
    nt2 = -(-ow // v2)
    cin = cin_total if cin_total is not None else cin_g
    # the ping-pong prefetch doubles the x staging slot
    xslots = 2 if _DBUF2D else 1
    return (
        (xslots * cin * t1 + cout * v1) * nt2 * t2 * 4
        <= _CELL2D_VMEM_BUDGET
    )


def tile_plan_2d(k1: int, k2: int, cin_g: int, cout: int):
    """(T1, V1, NB1, T2, V2) or None when no fused configuration fits.

    T1 (the H FFT length) is a whole number of 128-lane MXU contractions
    when the kernel allows it: the H-forward dots contract T1, and
    T1=144 runs TWO K-passes (the second 7/8 empty) where T1=128 runs
    one. V1 = T1-K1+1 rounded down to a multiple of 8 (DMA row offsets
    i*V1 must stay 8-aligned)."""
    if _T1_OVERRIDE is not None:
        t1 = _T1_OVERRIDE
    elif k1 <= 65:
        t1 = 128
    else:
        t1 = -(-(128 + k1 - 1) // 128) * 128
    if t1 < k1 + 8:
        return None
    v1 = (t1 - k1 + 1) // 8 * 8
    nb1 = t1 // 2 + 1
    # kara MAC keeps a third resident spectra array (ksum) in VMEM
    spectra_bytes = 12 if _MAC2D_MODE == "kara" else 8
    for t2 in _T2_CANDIDATES:
        v2 = t2 - k2 + 1
        if v2 < 32:
            continue
        if cout * nb1 * cin_g * t2 * spectra_bytes > _KER_VMEM_BUDGET:
            return None  # larger T2 only costs more
        return t1, v1, nb1, t2, v2
    return None


@lru_cache(maxsize=None)
def _mats_2d(t1: int, nb1: int, t2: int, v1: int):
    """Split-f32 factor matrices: H one-sided fwd (NB1, T1), W full DFT
    (T2, T2) fwd/inv, H irfft rows (V1, NB1)."""
    fr, fi = _rfft_mats(t1)            # (T1, NB1)
    wr, wi = _dft_mats(t2, inverse=False)
    ur, ui = _dft_mats(t2, inverse=True)
    cr, ci = _irfft_mats(t1)           # (NB1, T1)
    out = (
        fr.T, fi.T,                    # (NB1, T1)
        wr, wi,                        # (T2, T2)
        ur, ui,
        np.ascontiguousarray(cr.T[:v1]),   # (V1, NB1)
        np.ascontiguousarray(ci.T[:v1]),
    )
    return tuple(np.ascontiguousarray(m, np.float32) for m in out)


@lru_cache(maxsize=None)
def _mats_2d_v3(t1: int, nb1: int, nb1p: int, t2: int, v1: int):
    """Split-f32 factors for the v3 stacked-rows kernel:
      f2  (2*NB1P, T1)   [fr; fi] one-sided H fwd, zero rows >= NB1
      wr/wi (T2, T2)     W full DFT fwd
      ur/ui (T2, T2)     W full DFT inv
      cz1 (V1, 2*NB1P)   [ cr | ci]: Re of the H-inverse on [yr; yi]
      cz2 (V1, 2*NB1P)   [-ci | cr]: Im of the H-inverse
    The inverse runs H-first (out = Re((C̄ Y) U), matching v2's
    out = cr@Re(YU) + ci@Im(YU) = Re(C̄ (Y U)); transform order
    commutes), so the stacked [yr; yi] MAC result feeds cz1/cz2 directly
    and only two real dots go through the W inverse."""
    fr, fi = _rfft_mats(t1)            # (T1, NB1)
    wr, wi = _dft_mats(t2, inverse=False)
    ur, ui = _dft_mats(t2, inverse=True)
    cr, ci = _irfft_mats(t1)           # (NB1, T1)
    f2 = np.zeros((2 * nb1p, t1), np.float32)
    f2[:nb1] = fr.T
    f2[nb1p:nb1p + nb1] = fi.T
    cz1 = np.zeros((v1, 2 * nb1p), np.float32)
    cz1[:, :nb1] = cr.T[:v1]
    cz1[:, nb1p:nb1p + nb1] = ci.T[:v1]
    cz2 = np.zeros((v1, 2 * nb1p), np.float32)
    cz2[:, :nb1] = -ci.T[:v1]
    cz2[:, nb1p:nb1p + nb1] = cr.T[:v1]
    out = (f2, wr, wi, ur, ui, cz1, cz2)
    return tuple(np.ascontiguousarray(m, np.float32) for m in out)


def _kernel_spectra_2d(kernel: jax.Array, t1: int, nb1: int, t2: int):
    """Conjugated spectra of the (Cout, Cin/g, K1, K2) kernel on the tile
    grid, laid out (Cout, Cin/g, NB1, T2) split re/im — computed in XLA
    (cheap: matrices row-sliced to K taps)."""
    cout, cpg, k1, k2 = kernel.shape
    fr, fi, wr, wi = (jnp.asarray(m) for m in _mats_2d(t1, nb1, t2, 1)[:4])
    fr = fr[:, :k1]
    fi = fi[:, :k1]
    wr_s = wr[:k2]
    wi_s = wi[:k2]
    k = kernel.astype(jnp.float32)
    # H transform: (NB1, K1) x (Cout, Cpg, K1, K2) -> (Cout, Cpg, NB1, K2)
    ar = jnp.einsum("nk,oikw->oinw", fr, k, precision=lax.Precision.HIGHEST)
    ai = jnp.einsum("nk,oikw->oinw", fi, k, precision=lax.Precision.HIGHEST)
    # W transform: contract K2 with (K2, T2)
    hp = lax.Precision.HIGHEST
    br = (
        jnp.einsum("oinw,wz->oinz", ar, wr_s, precision=hp)
        - jnp.einsum("oinw,wz->oinz", ai, wi_s, precision=hp)
    )
    bi = (
        jnp.einsum("oinw,wz->oinz", ar, wi_s, precision=hp)
        + jnp.einsum("oinw,wz->oinz", ai, wr_s, precision=hp)
    )
    # conjugate (cross-correlation); layout (Cout, Cpg, NB1, T2) so the
    # kernel's per-(o, c) MAC slice is a contiguous (NB1, T2) 2D block
    return br, -bi


def _make_kernel_2d(t1, nb1, t2, v1, v2, nt2, cin, cout, groups, precision,
                    mac_mode="loop", dbuf=False):
    cpg = cin // groups
    opg = cout // groups

    def body(
        x_hbm, kr_ref, ki_ref, *rest,
    ):
        if mac_mode == "kara":
            ks_ref, *rest = rest
        else:
            ks_ref = None
        (fr, fi, wr, wi, ur, ui, cr, ci,
         out_ref, x_vmem, dma_sem) = rest
        b = pl.program_id(0)
        i = pl.program_id(1)
        # x is pre-windowed along W in XLA: (B, Cin, nt2, Hpad, T2). One cell
        # processes ALL nt2 W-tiles of an H-block.
        # Only the H (sublane) axis is sliced — sublane offsets i*V1 need
        # 8-alignment only (guaranteed: tile_plan_2d rounds V1 to a multiple
        # of 8); lane-axis DMA offsets would have to be 128-aligned, which
        # the overlapping V2 stride cannot satisfy (Mosaic rejects it).
        if dbuf:
            # 2-slot ping-pong: cell li computes from slot li%2 while the
            # NEXT cell's window streams into the other slot (grid cells
            # run sequentially; slot li+1 was last touched by cell li-1,
            # whose compute is done). Cost: one extra x_vmem slot.
            n1 = pl.num_programs(1)
            li = b * n1 + i
            total = pl.num_programs(0) * n1

            def get_dma(li_, slot):
                return pltpu.make_async_copy(
                    x_hbm.at[li_ // n1, :, :,
                             pl.ds((li_ % n1) * v1, t1), :],
                    x_vmem.at[slot], dma_sem.at[slot],
                )

            @pl.when(li == 0)
            def _first():
                get_dma(0, 0).start()

            @pl.when(li + 1 < total)
            def _prefetch():
                get_dma(li + 1, (li + 1) % 2).start()

            get_dma(li, li % 2).wait()
            xv = x_vmem.at[li % 2]
        else:
            dma = pltpu.make_async_copy(
                x_hbm.at[b, :, :, pl.ds(i * v1, t1), :],
                x_vmem, dma_sem,
            )
            dma.start()
            dma.wait()
            xv = x_vmem

        # Every matmul below is a plain 2D dot with M in {NB1, V1} rows —
        # rank>2 dot_generals with large leading dims make Mosaic unroll
        # one M=1 vector-matmul per leading element (observed: >500 s
        # compiles and 8x MXU under-utilization), so the (W-tile, channel)
        # structure is explicit Python loops over 2D VMEM slices instead.
        frm, fim = fr[...], fi[...]  # (NB1, T1)
        wrm, wim = wr[...], wi[...]  # (T2, T2)
        urm, uim = ur[...], ui[...]
        crm, cim = cr[...], ci[...]  # (V1, NB1)
        dn2 = (((1,), (0,)), ((), ()))

        for j in range(nt2):
            # forward H (one-sided) + W (full) DFTs per in-channel
            drs, dis = [], []
            for c in range(cin):
                a = xv[c, j]  # (T1, T2) real
                hr = _dot(frm, a, dn2, precision)  # (NB1, T2)
                hi = _dot(fim, a, dn2, precision)
                drs.append(
                    _dot(hr, wrm, dn2, precision)
                    - _dot(hi, wim, dn2, precision)
                )
                dis.append(
                    _dot(hr, wim, dn2, precision)
                    + _dot(hi, wrm, dn2, precision)
                )
            # grouped per-bin MAC (VPU) + inverse transforms per out-channel
            dsum = (
                [drs[c] + dis[c] for c in range(cin)]
                if mac_mode == "kara" else None
            )
            for o in range(cout):
                yr, yi = _mac_2d(
                    drs, dis, dsum, kr_ref, ki_ref, ks_ref, o, opg, cpg,
                    mac_mode,
                )
                er = (
                    _dot(yr, urm, dn2, precision)
                    - _dot(yi, uim, dn2, precision)
                )
                ei = (
                    _dot(yr, uim, dn2, precision)
                    + _dot(yi, urm, dn2, precision)
                )
                # inverse H irfft, valid rows only: (V1, NB1) x (NB1, T2)
                out = (
                    _dot(crm, er, dn2, precision)
                    + _dot(cim, ei, dn2, precision)
                )
                out_ref[0, 0, :, o, j, :] = out

    return body


def _make_kernel_2d_v3(t1, nb1p, t2, v1, v2, nt2, cin, cout, groups,
                       precision, mac_mode="loop"):
    """v3 stacked-rows body — see the _KERNEL2D_VERSION note. MAC and DMA
    identical to v2; only the transform dot structure differs."""
    cpg = cin // groups
    opg = cout // groups

    def body(
        x_hbm, kr_ref, ki_ref, *rest,
    ):
        if mac_mode == "kara":
            ks_ref, *rest = rest
        else:
            ks_ref = None
        (f2, wr, wi, ur, ui, cz1, cz2,
         out_ref, x_vmem, dma_sem) = rest
        b = pl.program_id(0)
        i = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[b, :, :, pl.ds(i * v1, t1), :],
            x_vmem, dma_sem,
        )
        dma.start()
        dma.wait()

        f2m = f2[...]                # (2*NB1P, T1)
        wrm, wim = wr[...], wi[...]  # (T2, T2)
        urm, uim = ur[...], ui[...]
        cz1m, cz2m = cz1[...], cz2[...]  # (V1, 2*NB1P)
        dn2 = (((1,), (0,)), ((), ()))

        for j in range(nt2):
            # forward: ONE stacked H dot emits [hr; hi]; two stacked W
            # dots replace four (row slices at NB1P are sublane-aligned)
            drs, dis = [], []
            for c in range(cin):
                a = x_vmem[c, j]                       # (T1, T2) real
                b2 = _dot(f2m, a, dn2, precision)      # (2*NB1P, T2)
                d1 = _dot(b2, wrm, dn2, precision)     # [hr@wr; hi@wr]
                d2 = _dot(b2, wim, dn2, precision)     # [hr@wi; hi@wi]
                drs.append(d1[:nb1p] - d2[nb1p:])      # (NB1P, T2)
                dis.append(d2[:nb1p] + d1[nb1p:])
            # grouped per-bin MAC (VPU, v2-identical; spectra rows padded
            # to NB1P with zeros), then the H-first stacked inverse
            dsum = (
                [drs[c] + dis[c] for c in range(cin)]
                if mac_mode == "kara" else None
            )
            for o in range(cout):
                yr, yi = _mac_2d(
                    drs, dis, dsum, kr_ref, ki_ref, ks_ref, o, opg, cpg,
                    mac_mode,
                )
                y2 = jnp.concatenate([yr, yi], axis=0)  # (2*NB1P, T2)
                zr = _dot(cz1m, y2, dn2, precision)     # (V1, T2)
                zi = _dot(cz2m, y2, dn2, precision)
                out = (
                    _dot(zr, urm, dn2, precision)
                    - _dot(zi, uim, dn2, precision)
                )
                out_ref[0, 0, :, o, j, :] = out

    return body


@lru_cache(maxsize=None)
def _fused2d_call(
    b, nt1, nt2, t1, nb1, t2, v1, v2, cin, cout, groups, precision, interpret,
    version="v2", mac_mode="loop", dbuf=False,
):
    if interpret and precision == "bf16x3":
        precision = "bf16x3_exact"  # see fused1d._dot3
    cpg = cin // groups
    nb1p = -(-nb1 // 8) * 8
    nb1k = nb1p if version == "v3" else nb1  # resident spectra rows
    mat_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    nmats = 7 if version == "v3" else 8
    spectra_spec = lambda: pl.BlockSpec(  # noqa: E731
        (cout, cpg, nb1k, t2), lambda b_, i: (0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # kara mode takes a third resident spectra input (ksum = kr + ki)
    nspectra = 3 if mac_mode == "kara" else 2
    grid_spec = pl.GridSpec(
        grid=(b, nt1),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x in HBM
        ] + [spectra_spec() for _ in range(nspectra)]
        + [mat_spec() for _ in range(nmats)],
        out_specs=pl.BlockSpec(
            (1, 1, v1, cout, nt2, t2),
            lambda b_, i: (b_, i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                ((2, cin, nt2, t1, t2) if dbuf and version != "v3"
                 else (cin, nt2, t1, t2)),
                jnp.float32,
            ),
            (pltpu.SemaphoreType.DMA((2,)) if dbuf and version != "v3"
             else pltpu.SemaphoreType.DMA(())),
        ],
    )
    # per-cell matmul flops (one real mul-add = 2 flops; v3 does the same
    # MACs on padded rows — close enough for the scheduler's estimate)
    cell = 2 * nt2 * t2 * (
        2 * nb1 * t1 * cin           # H fwd
        + 4 * nb1 * cin * t2         # W fwd
        + 4 * nb1 * cout * t2        # W inv
        + 2 * v1 * nb1 * cout        # H inv
    )
    make = _make_kernel_2d_v3 if version == "v3" else _make_kernel_2d
    body_nb1 = nb1p if version == "v3" else nb1
    make_kw = {} if version == "v3" else {"dbuf": dbuf}
    return pl.pallas_call(
        make(t1, body_nb1, t2, v1, v2, nt2, cin, cout, groups,
             precision, mac_mode, **make_kw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, nt1, v1, cout, nt2, t2), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=cell * b * nt1,
            bytes_accessed=(
                b * nt1 * nt2 * (cin * t1 * t2 + v1 * cout * t2)
            ) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def _is_cpu() -> bool:
    return jax.devices()[0].platform == "cpu"


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused2d_core(x_padded, kernel, out_hw: Tuple[int, int], groups: int = 1):
    return _fused2d_forward(x_padded, kernel, out_hw, groups)


def _fused2d_forward(x_padded, kernel, out_hw, groups=1, spectra=None):
    b, cin, hp, wp = x_padded.shape
    cout, cpg, k1, k2 = kernel.shape
    plan = tile_plan_2d(k1, k2, cpg, cout)
    if plan is None:
        raise ValueError("no fused 2D configuration fits this shape")
    t1, v1, nb1, t2, v2 = plan
    oh, ow = out_hw
    nt1 = -(-oh // v1)
    nt2 = -(-ow // v2)

    need_h = (nt1 - 1) * v1 + t1
    x = x_padded.astype(jnp.float32)
    if need_h != hp:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, need_h - hp), (0, 0)))
    # W windows extracted in XLA (O(1) ops: reshape + 2 slices + concat);
    # laid out (B, Cin, nt2, Hpad, T2) so the kernel's DMA slices only the
    # 8-aligned H axis
    from ..ops.tiled import _window_axis

    x = _window_axis(x, 3, t2, v2, nt2)  # (B, Cin, Hpad, nt2, T2)
    x = x.transpose(0, 1, 3, 2, 4)

    kr, ki = (
        spectra
        if spectra is not None
        else _kernel_spectra_2d(kernel.astype(jnp.float32), t1, nb1, t2)
    )
    version = _KERNEL2D_VERSION
    if version == "v3":
        nb1p = -(-nb1 // 8) * 8
        if nb1p != nb1:
            # zero rows multiply zero spectra -> contribute nothing via
            # the zero cz1/cz2 columns; keeps every stack slice 8-aligned
            pad = ((0, 0), (0, 0), (0, nb1p - nb1), (0, 0))
            kr = jnp.pad(kr, pad)
            ki = jnp.pad(ki, pad)
        mats = [jnp.asarray(m) for m in _mats_2d_v3(t1, nb1, nb1p, t2, v1)]
    else:
        mats = [jnp.asarray(m) for m in _mats_2d(t1, nb1, t2, v1)]

    mac_mode = _MAC2D_MODE
    call = _fused2d_call(
        b, nt1, nt2, t1, nb1, t2, v1, v2, cin, cout, groups,
        _PRECISION_2D, _is_cpu(), version, mac_mode, _DBUF2D,
    )
    spectra_args = (kr, ki, kr + ki) if mac_mode == "kara" else (kr, ki)
    out = call(x, *spectra_args, *mats)
    # (B, nt1, V1, Cout, nt2, T2): crop W valid, stitch, crop to out_hw
    out = out[:, :, :, :, :, :v2]
    out = out.transpose(0, 3, 1, 2, 4, 5).reshape(
        b, cout, nt1 * v1, nt2 * v2
    )
    return out[:, :, :oh, :ow]


def _fused2d_fwd(x_padded, kernel, out_hw, groups):
    return _fused2d_forward(x_padded, kernel, out_hw, groups), (
        x_padded, kernel,
    )


def _fused2d_bwd(out_hw, groups, residuals, g):
    x_padded, kernel = residuals
    dx = F.fft_conv_transpose(g, kernel, groups=groups, impl="xla")
    if groups == 1:
        dw = F.fft_conv(
            jnp.swapaxes(x_padded, 0, 1), jnp.swapaxes(g, 0, 1), impl="xla"
        )
        return dx, jnp.swapaxes(dw, 0, 1)
    b, cin = x_padded.shape[:2]
    cout = g.shape[1]
    cpg, opg = cin // groups, cout // groups
    xg = x_padded.reshape(b, groups, cpg, *x_padded.shape[2:])
    xg = jnp.moveaxis(xg, (1, 2), (0, 1))
    gg = g.reshape(b, groups, opg, *g.shape[2:])
    gg = jnp.moveaxis(gg, (1, 2), (0, 1))
    dw = jax.vmap(lambda a, c: F.fft_conv(a, c, impl="xla"))(xg, gg)
    dw = jnp.swapaxes(dw, 1, 2).reshape(cout, cpg, *dw.shape[3:])
    return dx, dw


_fused2d_core.defvjp(_fused2d_fwd, _fused2d_bwd)


def fft_conv2d_fused(
    signal: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    padding=0,
    padding_mode: str = "constant",
    stride=1,
    dilation=1,
    groups: int = 1,
) -> jax.Array:
    """Fused-Pallas 2D FFT convolution; torch conv2d semantics for the
    supported surface (any padding/padding_mode/stride/dilation/groups with
    a fitting tile plan). Falls back to the composed path when no plan fits.
    """
    if signal.ndim != 4 or kernel.ndim != 4:
        raise ValueError(
            "fft_conv2d_fused expects (B, Cin, H, W) and (Cout, Cin/g, K1, K2)"
        )
    padding_ = to_ntuple(padding, 2)
    stride_ = to_ntuple(stride, 2)
    dilation_ = to_ntuple(dilation, 2)
    kernel = F._dilate_kernel(kernel, dilation_)
    x = F._pad_signal(signal, padding_, padding_mode)
    b, cin, hp, wp = x.shape
    cout, cpg, k1, k2 = kernel.shape
    if cpg * groups != cin:
        raise ValueError(
            f"kernel Cin/groups {cpg} x groups {groups} != signal Cin {cin}"
        )
    if cout % groups:
        raise ValueError(f"out_channels {cout} not divisible by groups {groups}")
    if k1 > hp or k2 > wp:
        raise ValueError("Kernel size can't be greater than actual input size")

    oh, ow = hp - k1 + 1, wp - k2 + 1
    if not fused2d_fits(k1, k2, cpg, cout, (hp, wp), cin_total=cin):
        out = F.fft_conv(signal, kernel, None, padding=padding_,
                         groups=groups, padding_mode=padding_mode, impl="xla")
    else:
        out = _fused2d_core(
            x.astype(jnp.float32), kernel.astype(jnp.float32), (oh, ow),
            groups,
        )
    if stride_ != (1, 1):
        out = out[:, :, ::stride_[0], ::stride_[1]]
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1)
    return out.astype(signal.dtype)


def plan_fft_conv2d(
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    padding=0,
    padding_mode: str = "constant",
    *,
    signal_hw,
):
    """Serving-mode plan: the kernel's per-tile 2D spectra are computed
    ONCE and the returned jitted callable only transforms the signal
    (measured ~2% at 512^2 K=16 where the spectra are cheap; the saving
    scales with K^2 x channels). Fused surface only: groups=1, stride=1,
    dilation=1; caller gates on ``tile_plan_2d``."""
    if kernel.ndim != 4:
        raise ValueError("plan_fft_conv2d expects (Cout, Cin, K1, K2)")
    padding_ = to_ntuple(padding, 2)
    h, w = signal_hw
    cout, cin, k1, k2 = kernel.shape
    hp = h + 2 * padding_[0]
    wp = w + 2 * padding_[1]
    # full fused2d_fits gate, not just tile_plan_2d: the per-cell VMEM
    # scales with image width (nt2), so a wide image must be rejected here
    # rather than failing Mosaic compilation at call time
    if not fused2d_fits(k1, k2, cin, cout, (hp, wp)):
        raise ValueError(
            "no fused 2D configuration fits this shape (tile plan or "
            "per-cell VMEM budget)"
        )
    plan = tile_plan_2d(k1, k2, cin, cout)
    t1, v1, nb1, t2, v2 = plan
    if k1 > hp or k2 > wp:
        raise ValueError("Kernel size can't be greater than actual input size")
    out_hw = (hp - k1 + 1, wp - k2 + 1)

    kernel = kernel.astype(jnp.float32)
    kr, ki = _kernel_spectra_2d(kernel, t1, nb1, t2)
    kr = jax.device_put(kr)
    ki = jax.device_put(ki)

    @jax.jit
    def planned(signal):
        if signal.shape[2:] != (h, w):
            raise ValueError(
                f"plan serves spatial shape {(h, w)}, got {signal.shape[2:]}"
            )
        x = F._pad_signal(signal, padding_, padding_mode)
        out = _fused2d_core_planned(
            x.astype(jnp.float32), kernel, kr, ki, out_hw
        )
        if bias is not None:
            out = out + bias.reshape(1, -1, 1, 1)
        return out.astype(signal.dtype)

    return planned


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused2d_core_planned(x_padded, kernel, kr, ki, out_hw):
    return _fused2d_forward(x_padded, kernel, out_hw, 1, spectra=(kr, ki))


def _fused2d_planned_fwd(x_padded, kernel, kr, ki, out_hw):
    out = _fused2d_forward(x_padded, kernel, out_hw, 1, spectra=(kr, ki))
    return out, (x_padded, kernel)


def _fused2d_planned_bwd(out_hw, residuals, g):
    dx, dw = _fused2d_bwd(out_hw, 1, residuals, g)
    return dx, dw, None, None


_fused2d_core_planned.defvjp(_fused2d_planned_fwd, _fused2d_planned_bwd)


def fft_conv_transpose2d_fused(
    signal: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    padding=0,
    stride=1,
    dilation=1,
    groups: int = 1,
    output_padding=0,
) -> jax.Array:
    """Fused-Pallas 2D transposed convolution, full argument surface.

    Full correlation of the interior-zero-stuffed signal with the flipped,
    (Cin,Cout)-swapped, dilated kernel (reference functional.py:109-139),
    cropped by ``padding`` per side — one ``lax.pad`` builds the stride
    upsampling plus the full-conv borders, then the unit-stride fused tile
    kernel runs unchanged (see fft_conv_transpose1d_fused)."""
    if signal.ndim != 4 or kernel.ndim != 4:
        raise ValueError(
            "fft_conv_transpose2d_fused expects (B, Cin, H, W), "
            "(Cin, Cout/g, K1, K2)"
        )
    padding_ = to_ntuple(padding, 2)
    stride_ = to_ntuple(stride, 2)
    dilation_ = to_ntuple(dilation, 2)
    output_padding_ = to_ntuple(output_padding, 2)
    cin, cout_g, k1, k2 = kernel.shape
    if signal.shape[1] != cin:
        raise ValueError(f"kernel Cin {cin} != signal Cin {signal.shape[1]}")
    if cin % groups:
        raise ValueError(f"in_channels {cin} not divisible by groups {groups}")
    w = jnp.flip(kernel, axis=(2, 3))
    w = w.reshape(groups, cin // groups, cout_g, k1, k2)
    w = jnp.swapaxes(w, 1, 2).reshape(groups * cout_g, cin // groups, k1, k2)
    w = F._dilate_kernel(w, dilation_)
    kd1, kd2 = w.shape[2:]
    out_hw = tuple(
        (s - 1) * t - 2 * p + kd + op
        for s, t, p, kd, op in zip(
            signal.shape[2:], stride_, padding_, (kd1, kd2), output_padding_
        )
    )
    if out_hw[0] < 1 or out_hw[1] < 1:
        raise ValueError(f"non-positive output size {out_hw}")
    config = [(0, 0, 0), (0, 0, 0)] + [
        (kd - 1, kd - 1 + op, t - 1)
        for kd, op, t in zip((kd1, kd2), output_padding_, stride_)
    ]
    x = lax.pad(signal, jnp.zeros((), signal.dtype), config)
    out = fft_conv2d_fused(x, w, None, groups=groups)
    out = lax.slice(
        out,
        (0, 0, padding_[0], padding_[1]),
        (out.shape[0], out.shape[1],
         padding_[0] + out_hw[0], padding_[1] + out_hw[1]),
    )
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1)
    return out
