"""Fused 3D FFT convolution — Pallas TPU whole-volume kernels.

Two kernel generations ship here; ``plan_3d`` picks per shape:

v4 "overlap-save-D" (KD <= 9, the primary path): transforms ALL three
axes so the MAC is a pointwise frequency product (contraction over Cin
only) instead of v2/v3's KD-tap time-domain MAC — ~KD x fewer VPU flops
(the measured bottleneck: 0.54 of the 0.93 ms v3 kernel at the 64^3
benchmark). The D axis is cut into length-16 blocks on an 8-sample hop
(blocks start at even d so the d-pair lane packing below survives); each
block's DFT-16 is one windowed MXU matmul over d-pair pages (the E/O
radix-2 halves coming out in the two lane halves simultaneously) plus a
packed butterfly (lane roll + select + per-page twiddle), with the 16
bins stored as 8 page-rows x 2 lane halves — full-lane occupancy
throughout. Layout bridges between the H-leading and D-leading matmul
stages are Mosaic page<->sublane transposes (measured near-free on v5e).
Kernel spectra sampled at the 16 D-bins cost 16/KD x the tap-domain
storage — (8, Cin, Cout, NBHP, 128) x2 stays inside the VMEM budget.

v5 (round 3) stacks the v4 pipeline batch-channel style: channels ride
the page dim and re/im ride stacked matmul rows (factor matrices f2/g2/
w2/cr2 in _mats_v4), so each grid cell runs 8 full-width matmuls instead
of ~10*(Cin+Cout) per-channel ones — kernel 0.83 -> 0.59 ms at the 64^3
benchmark; with the all-matmul spectra below, end-to-end 0.94 ms (5.6x
vs XLA direct conv; composed was 2.15).

v2/v3 "tap" (9 < KD, fallback): D stays in the tap domain; a
register-blocked VPU MAC walks (NBH-row, 8-page) blocks. History: v1
(round 2) lost to the composed path (2.31 vs 2.08 ms at the reference
benchmark shape 64^3 K=8^3, reference
doc/scripts/generate_benchmark_plot.py:149-158) for three measured
reasons: the W axis was zero-padded 64 -> 128 lanes (2x wasted flops and
VPU lanes), the one-sided H matmuls ran at M=33 of 128 rows against a
128-wide volume, and the D-tap MAC did KD x the work on those 2x-padded
lanes. v2 removes the padding waste entirely:

  PACKED LANES — two consecutive D-slabs share one 128-lane tile:
      xp[c, h, p, 64*s + w] = x[c, 2p + s, h, w]
  so every matmul minor dim is a FULL 128-lane tile of real data.

  W axis — 64-point full DFT per lane half via a BLOCK-DIAGONAL
      (128, 128) matrix diag(F64, F64): one merged rank-4 minor-dim
      matmul transforms both slabs of every tile at once. The transform
      length equals W, so the conv is circular — valid outputs
      [0, W-KW+1) never see wraparound (reference crop semantics,
      functional.py:76-82), zero padding flops.

  H axis — one-sided 64-point rfft contracting the LEADING dim of
      (H, P, 128) per channel (single matmul; minor dims collapse to
      whole 128-lane tiles — the Mosaic lowering rule from v1).

  D axis — tap-domain MAC in the 2D spectral domain, but on packed
      lanes. Even taps kd=2m are pair-aligned: out_pair[p] += spec
      pair [p+m] * W[2m] (both lane halves use the same kernel value).
      Odd taps need the half-shifted pairing (x[2p+1], x[2p+2]); that
      is exactly the HALF-LANE ROLL of the spectra combined with a
      page shift, so the kernel precomputes R = roll(S, 64 lanes) once
      and gives the R-taps lane-half-DEPENDENT kernel spectra:
          KR[m'].low  = W[2m'+1]   (page offset m')
          KR[m'].high = W[2m'-1]
      The MAC stays the proven dynamic-ref-slice fori_loop of v1 —
      no misaligned DMAs, no cross-page shuffles in the loop.

All dots run bf16x3 by default (hi/lo split, 3 MXU passes — see fused1d).
Kernel per-tap spectra are computed in XLA (two dense matmul einsums),
conjugated, and stay VMEM-resident. Gradients via jax.custom_vjp with the
composed ops as backward (SURVEY §3.4), matching fused1d/fused2d.

Reference semantics: functional.py:19-89 (fft_conv), valid cross-
correlation of the padded signal, torch conv3d convention.
"""

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
from .fused1d import _dot

# resident kernel-spectra budget: Cout*T*Cin*NBH*128*8 bytes
_KER_VMEM_BUDGET = 24 * 2**20
# per-cell VMEM budgets for the signal-side scratch (x + spectra + out +
# the largest live values). The v4 gate counts its static scratch, the
# stacked G/Z values AND the per-channel chunk temporaries; 96 +
# _KER_VMEM_BUDGET fits the 128 MB vmem_limit. The tap path keeps the
# round-2-validated 80 MB bound (its estimate was never re-validated at
# a higher mark).
_VOL_VMEM_BUDGET = 96 * 2**20
_TAP_VMEM_BUDGET = 80 * 2**20

# W-axis transform length: one lane HALF. Two D-slabs pack per 128-lane
# tile, each transformed by its own F64 block of the block-diagonal matrix.
_TW = 64

# 3D kernel matmul precision (independent switch, like fused2d's)
_PRECISION_3D = "bf16x3"


def set_fused3d_precision(mode: str) -> None:
    """Selects the 3D kernel's matmul precision
    ("highest" | "bf16x3" | "bf16" — see fused1d's mode notes).

    Independent of the 1D/2D switches (``fused1d.set_fused_precision``,
    ``fused2d.set_fused2d_precision``)."""
    global _PRECISION_3D
    if mode not in ("highest", "bf16x3", "bf16"):
        raise ValueError(f"unknown fused precision mode: {mode!r}")
    if mode != _PRECISION_3D:
        _PRECISION_3D = mode
        _fused3d_call.cache_clear()
        _fused3d_call_v4.cache_clear()


# Pointwise-frequency MAC strategy of the v4 kernel body (the mac_it
# fori walk): "loop" = 4-mult complex FMA per (o, ci) pair (8 block-ops);
# "kara" = 3-mult Karatsuba with three accumulators (6 block-ops + an
# on-the-fly ksum add on the (1, 8, 128) kernel row — 1/NBD of a block
# op, so no third resident spectra array is needed, unlike fused2d's
# kara which would add ~10 MB of VMEM at the benchmark shape).
# Default decided by v5e measurement (scratch/tpu_r4_3dmac.py).
_MAC3D_MODE = "loop"


def set_fused3d_mac(mode: str) -> None:
    """Selects the v4 kernel's pointwise MAC strategy ("loop" | "kara")."""
    global _MAC3D_MODE
    if mode not in ("loop", "kara"):
        raise ValueError(f"unknown fused 3D MAC mode: {mode!r}")
    if mode != _MAC3D_MODE:
        _MAC3D_MODE = mode
        _fused3d_call_v4.cache_clear()


# Split-DMA x staging in the v4 kernel: the fwd H/W transform consumes
# x one channel at a time, so the cell's single big x copy can be split
# into CIN per-channel DMAs (disjoint XD regions, all started up front,
# each waited right before its channel's matmuls) — later channels' HBM
# traffic would stream under earlier channels' compute. MEASURED DEAD
# END on v5e (2026-08-18, scratch/tpu_r4_3ddbuf.py): at the benchmark
# shape (64^3, 8ch) Mosaic's register allocator already spills 44.4 MiB
# to VMEM, and BOTH overlap variants push the program past the 128 MiB
# cap — a dedicated 2-slot ping-pong staging buffer (134.3M) and this
# zero-extra-buffer split-DMA form (131.8M; the interleaved DMA waits
# extend live ranges across the fwd loop and grow the spill). dbuf=False
# (single up-front DMA, 0.574 ms kernel) is the only shippable form;
# the toggle is kept for re-probing if Mosaic's allocator improves.
_DBUF3D = False


def set_fused3d_dbuf(mode) -> None:
    """Selects the v4 kernel's x-staging DMA form (A/B probes).

    False — one big copy, start+wait up front (the shipping form).
    "par" — CIN per-channel copies, ALL started then ALL waited up
            front: identical live ranges to False (no interleave into
            the fwd loop), probing whether parallel DMA streams
            aggregate more HBM bandwidth than one descriptor.
    True  — per-channel copies waited inside the fwd loop (the measured
            OOM form; kept for re-probing if Mosaic's allocator
            improves)."""
    global _DBUF3D
    if mode not in (False, True, "par"):
        raise ValueError(f"unknown fused 3D dbuf mode: {mode!r}")
    if mode != _DBUF3D:
        _DBUF3D = mode
        _fused3d_call_v4.cache_clear()


# ANY-space spectra staging ("kany"): the XLA-side kernel spectra
# (~21 MB at the 64^3 benchmark shape) normally enter as VMEM input
# blocks, so the Pallas prologue copies them HBM->VMEM *before* grid
# cell 0 runs — fully exposed HBM traffic (the stage-0 ablation block,
# scratch/tpu_fused3d_v5_ablate.py, is ~27% of the kernel). kany passes
# them as pl.ANY operands instead and the kernel itself DMAs them into
# persistent VMEM scratch at cell 0 — started right after the x copy,
# waited only before the MAC — so the copy rides under the fwd-transform
# compute. VMEM-neutral: the scratch replaces the input-block buffer.
_KANY3D = False


def set_fused3d_kany(on: bool) -> None:
    """Toggles ANY-space spectra staging in the v4 kernel (A/B probes).
    Mutually exclusive with inline spectra (inline wins when both on)."""
    global _KANY3D
    if bool(on) != _KANY3D:
        _KANY3D = bool(on)
        _fused3d_call_v4.cache_clear()


# In-kernel kernel-spectra computation (v4 path): the XLA-side
# _kernel_spectra_v4 materializes ~21 MB of (8, Cin/g, Cout, NBHP, 128)
# intermediates through HBM every call (~0.17 ms at the 64^3 benchmark
# shape, HBM-bound) and the kernel then loads the result back as a VMEM
# input block. Inline mode instead ships the RAW taps (KD*Cpg*Cout,
# KH*KW floats) plus three small factor matrices, and grid cell 0
# computes the spectra straight into a persistent VMEM scratch with the
# same all-matmul formulation (HIGHEST precision, identical math) —
# zero spectra HBM traffic. Cells b>0 reuse the scratch (TPU grid cells
# run sequentially on the core; scratch persists across them).
# Default OFF — measured dead end on v5e (2026-08-19): at the 64^3
# benchmark shape the inline kernel fails Mosaic allocation (133.74M >
# the 128M vmem cap; the non-inline kernel already spills ~44M), and a
# weight-chained timing loop puts the XLA-side spectra it would replace
# at only ~5 us/step in-loop (0.948 vs 0.943 ms) — the 0.17 ms
# standalone spectra dispatch does not survive inside a compiled step.
# Shapes where it fits (``_inline_fits_v4``) can re-probe via this
# toggle; forwards where it does not fit fall back to non-inline v4.
_INLINE3D = False


def set_fused3d_inline(on: bool) -> None:
    """Toggles in-kernel v4 spectra computation (A/B probes). Only
    shapes that pass ``_inline_fits_v4`` actually run inline; the rest
    keep the XLA-side spectra path."""
    global _INLINE3D
    _INLINE3D = bool(on)


# v4 x-pack layout: how the wrapper lays x out in HBM and how the kernel
# assembles the (H, PP, 128) channel slabs the fwd transforms consume.
#   "h"  — wrapper does the full 6D pad+transpose to (B, H, Cin*PP, 128)
#          (h-major rows, d-pairs packed into 64-lane halves); the kernel
#          DMAs channel windows straight into the XD staging region.
#   "d2" — wrapper keeps h in place and only interleaves the d-pair dim
#          into lanes: (B, Cin*PP, h, 128); the kernel DMAs (PP, H, 128)
#          per channel into a 2-slot ping-pong scratch and outer-swaps to
#          (H, PP, 128) (near-free page/sublane permute).
#   "d0" — wrapper is PURE pad+reshape: (B, Cin*D, h, 128) with w padded
#          to all 128 lanes (2x HBM bytes); the kernel de-interleaves the
#          d-pairs itself (leading-dim split + outer swaps + lane roll).
# Motivation (v5e 2026-08-19, scratch/tpu_r4_barrier.py): the "h" pack
# reads 0.027 ms standalone but ~0.14 ms when it shares a jit program
# with the Mosaic call, and optimization_barrier does not recover it —
# these modes move the reordering into the kernel to dodge whatever the
# in-context lowering penalty is. MEASURED (v5e 2026-08-19,
# scratch/tpu_r4_xpack.py, 64^3 K=8^3 same session): "h2" — the same
# destination layout reached by two clean XLA transposes (minor d-pair
# interleave, then a rank-3 whole-lane page transpose) — recovers most
# of the penalty: 0.702 ms e2e vs "h" 0.786 (-11%). In-kernel
# reordering is a dead end: "d2" 0.835 (the per-channel outer swaps
# inside the main kernel cost more than the wrapper pack they replace),
# "d0" fails Mosaic allocation at 64^3 (staging can't carve into XD and
# a dedicated scratch blows the 128M cap), and the dedicated pack
# kernel "pk" reads 0.903 (its extra dispatch + full HBM round trip of
# x outweighs the fusion-codegen penalty it dodges).
_XPACK3D = "h2"


def set_fused3d_xpack(mode: str) -> None:
    """Selects the v4 x-pack layout — A/B probes.

    "h" | "d2" | "d0" change the HBM layout the main kernel consumes
    (see above). Two further modes keep the main kernel on the "h"
    layout and only change HOW the wrapper produces it:
      "h2" — the 6D pad+transpose is split into two clean steps (minor
             d-pair interleave, then a rank-3 whole-lane page
             transpose), aiming at XLA's fast transpose emitter.
      "pk" — a dedicated Pallas pack kernel (_pack3d_call) so no XLA
             fusion codegen sits between the pack and the main Mosaic
             call; requires PP % 8 == 0 (sublane-aligned channel
             stores), else silently packs like "h".
    """
    global _XPACK3D
    if mode not in ("h", "d2", "d0", "h2", "pk"):
        raise ValueError(f"unknown fused 3D x-pack mode: {mode!r}")
    _XPACK3D = mode


def _tap_counts(kd: int) -> Tuple[int, int]:
    """(ME, MR): even-tap count and R-tap count (0 when KD has no odd taps).

    Even taps kd=2m, m in [0, ME). R taps m' in [0, MR) carry the odd
    kernel taps split per lane half (see module docstring)."""
    me = (kd + 1) // 2
    mo = kd // 2
    return me, (mo + 1) if mo else 0


@lru_cache(maxsize=None)
def plan_3d(cin: int, cout: int, d: int, h: int, w: int,
            kd: int, kh: int, kw: int, groups: int = 1):
    """Mode-tagged fused-3D plan, or None when nothing fits.

    ('v4', nbh, nbhp, pp, nbd, vdp) — overlap-save-D kernel (kd <= 9):
    blocked DFT-16 along D turns the tap MAC into a pointwise frequency
    MAC (~KD x fewer VPU flops). ('tap', nbh, vdp, pages) — the v3
    tap-domain MAC kernel, kept for larger KD. Eligibility: W fits one
    lane half (see ``plan_3d_blocked`` for wider W), kernel spectra and
    per-cell scratch inside their VMEM budgets. ``cin`` is the TOTAL
    in-channel count; ``groups`` restricts each out-channel's MAC to its
    group's cin/groups slice (static slices in both kernels)."""
    if w > _TW or kd > d or kh > h or kw > w:
        return None
    if cin % groups or cout % groups:
        return None
    v4 = _plan_v4(cin, cout, d, h, w, kd, kh, kw, groups)
    if v4 is not None:
        return v4[:6]  # strip the internal cell-bytes element
    return _plan_tap(cin, cout, d, h, w, kd, kh, kw, groups)


def plan_3d_blocked(cin: int, cout: int, d: int, h: int, w: int,
                    kd: int, kh: int, kw: int, groups: int = 1):
    """(plan, nwb, hop): the W-overlap-save extension of ``plan_3d``.

    W <= 64 runs the kernel directly (nwb=1). Wider W is cut into nwb
    overlapping width-64 blocks on a 64-kw+1 hop, stacked into the batch
    grid dim (each block is a full-lane-occupancy kernel cell); the
    wrapper concatenates the per-block valid outputs. This is what makes
    the fused 3D TRANSPOSED conv possible at the reference benchmark
    shape: the stuffed full-correlation volume at 64^3 K=8 is 78^3, so no
    axis fits one lane half (reference transpose semantics
    functional.py:92-176)."""
    if w <= _TW:
        plan = plan_3d(cin, cout, d, h, w, kd, kh, kw, groups)
        return None if plan is None else (plan, 1, w - kw + 1)
    if kw > _TW:
        return None
    hop = _TW - kw + 1
    ow = w - kw + 1
    nwb = -(-ow // hop)
    plan = plan_3d(cin, cout, d, h, _TW, kd, kh, kw, groups)
    return None if plan is None else (plan, nwb, hop)


def _plan_v4(cin: int, cout: int, d: int, h: int, w: int,
             kd: int, kh: int, kw: int, groups: int = 1):
    """Overlap-save-D plan: D is cut into length-16 blocks on an 8-sample
    hop (blocks start at even d, so the d-pair lane packing survives);
    each block is DFT-16'd by one windowed MXU matmul plus a packed
    radix-2 butterfly (16 bins live in 8 page-rows x 2 lane halves)."""
    if kd > 9:
        return None  # hop = 16 - kd + 1 floored to 8 needs kd <= 9
    if (cin // groups) * cout > 128:
        return None  # MAC unrolls cout*(cin/g) statements per fori body
    if cin > 128:
        return None  # fwd W/butterfly stages unroll one chunk per channel
    nbh = h // 2 + 1
    nbhp = -(-nbh // 8) * 8
    vd = d - kd + 1
    nbd = -(-vd // 8)
    pp = -(-(4 * (nbd - 1) + 8) // 8) * 8
    r = 8 * nbd
    vdp = -(-(4 * nbd) // 8) * 8
    vh = h - kh + 1
    if 8 * (cin // groups) * cout * nbhp * 128 * 8 > _KER_VMEM_BUDGET:
        return None
    # static scratch (XD doubles as x staging, tr is shared fwd/inv) +
    # the largest stacked live values (G / Z, ~2R x C*NBHP) + the
    # per-channel chunk temporaries of the W stages (fwd: ac + b1 + b2 at
    # 2*NBHP x PP plus the combine pair at NBHP x PP ~ 8*NBHP*PP rows;
    # inverse symmetric with VDP)
    cell = (
        max(2 * pp, 2 * nbhp) * max(cin * nbhp, cout * vdp)    # tr
        + max(2 * r, h) * max(cin * nbhp, cin * pp)            # XD / x
        + 2 * r * cout * nbhp                                  # Y
        + vh * cout * vdp                                      # out block
        + 2 * r * max(cin, cout) * nbhp                        # live G / Z
        + 8 * nbhp * max(pp, vdp)                              # chunk temps
    ) * 128 * 4
    # factor matrices (_mats_v4): f2 (2*NBHP, H), 4x block-diag (128,128),
    # g2 (2R, 2PP), 4x twiddles (R, 1, 128), w2 (2*VDP, 2R), cr2 (VH,
    # 2*NBHP) — they scale with H/R/PP and count against the same
    # vmem_limit, so a near-budget cell can't fail Mosaic allocation
    cell += (
        2 * nbhp * h + 4 * 128 * 128 + 2 * r * 2 * pp
        + 4 * r * 128 + 2 * vdp * 2 * r + vh * 2 * nbhp
    ) * 4
    if cell > _VOL_VMEM_BUDGET:
        return None
    return ("v4", nbh, nbhp, pp, nbd, vdp, cell)


@lru_cache(maxsize=None)
def _inline_fits_v4(cin: int, cout: int, d: int, h: int, w: int,
                    kd: int, kh: int, kw: int, groups: int = 1) -> bool:
    """Whether the IN-KERNEL spectra variant fits the v4 VMEM budget.

    Inline mode adds the HW factor pair plus per-n-chunk live
    temporaries (a_r/a_i + the two-dot partials of one 8-bin chunk);
    the kr/ki spectra scratch itself is the same size as the input
    blocks it replaces. Deliberately NOT part of ``_plan_v4``'s gate —
    round-4 lesson: counting these bytes in the plan silently rerouted
    the 64^3 benchmark shape to the tap kernel (0.95 -> 1.27 ms e2e),
    and at that shape the inline kernel indeed fails Mosaic allocation
    (133.74M > the 128M cap, measured 2026-08-19) — so inline-mode
    forwards that don't fit fall back to the NON-inline v4 kernel, not
    to the tap kernel."""
    plan = _plan_v4(cin, cout, d, h, w, kd, kh, kw, groups)
    if plan is None:
        return False
    nbhp, cell = plan[2], plan[6]
    pco = (cin // groups) * cout
    cell += (
        2 * kh * kw * nbhp * 128
        + (4 * kd * pco + 3 * 16 * pco) * 8 * 128
    ) * 4
    return cell <= _VOL_VMEM_BUDGET


def _plan_tap(cin: int, cout: int, d: int, h: int, w: int,
              kd: int, kh: int, kw: int, groups: int = 1):
    nbh = h // 2 + 1
    me, mr = _tap_counts(kd)
    taps = me + mr
    if cout * taps * (cin // groups) * nbh * 128 * 8 > _KER_VMEM_BUDGET:
        return None
    vd = d - kd + 1
    # VDP (MAC block span, sublane dim), the MAC window and the page count
    # must be whole 8-row tiles: Mosaic's leading/minor-dim collapses are
    # layout-free only for whole (8, 128) tiles — otherwise it unrolls one
    # matmul per page and the compile explodes (v1 lesson, >400 s observed)
    vdp = -(-(-(-vd // 2)) // 8) * 8
    maxoff = max(me - 1, mr - 1 if mr else 0)
    wrows = -(-(8 + maxoff) // 8) * 8
    pages = vdp - 8 + wrows
    vh = h - kh + 1
    # x scratch + 4 spectra refs (S/R re+im) + 2 acc refs + out block, f32
    cell = (
        cin * h * pages * 128
        + 4 * cin * nbh * pages * 128
        + 2 * cout * nbh * vdp * 128
        + cout * vh * vdp * 128
    ) * 4
    if cell > _TAP_VMEM_BUDGET:
        return None
    return ("tap", nbh, vdp, pages)


@lru_cache(maxsize=None)
def _mats_3d(h: int, vh: int):
    """Split-f32 factor matrices: H one-sided fwd (NBH, H), block-diagonal
    W full DFT fwd/inv (128, 128), H irfft rows (VH, NBH)."""
    fr, fi = _rfft_mats(h)             # (H, NBH)
    wr, wi = _dft_mats(_TW, inverse=False)
    ur, ui = _dft_mats(_TW, inverse=True)
    cr, ci = _irfft_mats(h)            # (NBH, H)

    def blkdiag(m):
        out = np.zeros((2 * _TW, 2 * _TW), m.dtype)
        out[:_TW, :_TW] = m
        out[_TW:, _TW:] = m
        return out

    out = (
        fr.T, fi.T,                    # (NBH, H)
        blkdiag(wr), blkdiag(wi),      # (128, 128)
        blkdiag(ur), blkdiag(ui),
        np.ascontiguousarray(cr.T[:vh]),   # (VH, NBH)
        np.ascontiguousarray(ci.T[:vh]),
    )
    return tuple(np.ascontiguousarray(m, np.float32) for m in out)


def _kernel_spectra_3d(kernel: jax.Array, h: int, nbh: int):
    """Per-tap 2D spectra of the (Cout, Cin, KD, KH, KW) kernel, conjugated
    and packed for the lane-paired MAC: (Cout, ME+MR, Cin, NBH, 128) split
    re/im. Taps [0, ME) are the even D-taps (same spectrum in both lane
    halves); taps [ME, ME+MR) are the R-taps with half-dependent odd-tap
    spectra (see module docstring). Two dense einsums in XLA — cheap."""
    cout, cin, kd, kh, kw = kernel.shape
    hp = lax.Precision.HIGHEST
    fr, fi = _rfft_mats(h)
    fr = jnp.asarray(fr[:kh].T, jnp.float32)   # (NBH, KH)
    fi = jnp.asarray(fi[:kh].T, jnp.float32)
    wr, wi = _dft_mats(_TW, inverse=False)
    wr_s = jnp.asarray(wr[:kw], jnp.float32)   # (KW, TW)
    wi_s = jnp.asarray(wi[:kw], jnp.float32)
    k = kernel.astype(jnp.float32)
    # H transform: (NBH, KH) x (O, C, KD, KH, KW) -> (O, C, KD, NBH, KW)
    ar = jnp.einsum("nk,ocdkw->ocdnw", fr, k, precision=hp)
    ai = jnp.einsum("nk,ocdkw->ocdnw", fi, k, precision=hp)
    # W transform: contract KW with (KW, TW)
    br = (
        jnp.einsum("ocdnw,wz->ocdnz", ar, wr_s, precision=hp)
        - jnp.einsum("ocdnw,wz->ocdnz", ai, wi_s, precision=hp)
    )
    bi = (
        jnp.einsum("ocdnw,wz->ocdnz", ar, wi_s, precision=hp)
        + jnp.einsum("ocdnw,wz->ocdnz", ai, wr_s, precision=hp)
    )
    bi = -bi  # conjugate: cross-correlation

    me, mr = _tap_counts(kd)

    def pack(b):
        # even taps: duplicate the spectrum into both lane halves
        ke = jnp.concatenate([b[:, :, 0:kd:2], b[:, :, 0:kd:2]], axis=-1)
        parts = [ke]
        if mr:
            zero = jnp.zeros_like(b[:, :, :1])
            odd = b[:, :, 1:kd:2]              # (O, C, MO, NBH, TW)
            lo = jnp.concatenate([odd, zero], axis=2)    # m' < MO
            hi = jnp.concatenate([zero, odd], axis=2)    # m' >= 1
            parts.append(jnp.concatenate([lo, hi], axis=-1))
        # (O, C, T, NBH, 128) -> (NBH, C, T, O, 128): the kernel's MAC
        # reads one contiguous (C, T, O, 128) block per NBH row
        return jnp.transpose(jnp.concatenate(parts, axis=2), (3, 1, 2, 0, 4))

    return pack(br), pack(bi)


@lru_cache(maxsize=None)
def _mats_v4(h: int, vh: int, nbd: int, pp: int):
    """Split-f32 factor matrices for the overlap-save-D kernel, stacked so
    every transform is ONE real matmul over the full channel-batched width
    (channels ride the page/sublane dim; re/im ride stacked rows):

      f2       (2*NBHP, H)     [fr; fi] one-sided H rfft, zero rows >NBH
      bwr/bwi  (128, 128)      block-diagonal W fwd DFT (diag(F64, F64))
      bur/bui  (128, 128)      block-diagonal W inverse
      g2       (2R, 2PP)       [[wd_r, -wd_i], [wd_i, wd_r]]: windowed
                               block DFT-8 over d-pairs applied to the
                               stacked [S_re; S_im] rows; row (f8*NBD+j)
                               reads pages [4j, 4j+8) with w8^{p'f8} —
                               the E/O halves of the block DFT-16 land in
                               the two lane halves at once
      twfr/twfi (R,1,128)      fwd butterfly twiddle +-w16^{f8}
      twvr/twvi (R,1,128)      inverse combine twiddle +-w16^{-f8}
      w2       (2*VDP, 2R)     [[wid_r, -wid_i], [wid_i, wid_r]]: block
                               IDFT-8 rows (j,q) -> d-pair 4j+q, /16
      cr2      (VH, 2*NBHP)    [cr | ci] H irfft rows, zero cols >NBH
    """
    r_ = 8 * nbd
    vdp = -(-(4 * nbd) // 8) * 8
    nbh = h // 2 + 1
    nbhp = -(-nbh // 8) * 8
    fr, fi = _rfft_mats(h)             # (H, NBH)
    f2 = np.zeros((2 * nbhp, h), np.float32)
    f2[:nbh] = fr.T
    f2[nbhp:nbhp + nbh] = fi.T
    wr, wi = _dft_mats(_TW, inverse=False)
    ur, ui = _dft_mats(_TW, inverse=True)
    cr, ci = _irfft_mats(h)            # (NBH, H)
    cr2 = np.zeros((vh, 2 * nbhp), np.float32)
    cr2[:, :nbh] = cr.T[:vh]
    cr2[:, nbhp:nbhp + nbh] = ci.T[:vh]

    def blkdiag(m):
        out = np.zeros((2 * _TW, 2 * _TW), m.dtype)
        out[:_TW, :_TW] = m
        out[_TW:, _TW:] = m
        return out

    def cstack(mr, mi):
        m_, n_ = mr.shape
        out = np.zeros((2 * m_, 2 * n_), np.float32)
        out[:m_, :n_] = mr
        out[:m_, n_:] = -mi
        out[m_:, :n_] = mi
        out[m_:, n_:] = mr
        return out

    wd = np.zeros((r_, pp), np.complex128)
    for f8 in range(8):
        for j in range(nbd):
            ps = np.arange(8)
            wd[f8 * nbd + j, 4 * j:4 * j + 8] = np.exp(
                -2j * np.pi * ps * f8 / 8)
    lane = np.arange(128)
    sgn = np.where(lane < _TW, 1.0, -1.0)
    f8r = (np.arange(r_) // nbd)[:, None]
    twf = sgn[None] * np.exp(-2j * np.pi * f8r / 16)
    twv = sgn[None] * np.exp(2j * np.pi * f8r / 16)
    wid = np.zeros((vdp, r_), np.complex128)
    for j in range(nbd):
        for q in range(4):
            f8s = np.arange(8)
            wid[4 * j + q, f8s * nbd + j] = np.exp(
                2j * np.pi * q * f8s / 8) / 16
    out = (
        f2,
        blkdiag(wr), blkdiag(wi),
        blkdiag(ur), blkdiag(ui),
        cstack(wd.real, wd.imag),
        twf.real[:, None, :], twf.imag[:, None, :],
        twv.real[:, None, :], twv.imag[:, None, :],
        cstack(wid.real, wid.imag),
        cr2,
    )
    return tuple(np.ascontiguousarray(m, np.float32) for m in out)


@lru_cache(maxsize=None)
def _spectra_hw_mat_v4(h: int, kh: int, kw: int, nbhp: int):
    """Joint H(one-sided rfft) x W(DFT-64) spectra factor for the v4
    kernel spectra, laid out (KH*KW, NBHP*TW) split re/im with zero rows
    for the NBH->NBHP pad: M[(k,w), (n,z)] = F[k,n] * W[w,z]."""
    nbh = h // 2 + 1
    fr, fi = _rfft_mats(h)                     # (H, NBH)
    wr, wi = _dft_mats(_TW, inverse=False)     # (TW, TW) [w, z]
    fc = (fr + 1j * fi)[:kh]                   # (KH, NBH)
    wc = (wr + 1j * wi)[:kw]                   # (KW, TW)
    m = np.zeros((kh * kw, nbhp, _TW), np.complex128)
    m[:, :nbh, :] = np.einsum("kn,wz->kwnz", fc, wc).reshape(
        kh * kw, nbh, _TW)
    m = m.reshape(kh * kw, nbhp * _TW)
    return (np.ascontiguousarray(m.real, dtype=np.float32),
            np.ascontiguousarray(m.imag, dtype=np.float32))


@lru_cache(maxsize=None)
def _spectra_dmat_v4(kd: int):
    """Stacked-real D-transform factor for the kernel spectra: (16, 2*KD)
    rows (ri, f8), conjugation folded in. The lane-half (fd = f8 + 8s)
    dependence is NOT here — it rides the operand's lanes via the
    (-1)^(d*s) sign mask from _spectra_dsign_v4."""
    ds = np.arange(kd)[None, :]
    f8 = np.arange(8)[:, None]
    dm0 = np.exp(-2j * np.pi * ds * f8 / 16)         # (8, KD)
    d2 = np.zeros((16, 2 * kd), np.float32)
    d2[:8, :kd] = dm0.real
    d2[:8, kd:] = -dm0.imag
    d2[8:, :kd] = -dm0.imag      # conjugate: cross-correlation
    d2[8:, kd:] = -dm0.real
    return d2


@lru_cache(maxsize=None)
def _spectra_dsign_v4(kd: int):
    """(2*KD, 1, 128) sign mask: lanes >= TW (the fd high-bit half) of
    row d (and kd + d) carry (-1)^d."""
    sgn = np.ones((2 * kd, 1, 128), np.float32)
    for d in range(kd):
        if d % 2:
            sgn[d, :, _TW:] = -1.0
            sgn[kd + d, :, _TW:] = -1.0
    return sgn


@lru_cache(maxsize=None)
def _spectra_hw_inline_v4(h: int, kh: int, kw: int, nbhp: int):
    """Joint H x W spectra factor for the IN-KERNEL v4 spectra, in the
    kernel's final lane layout (KH*KW, NBHP, 128): M[(k1,k2), n, s*TW+z]
    = F[k1,n] * W[k2,z] duplicated into both lane halves (the fd
    high-bit dependence rides the per-d sign mask), zero rows n>=NBH."""
    nbh = h // 2 + 1
    fr, fi = _rfft_mats(h)                     # (H, NBH)
    wr, wi = _dft_mats(_TW, inverse=False)     # (TW, TW)
    fc = (fr + 1j * fi)[:kh]                   # (KH, NBH)
    wc = (wr + 1j * wi)[:kw]                   # (KW, TW)
    m = np.zeros((kh * kw, nbhp, _TW), np.complex128)
    m[:, :nbh, :] = np.einsum("kn,wz->kwnz", fc, wc).reshape(
        kh * kw, nbh, _TW)
    m = np.concatenate([m, m], axis=-1)        # both lane halves
    return (np.ascontiguousarray(m.real, dtype=np.float32),
            np.ascontiguousarray(m.imag, dtype=np.float32))


@lru_cache(maxsize=None)
def _spectra_sgn_inline_v4(kd: int, pco: int):
    """(KD*PCO, 1, 128) sign mask for the in-kernel spectra rows (d-major,
    PCO=(Cin/g)*Cout rows per d): lanes >= TW of odd-d rows carry -1."""
    sgn = np.ones((kd * pco, 1, 128), np.float32)
    for d in range(1, kd, 2):
        sgn[d * pco:(d + 1) * pco, :, _TW:] = -1.0
    return sgn


@lru_cache(maxsize=None)
def _spectra_dmats_inline_v4(kd: int):
    """The (16, KD) re/im halves of _spectra_dmat_v4, contiguous — the
    in-kernel D contraction runs as two leading dots (no stacked-rows
    concat of the operand)."""
    d2 = _spectra_dmat_v4(kd)
    return (np.ascontiguousarray(d2[:, :kd]),
            np.ascontiguousarray(d2[:, kd:]))


def _kernel_spectra_v4(kernel: jax.Array, h: int, nbh: int, nbhp: int):
    """conj(DFT16_d(rfft_h(DFT64_w(kernel)))) in the kernel's MAC layout
    (8, Cin, Cout, NBHP, 128), lanes (fd-high-bit, w-bin), split re/im.

    All-matmul formulation: one joint H x W factor matrix applied to the
    (KD*Cin*Cout, KH*KW) kernel matrix (2 real matmuls), a minor-dim
    duplication putting the W spectrum in both lane halves, and one
    stacked-real D matmul (16, 2*KD) whose operand's lane-half DFT-16
    shift rides a (-1)^(d*s) sign mask — the MAC layout falls out of
    pure reshapes: no big-array transposes anywhere."""
    cout, cin, kd, kh, kw = kernel.shape
    hp = lax.Precision.HIGHEST
    mr, mi = _spectra_hw_mat_v4(h, kh, kw, nbhp)
    kt = jnp.transpose(kernel.astype(jnp.float32), (2, 1, 0, 3, 4))
    kt = kt.reshape(kd * cin * cout, kh * kw)
    br = jnp.matmul(kt, jnp.asarray(mr), precision=hp)
    bi = jnp.matmul(kt, jnp.asarray(mi), precision=hp)
    # rows (d,c,o) -> rows d, cols (c,o,n,z): a contiguous reshape; then
    # duplicate the W spectrum into both lane halves
    p = cin * cout * nbhp
    br = br.reshape(kd, p, _TW)
    bi = bi.reshape(kd, p, _TW)
    b2 = jnp.concatenate([
        jnp.concatenate([br, br], axis=-1),
        jnp.concatenate([bi, bi], axis=-1),
    ], axis=0)                                 # (2*KD, P, 128)
    b2 = b2 * jnp.asarray(_spectra_dsign_v4(kd))
    d2 = jnp.asarray(_spectra_dmat_v4(kd))
    out = lax.dot_general(
        d2, b2, (((1,), (0,)), ((), ())), precision=hp,
        preferred_element_type=jnp.float32)    # (16, P, 128)
    kr = out[:8].reshape(8, cin, cout, nbhp, 128)
    ki = out[8:].reshape(8, cin, cout, nbhp, 128)
    return kr, ki


def _xpack_carve(cin, h, nbhp, pp, nbd, xpack):
    """Carve geometry for staging the xpack!="h" x copy inside XD.

    Returns (xrows, ncarve, rx) — per-channel row count, band count, and
    rows per band — when the staging fits the dead-until-butterfly XD
    region (band i holds x rows [i*rx, (i+1)*rx) in XD cols
    [i*h, i*h+h)), else None. rx is the largest whole-channel multiple
    of xrows fitting XD's 2R pages, so every channel slab lives inside
    one band."""
    if xpack == "h":
        return None
    xrows = 2 * pp if xpack == "d0" else pp
    rx = (2 * 8 * nbd // xrows) * xrows
    if rx == 0:
        return None
    nc = -(-cin * xrows // rx)
    if nc * h <= cin * nbhp:
        return xrows, nc, rx
    return None


def _make_kernel_v4(cin, cout, h, nbh, nbhp, pp, nbd, vdp, vh, precision,
                    groups=1, mac_mode="loop", dbuf=True, inline=False,
                    kd=0, khw=0, xpack="h", kany=False):
    """Overlap-save-D kernel body, batch-channel edition. Logical shapes:
      x        (H, Cin*PP, 128)   packed d-pair lanes, channels stacked
                                  along the page dim (one DMA per cell)
      kr/ki    (8, Cin/g, Cout, NBHP, 128)
      out_ref  (1, VH, Cout*VDP, 128)

    Every transform runs as ONE matmul over the full channel-stacked
    width, with re/im stacked into the rows of the same matmul where the
    algebra allows (f2/g2/w2/cr2 — see _mats_v4): 8 big dots total per
    grid cell instead of ~10*(Cin+Cout) per-channel ones. Elementwise
    stages (W-combine, butterflies, page/sublane transposes) are chunked
    per channel so the live VMEM temporaries stay a few MB. MAC:
    pointwise complex multiply-accumulate over each out-channel's group
    slice of Cin per (f8, fh-chunk) — group slices are static — each Y
    cell written exactly once (no RMW)."""
    r_ = 8 * nbd
    nch = nbhp // 8
    cpg = cin // groups
    opg = cout // groups

    pco = cpg * cout

    def body(x_hbm, *args):
        if inline:
            (kt_ref, mr2m, mi2m, sgnm, d2rm, d2im,
             f2m, bwr, bwi, bur, bui, g2m, twfr, twfi, twvr, twvi, w2m,
             cr2m, out_ref, tr_s, xd_s, y_s, kr_ref, ki_ref,
             *xrest) = args
        elif kany:
            (kr_hbm, ki_hbm,
             f2m, bwr, bwi, bur, bui, g2m, twfr, twfi, twvr, twvi, w2m,
             cr2m, out_ref, tr_s, xd_s, y_s, kr_ref, ki_ref, ksem,
             *xrest) = args
        else:
            (kr_ref, ki_ref,
             f2m, bwr, bwi, bur, bui, g2m, twfr, twfi, twvr, twvi, w2m,
             cr2m, out_ref, tr_s, xd_s, y_s, *xrest) = args
        carve = _xpack_carve(cin, h, nbhp, pp, nbd, xpack)
        if xpack == "h" or carve is not None:
            (dma_sem,) = xrest
        else:
            xst_s, dma_sem = xrest
        b = pl.program_id(0)

        if kany:
            kc_r = pltpu.make_async_copy(kr_hbm, kr_ref, ksem.at[0])
            kc_i = pltpu.make_async_copy(ki_hbm, ki_ref, ksem.at[1])

            def _start_spectra():
                @pl.when(b == 0)
                def _():
                    kc_r.start()
                    kc_i.start()

        if inline:
            # compute the conjugated kernel spectra ONCE (grid cell 0)
            # into the persistent kr/ki scratch, in n-chunks of one 8-row
            # tile: a[(d,co), nc, l] = kt @ M'[khw, nc, l], sign-masked
            # (-1)^(d*s) on the lane halves, then the conjugated DFT-16
            # D-contraction as two leading dots. HIGHEST precision —
            # identical math to the XLA-side _kernel_spectra_v4.
            @pl.when(b == 0)
            def _spectra():
                dn_l = (((1,), (0,)), ((), ()))
                kt = kt_ref[...]                     # (KD*PCO, KHW)
                sgn = sgnm[...]                      # (KD*PCO, 1, 128)
                d2r_, d2i_ = d2rm[...], d2im[...]    # (16, KD)
                for nc in range(nbhp // 8):
                    mrc = mr2m[:, pl.dslice(nc * 8, 8), :]
                    mic = mi2m[:, pl.dslice(nc * 8, 8), :]
                    a_r = _dot(kt, mrc, dn_l, "highest") * sgn
                    a_i = _dot(kt, mic, dn_l, "highest") * sgn
                    a_r = a_r.reshape(kd, pco, 8, 128)
                    a_i = a_i.reshape(kd, pco, 8, 128)
                    oc = (_dot(d2r_, a_r, dn_l, "highest")
                          + _dot(d2i_, a_i, dn_l, "highest"))
                    kr_ref[:, :, pl.dslice(nc * 8, 8), :] = oc[:8]
                    ki_ref[:, :, pl.dslice(nc * 8, 8), :] = oc[8:]

        if xpack != "h":
            # x stages into VMEM whole; the fwd loop assembles each
            # (H, PP, 128) channel slab with in-kernel outer swaps (and,
            # for "d0", the d-pair lane interleave), so the wrapper never
            # relocates h. Staging carves into the XD region when it fits
            # (XD is dead until the post-fwd butterfly; zero extra VMEM),
            # else a dedicated scratch.
            xrows = 2 * pp if xpack == "d0" else pp
            rx = carve[2] if carve is not None else 2 * r_
            if carve is not None:
                for i in range(carve[1]):
                    lo = i * rx
                    nr = min(rx, cin * xrows - lo)
                    pltpu.make_async_copy(
                        x_hbm.at[b, pl.dslice(lo, nr), :, :],
                        xd_s.at[pl.dslice(0, nr), pl.dslice(i * h, h), :],
                        dma_sem.at[i],
                    ).start()
                for i in range(carve[1]):
                    lo = i * rx
                    nr = min(rx, cin * xrows - lo)
                    pltpu.make_async_copy(
                        x_hbm.at[b, pl.dslice(lo, nr), :, :],
                        xd_s.at[pl.dslice(0, nr), pl.dslice(i * h, h), :],
                        dma_sem.at[i],
                    ).wait()
            else:
                for c in range(cin):
                    pltpu.make_async_copy(
                        x_hbm.at[b, pl.dslice(c * xrows, xrows), :, :],
                        xst_s.at[c], dma_sem.at[c],
                    ).start()
                for c in range(cin):
                    pltpu.make_async_copy(
                        x_hbm.at[b, pl.dslice(c * xrows, xrows), :, :],
                        xst_s.at[c], dma_sem.at[c],
                    ).wait()
        elif dbuf:
            # split-DMA overlap: x still stages into the XD scratch (free
            # until the post-fwd butterfly), but as CIN per-channel DMAs
            # into disjoint regions, ALL started up front — the DMA engine
            # streams the later channels under the earlier channels' fwd
            # matmuls, and each channel waits only for its own copy. Zero
            # extra VMEM vs the single-DMA staging (a dedicated 2-slot
            # ping-pong buffer measured OOM: the kernel's register spill
            # slots already eat the 128 MiB headroom — see ROADMAP r4).
            def get_dma(c):
                return pltpu.make_async_copy(
                    x_hbm.at[b, :, pl.dslice(c * pp, pp), :],
                    xd_s.at[pl.dslice(0, h), pl.dslice(c * pp, pp), :],
                    dma_sem.at[c],
                )

            for c in range(cin):
                get_dma(c).start()
            if dbuf == "par":
                # aggregate-bandwidth form: all waits up front, live
                # ranges identical to the single-DMA form
                for c in range(cin):
                    get_dma(c).wait()

        dn_lead = (((1,), (0,)), ((), ()))  # (M, K) x (K, P, 128)
        dn_min3 = (((2,), (0,)), ((), ()))  # (A, B, 128) x (128, 128)
        f2_ = f2m[...]
        bwr_, bwi_ = bwr[...], bwi[...]
        bur_, bui_ = bur[...], bui[...]
        g2_, w2_ = g2m[...], w2m[...]
        twfr_, twfi_ = twfr[...], twfi[...]
        twvr_, twvi_ = twvr[...], twvi[...]
        cr2_ = cr2m[...]
        lmask = lax.broadcasted_iota(jnp.int32, (r_, nbhp, 128), 2) < _TW

        if xpack == "h" and not dbuf:
            # x stages into the XD scratch (x is fully consumed before
            # the first XD write — see below), saving a staging buffer
            dma = pltpu.make_async_copy(
                x_hbm.at[b],
                xd_s.at[pl.dslice(0, h), pl.dslice(0, cin * pp), :],
                dma_sem,
            )
            dma.start()
            if kany:
                _start_spectra()  # rides behind the in-flight x copy
            dma.wait()
        elif kany:
            _start_spectra()  # x staging handled above for this mode
        if xpack == "d0":
            lmask_x = (
                lax.broadcasted_iota(jnp.int32, (h, pp, 128), 2) < _TW
            )

        # H fwd (leading) + W fwd (minor) + page/sublane transpose into
        # the D-leading stacked layout [Sr; Si] (2*PP, Cin*NBHP, 128),
        # chunked per channel to bound live temporaries
        for c in range(cin):
            if xpack != "h":
                if carve is not None:
                    r0 = c * xrows
                    band = r0 // rx
                    st = xd_s[pl.dslice(r0 - band * rx, xrows),
                              pl.dslice(band * h, h), :]
                else:
                    st = xst_s[c]
                if xpack == "d0":
                    # rows are raw d: leading split into (PP, 2) pages,
                    # outer-swap each half to h-major, odd half rolls its
                    # w data into the upper 64-lane half
                    st4 = st.reshape(pp, 2, h, 2 * _TW)
                    tet = jnp.transpose(st4[:, 0], (1, 0, 2))
                    tot = jnp.transpose(st4[:, 1], (1, 0, 2))
                    xc = jnp.where(
                        lmask_x, tet, pltpu.roll(tot, _TW, axis=2))
                else:
                    # rows are packed d-pairs already: one outer swap
                    xc = jnp.transpose(st, (1, 0, 2))
            else:
                if dbuf is True:  # "par" already waited up front
                    get_dma(c).wait()
                xc = xd_s[pl.dslice(0, h), pl.dslice(c * pp, pp), :]
            ac = _dot(f2_, xc, dn_lead, precision)   # (2*NBHP, PP, 128)
            b1 = _dot(ac, bwr_, dn_min3, precision)  # [Hr*Wr; Hi*Wr]
            b2 = _dot(ac, bwi_, dn_min3, precision)  # [Hr*Wi; Hi*Wi]
            src = b1[:nbhp] - b2[nbhp:]
            sic = b2[:nbhp] + b1[nbhp:]
            tr_s[pl.dslice(0, pp), pl.dslice(c * nbhp, nbhp), :] = (
                jnp.swapaxes(src, 0, 1))
            tr_s[pl.dslice(pp, pp), pl.dslice(c * nbhp, nbhp), :] = (
                jnp.swapaxes(sic, 0, 1))

        # D fwd: windowed block DFT-8 over d-pairs, one stacked leading
        # matmul; butterfly (roll + select + twiddle) chunked per channel
        g = _dot(
            g2_,
            tr_s[pl.dslice(0, 2 * pp), pl.dslice(0, cin * nbhp), :],
            dn_lead, precision,
        )                                            # (2R, Cin*NBHP, 128)
        for c in range(cin):
            gr = g[:r_, c * nbhp:(c + 1) * nbhp, :]
            gi = g[r_:, c * nbhp:(c + 1) * nbhp, :]
            rr = pltpu.roll(gr, _TW, axis=2)
            ri = pltpu.roll(gi, _TW, axis=2)
            er = jnp.where(lmask, gr, rr)
            ei = jnp.where(lmask, gi, ri)
            our = jnp.where(lmask, rr, gr)
            oui = jnp.where(lmask, ri, gi)
            xd_s[pl.dslice(0, r_), pl.dslice(c * nbhp, nbhp), :] = (
                er + twfr_ * our - twfi_ * oui)
            xd_s[pl.dslice(r_, r_), pl.dslice(c * nbhp, nbhp), :] = (
                ei + twfr_ * oui + twfi_ * our)

        if kany:
            # spectra landed sometime during the fwd transforms; cells
            # b>0 reuse the persistent scratch (sequential grid cells)
            @pl.when(b == 0)
            def _wait_spectra():
                kc_r.wait()
                kc_i.wait()

        # pointwise frequency MAC: walk (f8, fh-chunk); j-blocks ride as
        # a vector dim, kernel row f8 broadcasts across them; every Y
        # cell is written exactly once (no RMW). Spectra reads come from
        # the rank-5 input block (XLA-side spectra) or the rank-4
        # in-kernel scratch (inline mode) — same (8, 128) slices.
        if inline:
            def kread(ref, f8, ci, o, ch):
                return ref[f8, ci * cout + o, pl.dslice(ch, 8), :]
        else:
            def kread(ref, f8, ci, o, ch):
                return ref[f8, ci, o, pl.dslice(ch, 8), :]

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
            dsum = (
                [xr + xi for xr, xi in xs] if mac_mode == "kara" else None
            )
            for o in range(cout):
                go = o // opg
                if mac_mode == "kara":
                    m1 = m2 = m3 = None
                    for ci in range(cpg):
                        xr, xi = xs[go * cpg + ci]   # (NBD, 8, 128)
                        kro = kread(kr_ref, f8, ci, o, ch)[None]
                        kio = kread(ki_ref, f8, ci, o, ch)[None]
                        p1 = xr * kro
                        p2 = xi * kio
                        # ksum add runs on the (1, 8, 128) kernel row —
                        # 1/NBD of a block op, so no resident ksum array
                        p3 = dsum[go * cpg + ci] * (kro + kio)
                        m1 = p1 if m1 is None else m1 + p1
                        m2 = p2 if m2 is None else m2 + p2
                        m3 = p3 if m3 is None else m3 + p3
                    ar = m1 - m2
                    ai = m3 - m1 - m2
                else:
                    ar = ai = None
                    for ci in range(cpg):
                        xr, xi = xs[go * cpg + ci]   # (NBD, 8, 128)
                        kro = kread(kr_ref, f8, ci, o, ch)[None]
                        kio = kread(ki_ref, f8, ci, o, ch)[None]
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

        # inverse butterfly combine, in place on Y, chunked per channel
        for o in range(cout):
            yr = y_s[pl.dslice(0, r_), pl.dslice(o * nbhp, nbhp), :]
            yi = y_s[pl.dslice(r_, r_), pl.dslice(o * nbhp, nbhp), :]
            rr = pltpu.roll(yr, _TW, axis=2)
            ri = pltpu.roll(yi, _TW, axis=2)
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

        # D inverse: block IDFT-8, one stacked leading matmul
        z = _dot(w2_, y_s[...], dn_lead, precision)
        # z: (2*VDP, Cout*NBHP, 128) = [Zr; Zi]

        # W inverse (minor) + transpose back into the H-leading stacked
        # layout [Er; Ei] (2*NBHP, Cout*VDP, 128), reusing tr_s
        for o in range(cout):
            zo = z[:, o * nbhp:(o + 1) * nbhp, :]    # (2*VDP, NBHP, 128)
            b1 = _dot(zo, bur_, dn_min3, precision)
            b2 = _dot(zo, bui_, dn_min3, precision)
            ero = b1[:vdp] - b2[vdp:]
            eio = b2[:vdp] + b1[vdp:]
            tr_s[pl.dslice(0, nbhp), pl.dslice(o * vdp, vdp), :] = (
                jnp.swapaxes(ero, 0, 1))
            tr_s[pl.dslice(nbhp, nbhp), pl.dslice(o * vdp, vdp), :] = (
                jnp.swapaxes(eio, 0, 1))

        # H inverse: irfft valid rows, one stacked leading matmul
        out_ref[0] = _dot(
            cr2_,
            tr_s[pl.dslice(0, 2 * nbhp), pl.dslice(0, cout * vdp), :],
            dn_lead, precision,
        )                                            # (VH, Cout*VDP, 128)

    return body


@lru_cache(maxsize=None)
def _fused3d_call_v4(b, cin, cout, h, nbh, nbhp, pp, nbd, vdp, vh,
                     precision, interpret, groups=1, mac_mode="loop",
                     dbuf=True, inline=False, kd=0, khw=0, xpack="h",
                     kany=False):
    if interpret and precision == "bf16x3":
        precision = "bf16x3_exact"  # see fused1d._dot3
    r_ = 8 * nbd
    carve = _xpack_carve(cin, h, nbhp, pp, nbd, xpack)
    cpg = cin // groups
    pco = cpg * cout
    mat_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    spec_block = lambda: pl.BlockSpec(  # noqa: E731
        (8, cpg, cout, nbhp, 128), lambda b_: (0, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if inline:
        # raw taps + 5 small spectra factors instead of two 10 MB-class
        # spectra blocks; the spectra live in persistent scratch instead
        spectra_in = [mat_spec() for _ in range(6)]
        spectra_scratch = [
            pltpu.VMEM((8, pco, nbhp, 128), jnp.float32),  # kr
            pltpu.VMEM((8, pco, nbhp, 128), jnp.float32),  # ki
        ]
    elif kany:
        # ANY-space spectra: the kernel DMAs them into this persistent
        # scratch itself (same bytes the input-block buffer would take)
        spectra_in = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        spectra_scratch = [
            pltpu.VMEM((8, cpg, cout, nbhp, 128), jnp.float32),
            pltpu.VMEM((8, cpg, cout, nbhp, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        spectra_in = [spec_block(), spec_block()]
        spectra_scratch = []
    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x (B, H, Cin*PP, 128)
        ] + spectra_in + [mat_spec() for _ in range(12)],
        out_specs=pl.BlockSpec(
            (1, vh, cout * vdp, 128), lambda b_: (b_, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            # shared transpose buffer: fwd [Sr; Si] (2PP, Cin*NBHP),
            # inv [Er; Ei] (2NBHP, Cout*VDP)
            pltpu.VMEM((max(2 * pp, 2 * nbhp),
                        max(cin * nbhp, cout * vdp), 128), jnp.float32),
            # XD; for xpack "h" it doubles as the x staging buffer
            # (x (H, Cin*PP) is consumed by the fwd transforms before XD
            # is written); otherwise x stages via the ping-pong scratch
            pltpu.VMEM((
                (2 * r_, cin * nbhp, 128) if xpack != "h" else
                (max(2 * r_, h), max(cin * nbhp, cin * pp), 128)
            ), jnp.float32),
            pltpu.VMEM((2 * r_, cout * nbhp, 128), jnp.float32),  # Y
        ] + spectra_scratch + (
            [pltpu.SemaphoreType.DMA((carve[1],))]
            if carve is not None else
            [
                pltpu.VMEM((cin, 2 * pp if xpack == "d0" else pp, h, 128),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((cin,)),
            ] if xpack != "h" else [
                pltpu.SemaphoreType.DMA((cin,)) if dbuf
                else pltpu.SemaphoreType.DMA(()),
            ]
        ),
    )
    flops = b * 2 * (
        cin * (2 * nbhp * h + 4 * 128) * pp * 128            # H + W fwd
        + 4 * r_ * nbhp * 128 * (cin * pp + cout * vdp)      # D fwd/inv
        + cout * cpg * r_ * nbhp * 128 * 4                   # MAC (VPU)
        + cout * (4 * 128 + 2 * vh * nbh / 128) * vdp * 128  # W/H inv
    )
    if inline:
        flops += 2 * kd * pco * nbhp * 128 * (2 * khw + 32)
    return pl.pallas_call(
        _make_kernel_v4(cin, cout, h, nbh, nbhp, pp, nbd, vdp, vh,
                        precision, groups, mac_mode, dbuf, inline, kd,
                        khw, xpack, kany),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, vh, cout * vdp, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=(b * cin * h * pp + b * cout * vh * vdp)
            * 128 * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _pack3d_call(b, cin, pp, h, interpret):
    """Dedicated x-pack kernel ("pk" xpack mode): (B, Cin*2PP, H, TW) ->
    (B, H, Cin*PP, 128), the exact main-kernel x layout. Per channel:
    leading split into d-pair halves, lane concat (even | odd), one
    page/sublane outer swap. Motivation (v5e 2026-08-19,
    scratch/tpu_r4_barrier.py): the XLA 6D pad+transpose costs ~5x its
    standalone time when it shares a program with the Mosaic main call,
    and optimization_barrier can't recover it — a custom call -> custom
    call chain has no XLA fusion codegen in between."""

    def body(x_ref, out_ref):
        for c in range(cin):
            sl = x_ref[0, pl.dslice(c * 2 * pp, 2 * pp), :, :]
            s4 = sl.reshape(pp, 2, h, _TW)
            xc = jnp.concatenate([s4[:, 0], s4[:, 1]], axis=-1)
            out_ref[0, :, pl.dslice(c * pp, pp), :] = jnp.transpose(
                xc, (1, 0, 2)
            )

    return pl.pallas_call(
        body,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, cin * 2 * pp, h, _TW),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, h, cin * pp, 2 * _TW),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, h, cin * pp, 2 * _TW), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=b * cin * pp * h * 128 * 2 * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def _make_kernel_3d(cin, cout, h, nbh, pages, vdp, vh, me, mr, precision,
                    groups=1):
    """Kernel body. Logical shapes:
      x        (Cin, H, P, 128)  packed lanes (d-pair, w)
      kr/ki    (NBH, Cin/g, ME+MR, Cout, 128)
      out_ref  (1, Cout, VH, VDP, 128)

    Lowering rules (hard-won in v1, kernels/fused3d.py r2): leading/minor
    rank-3/4 contractions collapse to single matmuls iff the minor dims
    are whole 128-lane tiles (true everywhere here — lanes are packed);
    middle contractions unroll per page; per-kernel unrolled statement
    counts stay in the low hundreds via fori_loops with dynamic ref
    slices for the tap MAC."""
    maxoff = max(me - 1, mr - 1 if mr else 0)
    wrows = -(-(8 + maxoff) // 8) * 8
    cpg = cin // groups
    opg = cout // groups

    def body(
        x_hbm, kr_ref, ki_ref,
        frm, fim, bwr, bwi, bur, bui, crm, cim,
        out_ref, x_vmem, sr_s, si_s, rr_s, ri_s, ar_s, ai_s, dma_sem,
    ):
        b = pl.program_id(0)
        dma = pltpu.make_async_copy(x_hbm.at[b], x_vmem, dma_sem)
        dma.start()
        dma.wait()

        dn_lead = (((1,), (0,)), ((), ()))  # (M, K) x (K, P, 128)
        dn_min3 = (((2,), (0,)), ((), ()))  # (NBH, P, 128) x (128, 128)
        fr_, fi_ = frm[...], fim[...]
        bwr_, bwi_ = bwr[...], bwi[...]
        bur_, bui_ = bur[...], bui[...]
        cr_, ci_ = crm[...], cim[...]

        # forward per channel: H one-sided rfft (leading contraction, real
        # input: 2 matmuls), then the block-diagonal W DFT (minor
        # contraction, 4 matmuls); spectra land in S refs, and their
        # half-lane roll in R refs for the odd D-taps.
        for c in range(cin):
            xc = x_vmem[c]                     # (H, P, 128) real
            hr = _dot(fr_, xc, dn_lead, precision)   # (NBH, P, 128)
            hi = _dot(fi_, xc, dn_lead, precision)
            sr = (
                _dot(hr, bwr_, dn_min3, precision)
                - _dot(hi, bwi_, dn_min3, precision)
            )
            si = (
                _dot(hr, bwi_, dn_min3, precision)
                + _dot(hi, bwr_, dn_min3, precision)
            )
            sr_s[c] = sr
            si_s[c] = si
            if mr:
                rr_s[c] = pltpu.roll(sr, _TW, axis=2)
                ri_s[c] = pltpu.roll(si, _TW, axis=2)

        # D-tap MAC (VPU), register-blocked: walk the spectra in
        # (NBH-row, 8-page) blocks. Per block, one aligned window read of
        # each source covers every tap offset (static sub-slices), all
        # (tap, out-channel) products run on ~32 KB operands, and each
        # accumulator cell is written exactly once (no RMW). The previous
        # whole-plane MAC re-read the (Cin, NBH, VDP, 128) spectra block
        # once per (out-channel, tap) and was VMEM-bandwidth-bound
        # (~0.85 ms of the 1.14 ms kernel at the 64^3 benchmark).
        nv8 = vdp // 8

        def mac_block(idx, carry):
            n = idx // nv8
            v8 = (idx % nv8) * 8
            xw_sr = sr_s[:, n, pl.dslice(v8, wrows), :]  # (Cin, wrows, 128)
            xw_si = si_s[:, n, pl.dslice(v8, wrows), :]
            if mr:
                xw_rr = rr_s[:, n, pl.dslice(v8, wrows), :]
                xw_ri = ri_s[:, n, pl.dslice(v8, wrows), :]
            kn_r = kr_ref[n]                    # (Cin/g, T, Cout, 128)
            kn_i = ki_ref[n]
            for o in range(cout):
                gs = (o // opg) * cpg           # static group slice of Cin
                yr = yi = None
                for t in range(me + mr):
                    if t < me:
                        xr = xw_sr[gs:gs + cpg, t:t + 8, :]
                        xi = xw_si[gs:gs + cpg, t:t + 8, :]
                    else:
                        xr = xw_rr[gs:gs + cpg, t - me:t - me + 8, :]
                        xi = xw_ri[gs:gs + cpg, t - me:t - me + 8, :]
                    kro = kn_r[:, t, o][:, None, :]   # (Cin/g, 1, 128)
                    kio = kn_i[:, t, o][:, None, :]
                    tr = jnp.sum(xr * kro - xi * kio, axis=0)
                    ti = jnp.sum(xr * kio + xi * kro, axis=0)
                    yr = tr if yr is None else yr + tr
                    yi = ti if yi is None else yi + ti
                ar_s[o, n, pl.dslice(v8, 8), :] = yr
                ai_s[o, n, pl.dslice(v8, 8), :] = yi
            return carry

        jax.lax.fori_loop(0, nbh * nv8, mac_block, 0)

        # inverse transforms per out-channel: W (minor) then H (leading)
        def per_out(o, carry):
            yr = ar_s[o]
            yi = ai_s[o]
            er = (
                _dot(yr, bur_, dn_min3, precision)
                - _dot(yi, bui_, dn_min3, precision)
            )
            ei = (
                _dot(yr, bui_, dn_min3, precision)
                + _dot(yi, bur_, dn_min3, precision)
            )
            # H inverse irfft, valid rows only: (VH, NBH) x (NBH, VDP, 128)
            out = (
                _dot(cr_, er, dn_lead, precision)
                + _dot(ci_, ei, dn_lead, precision)
            )                                   # (VH, VDP, 128)
            out_ref[0, o] = out
            return carry

        jax.lax.fori_loop(0, cout, per_out, 0)

    return body


@lru_cache(maxsize=None)
def _fused3d_call(b, cin, cout, h, nbh, pages, vdp, vh, me, mr, precision,
                  interpret, groups=1):
    if interpret and precision == "bf16x3":
        precision = "bf16x3_exact"  # see fused1d._dot3
    taps = me + mr
    cpg = cin // groups
    mat_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x (B, Cin, H, P, 128) HBM
            pl.BlockSpec(
                (nbh, cpg, taps, cout, 128), lambda b_: (0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nbh, cpg, taps, cout, 128), lambda b_: (0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + [mat_spec() for _ in range(8)],
        out_specs=pl.BlockSpec(
            (1, cout, vh, vdp, 128), lambda b_: (b_, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((cin, h, pages, 128), jnp.float32),    # x packed
            pltpu.VMEM((cin, nbh, pages, 128), jnp.float32),  # S re
            pltpu.VMEM((cin, nbh, pages, 128), jnp.float32),  # S im
            pltpu.VMEM((cin, nbh, pages, 128), jnp.float32),  # R re
            pltpu.VMEM((cin, nbh, pages, 128), jnp.float32),  # R im
            pltpu.VMEM((cout, nbh, vdp, 128), jnp.float32),   # acc re
            pltpu.VMEM((cout, nbh, vdp, 128), jnp.float32),   # acc im
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # matmul MACs x2 flops: H fwd/inv (leading) + W fwd/inv (minor) + MAC
    flops = b * 2 * (
        cin * (2 * nbh * h + 4 * 128) * pages * 128          # fwd
        + cout * (4 * 128 + 2 * vh * nbh / 128) * vdp * 128  # inv
        + cout * cpg * taps * nbh * vdp * 128 * 4            # MAC (VPU)
    )
    return pl.pallas_call(
        _make_kernel_3d(cin, cout, h, nbh, pages, vdp, vh, me, mr,
                        precision, groups),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, cout, vh, vdp, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=(b * cin * h * pages + b * cout * vh * vdp)
            * 128 * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def _is_cpu() -> bool:
    return jax.devices()[0].platform == "cpu"


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused3d_core(x_padded, kernel, out_dhw: Tuple[int, int, int],
                  groups: int = 1):
    return _fused3d_forward(x_padded, kernel, out_dhw, groups)


def _fused3d_forward(x_padded, kernel, out_dhw, groups=1, spectra=None):
    b, cin, d, h, w = x_padded.shape
    cout, cpg, kd, kh, kw = kernel.shape
    od, oh, ow = out_dhw

    # W wider than one lane half: overlap-save along W in the wrapper —
    # width-64 blocks on a 64-kw+1 hop stacked into the batch grid dim;
    # per-block valid outputs concatenate to the full W output. Kernel
    # spectra are W-length-independent (the W DFT is always _TW-point),
    # so all blocks share one spectra set. The LAST block is CLAMPED to
    # end at the input's edge (uneven placement) instead of zero-padding
    # the input out to (nwb-1)*hop + TW: overlap-save blocks may overlap
    # freely, so its valid window simply ends exactly at the last output
    # column. This matters most for the transposed conv's stuffed
    # volumes — at 64^3 K=8 the old padding blew W up 78 -> 121 (43 of
    # the second block's 64 lanes pure zeros) before the pack transposes.
    b0, nwb = b, 1
    if w > _TW:
        hop = _TW - kw + 1
        nwb = -(-ow // hop)
        # only the last start can exceed w - TW (need - w < hop), so the
        # min() clamps exactly that block
        starts = [min(i * hop, w - _TW) for i in range(nwb)]
        x_padded = jnp.stack(
            [
                lax.slice_in_dim(x_padded, s, s + _TW, axis=4)
                for s in starts
            ],
            axis=1,
        ).reshape(b * nwb, cin, d, h, _TW)
        b, w, ow_blk = b * nwb, _TW, hop
    else:
        ow_blk = ow

    plan = plan_3d(cin, cout, d, h, w, kd, kh, kw, groups)
    if plan is None:
        raise ValueError("no fused 3D configuration fits this shape")
    if plan[0] == "v4":
        _, nbh, nbhp, pages, nbd, vdp = plan
    else:
        _, nbh, vdp, pages = plan
        me, mr = _tap_counts(kd)
    vh = h - kh + 1

    # pack lanes: two consecutive D-slabs share one 128-lane tile
    x = x_padded.astype(jnp.float32)
    xpack = _XPACK3D if plan[0] == "v4" else "h"
    if xpack == "pk" and pages % 8 != 0:
        xpack = "h"  # sublane-aligned channel stores required
    if xpack == "d0":
        # pure pad+reshape: rows (c, d), w padded across all 128 lanes
        # (the kernel de-interleaves the d-pairs into lane halves)
        x = jnp.pad(
            x, ((0, 0), (0, 0), (0, 2 * pages - d), (0, 0),
                (0, 2 * _TW - w))
        )
        x = x.reshape(b, cin * 2 * pages, h, 2 * _TW)
    else:
        if 2 * pages != d or w != _TW:
            x = jnp.pad(
                x,
                ((0, 0), (0, 0), (0, 2 * pages - d), (0, 0),
                 (0, _TW - w)),
            )
        x = x.reshape(b, cin, pages, 2, h, _TW)

    if plan[0] == "v4":
        if xpack == "h":
            # xp[b, h, c*PP + p, TW*s + w] = x[b, c, 2p + s, h, w]
            x = jnp.transpose(x, (0, 4, 1, 2, 3, 5))
            x = x.reshape(b, h, cin * pages, 2 * _TW)
        elif xpack == "h2":
            # same destination layout as "h", reached in two clean
            # steps: minor d-pair interleave, then a rank-3 page-level
            # transpose with whole 128-lane rows
            x = jnp.transpose(x, (0, 1, 2, 4, 3, 5))
            x = x.reshape(b, cin * pages, h, 2 * _TW)
            x = jnp.swapaxes(x, 1, 2)
        elif xpack == "pk":
            # dedicated Pallas pack kernel -> "h" layout
            x = x.reshape(b, cin * pages * 2, h, _TW)
            x = _pack3d_call(b, cin, pages, h, _is_cpu())(x)
        elif xpack == "d2":
            # xp[b, c*PP + p, h, TW*s + w]: d-pairs into lanes, h stays
            # put (the kernel outer-swaps each channel slab to h-major)
            x = jnp.transpose(x, (0, 1, 2, 4, 3, 5))
            x = x.reshape(b, cin * pages, h, 2 * _TW)
        mats = [jnp.asarray(m) for m in _mats_v4(h, vh, nbd, pages)]
        inline = (
            spectra is None
            and _INLINE3D
            and _inline_fits_v4(cin, cout, d, h, w, kd, kh, kw, groups)
        )
        if inline:
            # ship raw taps; cell 0 computes the spectra in-kernel
            pco = cpg * cout
            kt = jnp.transpose(
                kernel.astype(jnp.float32), (2, 1, 0, 3, 4)
            ).reshape(kd * pco, kh * kw)
            d2r, d2i = _spectra_dmats_inline_v4(kd)
            sp_args = (
                kt,
                *(jnp.asarray(m) for m in
                  _spectra_hw_inline_v4(h, kh, kw, nbhp)),
                jnp.asarray(_spectra_sgn_inline_v4(kd, pco)),
                jnp.asarray(d2r), jnp.asarray(d2i),
            )
        else:
            kr, ki = (
                spectra
                if spectra is not None
                else _kernel_spectra_v4(
                    kernel.astype(jnp.float32), h, nbh, nbhp)
            )
            sp_args = (kr, ki)
        call = _fused3d_call_v4(
            b, cin, cout, h, nbh, nbhp, pages, nbd, vdp, vh,
            _PRECISION_3D, _is_cpu(), groups, _MAC3D_MODE, _DBUF3D,
            inline, kd if inline else 0, kh * kw if inline else 0,
            # h2/pk produce the "h" layout; the main kernel is identical
            xpack if xpack in ("d2", "d0") else "h",
            _KANY3D and not inline,
        )
        out = call(x, *sp_args, *mats)    # (B, VH, Cout*VDP, 128)
        out = out.reshape(b, vh, cout, vdp, 2, _TW)
        out = jnp.transpose(out, (0, 2, 3, 4, 1, 5))
        out = out.reshape(b, cout, 2 * vdp, vh, _TW)
        out = out[:, :, :od, :oh, :ow_blk]
    else:
        # tap path: xp[b, c, h, p, TW*s + w] = x[b, c, 2p + s, h, w]
        x = jnp.transpose(x, (0, 1, 4, 2, 3, 5))
        x = x.reshape(b, cin, h, pages, 2 * _TW)
        kr, ki = (
            spectra
            if spectra is not None
            else _kernel_spectra_3d(kernel.astype(jnp.float32), h, nbh)
        )
        mats = [jnp.asarray(m) for m in _mats_3d(h, vh)]
        call = _fused3d_call(
            b, cin, cout, h, nbh, pages, vdp, vh, me, mr,
            _PRECISION_3D, _is_cpu(), groups,
        )
        out = call(x, kr, ki, *mats)        # (B, Cout, VH, VDP, 128)
        # unpack lanes -> D pages, crop to the valid output box
        out = out.reshape(b, cout, vh, vdp, 2, _TW)
        out = jnp.transpose(out, (0, 1, 3, 4, 2, 5))
        out = out.reshape(b, cout, 2 * vdp, vh, _TW)
        out = out[:, :, :od, :oh, :ow_blk]

    if nwb > 1:
        out = out.reshape(b0, nwb, cout, od, oh, ow_blk)
        out = jnp.transpose(out, (0, 2, 3, 4, 1, 5))
        # blocks i < nwb-1 contribute all ow_blk(=hop) columns starting
        # at i*hop; the clamped last block's outputs start at starts[-1],
        # so its first (nwb-1)*hop - starts[-1] columns duplicate block
        # nwb-2's tail and are dropped
        off = (nwb - 1) * ow_blk - starts[-1]
        head = out[:, :, :, :, :nwb - 1].reshape(
            b0, cout, od, oh, (nwb - 1) * ow_blk)
        tail = out[:, :, :, :, nwb - 1, off:]
        out = jnp.concatenate([head, tail], axis=-1)[..., :ow]
    return out


def _fused3d_fwd(x_padded, kernel, out_dhw, groups):
    return (
        _fused3d_forward(x_padded, kernel, out_dhw, groups),
        (x_padded, kernel),
    )


def _fused3d_bwd(out_dhw, groups, residuals, g):
    x_padded, kernel = residuals
    # dx: the forward kernel layout (Cout, Cin/g, *K) is exactly
    # conv_transpose's (in=Cout, out/g=Cin/g, *K) layout, groups included
    dx = F.fft_conv_transpose(g, kernel, groups=groups, impl="xla")
    if groups == 1:
        dw = F.fft_conv(
            jnp.swapaxes(x_padded, 0, 1), jnp.swapaxes(g, 0, 1), impl="xla"
        )
        return dx, jnp.swapaxes(dw, 0, 1)
    # grouped dw: correlation with batch as the contraction channel, per
    # group (3D analog of fused1d._fused_bwd)
    b, cin = x_padded.shape[:2]
    cout = g.shape[1]
    cpg, opg = cin // groups, cout // groups
    xg = jnp.moveaxis(
        x_padded.reshape(b, groups, cpg, *x_padded.shape[2:]), 0, 2
    )                                    # (groups, Cin/g, B, *spatial)
    gg = jnp.moveaxis(g.reshape(b, groups, opg, *g.shape[2:]), 0, 2)
    dw = jax.vmap(lambda a, c: F.fft_conv(a, c, impl="xla"))(xg, gg)
    # (groups, Cin/g, Cout/g, *K) -> (Cout, Cin/g, *K)
    dw = jnp.swapaxes(dw, 1, 2).reshape(cout, cpg, *dw.shape[3:])
    return dx, dw


_fused3d_core.defvjp(_fused3d_fwd, _fused3d_bwd)


def plan_fft_conv3d(
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    padding=0,
    padding_mode: str = "constant",
    *,
    signal_dhw,
):
    """Serving-mode plan: the kernel's 3D spectra are computed ONCE
    (conjugated, in the fused kernel's MAC layout) and the returned
    jitted callable only transforms the signal — removes the ~0.17 ms
    per-call spectra chain at the 64^3 K=8^3 benchmark shape (~18% of
    the fused call). Fused surface only: groups=1, stride=1, dilation=1;
    caller gates on ``plan_3d_blocked`` (the kernel spectra are
    W-length-independent, so W-overlap-save blocked shapes bake the same
    spectra)."""
    if kernel.ndim != 5:
        raise ValueError("plan_fft_conv3d expects (Cout, Cin, KD, KH, KW)")
    padding_ = to_ntuple(padding, 3)
    d, h, w = signal_dhw
    cout, cin, kd, kh, kw = kernel.shape
    dp = d + 2 * padding_[0]
    hp = h + 2 * padding_[1]
    wp = w + 2 * padding_[2]
    if kd > dp or kh > hp or kw > wp:
        raise ValueError("Kernel size can't be greater than actual input size")
    blocked = plan_3d_blocked(cin, cout, dp, hp, wp, kd, kh, kw)
    if blocked is None:
        raise ValueError("no fused 3D configuration fits this shape")
    plan = blocked[0]
    out_dhw = (dp - kd + 1, hp - kh + 1, wp - kw + 1)

    kernel = kernel.astype(jnp.float32)
    nbh = hp // 2 + 1
    if plan[0] == "v4":
        nbhp = plan[2]
        kr, ki = _kernel_spectra_v4(kernel, hp, nbh, nbhp)
    else:
        kr, ki = _kernel_spectra_3d(kernel, hp, nbh)
    kr = jax.device_put(kr)
    ki = jax.device_put(ki)

    @jax.jit
    def planned(signal):
        if signal.shape[2:] != (d, h, w):
            raise ValueError(
                f"plan serves spatial shape {(d, h, w)}, "
                f"got {signal.shape[2:]}"
            )
        x = F._pad_signal(signal, padding_, padding_mode)
        out = _fused3d_core_planned(
            x.astype(jnp.float32), kernel, kr, ki, out_dhw
        )
        if bias is not None:
            out = out + bias.reshape(1, -1, 1, 1, 1)
        return out.astype(signal.dtype)

    return planned


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused3d_core_planned(x_padded, kernel, kr, ki, out_dhw):
    return _fused3d_forward(x_padded, kernel, out_dhw, spectra=(kr, ki))


def _fused3d_planned_fwd(x_padded, kernel, kr, ki, out_dhw):
    out = _fused3d_forward(x_padded, kernel, out_dhw, spectra=(kr, ki))
    return out, (x_padded, kernel)


def _fused3d_planned_bwd(out_dhw, residuals, g):
    dx, dw = _fused3d_bwd(out_dhw, 1, residuals, g)
    return dx, dw, None, None


_fused3d_core_planned.defvjp(_fused3d_planned_fwd, _fused3d_planned_bwd)


def fft_conv3d_fused(
    signal: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    padding=0,
    padding_mode: str = "constant",
    stride=1,
    dilation=1,
    groups: int = 1,
) -> jax.Array:
    """Fused-Pallas 3D FFT convolution; torch conv3d semantics
    (padding/padding_mode/stride/dilation via wrapper transforms; groups
    via static group-sliced MACs in the kernel; W wider than one lane
    half via wrapper overlap-save W-blocking — see ``plan_3d_blocked``).
    Falls back to the composed path when no plan fits."""
    if signal.ndim != 5 or kernel.ndim != 5:
        raise ValueError(
            "fft_conv3d_fused expects (B, Cin, D, H, W) and "
            "(Cout, Cin/g, KD, KH, KW)"
        )
    padding_ = to_ntuple(padding, 3)
    stride_ = to_ntuple(stride, 3)
    dilation_ = to_ntuple(dilation, 3)
    kernel = F._dilate_kernel(kernel, dilation_)
    x = F._pad_signal(signal, padding_, padding_mode)
    b, cin, d, h, w = x.shape
    cout, cpg, kd, kh, kw = kernel.shape
    if cpg * groups != cin:
        raise ValueError(
            f"kernel Cin/groups {cpg} x groups {groups} != signal Cin {cin}"
        )
    if cout % groups:
        raise ValueError(
            f"out_channels {cout} not divisible by groups {groups}"
        )
    if kd > d or kh > h or kw > w:
        raise ValueError("Kernel size can't be greater than actual input size")

    od, oh, ow = d - kd + 1, h - kh + 1, w - kw + 1
    if plan_3d_blocked(cin, cout, d, h, w, kd, kh, kw, groups) is None:
        out = F.fft_conv(signal, kernel, None, padding=padding_,
                         groups=groups, padding_mode=padding_mode,
                         impl="xla")
    else:
        out = _fused3d_core(x.astype(jnp.float32),
                            kernel.astype(jnp.float32), (od, oh, ow),
                            groups)
    if stride_ != (1, 1, 1):
        out = out[:, :, ::stride_[0], ::stride_[1], ::stride_[2]]
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1, 1)
    return out.astype(signal.dtype)


def fft_conv_transpose3d_fused(
    signal: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    padding=0,
    stride=1,
    dilation=1,
    groups: int = 1,
    output_padding=0,
) -> jax.Array:
    """Fused-Pallas 3D transposed convolution, full argument surface.

    A transposed conv is the full correlation of the interior-zero-stuffed
    signal with the spatially-flipped, (Cin,Cout)-swapped, dilated kernel
    (reference functional.py:109-139), cropped by ``padding`` per side —
    so every configuration rides the unit-stride fused conv kernel, with
    one ``lax.pad`` per call building left pad K-1, interior stride-1
    zeros, and right pad K-1+output_padding (the composed path's
    transform hoisted in front of the kernel, as in fused1d/fused2d). The
    stuffed volume's W exceeds one lane half at typical shapes (e.g. 78^3
    at the 64^3 K=8 reference benchmark), so this path relies on the
    W-overlap-save blocking in ``fft_conv3d_fused``.

    Same intentional torch divergence as the 1D/2D wrappers: oversized
    ``output_padding`` is accepted (consistent with the composed path).
    """
    if signal.ndim != 5 or kernel.ndim != 5:
        raise ValueError(
            "fft_conv_transpose3d_fused expects (B, Cin, D, H, W) and "
            "(Cin, Cout/g, KD, KH, KW)"
        )
    padding_ = to_ntuple(padding, 3)
    stride_ = to_ntuple(stride, 3)
    dilation_ = to_ntuple(dilation, 3)
    output_padding_ = to_ntuple(output_padding, 3)
    cin = kernel.shape[0]
    k_spatial = kernel.shape[2:]
    if signal.shape[1] != cin:
        raise ValueError(f"kernel Cin {cin} != signal Cin {signal.shape[1]}")
    if cin % groups:
        raise ValueError(
            f"in_channels {cin} not divisible by groups {groups}"
        )
    # flip + group-swap (Cin, Cout/g, *K) -> (Cout, Cin/g, *K), then dilate
    # — the shared transform (ops/functional._transpose_kernel_layout)
    w = F._transpose_kernel_layout(kernel, groups, dilation_)
    k_dil = w.shape[2:]
    out_shape = tuple(
        (s - 1) * t - 2 * p + kd_ + op
        for s, t, p, kd_, op in zip(
            signal.shape[2:], stride_, padding_, k_dil, output_padding_
        )
    )
    if any(o < 1 for o in out_shape):
        raise ValueError(
            f"non-positive output shape {out_shape} (spatial "
            f"{signal.shape[2:]}, kernel {k_spatial}, padding {padding_})"
        )
    config = [(0, 0, 0), (0, 0, 0)] + [
        (kd_ - 1, kd_ - 1 + op, t - 1)
        for kd_, op, t in zip(k_dil, output_padding_, stride_)
    ]
    x = lax.pad(signal, jnp.zeros((), signal.dtype), config)
    out = fft_conv3d_fused(x, w, None, groups=groups)
    out = lax.slice(
        out,
        start_indices=(0, 0) + tuple(padding_),
        limit_indices=out.shape[:2]
        + tuple(p + o for p, o in zip(padding_, out_shape)),
    )
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1, 1)
    return out
