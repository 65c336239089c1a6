"""Fused 1D FFT convolution — Pallas TPU kernel.

One VMEM-resident pipeline per (batch, block) grid cell:

    load block -> forward four-step FFT (MXU matmuls) -> per-bin complex
    MAC over in-channels (VPU) -> inverse FFT (MXU) -> write valid samples

replacing the reference's three-HLO round trip rfftn -> complex_matmul ->
irfftn (reference functional.py:68-75), whose intermediates traverse HBM
~5x. Long signals are processed overlap-save: blocks of FFT size N overlap
by K-1 samples; each cell emits V = N-K+1 valid outputs (cross-correlation
keeps the FIRST V samples of the circular result).

TPU-shaping decisions:
  * FFT size N = N1*N2 (powers of two, N2 = 128 lanes). Each cell DMAs its
    overlapped block straight from HBM (rows of a free (B,Cin,rows,128)
    view) — an XLA-side gather for the overlapped blocks costs 2.5x the
    whole kernel (measured 0.43 ms vs 0.17 ms on v5e). The block is
    transposed to (N1,B,Cin,N2) in VMEM (two near-free sublane/outer
    swaps) so BOTH FFT stages are single full-width leading/minor MXU
    matmuls with native (8,128) f32 tiles — a middle-dim contraction here
    made Mosaic unroll one matmul per (B,Cin) page, 30% of the K=256 cell
    for 3% of its MACs (measured, scratch/tpu_fused1d_ablate.py).
  * Kernel spectra (precomputed once via kernels.fourstep, conjugated, in
    the same scrambled bin order) stay VMEM-resident across all grid cells;
    N is chosen so they fit a ~4 MiB budget.
  * Real-input optimization, ONE-SIDED end to end: the conjugate symmetry
    D[N1-k1, N2-1-k2] = conj(D[k1,k2]) of the scrambled spectrum cuts
    stage 2, the MAC, and inverse stage 1 to k1 in [0, N1/2] (~45% of the
    matmul MACs); inverse stage 2 folds the exact pair-doubling into its
    weights and emits valid output rows only (see _factor_consts).
  * f32 spectra with HIGHEST-precision matmuls: bf16 twiddles would blow
    the 5e-5/1e-4 accuracy bar (reference benchmark_utils.py:53-57).

Gradients: jax.custom_vjp. Backward of valid cross-correlation is itself a
pair of FFT convs (SURVEY §3.4): dx = conv_transpose(dy, w), dw =
corr(x^T, dy^T) — routed through the composed ops (ops/functional.py).
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
from ..utils.shapes import to_ntuple
from .fourstep import fft_factor_matrices, kernel_spectrum

# ker spectra VMEM residency budget (bytes): Cout*Cin*N*8 must fit.
_KER_VMEM_BUDGET = 4 * 2**20
# N=16384 (N1=N2=128) validated on v5e and measured SLOWER than 8192
# (0.172 ms vs 0.114 ms at the L=32768 K=3840 benchmark — 8 MiB resident
# spectra pressure VMEM) with a ~5 min Mosaic compile; capped on merits.
_FFT_SIZES = (2048, 4096, 8192)


def fused_split(n: int) -> Tuple[int, int]:
    """(N1, N2) with N2 = 128: keeps the minor dim at full lane width so
    block layouts hit the native (8, 128) f32 tile and stage-2 matmuls
    contract a full 128 dim on the MXU."""
    if n % 128:
        raise ValueError(f"fused FFT size must be a multiple of 128, got {n}")
    return n // 128, 128


# per-cell live-VMEM budget for the batch-merged kernel (scratch block +
# the handful of (N1, B, C, N2) f32 intermediates alive at once); kept
# well under the 64 MiB compiler limit so routing failures become
# composed-path fallbacks instead of Mosaic allocation errors
_CELL_VMEM_BUDGET = 40 * 2**20


def cell_fits(n: int, batch: int, cin: int, cout: int) -> bool:
    """True when the batch-merged cell's live VMEM fits at FFT size ``n``:
    scratch (B, Cin, N1, N2) + ~4 live complex (N1, B, Cin|Cout, N2) f32
    intermediates. Used both at plan time and by planned callables to
    re-check the *runtime* batch (a plan built with a small batch hint must
    fall back to the composed path, not die in Mosaic)."""
    return 4 * n * batch * 4 * (cin + cout) <= _CELL_VMEM_BUDGET


def choose_fft_size(
    k: int, l_padded: int, cin: int, cout: int, batch: int = 1
) -> Optional[int]:
    """Candidate N minimizing modeled per-output cost, spectra in budget.

    Cost per valid output sample ~ (N1 + c) * N/V: stage-1 contraction
    work grows with N1 = N/128 while overlap redundancy N/V shrinks with
    N. c ~ 128 lumps the N-independent stage-2/MAC/inverse work. The
    model reproduces the v5e sweep (2026-08-17): K=256 -> 2048,
    K=1024 -> 4096, K=3840 -> 8192.

    ``batch`` bounds the batch-merged cell's live VMEM (the grid folds
    the whole batch into each cell, so scratch and intermediates scale
    with B); callers must pass it so over-large batches fall back to the
    composed path instead of failing to compile.

    Returns None when no candidate works (caller falls back to the
    composed path)."""
    best, best_cost = None, None
    for n in _FFT_SIZES:
        if cout * cin * n * 8 > _KER_VMEM_BUDGET:
            break
        if not cell_fits(n, batch, cin, cout):
            break
        n1, n2 = fused_split(n)
        v = ((n - k + 1) // n2) * n2 if n >= k else 0
        if v < n2:
            continue
        cost = (n1 + 128.0) * n / v
        if best_cost is None or cost < best_cost:
            best, best_cost = n, cost
        if n >= 2 * l_padded:
            break
    return best


@lru_cache(maxsize=None)
def _factor_consts(n1: int, n2: int, v1: int):
    """Split re/im f32 DFT factors for the ONE-SIDED four-step pipeline.

    Real input makes the scrambled spectrum conjugate-symmetric in
    four-step coordinates: D[N1-k1, N2-1-k2] = conj(D[k1, k2]) (k1 > 0;
    row 0 pairs with itself under the k2 flip). The kernel therefore
    computes k1 in [0, N1/2] only — H1+1 = N1/2+1 rows, rows 0 and N1/2
    self-paired — through stage 2, the MAC, and inverse stage 1; the
    identity survives the inverse pipeline as G[N1-k1] = conj(G[k1]) (the
    k2 flip's per-column phase cancels against the twiddle), so inverse
    stage 2 is EXACTLY out = Re(if1[:, :H1+1] . diag(w) @ G) with interior
    weights 2 — no approximation. ~45% of the matmul MACs removed.

      f1os (H1+1, N1) fwd stage-1 rows; tw (H1+1, N2) twiddle rows;
      f2 / if2 (N2, N2); if1w (V1, H1+1) inverse stage-2, valid output
      rows only, pair-doubling folded in.
    """
    f1, f2, tw = fft_factor_matrices(n1, n2)
    h1 = n1 // 2
    if1 = np.conj(f1) / n1
    if2 = np.conj(f2) / n2
    wts = np.full(h1 + 1, 2.0)
    wts[0] = 1.0
    # the top row is self-paired only when N1 is even (always true for
    # the power-of-two _FFT_SIZES; guard odd N1 from sweep overrides)
    if n1 % 2 == 0:
        wts[h1] = 1.0
    if1w = if1[:v1, :h1 + 1] * wts[None, :]
    out = []
    for m in (f1[:h1 + 1], f2, tw[:h1 + 1], if1w, if2):
        out.append(np.ascontiguousarray(m.real, np.float32))
        out.append(np.ascontiguousarray(m.imag, np.float32))
    return tuple(out)


# Fused-matmul precision mode:
#   "highest" — native f32 dots (6 MXU passes each), reference accuracy
#   "bf16x3"  — hi/lo bf16 split, 3 bf16 passes per dot (drops lo*lo):
#               ~2x MXU throughput at near-f32 accuracy
#   "bf16"    — single bf16 pass per dot (f32 accumulation): 3x fewer MXU
#               passes than bf16x3 — an opt-in serving mode for
#               error-tolerant inference; NOT within the reference
#               5e-5/1e-4 bar, never auto-selected. MEASURED (v5e
#               2026-08-20, scratch/tpu_r5_bf16.py, vs composed f32):
#               err_mean ~3.3e-3*std, err_max ~2.2e-2*std, at 1.3-1.7x
#               lower latency than bf16x3 across the 1D/2D bench configs
# Default bf16x3: v5e hardware sweep 2026-08-16 across K in {256,1024,3840},
# N in {2048,4096,8192} measured relative error ~1e-6 vs torch (abs mean
# 2e-4 at |out|~200) — far inside the 5e-5/1e-4 bar at unit test scales —
# at 1.1-1.3x lower latency than HIGHEST (0.086 vs 0.10 ms at K=256).
_PRECISION_MODE = "bf16x3"


def set_fused_precision(mode: str) -> None:
    """Selects the fused 1D kernel's matmul precision
    ("highest" | "bf16x3" | "bf16").

    Per-kernel switch: the 2D and 3D kernels have their own independent
    switches (``fused2d.set_fused2d_precision``,
    ``fused3d.set_fused3d_precision``) — setting this does NOT affect them.
    """
    global _PRECISION_MODE
    if mode not in ("highest", "bf16x3", "bf16"):
        raise ValueError(f"unknown fused precision mode: {mode!r}")
    if mode != _PRECISION_MODE:
        _PRECISION_MODE = mode
        _fused_call.cache_clear()


# Per-bin MAC strategy inside the fused kernel (VPU block, ~13 us of the
# K=256 cell pre-one-siding — the largest remaining non-matmul stage):
#   "loop"    — per-out-channel unrolled: 4 mults + 2 full-size add/subs
#               + 2 sublane sums per o (round-1 design, measured baseline)
#   "stacked" — re/im stacked on the channel axis once per cell: per o
#               only 2 mults + 2 sums over the doubled axis (half the
#               big-op count; the concats are whole-tile sublane copies)
#   "kara"    — 3-multiply complex MAC: m1=dr*kr, m2=di*ki,
#               m3=(dr+di)*(kr+ki); yr=m1-m2, yi=m3-m1-m2 with the
#               combines on the REDUCED arrays (3 mults + 3 sums per o)
#   "bcast"   — single rank-5 broadcast mult + sum over all out-channels
#               at once (no python loop; groups==1 only, falls back to
#               "loop" otherwise)
# Default decided by v5e measurement (scratch/tpu_r4_1dmac.py).
_MAC_MODE = "loop"


def set_fused1d_mac(mode: str) -> None:
    """Selects the fused 1D kernel's per-bin MAC strategy (see _MAC_MODE)."""
    global _MAC_MODE
    if mode not in ("loop", "stacked", "kara", "bcast"):
        raise ValueError(f"unknown fused 1D MAC mode: {mode!r}")
    if mode != _MAC_MODE:
        _MAC_MODE = mode
        _fused_call.cache_clear()


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b, dn, exact=False):
    """f32-accurate dot from 3 bf16 MXU passes (a_hi*b_hi + a_hi*b_lo +
    a_lo*b_hi; the dropped lo*lo term is below f32 rounding).

    ``exact`` upcasts the split operands to f32 HIGHEST dots — used in
    interpret mode, where plain XLA's handling of raw bf16 dots is
    inconsistent between eager and jit (algebraic rewrites can merge the
    partial dots and re-round the lo terms away); Mosaic on real TPU
    lowers the bf16 form faithfully."""
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    if exact:
        d = partial(
            lax.dot_general, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        return (
            d(ah.astype(jnp.float32), bh.astype(jnp.float32))
            + d(ah.astype(jnp.float32), bl.astype(jnp.float32))
            + d(al.astype(jnp.float32), bh.astype(jnp.float32))
        )
    d = partial(
        lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _dot(a, b, dn, precision):
    if precision == "bf16x3":
        return _dot3(a, b, dn)
    if precision == "bf16x3_exact":
        return _dot3(a, b, dn, exact=True)
    if precision == "bf16":
        # single-pass bf16 dot with f32 accumulation: 3x fewer MXU passes
        # than bf16x3 (error figure: see the mode table above
        # _PRECISION_MODE — one canonical statement) — the opt-in
        # serving mode, NOT parity-grade (see set_fused_precision)
        return lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
    return lax.dot_general(
        a, b, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _mm_right(x_re, x_im, m_re, m_im, precision):
    """(..., N2) complex @ (N2,N2) complex -> (re, im): minor contraction.

    Measured dead end (v5e, round 3): stacking re/im along axis 0 to
    halve the dot count (2 dots over 2x rows) is neutral-to-slightly
    SLOWER (0.086 vs 0.084 ms at 1D K=256) — the stack/unstack copies
    cost what the saved weight loads gain."""
    dn = (((x_re.ndim - 1,), (0,)), ((), ()))
    dot = lambda a, b: _dot(a, b, dn, precision)  # noqa: E731
    re = dot(x_re, m_re) - dot(x_im, m_im)
    im = dot(x_re, m_im) + dot(x_im, m_re)
    return re, im


def _make_kernel(n1, n2, cin, cout, v1, vrow, precision, b, groups=1,
                 mac_mode="loop"):
    def body(
        x_hbm, kr_ref, ki_ref,
        f1r, f1i, f2r, f2i, twr, twi, if1r, if1i, if2r, if2i,
        out_ref, x_vmem, dma_sem,
    ):
        # Fetch this cell's overlapped block straight from HBM: rows
        # [i*vrow, i*vrow + n1) of the (B, Cin, rows, N2) view, ALL batches
        # at once (batch is merged into every matmul's leading dims — at
        # the small-K benchmark shapes per-cell overhead is a significant
        # fraction of the ~10 us cells, so fewer, fatter cells win).
        # Blocks overlap by (n1 - vrow) rows — inexpressible with
        # BlockSpec index maps (block-granular), and a gather in the XLA
        # wrapper costs 2.5x the whole kernel (measured) — so manual DMA.
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[:, :, pl.ds(i * vrow, n1), :], x_vmem, dma_sem
        )
        dma.start()
        dma.wait()
        a = x_vmem[...]  # (B, Cin, N1, N2) real block

        # forward stage 1 (real input, ONE-SIDED rows [0, N1/2]): the
        # block is first transposed to (N1, B, Cin, N2) — two near-free
        # sublane/outer swaps — so the contraction is a LEADING-dim dot
        # that collapses to one matmul. The previous middle contraction
        # (contract dim 2 of the rank-4 block) made Mosaic unroll one
        # (N1,N1)x(N1,N2) matmul per (B,Cin) page: 22.9 us of the 76 us
        # K=256 cell — 30% of the kernel for 3% of its MACs (measured,
        # scratch/tpu_fused1d_ablate.py).
        at = jnp.swapaxes(jnp.swapaxes(a, 1, 2), 0, 1)  # (N1, B, Cin, N2)
        dn_lead = (((1,), (0,)), ((), ()))
        br = _dot(f1r[...], at, dn_lead, precision)  # (N1H, B, Cin, N2)
        bi = _dot(f1i[...], at, dn_lead, precision)
        # twiddle (broadcast over batch + channel dims)
        tr = twr[...][:, None, None, :]
        ti = twi[...][:, None, None, :]
        cr = br * tr - bi * ti
        ci = br * ti + bi * tr
        # forward stage 2
        dr, di = _mm_right(cr, ci, f2r[...], f2i[...], precision)

        # per-bin complex MAC over this out-channel's group of in-channels
        # (kernel spectra pre-conjugated; group slices are static).
        # Four VPU strategies — see _MAC_MODE for the trade-offs.
        cpg = cin // groups
        opg = cout // groups
        mode = mac_mode if not (mac_mode == "bcast" and groups > 1) else "loop"
        if mode == "bcast":
            # all out-channels in one broadcast mult + sublane-axis sum
            ds = jnp.concatenate([dr, di], axis=2)[:, :, None]
            # (N1H, B, 1, 2Cin, N2); spectra to (N1H, 1, Cout, 2Cin, N2)
            krs = jnp.swapaxes(
                jnp.concatenate([kr_ref[...], -ki_ref[...]], axis=2), 0, 1
            )[:, None]
            kis = jnp.swapaxes(
                jnp.concatenate([ki_ref[...], kr_ref[...]], axis=2), 0, 1
            )[:, None]
            yr = jnp.sum(ds * krs, axis=3)  # (N1H, B, Cout, N2)
            yi = jnp.sum(ds * kis, axis=3)
        else:
            if mode == "stacked":
                krs = jnp.concatenate([kr_ref[...], -ki_ref[...]], axis=2)
                kis = jnp.concatenate([ki_ref[...], kr_ref[...]], axis=2)
                d_stk = [
                    jnp.concatenate(
                        [dr[:, :, g * cpg:(g + 1) * cpg, :],
                         di[:, :, g * cpg:(g + 1) * cpg, :]], axis=2
                    )
                    for g in range(groups)
                ]
            elif mode == "kara":
                ksum = kr_ref[...] + ki_ref[...]
                d_sum = dr + di
            yr_parts = []
            yi_parts = []
            for o in range(cout):
                go = o // opg
                if mode == "stacked":
                    ds = d_stk[go]  # (N1H, B, 2Cin/g, N2)
                    yr_parts.append(jnp.sum(
                        ds * krs[o][:, None], axis=2, keepdims=True))
                    yi_parts.append(jnp.sum(
                        ds * kis[o][:, None], axis=2, keepdims=True))
                    continue
                dr_g = dr[:, :, go * cpg:(go + 1) * cpg, :]
                di_g = di[:, :, go * cpg:(go + 1) * cpg, :]
                kr_o = kr_ref[o][:, None, :, :]  # (N1H, 1, Cin/g, N2)
                ki_o = ki_ref[o][:, None, :, :]
                if mode == "kara":
                    ds_g = d_sum[:, :, go * cpg:(go + 1) * cpg, :]
                    m1 = jnp.sum(dr_g * kr_o, axis=2, keepdims=True)
                    m2 = jnp.sum(di_g * ki_o, axis=2, keepdims=True)
                    m3 = jnp.sum(
                        ds_g * ksum[o][:, None], axis=2, keepdims=True)
                    yr_parts.append(m1 - m2)
                    yi_parts.append(m3 - m1 - m2)
                else:  # "loop"
                    yr_parts.append(jnp.sum(
                        dr_g * kr_o - di_g * ki_o, axis=2, keepdims=True))
                    yi_parts.append(jnp.sum(
                        dr_g * ki_o + di_g * kr_o, axis=2, keepdims=True))
            yr = jnp.concatenate(yr_parts, axis=2)  # (N1H, B, Cout, N2)
            yi = jnp.concatenate(yi_parts, axis=2)

        # inverse stage 1 (contract k2)
        er, ei = _mm_right(yr, yi, if2r[...], if2i[...], precision)
        # conjugate twiddle
        gr = er * tr + ei * ti
        gi = ei * tr - er * ti
        # inverse stage 2, real part only (2 matmuls; contracts the
        # leading dim — legal single-matmul lowering because the minor
        # dims collapse to whole 128-lane tiles). if1w carries the
        # one-sided pair-doubling and emits valid output rows directly.
        out_real = (
            _dot(if1r[...], gr, dn_lead, precision)
            - _dot(if1i[...], gi, dn_lead, precision)
        )  # (V1, B, Cout, N2)
        out_ref[0] = out_real

    return body


@lru_cache(maxsize=None)
def _fused_call(b, nblk, n1, n2, cin, cout, v1, vrow, precision, interpret,
                groups=1, mac_mode="loop"):
    """Builds the pallas_call for a given static configuration."""
    if interpret and precision == "bf16x3":
        precision = "bf16x3_exact"  # see _dot3: XLA mishandles raw bf16 dots
    n = n1 * n2
    cpg = cin // groups
    mat_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    grid_spec = pl.GridSpec(
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x: whole array in HBM
            pl.BlockSpec(
                (cout, n1 // 2 + 1, cpg, n2), lambda j: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cout, n1 // 2 + 1, cpg, n2), lambda j: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + [mat_spec() for _ in range(10)],
        out_specs=pl.BlockSpec(
            (1, v1, b, cout, n2), lambda j: (j, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((b, cin, n1, n2), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # one-sided rows (N1/2+1 of N1) through stage 2 / MAC / inverse
    n1h = n1 // 2 + 1
    flops_cell = (
        2 * n2 * (
            n1h * 2 * n1 + n1h * 4 * n2 + n1h * 4 * n2 + v1 * 2 * n1h
        ) * (cin + cout) // 2 * b
    )
    return pl.pallas_call(
        _make_kernel(n1, n2, cin, cout, v1, vrow, precision, b, groups,
                     mac_mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk, v1, b, cout, n2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_cell * nblk,
            bytes_accessed=(b * nblk * n * cin + b * nblk * v1 * n2 * cout) * 4,
            transcendentals=0,
        ),
        # the 16 MiB default scoped-vmem cap is a compiler limit, not
        # hardware: some shape/context combinations (e.g. under jvp in a
        # training step) spill slightly past it (observed 16.55M)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def _is_cpu() -> bool:
    return jax.devices()[0].platform == "cpu"


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_core(
    x_padded: jax.Array, kernel: jax.Array, n: int, groups: int = 1
) -> jax.Array:
    return _fused_forward(x_padded, kernel, n, groups)


def _fused_forward(x_padded, kernel, n, groups=1, spectra=None):
    b, cin, l_pad = x_padded.shape
    cout, _, k = kernel.shape
    n1, n2 = fused_split(n)
    v = ((n - k + 1) // n2) * n2
    v1 = v // n2
    v_total = l_pad - k + 1
    nblk = -(-v_total // v)

    # Zero prep: right-pad and view as (B, Cin, rows, N2) — a FREE reshape
    # (v and n are multiples of n2 by construction). Each grid cell DMAs its
    # own overlapped row window from HBM inside the kernel; an XLA-side
    # gather for the overlapped blocks costs 2.5x the whole kernel
    # (0.43 ms vs 0.17 ms, measured on v5e).
    need = (nblk - 1) * v + n
    x_ext = jnp.pad(x_padded, ((0, 0), (0, 0), (0, need - l_pad)))
    x4 = x_ext.reshape(b, cin, need // n2, n2)

    kr, ki = spectra if spectra is not None else kernel_spectrum(kernel, n, n1, n2)
    # one-sided MAC: keep spectrum rows k1 in [0, N1/2] (see _factor_consts)
    n1h = n1 // 2 + 1
    kr, ki = kr[:, :n1h], ki[:, :n1h]
    consts = [jnp.asarray(m) for m in _factor_consts(n1, n2, v1)]

    call = _fused_call(
        b, nblk, n1, n2, cin, cout, v1, v // n2,
        _PRECISION_MODE, _is_cpu(), groups, _MAC_MODE,
    )
    out = call(x4.astype(jnp.float32), kr, ki, *consts)
    # (nblk, V1, B, Cout, N2) -> (B, Cout, nblk*V) -> crop
    out = out.transpose(2, 3, 0, 1, 4).reshape(b, cout, nblk * v)
    return lax.slice_in_dim(out, 0, v_total, axis=2)


def _fused_fwd(x_padded, kernel, n, groups):
    return _fused_forward(x_padded, kernel, n, groups), (x_padded, kernel)


def _fused_bwd(n, groups, residuals, g):
    x_padded, kernel = residuals
    # dx = full convolution of g with w == conv_transpose (SURVEY §3.4);
    # the forward kernel layout (Cout, Cin/g, K) is exactly conv_transpose's
    # (in=Cout, out/g=Cin/g, K) layout, groups included.
    dx = F.fft_conv_transpose(g, kernel, groups=groups, impl="xla")
    # dw[o,i,t] = sum_{b,s} g[b,o,s] x[b,i,s+t]: correlation with batch as
    # the contraction channel, per group
    if groups == 1:
        dw = F.fft_conv(
            jnp.swapaxes(x_padded, 0, 1), jnp.swapaxes(g, 0, 1), impl="xla"
        )
        return dx, jnp.swapaxes(dw, 0, 1)
    b, cin, l_pad = x_padded.shape
    cout = g.shape[1]
    cpg, opg = cin // groups, cout // groups
    xg = x_padded.reshape(b, groups, cpg, l_pad).transpose(1, 2, 0, 3)
    gg = g.reshape(b, groups, opg, g.shape[-1]).transpose(1, 2, 0, 3)
    dw = jax.vmap(lambda a, c: F.fft_conv(a, c, impl="xla"))(xg, gg)
    # (groups, Cin/g, Cout/g, K) -> (Cout, Cin/g, K)
    dw = dw.transpose(0, 2, 1, 3).reshape(cout, cpg, -1)
    return dx, dw


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def fft_conv1d_fused(
    signal: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    padding: int = 0,
    padding_mode: str = "constant",
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """Fused-Pallas 1D FFT convolution.

    Same semantics as ``ops.fft_conv`` for the supported argument subset;
    raises ValueError otherwise. Stride and dilation are wrapper
    transformations around the unit-stride kernel: the kernel is
    zero-stuffed before its spectrum is taken, and the full-resolution
    output is stride-sliced afterwards — exactly what the reference does
    around its FFT core (functional.py:49-57, 76-82), so no extra FFT work.
    Groups restrict each out-channel's in-kernel MAC to its group's
    in-channel slice (static slices, zero overhead). Falls back to the
    composed path when no fused configuration fits (tiny signals / huge
    channel counts) — use ``fft_conv`` directly for those.
    """
    if signal.ndim != 3 or kernel.ndim != 3:
        raise ValueError("fft_conv1d_fused expects (B, Cin, L) and (Cout, Cin/g, K)")
    padding_ = to_ntuple(padding, 1)
    kernel = F._dilate_kernel(kernel, (dilation,))
    x = F._pad_signal(signal, padding_, padding_mode)
    b, cin, l_pad = x.shape
    cout, cin_k, k = kernel.shape
    if cin_k * groups != cin:
        raise ValueError(
            f"kernel Cin/groups {cin_k} x groups {groups} != signal Cin {cin}"
        )
    if cout % groups:
        raise ValueError(f"out_channels {cout} not divisible by groups {groups}")
    if k > l_pad:
        raise ValueError("Kernel size can't be greater than actual input size")

    n = choose_fft_size(k, l_pad, cin_k, cout, batch=b)
    if n is None:
        out = F.fft_conv(signal, kernel, None, padding=padding_,
                         groups=groups, padding_mode=padding_mode, impl="xla")
    else:
        out = _fused_core(
            x.astype(jnp.float32), kernel.astype(jnp.float32), n, groups
        )
    if stride != 1:
        out = out[:, :, ::stride]
    if bias is not None:
        out = out + bias.reshape(1, -1, 1)
    return out.astype(signal.dtype)


def plan_fft_conv1d(
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    padding: int = 0,
    signal_length: Optional[int] = None,
    cache_spectrum: bool = True,
    max_batch: int = 1,
):
    """Returns a jitted ``fn(signal) -> out`` with the kernel baked in.

    The TPU-native analog of an FFT plan + cached kernel spectrum: for
    inference serving where one kernel convolves many signals, the scrambled
    conjugated spectrum is computed ONCE here (when ``signal_length`` is
    given and a fused config fits) instead of per call.

    ``max_batch`` sizes the FFT choice for the expected batch (the
    batch-merged cell's VMEM scales with B); the planned callable also
    re-checks the actual runtime batch per trace and falls back to the
    composed path when it would bust the cell budget, so a plan built
    small never fails Mosaic compilation on a large batch.

    Reference contrast: the reference re-plans cuFFT per call and clears the
    plan cache in its benchmark (generate_benchmark_plot.py:51); here the
    plan is an explicit object with no hidden global cache.
    """
    cout, cin, k = kernel.shape
    kernel = kernel.astype(jnp.float32)
    n = None
    if signal_length is not None:
        n = choose_fft_size(
            k, signal_length + 2 * padding, cin, cout, batch=max_batch
        )
    if n is None or not cache_spectrum:
        return jax.jit(
            lambda signal: fft_conv1d_fused(signal, kernel, bias, padding=padding)
        )

    n1, n2 = fused_split(n)
    kr, ki = kernel_spectrum(kernel, n, n1, n2)
    kr = jax.device_put(kr)
    ki = jax.device_put(ki)

    @jax.jit
    def planned(signal):
        if not cell_fits(n, signal.shape[0], cin, cout):
            # runtime batch busts the planned cell's VMEM budget
            return F.fft_conv(
                signal, kernel, bias, padding=(padding,), impl="xla"
            ).astype(signal.dtype)
        x = F._pad_signal(signal, (padding,), "constant")
        out = _fused_core_planned(x.astype(jnp.float32), kernel, kr, ki, n)
        if bias is not None:
            out = out + bias.reshape(1, -1, 1)
        return out.astype(signal.dtype)

    return planned


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_core_planned(x_padded, kernel, kr, ki, n):
    return _fused_forward(x_padded, kernel, n, spectra=(kr, ki))


def _fused_planned_fwd(x_padded, kernel, kr, ki, n):
    out = _fused_forward(x_padded, kernel, n, spectra=(kr, ki))
    return out, (x_padded, kernel)


def _fused_planned_bwd(n, residuals, g):
    dx, dw = _fused_bwd(n, 1, residuals, g)
    return dx, dw, None, None


_fused_core_planned.defvjp(_fused_planned_fwd, _fused_planned_bwd)


def fft_conv_transpose1d_fused(
    signal: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    padding: int = 0,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    output_padding: int = 0,
) -> jax.Array:
    """Fused-Pallas 1D transposed convolution, full argument surface.

    A transposed conv is the full correlation of the interior-zero-stuffed
    signal with the spatially-flipped, (Cin,Cout)-swapped, dilated kernel
    (reference functional.py:109-139), cropped by ``padding`` per side —
    so every configuration rides the same unit-stride fused kernel: one
    ``lax.pad`` builds left pad K-1, interior stride-1 zeros, and right
    pad K-1+output_padding in a single op, exactly the composed path's
    transform (ops/functional.py:543-549) hoisted in front of the kernel.

    Intentional divergence from torch: ``output_padding >= max(stride,
    dilation)`` is NOT rejected (torch's ConvTransposeNd raises). The
    reference skips the check too (functional.py:92-176), and this repo's
    composed path accepts such configs with consistent semantics (extra
    right zero-extension) — verified numerically against it.
    """
    if signal.ndim != 3 or kernel.ndim != 3:
        raise ValueError(
            "fft_conv_transpose1d_fused expects (B, Cin, L) and "
            "(Cin, Cout/g, K)"
        )
    cin, cout_g, k = kernel.shape
    if signal.shape[1] != cin:
        raise ValueError(f"kernel Cin {cin} != signal Cin {signal.shape[1]}")
    if cin % groups:
        raise ValueError(f"in_channels {cin} not divisible by groups {groups}")
    # flip + group-swap (Cin, Cout/g, K) -> (Cout, Cin/g, K), then dilate
    w = jnp.flip(kernel, axis=2)
    w = w.reshape(groups, cin // groups, cout_g, k)
    w = jnp.swapaxes(w, 1, 2).reshape(groups * cout_g, cin // groups, k)
    w = F._dilate_kernel(w, (dilation,))
    k_dil = w.shape[-1]
    out_len = (
        (signal.shape[2] - 1) * stride - 2 * padding + k_dil + output_padding
    )
    if out_len < 1:
        raise ValueError(
            f"non-positive output length {out_len} (L={signal.shape[2]}, "
            f"K={k}, padding={padding})"
        )
    config = [(0, 0, 0), (0, 0, 0),
              (k_dil - 1, k_dil - 1 + output_padding, stride - 1)]
    x = lax.pad(signal, jnp.zeros((), signal.dtype), config)
    out = fft_conv1d_fused(x, w, None, groups=groups)
    out = lax.slice_in_dim(out, padding, padding + out_len, axis=2)
    if bias is not None:
        out = out + bias.reshape(1, -1, 1)
    return out
