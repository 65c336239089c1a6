"""Fused 3D FFT convolution — Pallas TPU whole-volume kernel (EXPERIMENTAL:
correct and tested, but measured 2.31 ms vs the composed path's 2.08 ms at
the reference benchmark shape, so impl="auto" does NOT route here).

At the reference 3D benchmark size (64^3, B=2, 8->8, K=8^3: reference
doc/scripts/generate_benchmark_plot.py:149-158) the composed path is bound
by HBM round trips and 64-wide matmuls (measured 2.1 ms; stage profile:
signal fwd 0.39, kernel fwd 0.41, MAC 0.19, inverse 0.54 ms). This kernel
runs the entire pipeline in VMEM — the whole (Cin, D, H, W) volume is only
8 MiB — with a structure chosen per-axis for the TPU ISA:

  W axis  — full 128-point DFT (input zero-padded to one lane tile) as a
            merged rank-3 minor-dim matmul per channel.
  H axis  — one-sided DFT contracting the LEADING dim of (H, D, TW):
            Mosaic lowers leading/minor contractions as single matmuls
            when the minor dims collapse to whole 128-lane tiles; MIDDLE
            contractions unroll one matmul per page (~2300 units here),
            which blows the compile past 9 minutes.
  D axis  — NO transform: the kernel's KD taps are summed directly in the
            2D spectral domain (out[d] = sum_kd spec2d(x[d+kd]) * W2[kd])
            inside a lax.fori_loop (static unrolling of the (o, t) loops
            over multi-thousand-vreg values is another compile-time trap).

Why it does not win (v5e, 2026-08-17, 2.31 ms): the one-sided H matmuls
run at M=33 of 128 rows; the tap-domain MAC does KD x the transform-domain
MAC work on 2x-padded lanes (~0.29 ms/batch of VPU); and the per-tap
kernel spectra cost ~0.2-0.4 ms in XLA. A D-transform variant was
estimated at ~1.5 ms — still short of the 5x bar (1.06 ms) — so the
composed path remains the routed 3D implementation. Kept as the starting
point for a future revision (per-axis lowering rules above are the
hard-won part).

All dots run bf16x3 by default (hi/lo split, 3 MXU passes — see fused1d).
Kernel per-tap 2D spectra (Cout, KD, Cin, NBH, TW), conjugated, are
computed in XLA and stay VMEM-resident. Gradients via jax.custom_vjp with
the composed ops as backward (SURVEY §3.4), matching fused1d/fused2d.

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
from . import fused1d
from .fused1d import _dot

# resident kernel-spectra budget: Cout*Cin*KD*NBH*W*8 bytes
_KER_VMEM_BUDGET = 24 * 2**20
# whole-volume VMEM budget for the signal-side arrays
_VOL_VMEM_BUDGET = 64 * 2**20

# 3D kernel matmul precision (independent switch, like fused2d's)
_PRECISION_3D = "bf16x3"


def set_fused3d_precision(mode: str) -> None:
    """Selects the 3D kernel's matmul precision ("highest" | "bf16x3").

    Independent of the 1D/2D switches (``fused1d.set_fused_precision``,
    ``fused2d.set_fused2d_precision``)."""
    global _PRECISION_3D
    if mode not in ("highest", "bf16x3"):
        raise ValueError(f"unknown fused precision mode: {mode!r}")
    if mode != _PRECISION_3D:
        _PRECISION_3D = mode
        _fused3d_call.cache_clear()


# W-axis transform length: one full lane tile. Mosaic's rank-3 MIDDLE
# contraction (the H stage) lowers via a pages->lanes collapse that is
# layout-free only when the minor dim is a multiple of 128 — a 64-lane
# minor dim fails with "infer-vector-layout: unsupported shape cast".
# 128 >= W+KW-1 also makes the W conv linear (no circular wraparound).
_TW = 128


def plan_3d(cin: int, cout: int, d: int, h: int, w: int,
            kd: int, kh: int, kw: int):
    """(NBH,) plan or None when the fused 3D kernel doesn't fit.

    Eligibility: W fits one lane tile, the padded volume and kernel
    spectra inside their VMEM budgets, groups handled by caller.
    """
    if w > _TW or h > 256 or kd > d or kh > h or kw > w:
        return None
    nbh = h // 2 + 1
    if cout * cin * kd * nbh * _TW * 8 > _KER_VMEM_BUDGET:
        return None
    # x + H-spectra (complex, TW lanes) resident per batch cell
    if cin * d * (h * _TW + 2 * nbh * _TW) * 4 > _VOL_VMEM_BUDGET:
        return None
    return (nbh,)


@lru_cache(maxsize=None)
def _mats_3d(h: int, w: int, vh: int):
    """Split-f32 factor matrices: W full DFT fwd (W, TW) row-sliced /
    inv (TW, TW), H one-sided fwd (NBH, H), H irfft rows (VH, NBH)."""
    wr, wi = _dft_mats(_TW, inverse=False)
    ur, ui = _dft_mats(_TW, inverse=True)
    fr, fi = _rfft_mats(h)             # (H, NBH)
    cr, ci = _irfft_mats(h)            # (NBH, H)
    out = (
        wr, wi,                        # (TW, TW); input zero-padded to TW
        ur, ui,                        # (TW, TW)
        fr.T, fi.T,                    # (NBH, H)
        np.ascontiguousarray(cr.T[:vh]),   # (VH, NBH)
        np.ascontiguousarray(ci.T[:vh]),
    )
    return tuple(np.ascontiguousarray(m, np.float32) for m in out)


def _kernel_spectra_3d(kernel: jax.Array, h: int, w: int, nbh: int):
    """Conjugated per-tap 2D spectra of the (Cout, Cin, KD, KH, KW) kernel,
    laid out (Cout, Cin, KD, NBH, TW) split re/im — computed in XLA with
    row-sliced DFT matrices (contractions of length KH/KW only)."""
    cout, cin, kd, kh, kw = kernel.shape
    hp = lax.Precision.HIGHEST
    wr, wi, _, _, fr, fi, _, _ = (
        jnp.asarray(m) for m in _mats_3d(h, w, 1)
    )
    fr = fr[:, :kh]                    # (NBH, KH)
    fi = fi[:, :kh]
    wr_s = wr[:kw]                     # (KW, TW)
    wi_s = wi[:kw]
    k = kernel.astype(jnp.float32)
    # H transform: (NBH, KH) x (..., KH, KW) -> (..., NBH, KW)
    ar = jnp.einsum("nk,ocdkw->ocdnw", fr, k, precision=hp)
    ai = jnp.einsum("nk,ocdkw->ocdnw", fi, k, precision=hp)
    # W transform: contract KW with (KW, W)
    br = (
        jnp.einsum("ocdnw,wz->ocdnz", ar, wr_s, precision=hp)
        - jnp.einsum("ocdnw,wz->ocdnz", ai, wi_s, precision=hp)
    )
    bi = (
        jnp.einsum("ocdnw,wz->ocdnz", ar, wi_s, precision=hp)
        + jnp.einsum("ocdnw,wz->ocdnz", ai, wr_s, precision=hp)
    )
    # conjugate (cross-correlation); layout (Cout, KD, Cin, NBH, TW) so
    # the kernel's fori_loop reads kr_ref[o, t] as one (Cin, NBH, TW) block
    return jnp.transpose(br, (0, 2, 1, 3, 4)), jnp.transpose(-bi, (0, 2, 1, 3, 4))


def _make_kernel_3d(cin, cout, d, h, w, kd, nbh, vdp, vh, precision):
    """Kernel body. Logical shapes (D pre-padded so VDP = D-KD+1 is a
    multiple of 8):
      x       (Cin, D, H, W)    natural 4D layout, (H, W) pages
      kr/ki   (Cout, KD, Cin, NBH, TW)
      out_ref (1, Cout, VH, VDP, W) — (h, d, w) axis order; XLA transposes

    Mosaic constraint driving the structure: value-level reshapes between
    rank-2 and rank-3 are unsupported ("infer-vector-layout: unsupported
    shape cast"), so every dot keeps its operands' natural ranks. Rank-3
    MINOR contractions whose leading-dims collapse is layout-free lower to
    single 2D matmuls (the fused1d _mm_right pattern); rank-3 MIDDLE
    contractions unroll over the page dim (fused1d stage-1 pattern).
    """

    def body(
        x_hbm, kr_ref, ki_ref,
        wr, wi, ur, ui, fr, fi, cr, ci,
        out_ref, x_vmem, hr_s, hi_s, dma_sem,
    ):
        b = pl.program_id(0)
        dma = pltpu.make_async_copy(x_hbm.at[b], x_vmem, dma_sem)
        dma.start()
        dma.wait()

        dn_min = (((2,), (0,)), ((), ()))   # rank-3 minor contraction
        dn_mid = (((1,), (1,)), ((), ()))   # rank-3 middle contraction
        dn_lead = (((1,), (0,)), ((), ()))  # rank-3 leading contraction
        wrm, wim = wr[...], wi[...]
        frm, fim = fr[...], fi[...]
        urm, uim = ur[...], ui[...]
        crm, cim = cr[...], ci[...]

        # ---- forward per channel: W full DFT contracts the minor dim of
        # the (H, D, TW) block (one merged matmul), then the H one-sided
        # DFT contracts the LEADING dim — x arrives (Cin, H, D, W) so that
        # both stages are single-matmul lowerings. (A middle contraction
        # here would internally unroll one matmul per D page — ~2300 units
        # across the channel loop, which sends Mosaic's compile time past
        # 9 minutes; leading contractions collapse the (D, TW) minor dims
        # into lanes instead, legal because TW == 128.)
        for c in range(cin):
            xc = x_vmem[c]                      # (H, D, TW) real
            s_r = _dot(xc, wrm, dn_min, precision)
            s_i = _dot(xc, wim, dn_min, precision)
            hr_s[c] = (
                _dot(frm, s_r, dn_lead, precision)
                - _dot(fim, s_i, dn_lead, precision)
            )                                   # (NBH, D, TW)
            hi_s[c] = (
                _dot(frm, s_i, dn_lead, precision)
                + _dot(fim, s_r, dn_lead, precision)
            )

        # ---- per out-channel: D-tap MAC (VPU) + inverse transforms ----
        # Both loops are lax.fori_loops with dynamic ref slices: unrolling
        # cout x kd statements over multi-thousand-vreg rank-4 values made
        # Mosaic's compile pathological (>9 min; cf. fused2d's rank-4 dot
        # story).
        def mac_tap(t, acc):
            yr, yi, o = acc
            xr = hr_s[:, :, pl.dslice(t, vdp), :]   # (Cin, NBH, VDP, TW)
            xi = hi_s[:, :, pl.dslice(t, vdp), :]
            kro = kr_ref[o, t][:, :, None, :]       # (Cin, NBH, 1, TW)
            kio = ki_ref[o, t][:, :, None, :]
            yr = yr + jnp.sum(xr * kro - xi * kio, axis=0)
            yi = yi + jnp.sum(xr * kio + xi * kro, axis=0)
            return yr, yi, o

        def per_out(o, carry):
            zero = jnp.zeros((nbh, vdp, _TW), jnp.float32)
            yr, yi, _ = jax.lax.fori_loop(0, kd, mac_tap, (zero, zero, o))
            # W inverse on (NBH, VDP, TW): minor contraction
            er = (
                _dot(yr, urm, dn_min, precision)
                - _dot(yi, uim, dn_min, precision)
            )
            ei = (
                _dot(yr, uim, dn_min, precision)
                + _dot(yi, urm, dn_min, precision)
            )
            # H inverse irfft, valid rows only: (VH, NBH) x (NBH, VDP, TW)
            out = (
                _dot(crm, er, dn_lead, precision)
                + _dot(cim, ei, dn_lead, precision)
            )                                   # (VH, VDP, TW)
            out_ref[0, o] = out
            return carry

        jax.lax.fori_loop(0, cout, per_out, 0)

    return body


@lru_cache(maxsize=None)
def _fused3d_call(b, cin, cout, d, h, w, kd, nbh, vdp, vh, precision,
                  interpret):
    if interpret and precision == "bf16x3":
        precision = "bf16x3_exact"  # see fused1d._dot3
    mat_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x (B, Cin, H, D, W) in HBM
            pl.BlockSpec(
                (cout, kd, cin, nbh, _TW), lambda b_: (0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cout, kd, cin, nbh, _TW), lambda b_: (0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + [mat_spec() for _ in range(8)],
        out_specs=pl.BlockSpec(
            (1, cout, vh, vdp, _TW), lambda b_: (b_, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((cin, h, d, _TW), jnp.float32),   # x, (H, D, W) order
            pltpu.VMEM((cin, nbh, d, _TW), jnp.float32),  # H re
            pltpu.VMEM((cin, nbh, d, _TW), jnp.float32),  # H im
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    vol = d * h * w
    # 2D dot flops (one real mul-add = 2): W fwd/inv + H fwd/inv + VPU MAC
    flops = b * 2 * (
        cin * vol * w * 2                      # W fwd (2 real dots)
        + cin * nbh * d * w * h * 4            # H fwd (4 dots)
        + cout * nbh * vdp * w * (cin * kd * 4 + w * 4)  # MAC + W inv
        + cout * vh * vdp * w * nbh * 2        # H inv
    )
    return pl.pallas_call(
        _make_kernel_3d(cin, cout, d, h, w, kd, nbh, vdp, vh, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, cout, vh, vdp, _TW), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(b * cin * vol + b * cout * vh * vdp * w) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def _is_cpu() -> bool:
    return jax.devices()[0].platform == "cpu"


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused3d_core(x_padded, kernel, out_dhw: Tuple[int, int, int]):
    return _fused3d_forward(x_padded, kernel, out_dhw)


def _fused3d_forward(x_padded, kernel, out_dhw):
    b, cin, d, h, w = x_padded.shape
    cout, cpg, kd, kh, kw = kernel.shape
    nbh = h // 2 + 1
    od, oh, ow = out_dhw
    vh = h - kh + 1        # valid H rows the irfft keeps
    # pad D twice over: VDP (the tap-MAC output pages) to a multiple of 8,
    # and the padded D itself to a multiple of 8 so the H-forward's 8-page
    # chunking tiles it exactly
    vdp = -(-(d - kd + 1) // 8) * 8
    d_pad = -(-(kd - 1 + vdp) // 8) * 8
    # pad W to the TW lane tile too: the kernel's whole-array DMA requires
    # the HBM operand's minor dim to be 128-aligned
    if d_pad != d or w != _TW:
        x_padded = jnp.pad(
            x_padded,
            ((0, 0), (0, 0), (0, d_pad - d), (0, 0), (0, _TW - w)),
        )

    # (B, Cin, H, D, W): H leading so the kernel's H-stage is a
    # leading-dim contraction (see _make_kernel_3d)
    x5d = jnp.transpose(x_padded.astype(jnp.float32), (0, 1, 3, 2, 4))
    kr, ki = _kernel_spectra_3d(kernel.astype(jnp.float32), h, w, nbh)
    mats = [jnp.asarray(m) for m in _mats_3d(h, w, vh)]

    call = _fused3d_call(
        b, cin, cout, d_pad, h, w, kd, nbh, vdp, vh,
        _PRECISION_3D, _is_cpu(),
    )
    out = call(x5d, kr, ki, *mats)      # (B, Cout, VH, VDP, W)
    out = out.transpose(0, 1, 3, 2, 4)  # -> (B, Cout, VDP, VH, W)
    return out[:, :, :od, :oh, :ow]


def _fused3d_fwd(x_padded, kernel, out_dhw):
    return _fused3d_forward(x_padded, kernel, out_dhw), (x_padded, kernel)


def _fused3d_bwd(out_dhw, residuals, g):
    x_padded, kernel = residuals
    dx = F.fft_conv_transpose(g, kernel, impl="xla")
    dw = F.fft_conv(
        jnp.swapaxes(x_padded, 0, 1), jnp.swapaxes(g, 0, 1), impl="xla"
    )
    return dx, jnp.swapaxes(dw, 0, 1)


_fused3d_core.defvjp(_fused3d_fwd, _fused3d_bwd)


def fft_conv3d_fused(
    signal: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    padding=0,
    padding_mode: str = "constant",
    stride=1,
    dilation=1,
) -> jax.Array:
    """Fused-Pallas 3D FFT convolution; torch conv3d semantics for the
    supported surface (groups=1; padding/padding_mode/stride/dilation via
    wrapper transforms). Falls back to the composed path when no plan fits.
    """
    if signal.ndim != 5 or kernel.ndim != 5:
        raise ValueError(
            "fft_conv3d_fused expects (B, Cin, D, H, W) and "
            "(Cout, Cin, KD, KH, KW)"
        )
    padding_ = to_ntuple(padding, 3)
    stride_ = to_ntuple(stride, 3)
    dilation_ = to_ntuple(dilation, 3)
    kernel = F._dilate_kernel(kernel, dilation_)
    x = F._pad_signal(signal, padding_, padding_mode)
    b, cin, d, h, w = x.shape
    cout, cpg, kd, kh, kw = kernel.shape
    if cpg != cin:
        raise ValueError(
            f"fused 3D kernel supports groups=1 only (kernel Cin {cpg} != "
            f"signal Cin {cin})"
        )
    if kd > d or kh > h or kw > w:
        raise ValueError("Kernel size can't be greater than actual input size")

    od, oh, ow = d - kd + 1, h - kh + 1, w - kw + 1
    if plan_3d(cin, cout, d, h, w, kd, kh, kw) is None:
        out = F.fft_conv(signal, kernel, None, padding=padding_,
                         padding_mode=padding_mode, impl="xla")
    else:
        out = _fused3d_core(x.astype(jnp.float32),
                            kernel.astype(jnp.float32), (od, oh, ow))
    if stride_ != (1, 1, 1):
        out = out[:, :, ::stride_[0], ::stride_[1], ::stride_[2]]
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1, 1)
    return out.astype(signal.dtype)
