"""Fused 2D FFT convolution — Pallas TPU kernel (experimental).

Extends the 1D design (fused1d.py) to images: one VMEM pipeline per
(batch, H-stripe) grid cell.

    DMA stripe (Cin, NH, W) -> W-axis rfft (rect matmuls) -> H-axis DFT
    (dense NHxNH matmuls) -> per-out-channel: MAC over Cin + inverse H-DFT
    + inverse W-rfft -> write (VH, W) valid rows

Blocking: overlap-save along H only (stripes of NH rows overlapping by
K_h - 1; each emits VH = NH - K_h + 1 valid rows); W is transformed whole —
the 2D benchmark sizes (<= 512 wide) fit VMEM per stripe. Kernel spectra
(Cout, Cin, NH, WB, 2) exceed VMEM at useful sizes, so they stay in HBM and
each out-channel's slice is DMA'd on demand inside the per-cout loop (the
Y spectrum then never materializes for all couts at once).

The W transform uses one-sided (rfft/irfft) dense matrices — valid because
W is transformed FIRST while the stripe is still real. The H transform is a
full complex DFT. All matmuls f32 HIGHEST (Mosaic has no HIGH).

Not yet wired into impl="auto": use fft_conv2d_fused explicitly. Gradients
via custom_vjp with the composed ops as backward (same recipe as 1D).
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

# stripe height (H-axis FFT size): dense NHxNH DFT matmuls at full MXU width
_NH = 128
# W-axis transform handled whole; cap so VMEM fits (stripe + spectra + temps)
_MAX_W = 1024
_MAX_CIN = 16


def _dot(a, b, dn):
    return lax.dot_general(
        a, b, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


@lru_cache(maxsize=None)
def _mats_2d(nh: int, w_fft: int):
    """All factor matrices as f32 numpy: W rfft/irfft + H DFT/iDFT."""
    fr, fi = _rfft_mats(w_fft)          # (W, WB)
    cr, ci = _irfft_mats(w_fft)         # (WB, W)
    hr, hi = _dft_mats(nh, inverse=False)
    gr, gi = _dft_mats(nh, inverse=True)
    return fr, fi, cr, ci, hr, hi, gr, gi


def kernel_spectrum_2d(kernel: jax.Array, nh: int, w_fft: int):
    """Conjugated 2D spectra laid out (Cout, Cin, NH, WB) split re/im.

    W one-sided first (kernel rows are real), then full H DFT; implicit
    zero-padding via row-sliced matrices (kernels are tiny).
    """
    cout, cin, kh, kw = kernel.shape
    fr, fi, _, _, hr, hi, _, _ = _mats_2d(nh, w_fft)
    k = kernel.astype(jnp.float32)
    hi_p = lax.Precision.HIGHEST
    # W rfft: contract kw with row-sliced (kw, WB)
    wr = jnp.einsum("ochw,wz->ochz", k, jnp.asarray(fr[:kw]), precision=hi_p)
    wi = jnp.einsum("ochw,wz->ochz", k, jnp.asarray(fi[:kw]), precision=hi_p)
    # H full DFT: contract kh with row-sliced (kh, NH)
    hr_s = jnp.asarray(hr[:kh])
    hi_s = jnp.asarray(hi[:kh])
    sr = (
        jnp.einsum("ochz,hH->ocHz", wr, hr_s, precision=hi_p)
        - jnp.einsum("ochz,hH->ocHz", wi, hi_s, precision=hi_p)
    )
    si = (
        jnp.einsum("ochz,hH->ocHz", wr, hi_s, precision=hi_p)
        + jnp.einsum("ochz,hH->ocHz", wi, hr_s, precision=hi_p)
    )
    return sr, -si  # conjugate -> cross-correlation (torch conv convention)


def _make_kernel2d(nh, wb, w_fft, cin, cout, vh, w_out):
    def body(
        x_hbm, ker_hbm,
        fr, fi, cr, ci, hr, hi, gr, gi,
        out_ref, x_vmem, ker_vmem, dma_sem, ker_sems,
    ):
        b = pl.program_id(0)
        s = pl.program_id(1)
        # stripe rows [s*vh, s*vh + nh) of the H-extended input
        dma = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(s * vh, nh), :], x_vmem, dma_sem
        )
        dma.start()
        dma.wait()
        x = x_vmem[...]  # (Cin, NH, W) real

        # W-axis rfft: contract last dim with (W, WB) — rows are still real
        dn_w = (((2,), (0,)), ((), ()))
        awr = _dot(x, fr[...], dn_w)  # (Cin, NH, WB)
        awi = _dot(x, fi[...], dn_w)
        # H-axis full DFT: contract NH (dim 1) with (NH, NH)
        dn_h = (((1,), (0,)), ((), ()))

        def hmul(ar, ai, mr, mi):
            rr = _dot(ar, mr, dn_h) - _dot(ai, mi, dn_h)
            ii = _dot(ar, mi, dn_h) + _dot(ai, mr, dn_h)
            return rr, ii  # (Cin, WB?, ...) -> dims (Cin, WB, NH)? see below

        # _dot with dn_h on (Cin, NH, WB) contracts dim1 -> output (Cin, WB, NH)
        sr, si = hmul(awr, awi, hr[...], hi[...])  # (Cin, WB, NH)

        # Per-out-channel MAC + inverse. Kernel spectra don't fit VMEM
        # resident (Mosaic wanted 177 MB with double-buffered resident
        # blocks), so they stream from HBM double-buffered: one combined
        # (2, Cin, WB, NH) copy per cout, next cout's copy in flight while
        # this one computes.
        def kdma(o, slot):
            return pltpu.make_async_copy(
                ker_hbm.at[o], ker_vmem.at[slot], ker_sems.at[slot]
            )

        kdma(0, 0).start()
        for o in range(cout):
            if o + 1 < cout:
                kdma(o + 1, (o + 1) % 2).start()
            kdma(o, o % 2).wait()
            kr_o = ker_vmem[o % 2, 0]  # (Cin, WB, NH)
            ki_o = ker_vmem[o % 2, 1]
            yr = jnp.sum(sr * kr_o - si * ki_o, axis=0)  # (WB, NH)
            yi = jnp.sum(sr * ki_o + si * kr_o, axis=0)
            # inverse H: contract NH (last dim now) with iDFT (NH, NH)
            dn_last = (((1,), (0,)), ((), ()))
            er = _dot(yr, gr[...], dn_last) - _dot(yi, gi[...], dn_last)
            ei = _dot(yr, gi[...], dn_last) + _dot(yi, gr[...], dn_last)
            # er/ei: (WB, NH) -> need (NH rows valid, W): inverse W rfft:
            # contract WB (dim 0) with (WB, W)
            dn_first = (((0,), (0,)), ((), ()))
            y = _dot(er, cr[...], dn_first) + _dot(ei, ci[...], dn_first)
            # y: (NH, W) real; valid region [0, vh) x [0, w_out)
            out_ref[0, 0, o] = y[:vh, :w_out]

    return body


@lru_cache(maxsize=None)
def _fused2d_call(b, nstripes, nh, w_fft, wb, cin, cout, vh, w_out, interpret):
    grid_spec = pl.GridSpec(
        grid=(b, nstripes),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x (B, Cin, Hext, W)
            pl.BlockSpec(memory_space=pl.ANY),   # spectra (Cout,2,Cin,WB,NH)
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(8)],
        out_specs=pl.BlockSpec(
            (1, 1, cout, vh, w_out), lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((cin, nh, w_fft), jnp.float32),
            pltpu.VMEM((2, 2, cin, wb, nh), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_kernel2d(nh, wb, w_fft, cin, cout, vh, w_out),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, nstripes, cout, vh, w_out), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def _is_cpu() -> bool:
    return jax.devices()[0].platform == "cpu"


def fft_conv2d_fused(
    signal: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    padding=0,
    padding_mode: str = "constant",
) -> jax.Array:
    """Fused-Pallas 2D FFT convolution (stride=1, dilation=1, groups=1).

    Experimental: not routed by impl="auto" yet. signal (B, Cin, H, W),
    kernel (Cout, Cin, KH, KW).
    """
    if signal.ndim != 4 or kernel.ndim != 4:
        raise ValueError("fft_conv2d_fused expects (B,Cin,H,W) and (Cout,Cin,KH,KW)")
    padding_ = to_ntuple(padding, 2)
    x = F._pad_signal(signal, padding_, padding_mode).astype(jnp.float32)
    b, cin, h, w = x.shape
    cout, cin_k, kh, kw = kernel.shape
    if cin_k != cin:
        raise ValueError(f"kernel Cin {cin_k} != signal Cin {cin}")
    if kh > h or kw > w:
        raise ValueError("Kernel size can't be greater than actual input size")
    if w > _MAX_W or cin > _MAX_CIN or kh >= _NH:
        raise ValueError(
            f"fused 2D limits: W <= {_MAX_W}, Cin <= {_MAX_CIN}, KH < {_NH}"
        )

    nh = _NH
    w_fft = w  # circular along W at the padded width: valid cols cropped
    wb = w_fft // 2 + 1
    # stripe advance rounded to the 8-row sublane tile: Mosaic requires the
    # DMA row offset (stripe * vh) provably tile-aligned
    vh = ((nh - kh + 1) // 8) * 8
    if vh < 8:
        raise ValueError(f"KH {kh} too large for stripe height {nh}")
    vh_total = h - kh + 1
    nstripes = -(-vh_total // vh)
    w_out = w - kw + 1

    out = _fused2d_core(x, kernel.astype(jnp.float32), nh, w_fft, nstripes, vh)
    out = out.reshape(b, nstripes * vh, cout, -1)[:, :vh_total]
    out = jnp.transpose(out, (0, 2, 1, 3))
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1)
    return out.astype(signal.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused2d_core(x, kernel, nh, w_fft, nstripes, vh):
    return _fused2d_forward(x, kernel, nh, w_fft, nstripes, vh)


def _fused2d_forward(x, kernel, nh, w_fft, nstripes, vh):
    b, cin, h, w = x.shape
    cout, _, kh, kw = kernel.shape
    wb = w_fft // 2 + 1
    w_out = w - kw + 1

    # H-extend so every stripe DMA is in-bounds
    need_h = (nstripes - 1) * vh + nh
    x_ext = jnp.pad(x, ((0, 0), (0, 0), (0, need_h - h), (0, 0)))

    kr, ki = kernel_spectrum_2d(kernel, nh, w_fft)  # (Cout, Cin, NH, WB)
    # transpose to the in-kernel x-spectra layout and stack re/im so each
    # out-channel streams in with ONE double-buffered DMA
    spectra = jnp.stack(
        [jnp.transpose(kr, (0, 1, 3, 2)), jnp.transpose(ki, (0, 1, 3, 2))],
        axis=1,
    )  # (Cout, 2, Cin, WB, NH)

    mats = [jnp.asarray(m) for m in _mats_2d(nh, w_fft)]
    call = _fused2d_call(
        b, nstripes, nh, w_fft, wb, cin, cout, vh, w_out, _is_cpu()
    )
    out = call(x_ext, spectra, *mats)
    # (B, nstripes, Cout, VH, W_out) -> (B, nstripes*VH, Cout, W_out)
    return out.transpose(0, 1, 3, 2, 4).reshape(b, nstripes * vh, cout, w_out)


def _fused2d_fwd(x, kernel, nh, w_fft, nstripes, vh):
    return _fused2d_forward(x, kernel, nh, w_fft, nstripes, vh), (x, kernel)


def _fused2d_bwd(nh, w_fft, nstripes, vh, residuals, g_shaped):
    x, kernel = residuals
    b, cin, h, w = x.shape
    cout, _, kh, kw = kernel.shape
    vh_total = h - kh + 1
    # undo the wrapper-visible layout: g (B, nstripes*vh, Cout, W_out)
    g = jnp.transpose(g_shaped, (0, 2, 1, 3))[:, :, :vh_total]
    # dx = conv_transpose(g, kernel); dw = corr over batch (same as 1D bwd)
    dx = F.fft_conv_transpose(g, kernel, impl="xla")
    dw = F.fft_conv(
        jnp.swapaxes(x, 0, 1), jnp.swapaxes(g, 0, 1), impl="xla"
    )
    return dx, jnp.swapaxes(dw, 0, 1)


_fused2d_core.defvjp(_fused2d_fwd, _fused2d_bwd)
