"""Tiled (overlap-save) spectral convolution — the 2D/3D fast path.

Whole-image DFT-matmul convolution (ops/spectral.py) pays O(N) matmul flops
per output sample per axis. Overlap-save tiling cuts that to O(T) with tile
size T << N, at the price of (T / (T-K+1))^d overlap redundancy — for the
reference 2D benchmark (512^2 image, K=16: reference
doc/scripts/generate_benchmark_plot.py:139-148) a 128^2 tile does ~3.3x
fewer matmul flops than the 512^2 transform. Tiles also keep every matmul
operand MXU-shaped (short contractions, large merged batch dims).

The decomposition is the N-d analog of the fused 1D kernel's overlap-save
blocks (kernels/fused1d.py), expressed in plain XLA so it composes with
every fft_conv feature (groups, stride, dilation, transpose, any ndim) and
differentiates via JAX AD:

    pad right -> stack overlapping tiles (lax.slice copies; ~(T/V)^d of the
    input, no gather) -> per-tile rfftn as DFT matmuls -> per-bin grouped
    MAC (VPU, fused into the transforms by XLA) -> per-tile irfftn ->
    crop each tile's leading valid V samples -> reassemble (one reshape)

Replaces the reference's single whole-signal rfftn -> complex_matmul ->
irfftn (reference functional.py:68-75) when the tile plan is cheaper; the
caller (ops/functional._fft_conv) makes that static routing decision via
``plan_tiles``.
"""

from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .spectral import irfftn_matmul, rfftn_matmul

# Candidate tile FFT lengths per axis. Any even length works (dense DFT
# matrices, no radix constraint); the plan search minimizes a flops+bytes
# cost over the cross product. "Whole axis" (single tile) is always included
# as a candidate, so the planner degrades gracefully to the untiled path.
_TILE_CANDIDATES = (
    32, 48, 64, 96, 128, 160, 192, 256, 320, 384, 512, 768, 1024, 1536, 2048,
)

# Rough cost weights: matmul flops at HIGHEST-precision MXU rate vs HBM
# bytes for the tile extraction/reassembly copies. XLA fuses the MAC and
# adjacent transforms, so spectra round-trip far less than a naive count;
# calibrated against a v5e tile-size sweep (2026-08-16: measured rankings at
# 512^2 K=16/K=34 and 64^3 K=8 match this model's).
_BYTES_TO_FLOPS = 10.0


def _axis_cost(t: int) -> float:
    """Per-sample matmul work of transforming one axis of length t.

    Floored at 128: a DFT matmul contracts t elements, and contractions
    shorter than the 128-wide MXU run at t/128 utilization, so shrinking a
    tile below 128 buys no real time (v5e sweep: 64^3-volume tiles of 32-48
    were 3-8x SLOWER than the model's unfloored prediction).
    """
    return float(max(t, 128))


def untiled_shape(
    spatial: Tuple[int, ...],
    kernel: Tuple[int, ...],
    out_len: Tuple[int, ...],
) -> Tuple[int, ...]:
    """Per-axis length of the single transform covering all of out_len
    (even-rounded) — the planner's untiled candidate AND the composed
    path's FFT shape for the same problem."""
    return tuple(
        (s + max(0, o - (s - k + 1)) + 1) // 2 * 2
        for s, k, o in zip(spatial, kernel, out_len)
    )


@lru_cache(maxsize=None)
def plan_tiles(
    spatial: Tuple[int, ...],
    kernel: Tuple[int, ...],
    out_len: Tuple[int, ...],
    channels: Tuple[int, int, int],
) -> Tuple[Tuple[int, ...], float, float]:
    """Chooses per-axis tile FFT sizes minimizing modeled cost.

    Returns (tile_shape, tiled_cost, whole_cost); tile_shape[i] == the
    whole-axis FFT length when tiling that axis doesn't pay. Costs are
    comparable across plans of the same problem only.

    spatial: padded signal spatial shape; kernel: dilated kernel spatial
    shape; out_len: required output samples per axis; channels:
    (batch, cin, cout).
    """
    b, cin, cout = channels
    n = len(spatial)

    # The untiled candidate must cover ALL requested outputs in one
    # transform: when out_len exceeds the natural valid size s-k+1 (the
    # transposed-conv zero-extension case) the single transform is longer
    # — s + (out - (s-k+1)) — exactly the composed path's FFT length.
    # Modeling it as the bare signal size made plan_cost tile the "whole"
    # candidate 2x per axis and inflated its cost ~3x, which routed 3D
    # transposed convs into a 32^3 tiling measured 10x SLOWER than
    # composed (19.9 ms vs 2.1 ms at 64^3 K=4, v5e 2026-08-17).
    whole = untiled_shape(spatial, kernel, out_len)

    def plan_cost(ts: Sequence[int]) -> float:
        nt = []
        for t, k, v in zip(ts, kernel, out_len):
            vt = t - k + 1
            if vt < 1:
                return float("inf")
            nt.append(-(-v // vt))
        ntiles = int(np.prod(nt))
        tvol = int(np.prod(ts))
        # spectra memory guard: split-re/im f32 spectra for all tiles of
        # both operands must stay well under HBM
        if ntiles * tvol * b * (cin + cout) * 8 > 2 * 2**30:
            return float("inf")
        # forward transforms on cin instances + inverse on cout, each axis a
        # matmul contracting T_i over the tile volume
        flops = b * (cin + cout) * ntiles * tvol * sum(_axis_cost(t) for t in ts)
        # MAC: one complex multiply-accumulate per bin per (b, cout, cin_g)
        flops += 8 * b * cout * cin * ntiles * tvol // 2
        # tile extraction + one spectra round trip + reassembly, f32
        tiled_bytes = 4 * ntiles * tvol * b * 2 * (cin + cout)
        return flops + tiled_bytes * _BYTES_TO_FLOPS

    whole_cost = plan_cost(whole)

    best = whole
    best_cost = whole_cost
    # independent per-axis search around the cross product: greedy per-axis
    # refinement converges for this separable-ish cost and avoids the full
    # candidate^n sweep
    cands = [
        sorted(
            {t for t in _TILE_CANDIDATES if kernel[i] < t < whole[i]}
            | {whole[i]}
        )
        for i in range(n)
    ]
    cur = list(whole)
    for _ in range(3):
        changed = False
        for i in range(n):
            for t in cands[i]:
                trial = cur.copy()
                trial[i] = t
                c = plan_cost(trial)
                if c < best_cost:
                    best, best_cost = tuple(trial), c
                    cur = trial
                    changed = True
        if not changed:
            break
    return best, best_cost, whole_cost


def _window_axis(x: jax.Array, axis: int, tile: int, valid: int, nt: int):
    """Split ``axis`` (length >= anything) into (nt, tile) overlapping
    windows; window j covers [j*valid, j*valid + tile), zero-padded past the
    end.

    O(1) ops regardless of nt: right-pad to (nt+1)*valid, reshape the axis
    to (nt+1, valid) — row j+1 starts exactly at the overlap region of
    window j — then window j = concat(row j, first tile-valid of row j+1).
    Requires the overlap tile-valid <= valid (one extra row covers it),
    which the planner guarantees; falls back to explicit slices otherwise.
    """
    s = x.shape[axis]
    overlap = tile - valid
    if nt == 1:
        need = tile
        if need != s:
            pad = [(0, 0)] * x.ndim
            pad[axis] = (0, max(0, need - s))
            x = jnp.pad(x, pad) if need > s else lax.slice_in_dim(x, 0, need, axis=axis)
        return jnp.expand_dims(x, axis)

    if overlap <= valid:
        need = (nt + 1) * valid
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, max(0, need - s))
        if need > s:
            x = jnp.pad(x, pad)
        elif need < s:
            x = lax.slice_in_dim(x, 0, need, axis=axis)
        shape = list(x.shape)
        shape[axis : axis + 1] = [nt + 1, valid]
        g = x.reshape(shape)
        main = lax.slice_in_dim(g, 0, nt, axis=axis)
        if overlap == 0:
            return main
        nxt = lax.slice_in_dim(g, 1, nt + 1, axis=axis)
        nxt = lax.slice_in_dim(nxt, 0, overlap, axis=axis + 1)
        return jnp.concatenate([main, nxt], axis=axis + 1)

    # rare fallback (tile > 2*valid): explicit strided windows
    need = (nt - 1) * valid + tile
    if need != s:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, max(0, need - s))
        x = jnp.pad(x, pad) if need > s else lax.slice_in_dim(x, 0, need, axis=axis)
    slices = [
        lax.slice_in_dim(x, j * valid, j * valid + tile, axis=axis)
        for j in range(nt)
    ]
    return jnp.stack(slices, axis=axis)


def _stack_tiles(
    x: jax.Array,
    tile: Sequence[int],
    valid: Sequence[int],
    nt: Sequence[int],
):
    """(B, C, *S) -> (B, C, *nt, *tile): overlapping windows, axis by axis.

    Each axis costs O(1) XLA ops (reshape + two slices + concat) via
    ``_window_axis``; right-side zero padding doubles as the zero-extension
    the transposed-conv caller relies on.
    """
    n = len(tile)
    for i in range(n):
        axis = 2 + i * 2  # current position of spatial axis i
        x = _window_axis(x, axis, tile[i], valid[i], nt[i])
    # layout (B, C, nt1, T1, nt2, T2, ...) -> (B, C, nt..., T...)
    perm = (0, 1)
    perm += tuple(2 + 2 * i for i in range(n))
    perm += tuple(3 + 2 * i for i in range(n))
    return jnp.transpose(x, perm)


def _tiled_mac(sr, si, kr, ki, groups: int, n_tile_dims: int):
    """Grouped per-bin MAC with conjugated kernel, broadcast over tile dims.

    Split-real form of reference complex_matmul (functional.py:11-16):
    out = sig * conj(ker) summed over Cin/g.
    """
    b, cin = sr.shape[0], sr.shape[1]
    cout = kr.shape[0]
    cin_g, cout_g = cin // groups, cout // groups
    freq = sr.shape[2:]
    fbins = kr.shape[2:]
    ones = (1,) * n_tile_dims

    def xs(a):
        return a.reshape(b, groups, 1, cin_g, *freq)

    def ks(a):
        return a.reshape(1, groups, cout_g, cin_g, *ones, *fbins)

    xr, xi = xs(sr), xs(si)
    wr, wi = ks(kr), ks(ki)
    out_r = jnp.sum(xr * wr + xi * wi, axis=3).reshape(b, cout, *freq)
    out_i = jnp.sum(xi * wr - xr * wi, axis=3).reshape(b, cout, *freq)
    return out_r, out_i


def tiled_valid_corr(
    signal: jax.Array,
    kernel: jax.Array,
    groups: int = 1,
    out_len: Optional[Tuple[int, ...]] = None,
    tile: Optional[Tuple[int, ...]] = None,
) -> jax.Array:
    """Valid-region cross-correlation via overlap-save DFT-matmul tiles.

    signal (B, Cin, *S) and kernel (Cout, Cin/g, *K) are already
    dilated/padded by the caller. Returns (B, Cout, *out_len) where
    out_len defaults to the valid size S-K+1; larger out_len treats the
    signal as zero-extended (the transposed-conv case, where the reference
    crops beyond the nominal valid region — functional.py:163-169).
    """
    n = signal.ndim - 2
    k_sp = kernel.shape[2:]
    valid_nat = tuple(signal.shape[2 + i] - k_sp[i] + 1 for i in range(n))
    out_len = tuple(out_len) if out_len is not None else valid_nat

    in_dtype = signal.dtype
    if in_dtype != jnp.float32:
        signal = signal.astype(jnp.float32)
        kernel = kernel.astype(jnp.float32)

    if tile is None:
        tile, _, _ = plan_tiles(
            signal.shape[2:], k_sp, out_len,
            (signal.shape[0], signal.shape[1], kernel.shape[0]),
        )
    vt = tuple(t - k + 1 for t, k in zip(tile, k_sp))
    # window count covers exactly the outputs the caller keeps; right-side
    # zero padding in _stack_tiles supplies the zero-extension semantics
    nt = tuple(-(-o // v) for o, v in zip(out_len, vt))

    x = _stack_tiles(signal, tile, vt, nt)

    sr, si = rfftn_matmul(x, tile)
    kr, ki = rfftn_matmul(kernel, tile)
    or_, oi = _tiled_mac(sr, si, kr, ki, groups, n)
    y = irfftn_matmul(or_, oi, tile)  # (B, Cout, *nt, *tile)

    # keep each tile's leading valid samples, then stitch:
    # (B, C, nt..., vt...) -> (B, C, nt1, vt1, nt2, vt2, ...) -> reshape
    y = lax.slice(
        y,
        (0,) * y.ndim,
        y.shape[: 2 + n] + vt,
    )
    perm = (0, 1) + tuple(
        val for i in range(n) for val in (2 + i, 2 + n + i)
    )
    y = jnp.transpose(y, perm)
    y = y.reshape(y.shape[0], y.shape[1], *[nt[i] * vt[i] for i in range(n)])
    y = lax.slice(
        y, (0, 0) + (0,) * n, y.shape[:2] + out_len
    )
    return y.astype(in_dtype)


def tiling_wins(
    spatial: Tuple[int, ...],
    kernel: Tuple[int, ...],
    out_len: Tuple[int, ...],
    channels: Tuple[int, int, int],
    margin: float = 1.25,
) -> bool:
    """Static routing predicate: does the best tile plan beat the whole-image
    transform by at least ``margin`` in modeled cost?"""
    tile, tiled_cost, whole_cost = plan_tiles(spatial, kernel, out_len, channels)
    return tiled_cost * margin < whole_cost
