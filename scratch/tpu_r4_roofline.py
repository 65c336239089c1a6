"""Round-4 roofline/MFU accounting -> doc/roofline.json.

For every headline bench row, measures the fused end-to-end time and
computes BOTH roof distances:
  * MXU roof: the kernel's actual matmul MAC count (the same expressions
    as each pallas_call's CostEstimate) at the v5e bf16 peak, x3 passes
    for bf16x3 (hi*hi + hi*lo + lo*hi) — the compute-bound ideal.
  * HBM roof: minimum possible traffic (read signal+kernel once, write
    output once, f32) at ~819 GB/s — the bandwidth-bound ideal.
The larger of the two is the binding roof; mfu/hbm fractions quantify
the distance. BASELINE.md target 2 frames the kernels as HBM-bound;
this artifact shows they are COMPUTE-bound (dense-DFT matmuls trade
bandwidth for MXU flops), so the MXU roof is the honest yardstick.

Usage: timeout 2400 python -u scratch/tpu_r4_roofline.py
Writes doc/roofline.json.
"""
import json
import math
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fft_conv_tpu.bench.harness import benchmark_fori  # noqa: E402
from fft_conv_tpu.kernels import fused1d, fused2d, fused3d  # noqa: E402

# v5e single-chip peaks
BF16_PEAK = 197e12   # flops/s (MXU)
HBM_GBPS = 819e9


def mats_1d(b, n, k, cin, cout, l_pad):
    n1, n2 = fused1d.fused_split(n)
    v = ((n - k + 1) // n2) * n2
    v1 = v // n2
    nblk = -(-(l_pad - k + 1) // v)
    n1h = n1 // 2 + 1
    flops_cell = (
        2 * n2 * (
            n1h * 2 * n1 + n1h * 4 * n2 + n1h * 4 * n2 + v1 * 2 * n1h
        ) * (cin + cout) // 2 * b
    )
    return flops_cell * nblk


def mats_2d(b, k, cin, cout, hw):
    plan = fused2d.tile_plan_2d(k, k, cin, cout)
    t1, v1, nb1, t2, v2 = plan
    oh = ow = hw - k + 1
    nt1 = -(-oh // v1)
    nt2 = -(-ow // v2)
    cell = 2 * nt2 * t2 * (
        2 * nb1 * t1 * cin + 4 * nb1 * cin * t2
        + 4 * nb1 * cout * t2 + 2 * v1 * nb1 * cout
    )
    return cell * b * nt1


def mats_3d(b, k, cin, cout, l):
    plan = fused3d.plan_3d(cin, cout, l, l, l, k, k, k)
    assert plan[0] == "v4"
    _, nbh, nbhp, pp, nbd, vdp = plan
    r_ = 8 * nbd
    vh = l - k + 1
    h = l
    matmul = b * 2 * (
        cin * (2 * nbhp * h + 4 * 128) * pp * 128
        + 4 * r_ * nbhp * 128 * (cin * pp + cout * vdp)
        + cout * (4 * 128 + 2 * vh * nbh / 128) * vdp * 128
    )
    vpu = b * 2 * cout * cin * r_ * nbhp * 128 * 4
    return matmul, vpu


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    rows = []
    configs = [
        (1, 32768, 256), (1, 32768, 1024), (1, 32768, 3840),
        (2, 512, 16), (2, 512, 34), (3, 64, 8),
    ]
    for ndim, size, k in configs:
        sig = jnp.asarray(
            rng.standard_normal((2, 8) + (size,) * ndim).astype(np.float32))
        ker = jnp.asarray(
            rng.standard_normal((8, 8) + (k,) * ndim).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
        fn = {1: fused1d.fft_conv1d_fused, 2: fused2d.fft_conv2d_fused,
              3: fused3d.fft_conv3d_fused}[ndim]
        t = min(
            benchmark_fori(fn, sig, ker, bias, num_iterations=25,
                           min_work_s=0.2).mean for _ in range(2))
        vpu_ops = 0.0
        if ndim == 1:
            n = fused1d.choose_fft_size(k, size, 8, 8, batch=2)
            matmul_flops = mats_1d(2, n, k, 8, 8, size)
            # MAC: 4 mult + 4 add per (o,cin_g) per one-sided bin element
            n1, n2 = fused1d.fused_split(n)
            v = ((n - k + 1) // n2) * n2
            nblk = -(-(size - k + 1) // v)
            vpu_ops = nblk * (n1 // 2 + 1) * 2 * 8 * 8 * n2 * 8
        elif ndim == 2:
            matmul_flops = mats_2d(2, k, 8, 8, size)
            plan = fused2d.tile_plan_2d(k, k, 8, 8)
            t1, v1, nb1, t2, v2 = plan
            o = size - k + 1
            vpu_ops = (
                2 * (-(-o // v1)) * (-(-o // v2)) * nb1 * t2 * 8 * 8 * 8
            )
        else:
            matmul_flops, vpu_ops = mats_3d(2, k, 8, 8, size)
        out_spatial = (size - k + 1) ** ndim
        min_bytes = 4 * (sig.size + ker.size + 2 * 8 * out_spatial)
        mxu_ideal_s = 3 * matmul_flops / BF16_PEAK   # bf16x3 = 3 passes
        hbm_ideal_s = min_bytes / HBM_GBPS
        binding = "mxu" if mxu_ideal_s > hbm_ideal_s else "hbm"
        rows.append({
            "config": f"{ndim}d_L{size}_K{k}",
            "fused_ms": round(t * 1e3, 4),
            "matmul_gflops_logical": round(matmul_flops / 1e9, 2),
            "mxu_ideal_ms_bf16x3": round(mxu_ideal_s * 1e3, 4),
            "mfu_vs_bf16x3_peak": round(mxu_ideal_s / t, 3),
            "vpu_gops": round(vpu_ops / 1e9, 2),
            "min_hbm_mb": round(min_bytes / 1e6, 1),
            "hbm_ideal_ms": round(hbm_ideal_s * 1e3, 4),
            "hbm_roofline_frac": round(hbm_ideal_s / t, 3),
            "binding_roof": binding,
            "roof_gap_x": round(
                t / max(mxu_ideal_s, hbm_ideal_s), 2),
        })
        print(rows[-1], flush=True)
    out = {
        "hardware": "TPU v5e (single chip)",
        "peaks": {"bf16_mxu_flops": BF16_PEAK, "hbm_bytes_per_s": HBM_GBPS},
        "note": (
            "Dense-DFT FFT-conv kernels are COMPUTE-bound by design: all "
            "intermediates stay in VMEM, so HBM traffic is ~the minimum "
            "possible and hbm_roofline_frac is small BECAUSE the kernels "
            "do MXU work instead of streaming spectra through HBM. The "
            "binding roof per row is 'mxu'; mfu_vs_bf16x3_peak is the "
            "honest utilization metric. roof_gap_x = measured / binding "
            "ideal (dispatch, DMA, VPU MAC, layout stages, and sub-128-row "
            "matmul pipeline fill account for the gap; see the stage "
            "ablations in doc/ROADMAP.md and scratch/)."
        ),
        "rows": rows,
    }
    with open("/root/repo/doc/roofline.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote doc/roofline.json", flush=True)


if __name__ == "__main__":
    main()
