#!/usr/bin/env python
"""Headline benchmark: fft_conv speedup vs XLA direct convolution.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x", "vs_baseline": N}

value        = geometric-mean speedup of fft_conv over
               lax.conv_general_dilated across the reference benchmark
               configs with kernels >= 128 elements
               (reference doc/scripts/generate_benchmark_plot.py:128-159:
               1D L=32768 / 2D 512x512 / 3D 64^3, B=2, 8->8 channels).
vs_baseline  = value / 5.0 — fraction of the BASELINE.md target
               (">=5x speedup vs XLA direct conv for kernels >= 128
               elements on v5e"); >= 1.0 means target met.

For each config the framework's time is the better of the composed-XLA path
and the fused Pallas path (1D). Timing uses device-side fori-loop chaining
(bench/harness.py benchmark_fori) — host-side per-dispatch timing through
the TPU tunnel is unreliable (block_until_ready returns early).
"""

import json
import math
import sys
import time

import numpy as np


def direct_conv_fn(ndim):
    """XLA direct-conv baseline: lax.conv_general_dilated, NCHW layout."""
    import jax.numpy as jnp
    from jax import jit, lax

    spatial = "DHW"[3 - ndim :]
    dn = ("NC" + spatial, "OI" + spatial, "NC" + spatial)

    @jit
    def f(sig, ker, bias):
        out = lax.conv_general_dilated(
            sig, ker, window_strides=(1,) * ndim, padding="VALID",
            dimension_numbers=dn,
        )
        return out + bias.reshape((1, -1) + (1,) * ndim)

    return f


def main():
    import jax
    import jax.numpy as jnp

    from fft_conv_tpu import fft_conv
    from fft_conv_tpu.bench.harness import benchmark_fori
    from fft_conv_tpu.kernels.fused1d import fft_conv1d_fused

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)

    # (ndim, spatial, kernel) — reference sweep points with K >= 128 elements
    configs = [
        (1, 32768, 256),
        (1, 32768, 1024),
        (1, 32768, 3840),
        (2, 512, 16),   # 256 elements
        (2, 512, 34),   # 1156 elements
        (3, 64, 8),     # 512 elements
    ]
    iters = 25 if platform == "tpu" else 3

    speedups = []
    details = []
    for ndim, size, k in configs:
        sig = jnp.asarray(
            rng.standard_normal((2, 8) + (size,) * ndim).astype(np.float32)
        )
        ker = jnp.asarray(
            rng.standard_normal((8, 8) + (k,) * ndim).astype(np.float32)
        )
        bias = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))

        t_fft = benchmark_fori(
            lambda s, k, b: fft_conv(s, k, b, impl="xla"), sig, ker, bias,
            num_iterations=iters,
        ).mean
        best = "composed"
        if ndim == 1:
            try:
                t_fused = benchmark_fori(
                    fft_conv1d_fused, sig, ker, bias, num_iterations=iters,
                ).mean
                if t_fused < t_fft:
                    t_fft, best = t_fused, "fused"
            except Exception as e:  # fused path must never sink the bench
                print(f"# fused path failed for {ndim}d K={k}: {e}",
                      file=sys.stderr)
        t_direct = benchmark_fori(
            direct_conv_fn(ndim), sig, ker, bias, num_iterations=iters,
        ).mean
        speedups.append(t_direct / t_fft)
        details.append(
            {
                "config": f"{ndim}d_L{size}_K{k}",
                "fft_ms": round(t_fft * 1e3, 3),
                "direct_ms": round(t_direct * 1e3, 3),
                "speedup": round(t_direct / t_fft, 2),
                "path": best,
            }
        )
        print(f"# {details[-1]}", file=sys.stderr)

    value = math.exp(sum(math.log(s) for s in speedups) / len(speedups))
    print(
        json.dumps(
            {
                "metric": "fft_conv_speedup_vs_xla_direct_geomean_k>=128",
                "value": round(value, 3),
                "unit": "x",
                "vs_baseline": round(value / 5.0, 3),
                "platform": platform,
                "details": details,
            }
        )
    )


if __name__ == "__main__":
    main()
