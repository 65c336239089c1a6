"""Benchmark driver: crossover curves of FFT conv vs direct conv on TPU.

TPU-native counterpart of the reference CUDA sweep
(reference doc/scripts/generate_benchmark_plot.py:125-199): same three
configs (1D L=32768, 2D 512^2, 3D 64^3; B=2, 8->8 channels; :128-159), same
measured quantities (wall time + peak device memory, mean±std with warm-up
dropped), with two gaps fixed: raw numbers are written to JSON (the
reference ships only a PNG), and the fused Pallas path is swept alongside
the composed path where applicable.

Methods: fft_conv / fft_conv_transpose (auto-routed: fused Pallas where
its plan fits, composed XLA otherwise), explicit fft_conv_fused /
fft_conv_transpose_fused rows for every dimension (1D/2D/3D), and
naive_conv / naive_conv_transpose
(lax.conv_general_dilated / conv_transpose — the XLA direct baselines).

Run:  python -m fft_conv_tpu.bench.generate_benchmark_plot [--out DIR]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class BenchConfig:
    """One sweep: mirrors reference generate_benchmark_plot.py:128-159."""

    label: str
    ndim: int
    input_size: int
    kernel_sizes: Tuple[int, ...]
    batch_size: int = 2
    in_channels: int = 8
    out_channels: int = 8
    num_iterations: int = 16


CONFIGS = [
    BenchConfig("1D", 1, 32768, (1, 256, 768, 1280, 1792, 2304, 2816, 3328, 3840)),
    BenchConfig("2D", 2, 512, (1, 4, 10, 16, 22, 28, 34, 40, 46)),
    BenchConfig("3D", 3, 64, (1, 2, 4, 6, 8)),
]


def _naive_conv(ndim):
    from jax import jit, lax

    spatial = "DHW"[3 - ndim:]
    dn = ("NC" + spatial, "OI" + spatial, "NC" + spatial)

    @jit
    def f(sig, ker, bias):
        out = lax.conv_general_dilated(
            sig, ker, window_strides=(1,) * ndim, padding="VALID",
            dimension_numbers=dn,
        )
        return out + bias.reshape((1, -1) + (1,) * ndim)

    return f


def _naive_conv_transpose(ndim):
    from jax import jit, lax

    spatial = "DHW"[3 - ndim:]
    dn = ("NC" + spatial, "IO" + spatial, "NC" + spatial)

    @jit
    def f(sig, ker, bias):
        out = lax.conv_transpose(
            sig, ker, strides=(1,) * ndim, padding="VALID",
            dimension_numbers=dn,
        )
        return out + bias.reshape((1, -1) + (1,) * ndim)

    return f


def _methods(ndim) -> Dict[str, Callable]:
    from ..kernels.fused1d import fft_conv1d_fused, fft_conv_transpose1d_fused
    from ..kernels.fused2d import fft_conv2d_fused, fft_conv_transpose2d_fused
    from ..kernels.fused3d import fft_conv3d_fused, fft_conv_transpose3d_fused
    from ..ops.functional import fft_conv, fft_conv_transpose

    methods = {
        "fft_conv": lambda s, k, b: fft_conv(s, k, b),
        "fft_conv_transpose": lambda s, kt, b: fft_conv_transpose(s, kt, b),
        "naive_conv": _naive_conv(ndim),
        "naive_conv_transpose": _naive_conv_transpose(ndim),
    }
    # explicit labeled fused rows for every dimension (the fused wrappers
    # fall back to composed when no plan fits, e.g. kernel_size=1 in 1D)
    fused, fused_t = {
        1: (fft_conv1d_fused, fft_conv_transpose1d_fused),
        2: (fft_conv2d_fused, fft_conv_transpose2d_fused),
        3: (fft_conv3d_fused, fft_conv_transpose3d_fused),
    }[ndim]
    methods["fft_conv_fused"] = lambda s, k, b: fused(s, k, b)
    methods["fft_conv_transpose_fused"] = lambda s, kt, b: fused_t(s, kt, b)
    return methods


def run_sweep(
    configs: Optional[List[BenchConfig]] = None,
    checkpoint_path: Optional[str] = None,
    resume: bool = False,
) -> List[dict]:
    """Sweeps every (config, kernel size, method) point.

    ``checkpoint_path``: if given, the accumulated rows are re-written
    there after EVERY point — the TPU tunnel occasionally wedges
    mid-sweep (observed: >50 min silent on one compile), and a killed
    run must not lose the hours of points already measured.

    ``resume``: load ``checkpoint_path`` if present and skip every
    (config, method, kernel_size) already measured on the SAME platform —
    a killed full sweep picks up where it died instead of re-paying the
    measured points."""
    import jax

    # persistent compile cache: the sweep compiles ~40 (method, point)
    # pipelines at 5-15 s each through the tunnel; with the cache a rerun
    # (or a driver re-invocation after a tunnel wedge) skips straight to
    # the measurements
    try:
        from .harness import repo_cache_dir

        jax.config.update("jax_compilation_cache_dir", repo_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from .harness import benchmark_fori, peak_memory_gib

    configs = configs or CONFIGS
    # bounded retry against tunnel UNAVAILABLE at backend init (the same
    # failure mode that ate the round-3 driver bench record)
    deadline = time.monotonic() + 360.0
    delay = 15.0
    while True:
        try:
            platform = jax.devices()[0].platform
            break
        except Exception as e:
            if time.monotonic() + delay > deadline:
                raise
            print(f"backend init failed ({e}); retrying in {delay:.0f}s",
                  file=sys.stderr, flush=True)
            time.sleep(delay)
            delay = min(delay * 1.6, 90.0)
    rng = np.random.default_rng(0)
    rows = []
    done = set()
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        try:
            with open(checkpoint_path) as f:
                rows = [
                    r for r in json.load(f)
                    if r.get("platform") == platform
                    # drop unmeasured (null-time) rows so resume retries them
                    and r.get("time_mean_s") is not None
                ]
            done = {
                (r["config"], r["method"], r["kernel_size"]) for r in rows
            }
            print(f"resuming: {len(done)} points already measured",
                  flush=True)
        except Exception as e:
            print(f"resume load failed ({e}); starting fresh", flush=True)
            rows, done = [], set()
    for cfg in configs:
        methods = _methods(cfg.ndim)
        for k in cfg.kernel_sizes:
            sig = jnp.asarray(
                rng.standard_normal(
                    (cfg.batch_size, cfg.in_channels) + (cfg.input_size,) * cfg.ndim
                ).astype(np.float32)
            )
            ker = jnp.asarray(
                rng.standard_normal(
                    (cfg.out_channels, cfg.in_channels) + (k,) * cfg.ndim
                ).astype(np.float32)
            )
            ker_t = jnp.swapaxes(ker, 0, 1)
            bias = jnp.asarray(
                rng.standard_normal((cfg.out_channels,)).astype(np.float32)
            )
            for name, fn in methods.items():
                if (cfg.label, name, k) in done:
                    continue
                arg_k = ker_t if "transpose" in name else ker
                try:
                    t = benchmark_fori(
                        fn, sig, arg_k, bias,
                        num_iterations=cfg.num_iterations,
                        min_work_s=0.2,
                    )
                    mem, mem_src = peak_memory_gib(fn, sig, arg_k, bias)
                    row = {
                        "config": cfg.label,
                        "method": name,
                        "kernel_size": k,
                        "time_mean_s": t.mean,
                        "time_std_s": t.std,
                        "peak_mem_gib": mem,
                        "peak_mem_source": mem_src,
                        "platform": platform,
                    }
                    if not np.isfinite(t.mean) or t.mean <= 0:
                        # benchmark_fori reports NaN when even the scaled
                        # re-measure produced a non-positive differential;
                        # record the point as explicitly unmeasured rather
                        # than plotting an infinite-speedup artifact
                        row["time_mean_s"] = None
                        row["time_std_s"] = None
                        row["note"] = "non-positive differential; unmeasurable"
                    rows.append(row)
                    shown = ("   (unmeasurable)" if row["time_mean_s"] is None
                             else f"{t.mean * 1e3:9.3f} ms ± {t.std * 1e3:.3f}")
                    print(
                        f"{cfg.label} k={k:5d} {name:22s} {shown}",
                        flush=True,
                    )
                except Exception as e:  # keep sweeping (reference :192-193)
                    print(f"{cfg.label} k={k} {name}: {type(e).__name__}: {e}")
                if checkpoint_path:
                    # atomic: a kill mid-dump must not truncate the
                    # previously checkpointed rows
                    tmp = checkpoint_path + ".tmp"
                    with open(tmp, "w") as f:
                        json.dump(rows, f, indent=1)
                    os.replace(tmp, checkpoint_path)
    return rows


def plot(rows: List[dict], out_png: str) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping plot")
        return
    configs = sorted({r["config"] for r in rows})
    # two rows like the reference plot (reference generate_benchmark_plot.py:
    # 162-199): execution time on top, peak memory below
    fig, axes = plt.subplots(
        2, len(configs), figsize=(5 * len(configs), 8), squeeze=False
    )
    for col, cfg in enumerate(configs):
        ax_t, ax_m = axes[0][col], axes[1][col]
        for method in sorted({r["method"] for r in rows if r["config"] == cfg}):
            pts = sorted(
                (
                    r["kernel_size"],
                    r["time_mean_s"],
                    r["time_std_s"],
                    r.get("peak_mem_gib", 0.0),
                )
                for r in rows
                if r["config"] == cfg and r["method"] == method
                and r.get("time_mean_s") is not None  # unmeasured points
            )
            if not pts:
                continue
            ks, means, stds, mems = zip(*pts)
            ax_t.errorbar(ks, means, yerr=stds, label=method, marker="o", ms=3)
            if any(m > 0 for m in mems):
                ax_m.plot(ks, mems, label=method, marker="o", ms=3)
        ax_t.set_yscale("log")
        ax_t.set_title(f"{cfg} execution time")
        ax_t.set_xlabel("kernel size")
        ax_t.set_ylabel("time (s)")
        ax_t.legend(fontsize=7)
        ax_m.set_yscale("log")
        ax_m.set_title(f"{cfg} peak memory")
        ax_m.set_xlabel("kernel size")
        ax_m.set_ylabel("memory (GiB)")
        ax_m.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    print(f"wrote {out_png}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="doc")
    parser.add_argument("--quick", action="store_true",
                        help="3 kernel sizes per config")
    parser.add_argument("--resume", action="store_true",
                        help="skip points already in the checkpoint JSON "
                             "(same platform); continue a killed sweep")
    args = parser.parse_args()
    configs = CONFIGS
    if args.quick:
        # keep num_iterations high even in quick mode: the differential
        # timing's noise floor is ~0.5 ms at 6 iterations, swamping sub-ms
        # rows; compiles dominate the wall time either way
        configs = [
            dataclasses.replace(
                c, kernel_sizes=c.kernel_sizes[:: max(1, len(c.kernel_sizes) // 3)],
                num_iterations=24,
            )
            for c in CONFIGS
        ]
    os.makedirs(args.out, exist_ok=True)
    json_path = os.path.join(args.out, "benchmark_results.json")
    rows = run_sweep(configs, checkpoint_path=json_path, resume=args.resume)
    with open(json_path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {json_path}")
    plot(rows, os.path.join(args.out, "benchmark.png"))


if __name__ == "__main__":
    main()
