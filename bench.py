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

For each config the framework's time is the best of its paths: the fused
Pallas kernels (1D/2D/3D) where they fit, the composed-XLA path otherwise.
Every measured path is also PARITY-GATED against the composed path
(which the CPU test grid validates against torch): a mismatch beyond the
scale-aware tolerance fails the whole benchmark loudly, so each driver bench
run doubles as a real-hardware correctness check of the fast paths. The
per-row ``err_mean``/``err_max`` fields record the measured fused-vs-composed
error each run (fresh on-chip backing for the bf16x3 accuracy story).

One additional gate on TPU: a 1-device-mesh ``fft_conv_sharded(...,
impl="fused")`` parity check — the only place compiled Pallas inside
shard_map runs on real hardware (the CPU suite covers interpret mode only).

Timing uses device-side fori-loop chaining (bench/harness.py
benchmark_fori) — host-side per-dispatch timing through the TPU tunnel is
unreliable (block_until_ready returns early).

Resilience: the axon TPU tunnel periodically wedges or drops with
UNAVAILABLE at backend init (this ate the round-3 driver record). Backend
init retries with bounded backoff (~6 min total), and any mid-run failure
still emits the partial JSON (with "partial": true and the error) instead
of a bare traceback — rc stays nonzero unless every row was measured.
"""

import json
import math
import sys
import time

import numpy as np


def _init_backend(max_wait_s: float = 360.0):
    """jax.devices() with bounded retry-backoff against tunnel outages.

    Retries UNAVAILABLE/init errors for up to ~6 minutes (the round-3
    driver bench died on the FIRST jax.devices() raise with zero retries).
    Hangs are not recoverable here — the driver's own timeout handles those.
    """
    import jax

    deadline = time.monotonic() + max_wait_s
    delay = 15.0
    while True:
        try:
            return jax.devices()
        except Exception as e:  # UNAVAILABLE from the tunnel, backend init
            if time.monotonic() + delay > deadline:
                raise RuntimeError(
                    f"backend init failed after {max_wait_s:.0f}s of retries"
                ) from e
            print(f"# backend init failed ({e}); retrying in {delay:.0f}s",
                  file=sys.stderr, flush=True)
            time.sleep(delay)
            delay = min(delay * 1.6, 90.0)


def direct_conv_fn(ndim):
    """XLA direct-conv baseline: lax.conv_general_dilated, NCHW layout."""
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


def _parity_errs(ref, got):
    ref = np.asarray(ref)
    got = np.asarray(got)
    scale = max(1.0, float(np.abs(ref).max()))
    err = np.abs(ref - got)
    return float(err.mean()), float(err.max()), scale


def _assert_parity(name, ref, got, config):
    """Scale-aware two-threshold check: the fast path must match the
    composed path on real hardware (catches Mosaic/layout miscompiles).
    Returns (mean_err, max_err) for the JSON record."""
    mean_err, max_err, scale = _parity_errs(ref, got)
    if mean_err >= 5e-5 * scale or max_err >= 1e-4 * scale:
        raise AssertionError(
            f"PARITY FAILURE [{config}] {name} vs composed: "
            f"mean {mean_err:.3e} max {max_err:.3e} scale {scale:.1f}"
        )
    return mean_err, max_err


def _shardmap_gate(platform, rng):
    """1-device-mesh fused-impl shard_map parity check (TPU only).

    tests/test_sharding.py validates Pallas-inside-shard_map in interpret
    mode on the CPU mesh; this is the real-hardware counterpart: one
    compiled Mosaic dispatch under shard_map, asserted against composed.
    """
    if platform != "tpu":
        return "skipped_non_tpu"
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from fft_conv_tpu import fft_conv
    from fft_conv_tpu.parallel.shard import fft_conv_sharded

    sig = jnp.asarray(
        rng.standard_normal((2, 8, 8192)).astype(np.float32))
    ker = jnp.asarray(
        rng.standard_normal((8, 8, 256)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    ref = np.asarray(fft_conv(sig, ker, bias, impl="xla"))
    got = fft_conv_sharded(sig, ker, bias, mesh=mesh, impl="fused")
    _assert_parity("shard_map+fused", ref, np.asarray(got), "1dev_mesh_1d")
    return "ok"


def main():
    import jax

    # persistent compile cache: the fused/composed pipelines cost 5-15 s
    # each to compile; repeat runs (driver rounds, reruns after tunnel
    # wedges) then start timing immediately
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/fft_conv_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    devices = _init_backend()
    platform = devices[0].platform

    import jax.numpy as jnp

    from fft_conv_tpu import fft_conv
    from fft_conv_tpu.bench.harness import benchmark_fori
    from fft_conv_tpu.kernels.fused1d import fft_conv1d_fused
    from fft_conv_tpu.kernels.fused2d import fft_conv2d_fused
    from fft_conv_tpu.kernels.fused3d import fft_conv3d_fused

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
    failure = None
    gate_result = {"shardmap_gate": "not_run"}

    def emit(partial):
        value = (
            math.exp(sum(math.log(s) for s in speedups) / len(speedups))
            if speedups else 0.0
        )
        record = {
            "metric": "fft_conv_speedup_vs_xla_direct_geomean_k>=128",
            "value": round(value, 3),
            "unit": "x",
            "vs_baseline": round(value / 5.0, 3),
            "platform": platform,
            "parity_gate": "fast paths asserted against composed",
            "shardmap_gate": gate_result["shardmap_gate"],
            "details": details,
        }
        if partial:
            record["partial"] = True
            record["error"] = failure
        print(json.dumps(record), flush=True)

    try:
        for ndim, size, k in configs:
            sig = jnp.asarray(
                rng.standard_normal((2, 8) + (size,) * ndim).astype(np.float32)
            )
            ker = jnp.asarray(
                rng.standard_normal((8, 8) + (k,) * ndim).astype(np.float32)
            )
            bias = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
            config_name = f"{ndim}d_L{size}_K{k}"

            paths = {
                "composed": lambda s, k_, b: fft_conv(s, k_, b, impl="xla")
            }
            # the tiled overlap-save path is NOT timed separately: the fused
            # kernels beat it wherever its plan is non-degenerate (it remains
            # the auto fallback for shapes the fused kernels don't fit)
            if ndim == 1:
                paths["fused"] = fft_conv1d_fused
            if ndim == 2:
                paths["fused"] = fft_conv2d_fused
            if ndim == 3:
                paths["fused"] = fft_conv3d_fused

            ref_out = None
            t_fft, best = None, None
            errs = None
            for name, fn in paths.items():
                try:
                    out = jax.jit(fn)(sig, ker, bias)
                    jax.block_until_ready(out)
                    if name == "composed":
                        ref_out = np.asarray(out)
                        if len(paths) > 1:
                            # composed is only the parity reference when a
                            # fused path exists — timing it too would double
                            # the compile bill (~30 s/config via the tunnel)
                            continue
                    elif ref_out is not None:
                        errs = _assert_parity(name, ref_out, out, config_name)
                    else:
                        print(f"# no composed reference for {config_name}; "
                              f"parity gate skipped for {name}",
                              file=sys.stderr)
                    # best-of-2 full measurements at min_work_s=0.2 (the
                    # differential loop runs >=0.2 s of device work, so
                    # sub-ms rows like 1D K=256 time to convergence rather
                    # than flapping ±15% on tunnel jitter)
                    t = min(
                        benchmark_fori(fn, sig, ker, bias,
                                       num_iterations=iters,
                                       min_work_s=0.2).mean
                        for _ in range(2)
                    )
                except AssertionError:
                    raise  # parity failures must sink the benchmark
                except Exception as e:  # a slow path may not fit; keep going
                    print(f"# {name} path failed for {config_name}: {e}",
                          file=sys.stderr)
                    continue
                if t_fft is None or t < t_fft:
                    t_fft, best = t, name

            if t_fft is None:
                # every fast path failed (e.g. fused compile error after the
                # composed reference was skipped from timing) — time composed
                # as the last resort so one bad path can't sink the benchmark
                t_fft = benchmark_fori(
                    paths["composed"], sig, ker, bias, num_iterations=iters,
                    min_work_s=0.2,
                ).mean
                best = "composed"

            direct_fn = direct_conv_fn(ndim)
            t_direct = min(
                benchmark_fori(direct_fn, sig, ker, bias,
                               num_iterations=iters, min_work_s=0.2).mean
                for _ in range(2)
            )
            speedups.append(t_direct / t_fft)
            # roofline evidence (BASELINE.md target 2): achieved_gbps is the
            # MINIMUM HBM traffic (read signal+kernel once, write output
            # once, f32) over the measured time — the fused pipelines keep
            # all intermediates in VMEM, so this is their true HBM
            # throughput vs the v5e ~819 GB/s roofline. effective_gflops is
            # the direct-conv-equivalent FLOP rate
            # (2*B*Cout*Cin*prod(out)*prod(k)) the pipeline sustains — the
            # honest "work done per second" metric for an FFT algorithm that
            # does asymptotically fewer real flops.
            out_spatial = [size - k + 1] * ndim
            min_bytes = 4 * (
                sig.size + ker.size + 2 * 8 * math.prod(out_spatial)
            )
            direct_flops = 2 * 2 * 8 * 8 * math.prod(out_spatial) * k ** ndim
            row = {
                "config": config_name,
                "fft_ms": round(t_fft * 1e3, 3),
                "direct_ms": round(t_direct * 1e3, 3),
                "speedup": round(t_direct / t_fft, 2),
                "path": best,
                "achieved_gbps": round(min_bytes / t_fft / 1e9, 1),
                "hbm_roofline_frac": round(min_bytes / t_fft / 819e9, 3),
                "effective_gflops": round(direct_flops / t_fft / 1e9, 1),
            }
            if errs is not None:
                row["err_mean"] = float(f"{errs[0]:.3e}")
                row["err_max"] = float(f"{errs[1]:.3e}")
            details.append(row)
            print(f"# {details[-1]}", file=sys.stderr, flush=True)

        try:
            gate = _shardmap_gate(platform, rng)
        except AssertionError:
            raise  # a parity mismatch under shard_map sinks the benchmark
        except Exception as e:  # infra failure: record, don't sink the rows
            gate = f"failed: {type(e).__name__}: {e}"
        gate_result["shardmap_gate"] = gate
        print(f"# shardmap_gate: {gate}", file=sys.stderr, flush=True)
    except BaseException as e:  # noqa: BLE001 — emit partial JSON first
        failure = f"{type(e).__name__}: {e}"
        emit(partial=True)
        raise

    emit(partial=False)


if __name__ == "__main__":
    main()
