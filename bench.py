#!/usr/bin/env python
"""Headline benchmark: fft_conv speedup vs XLA direct convolution.

Output protocol (driver-survivable): after EVERY completed config this
script prints one complete cumulative JSON record on stdout, so a tail
capture at ANY moment — including a SIGKILL from the driver's timeout —
holds the last known state as a parseable line. Intermediate lines carry
``"partial": true``; the final line is the same record without it:

  {"metric": ..., "value": N, "unit": "x", "vs_baseline": N, ...}

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

Resilience (the r3 record died at backend init, the r4 record died in a
silent hang — both through the axon tunnel):
  * backend init retries with bounded backoff (~6 min total);
  * a WATCHDOG DAEMON THREAD (deadline FFTCONV_BENCH_DEADLINE_S, default
    1020 s) emits the partial record and hard-exits if the main thread
    wedges inside a C call (SIGALRM handlers cannot preempt those; a
    thread can still print and _exit as long as the hang releases the
    GIL, which the tunnel's gRPC waits do);
  * any raised mid-run failure emits the partial record before re-raising;
  * the persistent compile cache lives REPO-LOCAL (.jax_cache/, gitignored)
    so repeat driver runs in the same workspace skip the ~10-30 s/config
    Mosaic compile bill (/tmp need not survive between rounds);
  * configs run cheapest-compile-first (1D < 2D < 3D), so rows start
    landing on stdout within the first minutes of a cold run.
"""

import json
import math
import os
import sys
import threading
import time

import numpy as np

_STATE = {
    "platform": "unknown",
    "stage": "startup",
    "speedups": [],
    "details": [],
    "shardmap_gate": "not_run",
    "failure": None,
    "done": False,
}
_EMIT_LOCK = threading.Lock()


def _emit(partial):
    """Print the full cumulative record as one JSON line on stdout.

    The record is BUILT under _EMIT_LOCK — the main thread appends each
    (speedup, row) pair under the same lock, so a watchdog-thread emit
    always snapshots a consistent value/details pair."""
    with _EMIT_LOCK:
        speedups = list(_STATE["speedups"])
        details = list(_STATE["details"])
        value = (
            math.exp(sum(math.log(s) for s in speedups) / len(speedups))
            if speedups else 0.0
        )
        record = {
            "metric": "fft_conv_speedup_vs_xla_direct_geomean_k>=128",
            "value": round(value, 3),
            "unit": "x",
            "vs_baseline": round(value / 5.0, 3),
            "platform": _STATE["platform"],
            "parity_gate": "fast paths asserted against composed",
            "shardmap_gate": _STATE["shardmap_gate"],
            "details": details,
        }
        if partial:
            record["partial"] = True
            record["stage"] = _STATE["stage"]
            if _STATE["failure"]:
                record["error"] = _STATE["failure"]
        print(json.dumps(record), flush=True)


def _watchdog(deadline_s: float):
    """Daemon thread: if the run hasn't finished by the deadline, emit the
    cumulative partial record and hard-exit 3. Survives C-level hangs
    (tunnel gRPC waits, Mosaic compiles) that SIGALRM cannot interrupt."""
    time.sleep(deadline_s)
    if _STATE["done"]:
        return
    _STATE["failure"] = (
        f"watchdog deadline {deadline_s:.0f}s hit at stage "
        f"{_STATE['stage']!r}"
    )
    print(f"# WATCHDOG: {_STATE['failure']}", file=sys.stderr, flush=True)
    _emit(partial=True)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(3)


def _init_backend(max_wait_s: float = 360.0):
    """jax.devices() with bounded retry-backoff against tunnel outages.

    Retries UNAVAILABLE/init errors for up to ~6 minutes (the round-3
    driver bench died on the FIRST jax.devices() raise with zero retries).
    A HANG here is covered by the watchdog thread, which emits the empty
    partial record with stage="backend_init" before exiting.
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
    scale = max(1.0, float(np.std(ref)))
    err = np.abs(ref - got)
    return float(err.mean()), float(err.max()), scale


def _assert_parity(name, ref, got, config):
    """The bf16x3 ERROR CONTRACT, asserted on real hardware: the fast path
    must match the composed path within err_mean < 2e-5*sigma and
    err_max < 1.2e-4*sigma, sigma = max(1, std(composed)). Same model as
    tests/helpers._assert_close_scaled (measured on v5e: 5.4-6.0e-6 /
    3.4-4.0e-5 per sigma, >=3x headroom — scratch/tpu_r5_bf16.py). Also
    catches Mosaic/layout miscompiles outright. Returns (mean_err,
    max_err) for the JSON record."""
    mean_err, max_err, scale = _parity_errs(ref, got)
    if mean_err >= 2e-5 * scale or max_err >= 1.2e-4 * scale:
        raise AssertionError(
            f"PARITY FAILURE [{config}] {name} vs composed: "
            f"mean {mean_err:.3e} max {max_err:.3e} sigma {scale:.1f}"
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
    deadline_s = float(os.environ.get("FFTCONV_BENCH_DEADLINE_S", "1020"))
    threading.Thread(
        target=_watchdog, args=(deadline_s,), daemon=True
    ).start()

    import jax

    # persistent compile cache: the fused/composed pipelines cost 5-15 s
    # each to compile; repeat runs (driver rounds, reruns after tunnel
    # wedges) then start timing immediately. REPO-LOCAL so it survives
    # across driver rounds in the same checkout (/tmp may not).
    try:
        from fft_conv_tpu.bench.harness import repo_cache_dir

        jax.config.update("jax_compilation_cache_dir", repo_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    _STATE["stage"] = "backend_init"
    devices = _init_backend()
    platform = devices[0].platform
    _STATE["platform"] = platform

    import jax.numpy as jnp

    from fft_conv_tpu import fft_conv
    from fft_conv_tpu.bench.harness import benchmark_fori
    from fft_conv_tpu.kernels.fused1d import fft_conv1d_fused
    from fft_conv_tpu.kernels.fused2d import fft_conv2d_fused
    from fft_conv_tpu.kernels.fused3d import fft_conv3d_fused

    rng = np.random.default_rng(0)

    # (ndim, spatial, kernel) — reference sweep points with K >= 128
    # elements, ordered cheapest-compile-first (1D < 2D < 3D) so rows land
    # on stdout within minutes even on a cold cache
    configs = [
        (1, 32768, 256),
        (1, 32768, 1024),
        (1, 32768, 3840),
        (2, 512, 16),   # 256 elements
        (2, 512, 34),   # 1156 elements
        (3, 64, 8),     # 512 elements
    ]
    iters = 25 if platform == "tpu" else 3

    speedups = _STATE["speedups"]
    details = _STATE["details"]

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
            _STATE["stage"] = config_name

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
                    # than flapping ±15% on tunnel jitter); NaN = harness
                    # gave up on a non-positive differential — drop it
                    ts = [
                        benchmark_fori(fn, sig, ker, bias,
                                       num_iterations=iters,
                                       min_work_s=0.2).mean
                        for _ in range(2)
                    ]
                    ts = [v for v in ts if math.isfinite(v) and v > 0]
                    if not ts:
                        raise RuntimeError("unmeasurable (NaN differential)")
                    t = min(ts)
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
                if not (math.isfinite(t_fft) and t_fft > 0):
                    # never let NaN into speedups/JSON (json.dumps would
                    # emit a bare NaN token strict parsers reject, breaking
                    # the always-parseable stdout contract)
                    raise RuntimeError(
                        f"composed fallback unmeasurable for {config_name}")
                best = "composed"

            direct_fn = direct_conv_fn(ndim)
            t_directs = [
                benchmark_fori(direct_fn, sig, ker, bias,
                               num_iterations=iters, min_work_s=0.2).mean
                for _ in range(2)
            ]
            t_directs = [v for v in t_directs if math.isfinite(v) and v > 0]
            if not t_directs:
                raise RuntimeError(
                    f"direct baseline unmeasurable for {config_name}")
            t_direct = min(t_directs)
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
            # append both under the emit lock so a concurrently-firing
            # watchdog can never snapshot a speedup without its row (or
            # vice versa)
            with _EMIT_LOCK:
                speedups.append(t_direct / t_fft)
                details.append(row)
            print(f"# {details[-1]}", file=sys.stderr, flush=True)
            # stream the cumulative record: the driver's tail now holds a
            # parseable line no matter when (or how hard) this run dies
            _emit(partial=True)

        _STATE["stage"] = "shardmap_gate"
        try:
            gate = _shardmap_gate(platform, rng)
        except AssertionError:
            raise  # a parity mismatch under shard_map sinks the benchmark
        except Exception as e:  # infra failure: record, don't sink the rows
            gate = f"failed: {type(e).__name__}: {e}"
        _STATE["shardmap_gate"] = gate
        print(f"# shardmap_gate: {gate}", file=sys.stderr, flush=True)
    except BaseException as e:  # noqa: BLE001 — emit partial JSON first
        _STATE["failure"] = f"{type(e).__name__}: {e}"
        _emit(partial=True)
        raise

    _STATE["done"] = True
    _emit(partial=False)


if __name__ == "__main__":
    main()
