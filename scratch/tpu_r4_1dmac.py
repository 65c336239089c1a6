"""Round-4 measurement: fused 1D per-bin MAC strategies on v5e.

The K=256 cell ablation (scratch/tpu_fused1d_ablate.py, pre-one-siding)
put the MAC at ~13 us — the largest single VPU block left. Candidates
(see fused1d._MAC_MODE): "loop" (baseline), "stacked" (half the big-op
count), "kara" (3-mult complex), "bcast" (single rank-5 broadcast).

Decision input for the _MAC_MODE default.
Usage: timeout 2400 python -u scratch/tpu_r4_1dmac.py
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import fft_conv_tpu.kernels.fused1d as f1  # noqa: E402
from fft_conv_tpu.bench.harness import benchmark_fori  # noqa: E402

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

sig = jnp.asarray(rng.standard_normal((2, 8, 32768)).astype(np.float32))
bias = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))

for k in (256, 1024, 3840):
    ker = jnp.asarray(rng.standard_normal((8, 8, k)).astype(np.float32))
    ref = None
    for mode in ("loop", "stacked", "kara", "bcast"):
        f1.set_fused1d_mac(mode)

        def fn(s, w, b):
            return f1.fft_conv1d_fused(s, w, b)

        try:
            out = jax.jit(fn)(sig, ker, bias)
            jax.block_until_ready(out)
            out = np.asarray(out)
            if ref is None:
                ref = out
            err = np.abs(out - ref).max()
            t = min(
                benchmark_fori(fn, sig, ker, bias, num_iterations=25,
                               min_work_s=0.2).mean
                for _ in range(2))
            print(f"K={k:4d} {mode:8s}: {t*1e3:7.3f} ms  "
                  f"max_vs_loop={err:.2e}", flush=True)
        except Exception as e:
            print(f"K={k:4d} {mode:8s}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    f1.set_fused1d_mac("loop")
