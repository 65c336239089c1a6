"""Round-5 measurement: opt-in "bf16" single-pass dot mode vs bf16x3.

All six bench configs; for each, fused e2e under bf16x3 (default) and
bf16 (1 MXU pass per dot), plus error vs the composed f32 path. Decision
input for whether the serving mode is worth documenting with numbers.
Usage: timeout 2400 python -u scratch/tpu_r5_bf16.py
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import fft_conv_tpu.kernels.fused1d as f1  # noqa: E402
import fft_conv_tpu.kernels.fused2d as f2  # noqa: E402
import fft_conv_tpu.kernels.fused3d as f3  # noqa: E402
from fft_conv_tpu.bench.harness import benchmark_fori  # noqa: E402
from fft_conv_tpu.ops.functional import fft_conv  # noqa: E402

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

CONFIGS = [
    ("1d_K256", (4, 4, 32768), (4, 4, 256)),
    ("1d_K1024", (4, 4, 32768), (4, 4, 1024)),
    ("1d_K3840", (4, 4, 32768), (4, 4, 3840)),
    ("2d_K16", (2, 4, 512, 512), (4, 4, 16, 16)),
    ("2d_K34", (2, 4, 512, 512), (4, 4, 34, 34)),
    ("3d_K8", (2, 8, 64, 64, 64), (8, 8, 8, 8, 8)),
]


def set_all(mode):
    f1.set_fused_precision(mode)
    f2.set_fused2d_precision(mode)
    f3.set_fused3d_precision(mode)


for name, sshape, kshape in CONFIGS:
    sig = jnp.asarray(rng.standard_normal(sshape).astype(np.float32))
    ker = jnp.asarray(rng.standard_normal(kshape).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((kshape[0],)).astype(np.float32))
    ref = np.asarray(fft_conv(sig, ker, bias, impl="xla"))
    scale = max(1.0, float(np.std(ref)))
    row = [name]
    for mode in ("bf16x3", "bf16"):
        set_all(mode)

        def fn(s, w, b):
            return fft_conv(s, w, b, impl="fused")

        try:
            out = jax.jit(fn)(sig, ker, bias)
            jax.block_until_ready(out)
            err = np.abs(np.asarray(out) - ref)
            t = min(
                benchmark_fori(fn, sig, ker, bias, num_iterations=25,
                               min_work_s=0.2).mean
                for _ in range(2))
            row.append(
                f"{mode}: {t*1e3:7.3f} ms (rel_mean {err.mean()/scale:.2e} "
                f"rel_max {err.max()/scale:.2e})")
        except Exception as e:
            row.append(f"{mode}: FAILED {type(e).__name__}: {e}")
    set_all("bf16x3")
    print("  |  ".join(row), flush=True)
