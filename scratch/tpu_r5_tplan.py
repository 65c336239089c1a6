"""Round-5 check: plan_fft_conv_transpose fused tiers on real TPU.

The plan's fused tiers are platform-gated (plan_fft_conv routes fused
only on TPU), so the CPU suite can only cover tiers 2/3. This drives
the 1D and 2D fused-tier transpose plans on hardware: parity vs the
composed per-call transpose, plus the serving latency delta the plan
buys (it amortizes the kernel flip/swap/dilate + spectra transform).

Usage: timeout 1800 python -u scratch/tpu_r5_tplan.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fft_conv_tpu.bench.harness import benchmark_fori  # noqa: E402
from fft_conv_tpu.ops.functional import fft_conv_transpose  # noqa: E402
from fft_conv_tpu.ops.plan import plan_fft_conv_transpose  # noqa: E402

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

CASES = [
    ("1d_L32768_K1024_s1", (2, 8, 32768), (8, 8, 1024), dict()),
    ("2d_L256_K16_s2", (2, 8, 256, 256), (8, 8, 16, 16),
     dict(stride=2, padding=4, output_padding=1)),
]

for name, sshape, kshape, kw in CASES:
    sig = jnp.asarray(rng.standard_normal(sshape).astype(np.float32))
    ker = jnp.asarray(rng.standard_normal(kshape).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((kshape[1],)).astype(np.float32))

    def percall(s, k_, b):
        return fft_conv_transpose(s, k_, b, **kw)

    plan = plan_fft_conv_transpose(
        ker, bias, signal_spatial=sshape[2:], max_batch=sshape[0], **kw)

    ref = np.asarray(jax.jit(percall)(sig, ker, bias))
    got = np.asarray(plan(sig))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    err = np.abs(got - ref)
    sc = max(1.0, float(ref.std()))
    ok = err.mean() < 2e-5 * sc and err.max() < 1.2e-4 * sc
    tp = min(benchmark_fori(percall, sig, ker, bias, num_iterations=25,
                            min_work_s=0.2).mean for _ in range(2))
    tl = min(benchmark_fori(plan, sig, num_iterations=25,
                            min_work_s=0.2).mean for _ in range(2))
    print(f"{name}: percall {tp*1e3:7.3f} ms  planned {tl*1e3:7.3f} ms "
          f"({tp/tl:.2f}x)  contract_ok={ok} "
          f"(mean {err.mean():.2e} max {err.max():.2e} sigma {sc:.1f})",
          flush=True)
