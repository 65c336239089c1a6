"""TPU probe (r4): v4 kernel exposed-HBM experiments at 64^3 K=8^3.

The stage ablation (tpu_fused3d_v5_ablate.py, re-run 2026-08-19) puts
0.168 ms of the 0.619 ms kernel in the stage-0 block = dispatch + x DMA
(21 MB) + Pallas-prologue spectra copy (21 MB) + out (15 MB) — ~340 GB/s
aggregate, 2.4x off the HBM roof. Two live-range-neutral overlaps:
  dbuf="par" — x copy split into CIN parallel DMAs, all started then all
               waited up front (aggregate-bandwidth test only).
  kany=True  — spectra as pl.ANY operands, DMA'd by the kernel into
               persistent scratch behind the in-flight x copy, waited
               only before the MAC (hidden under the fwd transforms).
"""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused3d as Z
import fft_conv_tpu.ops.functional as F

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)

B, CIN, COUT, L, K = 2, 8, 8, 64, 8
x = jnp.asarray(rng.standard_normal((B, CIN, L, L, L)).astype(np.float32))
w = jnp.asarray(
    rng.standard_normal((COUT, CIN, K, K, K)).astype(np.float32) / K**1.5)

ref = jax.jit(lambda s, k: F.fft_conv(s, k, impl="xla"))(x, w)
ref = jax.block_until_ready(ref)

for dbuf in (False, "par"):
    for kany in (False, True):
        Z.set_fused3d_dbuf(dbuf)
        Z.set_fused3d_kany(kany)
        fn = jax.jit(lambda s, k: F.fft_conv(s, k, impl="fused"))
        try:
            out = jax.block_until_ready(fn(x, w))
        except Exception as e:  # Mosaic allocation failures etc.
            print(f"dbuf={dbuf!s:5} kany={kany!s:5} FAILED: "
                  f"{str(e)[:120]}", flush=True)
            continue
        err = float(jnp.max(jnp.abs(out - ref)))
        t = min(benchmark_fori(fn, x, w).mean for _ in range(3))
        print(f"dbuf={dbuf!s:5} kany={kany!s:5} {t*1e3:7.3f} ms  "
              f"maxerr={err:.2e}", flush=True)

Z.set_fused3d_dbuf(False)
Z.set_fused3d_kany(False)
