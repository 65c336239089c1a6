"""TPU recheck at pristine HEAD: the two rows whose readings moved —
3D 64^3 K=8 (r4 snapshot 0.946 ms, yesterday's probes 1.27 ms) and
2D 512 K=34 (r3 0.58 ms, r4 snapshot 0.725 ms). Bench-identical
methodology: jit(fn(sig, ker, bias)), benchmark_fori best-of-3 at
min_work_s=0.2."""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax import lax

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels.fused2d import fft_conv2d_fused
from fft_conv_tpu.kernels.fused3d import fft_conv3d_fused

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)


def direct(ndim):
    spatial = "DHW"[3 - ndim:]
    dn = ("NC" + spatial, "OI" + spatial, "NC" + spatial)

    def f(sig, ker, bias):
        out = lax.conv_general_dilated(
            sig, ker, (1,) * ndim, "VALID", dimension_numbers=dn)
        return out + bias.reshape((1, -1) + (1,) * ndim)

    return f


CASES = [
    ("3d fused  K8 ", fft_conv3d_fused, 3, 64, 8),
    ("3d direct K8 ", direct(3), 3, 64, 8),
    ("2d fused  K34", fft_conv2d_fused, 2, 512, 34),
    ("2d direct K34", direct(2), 2, 512, 34),
    ("2d fused  K16", fft_conv2d_fused, 2, 512, 16),
]

for name, fn, ndim, size, k in CASES:
    sig = jnp.asarray(
        rng.standard_normal((2, 8) + (size,) * ndim).astype(np.float32))
    ker = jnp.asarray(
        rng.standard_normal((8, 8) + (k,) * ndim).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(sig, ker, bias))
    ts = [benchmark_fori(jfn, sig, ker, bias, num_iterations=25,
                         min_work_s=0.2).mean for _ in range(3)]
    print(f"{name}  best {min(ts)*1e3:8.4f} ms   "
          f"all {[round(t*1e3, 4) for t in ts]}", flush=True)
