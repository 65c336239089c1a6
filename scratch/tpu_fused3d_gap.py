"""TPU probes: (1) where the ~0.23 ms between sum-of-stages (1.07) and
the full fused3d path (1.30) goes; (2) Mosaic page<->sublane transpose
throughput (feasibility of the overlap-save-D v4 design)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fft_conv_tpu.bench.harness import benchmark_fori
from fft_conv_tpu.kernels import fused3d as Z

rng = np.random.default_rng(0)
print("platform:", jax.devices()[0].platform, flush=True)

B, CIN, COUT, D, H, W, K = 2, 8, 8, 64, 64, 64, 8
x = jnp.asarray(rng.standard_normal((B, CIN, D, H, W)).astype(np.float32))
w = jnp.asarray(
    rng.standard_normal((COUT, CIN, K, K, K)).astype(np.float32))
nbh, vdp, pages = Z.plan_3d(CIN, COUT, D, H, W, K, K, K)
me, mr = Z._tap_counts(K)
vh = H - K + 1
od, oh, ow = D - K + 1, H - K + 1, W - K + 1
mats = [jnp.asarray(m) for m in Z._mats_3d(H, vh)]
call = Z._fused3d_call(B, CIN, COUT, H, nbh, pages, vdp, vh, me, mr,
                       Z._PRECISION_3D, False)


def composed(s, k_):
    xx = s.reshape(B, CIN, pages * 2 // 2, 2, H, Z._TW) if False else None
    xp = jnp.pad(s, ((0, 0), (0, 0), (0, 2 * pages - D), (0, 0), (0, 0)))
    xp = xp.reshape(B, CIN, pages, 2, H, Z._TW)
    xp = jnp.transpose(xp, (0, 1, 4, 2, 3, 5))
    xp = xp.reshape(B, CIN, H, pages, 2 * Z._TW)
    kr, ki = Z._kernel_spectra_3d(k_, H, nbh)
    out = call(xp, kr, ki, *mats)
    out = out.reshape(B, COUT, vh, vdp, 2, Z._TW)
    out = jnp.transpose(out, (0, 1, 3, 4, 2, 5))
    out = out.reshape(B, COUT, 2 * vdp, vh, Z._TW)
    return out[:, :, :od, :oh, :ow]


def prof(name, fn, *args):
    t = min(benchmark_fori(jax.jit(fn), *args, num_iterations=20,
                           min_work_s=0.05).mean for _ in range(2))
    print(f"  {name:30s} {t*1e3:8.3f} ms", flush=True)
    return t


prof("manual composed stages", composed, x, w)
prof("_fused3d_forward", lambda s, k_: Z._fused3d_forward(
    s, k_, (od, oh, ow)), x, w)
prof("fft_conv3d_fused", lambda s, k_: Z.fft_conv3d_fused(s, k_), x, w)

# ---- Mosaic transpose probe: (33, 36, 128) page<->sublane swaps, the
# forward-side transposes the overlap-save-D design needs (x8 channels,
# x2 re/im), written into a padded (36, 40, 128) scratch.
P_IN, S_IN, S_OUT, P_OUT = 33, 36, 40, 36


def tr_body(x_ref, o_ref, sc):
    for c in range(CIN):
        for part in range(2):
            v = x_ref[c, part]                    # (33, 36, 128)
            sc[:, :P_IN] = jnp.swapaxes(v, 0, 1)  # (36, 33, 128) -> pad
            o_ref[c, part] = sc[...]
    return


def run_transpose(xin):
    return pl.pallas_call(
        tr_body,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CIN, 2, P_OUT, S_OUT, 128),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((P_OUT, S_OUT, 128), jnp.float32)],
    )(xin)


xt = jnp.asarray(
    rng.standard_normal((CIN, 2, P_IN, S_IN, 128)).astype(np.float32))
try:
    t = prof("16x (33,36,128) transposes", run_transpose, xt)
    mb = CIN * 2 * P_IN * S_IN * 128 * 4 * 2 / 1e6
    print(f"    ~{mb:.0f} MB moved -> {mb/1e3/t:.1f} TB/s", flush=True)
except Exception as e:
    print("  transpose probe FAILED:", type(e).__name__, str(e)[:300],
          flush=True)
