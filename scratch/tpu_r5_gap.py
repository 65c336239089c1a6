"""Round-5 probe: attribute the ~0.1 ms unexplained 3D e2e dispatch gap
(VERDICT r4 ask #7 / ROADMAP lever 4) at 64^3 K=8^3.

Strategy: an INCREMENTAL jit-composition chain — pack, pack+kernel,
pack+kernel+unpack, planned e2e (baked spectra), full e2e — so every
addition is measured IN CONTEXT (the r4 probes measured stages
standalone and the sums never reconciled; the r4 barrier probe showed
pack costs 5x more fused into the kernel's jit than alone). The deltas
attribute the whole e2e read or name the owner of what remains.

Also attempts a jax.profiler.trace through the tunnel and reports
whether device-side events are captured at all (expected: the axon
tunnel does not ship xprof device traces; record the finding).

Usage: timeout 2400 python -u scratch/tpu_r5_gap.py
"""
import glob
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/fft_conv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fft_conv_tpu.bench.harness import benchmark_fori  # noqa: E402
from fft_conv_tpu.kernels import fused3d as Z  # noqa: E402

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.default_rng(0)

B, CIN, COUT, L, K = 2, 8, 8, 64, 8
_, nbh, nbhp, pp, nbd, vdp = Z.plan_3d(CIN, COUT, L, L, L, K, K, K)
vh = od = oh = ow = L - K + 1
TW = Z._TW
print(f"nbh={nbh} nbhp={nbhp} pp={pp} nbd={nbd} vdp={vdp} "
      f"xpack={Z._XPACK3D} dbuf={Z._DBUF3D}", flush=True)

x = jnp.asarray(rng.standard_normal((B, CIN, L, L, L)).astype(np.float32))
w = jnp.asarray(
    rng.standard_normal((COUT, CIN, K, K, K)).astype(np.float32) / K**1.5)

kr, ki = jax.jit(lambda k_: Z._kernel_spectra_v4(k_, L, nbh, nbhp))(w)
kr, ki = jax.device_put(kr), jax.device_put(ki)
mats = [jnp.asarray(m) for m in Z._mats_v4(L, vh, nbd, pp)]
call = Z._fused3d_call_v4(B, CIN, COUT, L, nbh, nbhp, pp, nbd, vdp, vh,
                          Z._PRECISION_3D, False, 1, Z._MAC3D_MODE,
                          Z._DBUF3D, False, 0, 0, "h", Z._KANY3D)


def pack_h2(xv):
    # the shipping "h2" pack (fused3d._fused3d_forward xpack == "h2")
    xq = jnp.pad(xv, ((0, 0), (0, 0), (0, 2 * pp - L), (0, 0), (0, 0)))
    xq = xq.reshape(B, CIN, pp, 2, L, TW)
    xq = jnp.transpose(xq, (0, 1, 2, 4, 3, 5))
    xq = xq.reshape(B, CIN * pp, L, 2 * TW)
    return jnp.swapaxes(xq, 1, 2)


def unpack(o):
    o = o.reshape(B, vh, COUT, vdp, 2, TW)
    o = jnp.transpose(o, (0, 2, 3, 4, 1, 5))
    o = o.reshape(B, COUT, 2 * vdp, vh, TW)
    return o[:, :, :od, :oh, :ow]


def spectra_fn(ww):
    return Z._kernel_spectra_v4(ww, L, nbh, nbhp)


from fft_conv_tpu.kernels.fused3d import (  # noqa: E402
    fft_conv3d_fused,
    plan_fft_conv3d,
)

planned = plan_fft_conv3d(w, None, signal_dhw=(L, L, L))

STAGES = [
    ("pack", lambda xv: pack_h2(xv)),
    ("pack+kern", lambda xv: call(pack_h2(xv), kr, ki, *mats)),
    ("pk+k+unpack", lambda xv: unpack(call(pack_h2(xv), kr, ki, *mats))),
    ("e2e planned", lambda xv: planned(xv)),
    ("e2e full", lambda xv: fft_conv3d_fused(xv, w)),
]

prev = 0.0
readings = {}
for name, fn in STAGES:
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(x))
    t = min(benchmark_fori(jfn, x, num_iterations=20,
                           min_work_s=0.2).mean for _ in range(2))
    readings[name] = t
    print(f"{name:12s} {t*1e3:7.4f} ms  (delta {(t-prev)*1e3:+7.4f})",
          flush=True)
    prev = t

# spectra chain standalone (loop-carried weight so it can't hoist)
jsp = jax.jit(lambda ww: spectra_fn(ww)[0])
jax.block_until_ready(jsp(w))
tsp = min(benchmark_fori(jsp, w, num_iterations=20, min_work_s=0.2).mean
          for _ in range(2))
print(f"{'spectra':12s} {tsp*1e3:7.4f} ms (standalone; in-loop it hoists "
      f"except ~5us — r4 measurement)", flush=True)

gap_planned = readings["e2e planned"] - readings["pk+k+unpack"]
gap_full = readings["e2e full"] - readings["e2e planned"]
print(f"residual: planned-vs-(pk+k+unpack) {gap_planned*1e3:+.4f} ms "
      f"(wrapper cast/crop beyond the probe's unpack), "
      f"full-vs-planned {gap_full*1e3:+.4f} ms (in-loop spectra+dispatch)",
      flush=True)

# --- profiler attempt ---------------------------------------------------
tdir = "/tmp/r5trace"
os.system(f"rm -rf {tdir}")
try:
    jfull = jax.jit(STAGES[-1][1])
    with jax.profiler.trace(tdir):
        for _ in range(3):
            jax.block_until_ready(jfull(x))
    files = glob.glob(tdir + "/**/*", recursive=True)
    sizes = {os.path.basename(f): os.path.getsize(f)
             for f in files if os.path.isfile(f)}
    print("trace files:", sizes, flush=True)
    xplanes = [f for f in files if f.endswith(".xplane.pb")]
    if xplanes:
        raw = open(xplanes[0], "rb").read()
        # cheap content sniff: device planes are named /device:TPU in the
        # serialized proto; host-only traces carry only /host:CPU
        has_tpu = b"TPU" in raw
        print(f"xplane bytes={len(raw)} contains_TPU_plane={has_tpu}",
              flush=True)
except Exception as e:
    print(f"profiler trace FAILED: {type(e).__name__}: {e}", flush=True)
