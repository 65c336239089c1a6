"""Example: filtering a long audio stream three ways.

Shows the three execution modes on the library's headline use case
(long-1D-signal convolution, reference README.md:29-30):

  1. one-shot  — fft_conv, impl="auto" (fused Pallas kernel on TPU)
  2. planned   — plan_fft_conv, kernel spectrum baked for serving
  3. streaming — chunked causal convolution with carried state

Run: python examples/long_audio_filter.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from fft_conv_tpu import fft_conv
from fft_conv_tpu.ops import (
    plan_fft_conv,
    streaming_conv1d_init,
    streaming_conv1d_step,
)


def main():
    rng = np.random.default_rng(0)
    batch, channels, length, taps = 2, 4, 1 << 18, 513

    audio = jnp.asarray(rng.standard_normal((batch, channels, length)), jnp.float32)
    fir = jnp.asarray(rng.standard_normal((channels, channels, taps)), jnp.float32)
    fir = fir * (1.0 / taps)

    # 1. one-shot
    filtered = fft_conv(audio, fir, padding=taps // 2)
    print(f"one-shot:  {filtered.shape} on {jax.devices()[0].platform}")

    # 2. planned (serve many buffers with one kernel)
    plan = plan_fft_conv(fir, padding=taps // 2, signal_spatial=(length,))
    served = plan(audio)
    print(f"planned:   {served.shape}, max diff vs one-shot "
          f"{float(jnp.abs(served - filtered).max()):.2e}")

    # 3. streaming (causal) over 1024-sample chunks
    chunk_len = 1024
    state = streaming_conv1d_init(batch, channels, taps)
    outs = []
    for start in range(0, length, chunk_len):
        chunk = jax.lax.dynamic_slice_in_dim(audio, start, chunk_len, axis=2)
        y, state = streaming_conv1d_step(state, chunk, fir)
        outs.append(y)
    streamed = jnp.concatenate(outs, axis=-1)
    print(f"streaming: {streamed.shape} ({length // chunk_len} chunks, causal)")


if __name__ == "__main__":
    main()
