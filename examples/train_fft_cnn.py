"""Example: training a small FFT-convolution network, optionally sharded.

Modules are pytrees, so the training loop is plain functional JAX: jit one
step, grad through the model, tree_map the update. With more than one
device, the same step runs batch-data-parallel + out-channel-tensor-parallel
through fft_conv_tpu.parallel.

Run: python examples/train_fft_cnn.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from fft_conv_tpu import FFTConv1d


def main():
    rng = np.random.default_rng(0)
    k1, k2 = jax.random.split(jax.random.key(0))

    model = {
        "conv1": FFTConv1d(3, 8, 65, padding=32, key=k1),
        "conv2": FFTConv1d(8, 1, 65, padding=32, key=k2),
    }

    x = jnp.asarray(rng.standard_normal((4, 3, 4096)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((4, 1, 4096)), jnp.float32)

    def forward(m, x):
        h = jax.nn.relu(m["conv1"](x))
        return m["conv2"](h)

    @jax.jit
    def train_step(m, x, y):
        loss, grads = jax.value_and_grad(
            lambda m_: jnp.mean((forward(m_, x) - y) ** 2)
        )(m)
        new_m = jax.tree_util.tree_map(lambda p, g: p - 1e-2 * g, m, grads)
        return loss, new_m

    for step in range(5):
        loss, model = train_step(model, x, target)
        print(f"step {step}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
