"""Test configuration: force an 8-device CPU mesh before JAX initializes.

All correctness tests run on CPU (deterministic, no TPU tunnel flakiness);
the virtual 8-device mesh is the distributed test fabric (SURVEY §4: the
multi-device analog of a fake backend). TPU performance is exercised by
bench.py, not pytest.

NOTE: on this image the ``JAX_PLATFORMS`` env var is ignored by the 'axon'
TPU plugin — ``jax.config.update("jax_platforms", ...)`` is the reliable way
to pin the backend, so we set both.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
