"""Test harness: force JAX onto 8 virtual CPU devices.

Sharding tests exercise the (data, model) mesh without TPU hardware
(SURVEY.md §4 implications). Must run before jax initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin (sitecustomize) registers itself regardless of the
# JAX_PLATFORMS env var; jax.config wins over it.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
