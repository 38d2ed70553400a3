"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding tests run on host-platform virtual devices
(``--xla_force_host_platform_device_count=8``), per SURVEY.md §4's
"same loss on 1 vs N devices" strategy.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# The container's sitecustomize registers the axon TPU plugin and resets
# jax_platforms to "axon,cpu"; force CPU (virtual 8-device mesh) for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# TPU-style bf16 matmul defaults would mask precision bugs in invertibility
# tests; pin to full f32.
jax.config.update("jax_default_matmul_precision", "highest")
