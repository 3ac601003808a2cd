"""Test configuration: force JAX onto an 8-device virtual CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

This container's sitecustomize force-registers the axon TPU plugin and
hard-sets jax_platforms="axon,cpu" in every process, so the JAX_PLATFORMS
env var alone is not enough — we must also flip the config after import.
XLA_FLAGS must be set before the lazy CPU client is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
