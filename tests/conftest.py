"""Test env: force CPU with 8 virtual devices so mesh/sharding tests run
anywhere (the TPU-world answer to testing distributed without a cluster).

The container's sitecustomize registers a remote-TPU ('axon') backend and
pins JAX_PLATFORMS=axon, so the env var alone is not enough — we must flip
the config knob before any backend is initialised.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
