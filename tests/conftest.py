"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware.

Note: the axon TPU plugin in this environment ignores the JAX_PLATFORMS
environment variable, so we must set the config programmatically before any
backend is initialized."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
