"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware, and enable x64 for the
filter/optimizer algebra."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
