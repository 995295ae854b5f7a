"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend and forces
JAX_PLATFORMS=axon, so a plain env setdefault is not enough: we overwrite the
env var and update the jax config before any backend is initialized.  Tests
never touch the (single, tunneled) real TPU chip; sharded code paths are
validated on 8 virtual host devices instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
