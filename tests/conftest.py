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

# Persistent compilation cache for the CPU tier (separate from the TPU
# bench cache).  Two reasons: (a) reruns skip hundreds of XLA:CPU compiles,
# roughly halving tier wall time; (b) the tier's one known infra flake is a
# segfault INSIDE the XLA:CPU compiler that only appears late in a
# long-lived session after ~400 in-process compilations (reproduced at
# test_polar_rx_chain_matches_reference with the full faulthandler stack in
# backend_compile_and_load; the same test is rock-solid in a fresh process)
# — a warm cache removes most of the compile pressure that triggers it.
from srsran_projectvtlmo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_cpu"))
# Only persist executables whose compile took >= 0.5 s: the warm-run win
# comes from the expensive programs, and skipping the hundreds of trivial
# serializations also shrinks the native cache-write surface (one observed
# crash was inside executable serialization, put_executable_and_time).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
