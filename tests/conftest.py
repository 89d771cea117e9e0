"""Test harness config: run everything on a virtual 8-device CPU mesh.

Real-TPU runs use bench.py / __graft_entry__.py; unit tests must be
hardware-independent and exercise multi-chip sharding on the host platform
(xla_force_host_platform_device_count). The container's sitecustomize
force-registers the axon TPU backend and overrides JAX_PLATFORMS, so the
platform is pinned via jax.config after import instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is dominated by XLA:CPU compiles on
# this 1-core host (13 min cold); cached executables bring reruns under the
# 5-minute budget
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
