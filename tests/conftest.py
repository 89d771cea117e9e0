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
