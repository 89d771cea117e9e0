"""Test harness config: run everything on a virtual 8-device CPU mesh.

Real-TPU runs use bench.py / __graft_entry__.py; unit tests must be
hardware-independent and exercise multi-chip sharding on the host platform
(jax's xla_force_host_platform_device_count)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
