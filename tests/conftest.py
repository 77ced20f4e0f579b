"""Test configuration: run everything on a virtual 8-device CPU mesh.

Only one real TPU chip exists in this environment (SURVEY.md §5.1), so sharding
logic is tested against XLA's host-CPU backend with 8 virtual devices — the
fake-backend pattern the reference lacks. Must be set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
