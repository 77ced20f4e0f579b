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
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

# The image's sitecustomize registers the axon TPU plugin and force-sets
# jax_platforms='axon,cpu' in EVERY python process, overriding the env var —
# re-apply the CPU choice explicitly (utils/env.py documents this).
import jax  # noqa: E402

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.devices()[0].platform
    )
