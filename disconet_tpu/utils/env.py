"""Environment plumbing for this TPU image.

The image's sitecustomize registers the 'axon' TPU PJRT plugin in every python
process and sets ``jax_platforms='axon,cpu'`` — which silently overrides the
``JAX_PLATFORMS`` environment variable (config beats env once set). Dev/test
runs that want the host CPU backend must therefore re-apply the env choice via
``jax.config.update`` before any backend initializes. CLIs call
:func:`apply_platform_env` first thing.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Honor an explicit JAX_PLATFORMS env var over sitecustomize's override."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    if jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)


def setup_compilation_cache() -> None:
    """Persistent XLA compile cache: this box has one CPU core; repeated CLI
    invocations must not re-pay multi-minute compiles."""
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache")
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def setup() -> None:
    setup_compilation_cache()
    apply_platform_env()
