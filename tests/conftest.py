"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Must set flags before jax initializes a backend (hence top of conftest).
"""
import os

# Force-assign: the ambient environment may pin JAX_PLATFORMS to a TPU
# plugin (e.g. axon); tests must run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
