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

# Persistent compilation cache: first runs are compile-dominated
# (interpret-mode Pallas + many jit variants); caching compiled
# executables on disk plus the xdist `-n 4 --dist loadscope` default
# (pyproject addopts) brings the warm default suite under 3 min wall
# (179 s measured round 4; serial warm: ~8.5 min) — what makes running
# tests before every commit viable. loadscope matters: plain `load`
# scatters same-module tests and re-runs module fixtures per worker
# (~5 min).
_cache = os.environ.get("SGNT_JAX_CACHE",
                        os.path.expanduser("~/.cache/sgnt_jax_cache"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
