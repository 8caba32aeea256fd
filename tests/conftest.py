"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers a TPU ('axon') backend and pins
`JAX_PLATFORMS=axon` at interpreter start, so env vars alone don't work —
we must override the config after importing jax (backends init lazily, so
this is safe as long as no array op ran yet).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# XLA compiles dominate suite wall time; persist them across runs
# (first run populates ~tests/.jax_cache, later runs hit it).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_pipe():
    """One shared tiny InvertibleCD per test session — model init and jit
    compiles dominate suite wall time, and the pipeline is read-only for
    tests (its jit cache is shared on purpose)."""
    from invertible_cd_tpu.testing import tiny_bundle

    return tiny_bundle()


@pytest.fixture(scope="session")
def tiny_pipe_xl():
    """Shared tiny SDXL bundle (see tiny_pipe)."""
    from invertible_cd_tpu.testing import tiny_bundle_xl

    return tiny_bundle_xl()
