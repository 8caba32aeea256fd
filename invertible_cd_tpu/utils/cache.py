"""Persistent XLA-executable cache setup.

Setting JAX_COMPILATION_CACHE_DIR in the environment is INERT in
containers whose sitecustomize imports jax at interpreter start (to
register a backend plugin): the config default is read before user code
runs. An explicit `jax.config.update` after import works regardless —
and on the tunneled-TPU (axon) backend the cache genuinely round-trips
executables across processes (verified 2026-08-20: second-process
compile of a probe program 2.7 s -> 1.2 s; for the full SD1.5 generate
program it is the difference between a ~6 min remote compile and
seconds). Call this once per entry point, right after importing jax.
"""
from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/icd_tpu_jax_cache"


def enable_persistent_compilation_cache(path: str | None = None) -> str:
    import jax

    # Respect an already-configured cache dir (e.g. tests/conftest.py
    # points the suite at tests/.jax_cache) — only fill in the default
    # when nothing set one.
    current = jax.config.jax_compilation_cache_dir
    if path is None and current:
        return current
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
