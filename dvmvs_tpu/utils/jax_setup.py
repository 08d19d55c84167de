"""Process-level JAX configuration for drivers and benchmarks."""

from __future__ import annotations

import os

import jax


def setup_jax(cache_dir: str = None):
    """Enable the persistent compilation cache (remote TPU compiles here run
    60-120 s; the cache makes driver restarts fast)."""
    if os.environ.get("DVMVS_FORCE_CPU") == "1":
        # the sandbox sitecustomize pins jax_platforms to the remote TPU;
        # this knob forces the host platform (smoke tests, CI)
        jax.config.update("jax_platforms", "cpu")
    cache_dir = cache_dir or os.environ.get(
        "DVMVS_TPU_JAX_CACHE", os.path.expanduser("~/.cache/dvmvs_tpu_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
