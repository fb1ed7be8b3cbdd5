"""Persistent XLA compile cache for the CLI drivers.

Big graphs take 30-150 s to compile on first use (CLAUDE.md); without a
persistent cache every daemon restart / CLI invocation pays that again —
measured ~2-4 min of recompiles per `serve` process at 600-s-video shapes.
bench.py has always set this cache; the drivers now share it.

TPU-only by default: XLA:CPU's AOT executable serializer segfaulted twice
on this host (see tests/conftest.py), so the CPU backend (tests, local
smoke) stays cache-less unless VIDI_JAX_CACHE is set explicitly.
"""
from __future__ import annotations

import os


def setup_compile_cache() -> None:
    import jax

    path = os.environ.get("VIDI_JAX_CACHE")
    if path is None:
        if jax.default_backend() == "cpu":
            return
        path = "/tmp/vidi_tpu_jax_cache"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
