"""Persistent XLA compilation cache.

This host has a single CPU core, so XLA's TPU compile of the generator
graph costs minutes; caching it across processes makes every run after the
first start in seconds. Call :func:`enable_compile_cache` before the first
jit execution (bench.py, __graft_entry__.py and tests all do).
"""

from __future__ import annotations

import os
import pathlib

_DEFAULT = pathlib.Path(__file__).resolve().parents[2] / ".cache" / "jax"


def enable_compile_cache(path: str | os.PathLike | None = None) -> None:
    import jax

    cache_dir = str(path or os.environ.get("CALIPSYNC_COMPILE_CACHE",
                                           _DEFAULT))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
