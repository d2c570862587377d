"""Persistent XLA compilation cache setup.

The proving kernels are big straight-line integer graphs that XLA compiles
slowly (especially XLA:CPU); caching compiled executables on disk makes
every process after the first start fast. Safe to call multiple times.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/keyless_zk_tpu/xla")


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("KEYLESS_ZK_TPU_CACHE", DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
