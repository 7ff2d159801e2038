"""Persistent XLA compilation cache.

The flagship train step takes minutes to compile; enabling JAX's persistent
cache makes every subsequent process start near-instant (the reference has
no equivalent concern — torch eager). Called by the train CLI and the
serving engine.
"""

from __future__ import annotations

import os

import jax


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    cache_dir = cache_dir or os.environ.get(
        "VITS_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "vits_tpu_xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return cache_dir
