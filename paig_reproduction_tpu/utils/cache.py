"""Persistent XLA compilation cache setup, shared by every entry point
(CLI, bench, tools). First compile of a given graph pays the (slow,
~minutes through the TPU tunnel) cost; every later process reuses it.
Override the location with ``PAIG_COMPILE_CACHE``; set it to ``0`` to
disable."""
from __future__ import annotations

import os


def enable_compile_cache() -> None:
    import jax

    cache_dir = os.environ.get(
        "PAIG_COMPILE_CACHE", os.path.expanduser("~/.cache/paig_jax"))
    if cache_dir and cache_dir != "0":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
