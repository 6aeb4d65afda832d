"""Test configuration: run everything on an emulated 8-device CPU mesh.

The reference has no tests (SURVEY.md §4); this suite is new capability. The
8 virtual CPU devices stand in for a TPU slice so data/tensor-parallel
``jit``/``shard_map`` code is exercised without hardware.
"""
import os

# Must be set before jax is imported anywhere in the test process.
os.environ["JAX_PLATFORMS"] = "cpu"
# The CPU backend defaults to per-step dispatch (trainer.py: fused chunks
# only amortize accelerator-tunnel latency and the chunked TRAIN graph is
# pathologically slow under XLA:CPU at real sizes). Tiny test shapes stay
# fast either way — pin the fused path ON so the chunked train/eval graphs
# keep their coverage on the emulated mesh.
os.environ.setdefault("PAIG_FUSED", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


def pytest_configure(config):
    import jax

    # The environment's TPU plugin overrides jax_platforms via
    # sitecustomize, so the env var alone is not enough — force the CPU
    # backend explicitly before any backend initialization.
    jax.config.update("jax_platforms", "cpu")

    # Persistent XLA compilation cache: first run pays the compile cost,
    # reruns are fast. Safe to delete .jax_cache at any time.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
