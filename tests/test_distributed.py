"""Multi-host (multi-process) runtime test: two REAL processes join a
localhost coordinator (DCN stand-in), build one global mesh, assemble a
globally-sharded batch with per-process rows, and agree on a jitted
global computation (parallel/distributed.py). This is the multi-host
story SURVEY.md §5 promises; the reference has nothing distributed."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ["PAIG_REPO"])
from paig_reproduction_tpu.parallel.distributed import (
    global_batch, init_distributed, process_local_rows)
from paig_reproduction_tpu.parallel.mesh import batch_sharding, make_mesh

pid = init_distributed()
assert jax.process_count() == 2, jax.process_count()
n_global = jax.device_count()
assert n_global == 4, n_global          # 2 procs x 2 local cpu devices

mesh = make_mesh(n_data=n_global, n_model=1, devices=jax.devices())

# Global batch: every process holds the same host array; only its own
# rows are uploaded.
batch = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
arr = global_batch(batch, batch_sharding(mesh))
assert arr.shape == (8, 3)

rows = process_local_rows(8)
assert rows == slice(pid * 4, pid * 4 + 4), rows

# A jitted global reduction must see ALL rows, not just local ones.
total = jax.jit(lambda x: x.sum())(arr)
expected = float(batch.sum())
assert abs(float(total) - expected) < 1e-5, (float(total), expected)

# Replicated upload path (odd eval batches, the resident uint8 split).
rep = global_batch(batch, jax.sharding.NamedSharding(
    mesh, jax.sharding.PartitionSpec()))
assert abs(float(jax.jit(lambda x: x.sum())(rep)) - expected) < 1e-5
print(f"proc {pid}: OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            PAIG_REPO=repo,
            PAIG_COORDINATOR=f"127.0.0.1:{port}",
            PAIG_NUM_PROCESSES="2",
            PAIG_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}: OK" in out
