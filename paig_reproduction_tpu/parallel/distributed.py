"""Multi-host (multi-process) runtime support.

The reference is single-process (reference torch_run_physics.py:78-80);
this is new capability, built the JAX way: ``jax.distributed.initialize``
brings every host's chips into one global device set, the ('data',
'model') mesh spans all of them (parallel/mesh.py), and GSPMD rides ICI
within a slice and DCN across slices. The only host-code differences from
single-process are (a) initialization and (b) batch assembly — each
process contributes its local rows of the globally-sharded batch via
``jax.make_array_from_process_local_data``.

Environment contract (matches the standard JAX launcher conventions):
set ``PAIG_COORDINATOR`` (host:port), ``PAIG_NUM_PROCESSES``,
``PAIG_PROCESS_ID`` — or pass the values explicitly / rely on
``jax.distributed``'s own cluster auto-detection (TPU pods populate it
from the metadata server, so on Cloud TPU all three can be omitted).

Tested in tests/test_distributed.py by spawning two real CPU processes
against a localhost coordinator.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize the multi-process runtime. Must run before any backend
    use. No-op when neither args nor env request distribution.

    Returns this process's index (0 when single-process)."""
    coordinator = coordinator or os.environ.get("PAIG_COORDINATOR")
    if num_processes is None and "PAIG_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["PAIG_NUM_PROCESSES"])
    if process_id is None and "PAIG_PROCESS_ID" in os.environ:
        process_id = int(os.environ["PAIG_PROCESS_ID"])

    if coordinator is None and num_processes is None and process_id is None:
        return 0
    missing = [name for name, v in (("PAIG_COORDINATOR", coordinator),
                                    ("PAIG_NUM_PROCESSES", num_processes),
                                    ("PAIG_PROCESS_ID", process_id))
               if v is None]
    if missing:
        raise ValueError(
            "partial multi-process config: set all of PAIG_COORDINATOR, "
            "PAIG_NUM_PROCESSES and PAIG_PROCESS_ID (or none of them); "
            f"missing {missing}")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)
    return jax.process_index()


def process_local_rows(n_rows: int) -> slice:
    """The half-open row range of a global batch this process owns under
    batch sharding over the 'data' axis (row-major process order).

    Contract: every process must hold an IDENTICALLY-ORDERED host batch
    (same dataset file, same shuffling RNG state) — each process slices
    its own rows out of the logically-global array. The CLI guarantees
    this by seeding the global numpy RNG from --seed on every process
    (cli.py); any other multi-host entry point must do the same or feed
    divergent per-process batches silently."""
    pc, pi = jax.process_count(), jax.process_index()
    assert n_rows % pc == 0, (n_rows, pc)
    per = n_rows // pc
    return slice(pi * per, (pi + 1) * per)


def global_put_replicated(x, sharding) -> jax.Array:
    """Place one param/opt-state leaf under a (possibly multi-process)
    sharding. Single-process: plain device_put. Multi-process: every
    process passes the SAME full value (params are computed identically
    on every host — same PRNGKey init, same deterministic surgery), so
    placement only supports fully-replicated shardings there; leaves that
    are already correctly-placed global arrays pass through untouched.
    Multi-host tensor-parallel placement (a 'model'-sharded leaf spanning
    processes) is not supported and asserts loudly."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.sharding.is_equivalent_to(sharding, x.ndim):
            return x
        # np.asarray below needs a locally recoverable value
        assert x.is_fully_replicated, (
            "cannot re-place a multi-process sharded leaf", x.sharding)
    assert sharding.is_fully_replicated, (
        "multi-process placement only supports replicated param/opt "
        "leaves (multi-host TP is not wired up)", sharding)
    x = np.asarray(x)
    return jax.make_array_from_process_local_data(
        sharding, x, global_shape=x.shape)


def global_index_batches(idxs: np.ndarray, sharding) -> jax.Array:
    """Assemble the fused-chunk [K, B] index matrix under a
    PartitionSpec(None, 'data') sharding: the batch axis (axis 1) shards
    across ALL devices, including other processes' — each process
    uploads its own column block. This is what lets the fused
    whole-chunk train/eval dispatch data-parallelize on multi-host runs
    (a replicated index matrix makes every device gather and compute the
    FULL batch). Same same-host-order contract as global_batch."""
    if jax.process_count() == 1:
        return jax.device_put(idxs, sharding)
    if sharding.is_fully_replicated:
        local = idxs
    else:
        local = idxs[:, process_local_rows(idxs.shape[1])]
    return jax.make_array_from_process_local_data(
        sharding, local, global_shape=idxs.shape)


def global_batch(batch_np: np.ndarray, sharding) -> jax.Array:
    """Assemble a globally-sharded array. Single-process: plain
    device_put. Multi-process: every process passes the SAME global-shape
    host array (datasets are small and loaded everywhere); only this
    process's rows are uploaded."""
    if jax.process_count() == 1:
        return jax.device_put(batch_np, sharding)
    if sharding.is_fully_replicated:
        local = batch_np
    else:
        local = batch_np[process_local_rows(batch_np.shape[0])]
    return jax.make_array_from_process_local_data(
        sharding, local, global_shape=batch_np.shape)
