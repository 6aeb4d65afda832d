"""Benchmark harness: train-step throughput of the flagship spring_color
config on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: video frames/sec/chip through the full jitted train step
(fwd + bwd + rmsprop update), batch 100 x seq 12 x 32x32x3 — the
reference's published training configuration (reference README.md:14,
torch_run_physics.py:55-59).

vs_baseline compares against the reference PyTorch implementation's
measured step time stored in benchmarks/torch_baseline.json (measured on
this container's CPU via the reference's own code; the reference publishes
no throughput numbers — SURVEY.md §6).
"""
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from paig_reproduction_tpu.models import PhysicsNet
    from paig_reproduction_tpu.models.physics_net import compute_losses
    from paig_reproduction_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        param_shardings,
    )
    from paig_reproduction_tpu.train.optimizers import build_optimizer

    B, T = 100, 12
    model = PhysicsNet(
        task="spring_color", cell_type="spring_ode_cell", seq_len=T,
        input_steps=4, pred_steps=6, autoencoder_loss=3.0, color=True,
        input_size=32 * 32)
    inp = jnp.asarray(np.random.RandomState(0).rand(B, T, 3, 32, 32),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), inp)["params"]

    n_chips = jax.device_count()
    mesh = make_mesh()
    tx = build_optimizer("rmsprop", 6e-4, params)
    opt_state = tx.init(params)

    params = jax.device_put(params, param_shardings(params, mesh))
    inp = jax.device_put(inp, batch_sharding(mesh))

    def loss_fn(p, b):
        out, aux = model.apply({"params": p}, b)
        loss, _ = compute_losses(model, b, out, aux["recons_out"])
        return loss

    import functools

    # The trainer's production input path: the train split resident in
    # HBM as uint8, K optimizer steps fused into one dispatch via
    # lax.scan, batches gathered + normalized in-graph.
    K = 10
    N_DATA = 1000
    rs = np.random.RandomState(0)
    data_u8 = jax.device_put(
        rs.randint(0, 255, (N_DATA, T, 3, 32, 32), dtype=np.uint8),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    idx_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data"))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_chunk(p, o, data, idxs):
        def body(carry, idx):
            p, o = carry
            b = data[idx].astype(jnp.float32) / 255.0
            loss, grads = jax.value_and_grad(loss_fn)(p, b)
            updates, o = tx.update(grads, o, p)
            p = jax.tree.map(lambda x, u: x + u, p, updates)
            return (p, o), loss
        (p, o), losses = jax.lax.scan(body, (p, o), idxs)
        return p, o, losses

    def make_idxs():
        return jax.device_put(
            rs.randint(0, N_DATA, (K, B)).astype(np.int32), idx_sharding)

    # warmup / compile
    for _ in range(2):
        params, opt_state, losses = train_chunk(params, opt_state,
                                                data_u8, make_idxs())
    jax.block_until_ready(losses)

    n_chunks = 10
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        params, opt_state, losses = train_chunk(params, opt_state,
                                                data_u8, make_idxs())
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / (n_chunks * K)

    fps_per_chip = B * T / dt / n_chips

    baseline_path = os.path.join(os.path.dirname(__file__), "benchmarks",
                                 "torch_baseline.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        vs_baseline = fps_per_chip / ref["frames_per_sec"]

    print(json.dumps({
        "metric": "train video frames/sec/chip (spring_color B100xT12)",
        "value": round(fps_per_chip, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
