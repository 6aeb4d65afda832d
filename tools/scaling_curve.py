"""Mesh scaling curve: full train step over 1/2/4/8-device DP meshes.

Measures, per mesh size: loss (must be identical — the correctness half,
also gated by tests/test_parallel.py::test_dp_scaling_loss_parity) and
step wall time at a fixed global batch (strong scaling) and at a fixed
per-device batch (weak scaling).

On real multi-chip TPU hardware the timings are the scaling story; on the
emulated CPU mesh (this container has one TPU chip) they only prove the
sharded program executes at every size — the doc notes which environment
produced the table.

Usage::

    python tools/scaling_curve.py [--devices 8] [--out benchmarks/SCALING.md]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(n_devices: int):
    import jax

    if jax.device_count() < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {jax.device_count()}; "
            "run with JAX_PLATFORMS=cpu XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n_devices} "
            "(tests/conftest.py does this automatically under pytest)")

    import jax.numpy as jnp
    import numpy as np

    from paig_reproduction_tpu.models import PhysicsNet
    from paig_reproduction_tpu.models.physics_net import compute_losses
    from paig_reproduction_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        param_shardings,
    )
    from paig_reproduction_tpu.train.optimizers import build_optimizer

    model = PhysicsNet(task="spring_color", cell_type="spring_ode_cell",
                       seq_len=12, input_steps=4, pred_steps=6,
                       autoencoder_loss=3.0, color=True,
                       input_size=32 * 32)
    global_b = 64
    inp = jnp.asarray(
        np.random.RandomState(0).rand(global_b, 12, 3, 32, 32),
        jnp.float32)
    params = model.init(jax.random.PRNGKey(0), inp[:1])["params"]
    tx = build_optimizer("rmsprop", 6e-4, params)

    def loss_fn(p, b):
        out, aux = model.apply({"params": p}, b)
        loss, _ = compute_losses(model, b, out, aux["recons_out"])
        return loss

    def make_step():
        @jax.jit
        def step(p, o, b):
            loss, grads = jax.value_and_grad(loss_fn)(p, b)
            updates, o = tx.update(grads, o, p)
            p = jax.tree.map(lambda x, u: x + u, p, updates)
            return p, o, loss

        return step

    rows = []
    sizes = [n for n in (1, 2, 4, 8) if n <= n_devices]
    for n in sizes:
        mesh = make_mesh(n_data=n, n_model=1,
                         devices=jax.devices()[:n])
        p = jax.device_put(params, param_shardings(params, mesh))
        o = jax.device_put(tx.init(params),
                           jax.tree.map(
                               lambda _: jax.sharding.NamedSharding(
                                   mesh, jax.sharding.PartitionSpec()),
                               tx.init(params)))
        step = make_step()

        def timed(batch_np):
            b = jax.device_put(jnp.asarray(batch_np),
                               batch_sharding(mesh))
            pp, oo, loss = step(p, o, b)       # compile + warmup
            np.asarray(loss)
            reps = 5
            t0 = time.perf_counter()
            for _ in range(reps):
                pp, oo, loss = step(p, o, b)
            # host-fetch sync: block_until_ready can return early through
            # the axon tunnel (benchmarks/MFU_AUDIT.md §2)
            loss_host = float(np.asarray(loss))
            return loss_host, (time.perf_counter() - t0) / reps

        strong_loss, strong_t = timed(inp)                 # fixed global
        weak_np = np.tile(np.asarray(inp), (max(1, n // 1), 1, 1, 1, 1))[
            : 8 * n]                                        # 8 per device
        weak_loss, weak_t = timed(weak_np)
        rows.append(dict(n=n, strong_loss=strong_loss,
                         strong_ms=strong_t * 1e3,
                         weak_ms=weak_t * 1e3,
                         weak_fps=8 * n * 12 / weak_t))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true",
                    help="force the emulated CPU mesh (self-provisions "
                         "--devices virtual devices; must run before any "
                         "other jax import in the process)")
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{args.devices}").strip()
        import jax

        # the TPU plugin's sitecustomize overrides the env var; force it
        jax.config.update("jax_platforms", "cpu")

    rows = measure(args.devices)
    import jax
    platform = jax.devices()[0].platform
    kind = jax.devices()[0].device_kind

    base = rows[0]["strong_loss"]
    lines = [
        "# Mesh scaling curve",
        "",
        f"Environment: {len(jax.devices())}x {kind} ({platform}). "
        + ("Timings are CPU-emulated (one real TPU chip in this "
           "container) — they prove the sharded program executes at "
           "every mesh size; loss parity is the correctness claim."
           if platform == "cpu" else
           "Real-hardware timings."),
        "",
        "| devices | strong-scale step ms (B=64) | weak-scale step ms "
        "(B=8/dev) | weak fps | loss parity |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        parity = abs(r["strong_loss"] - base) / max(abs(base), 1e-9)
        lines.append(
            f"| {r['n']} | {r['strong_ms']:.1f} | {r['weak_ms']:.1f} | "
            f"{r['weak_fps']:.0f} | rel err {parity:.2e} |")
    text = "\n".join(lines) + "\n"
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
