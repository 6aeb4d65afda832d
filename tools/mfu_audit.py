"""MFU audit: derive the benchmark's MFU claim two independent ways.

bench.py reports ``mfu_pct`` from XLA's cost analysis flop count / wall
time. Both factors need an independent check (round-2's 83%-MFU claim
fell to exactly this audit: the flop count divided a once-counted scan
body by K, and block_until_ready through the tunnel returned without
syncing — the honest number is ~6% f32 MFU, dominated by tiny-channel
convs). This tool audits both factors independently:

1. **FLOPs** — walks the jaxpr of the exact train-step (fwd + bwd + opt)
   and sums only ``dot_general`` / ``conv_general_dilated`` FLOPs
   (2*M*N*K per contraction), recursing through scan (× length), pjit,
   and custom-vjp calls. These are the MXU FLOPs — the only ones an MFU
   claim against MXU peak can honestly count.
2. **Device time** — times fused chunks of K=KA and K=KB optimizer steps
   and takes the slope (t_KB - t_KA) / (KB - KA): per-step device time
   with per-dispatch overhead (tunnel latency, host sync) cancelled.

Output: one JSON line with both FLOP counts, both MFU numbers, and their
ratio. Run on the TPU for the timing section; ``--no-time`` runs the
FLOP walk anywhere.

No reference counterpart (the reference publishes no throughput or
utilization numbers; SURVEY.md §6).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _PEAK_F32_TFLOPS  # noqa: E402


from paig_reproduction_tpu.utils.flops import (  # noqa: E402,F401
    matmul_flops,
)


def build_step(B=100, T=12):
    import jax
    import jax.numpy as jnp

    from paig_reproduction_tpu.models import PhysicsNet
    from paig_reproduction_tpu.models.physics_net import compute_losses
    from paig_reproduction_tpu.train.optimizers import build_optimizer

    model = PhysicsNet(
        task="spring_color", cell_type="spring_ode_cell", seq_len=T,
        input_steps=4, pred_steps=6, autoencoder_loss=3.0, color=True,
        input_size=32 * 32)
    inp = jnp.asarray(np.random.RandomState(0).rand(B, T, 3, 32, 32),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), inp)["params"]
    tx = build_optimizer("rmsprop", 6e-4, params)
    opt_state = tx.init(params)

    def loss_fn(p, b):
        out, aux = model.apply({"params": p}, b)
        loss, _ = compute_losses(model, b, out, aux["recons_out"])
        return loss

    def train_step(p, o, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, o = tx.update(grads, o, p)
        p = jax.tree.map(lambda x, u: x + u, p, updates)
        return p, o, loss

    return train_step, (params, opt_state, inp), B, T


def chunk_times(train_step, args, ks=(10, 100), n_rep=5):
    """Median wall time of a K-step fused chunk for each K in ks."""
    import functools

    import jax
    import jax.numpy as jnp

    params, opt_state, inp = args

    out = {}
    for k in ks:
        @functools.partial(jax.jit, static_argnums=())
        def chunk(p, o, b):
            def body(carry, _):
                p, o = carry
                p, o, loss = train_step(p, o, b)
                return (p, o), loss
            (p, o), losses = jax.lax.scan(body, (p, o), None, length=k)
            return p, o, losses
        p, o, losses = chunk(params, opt_state, inp)  # compile+warm
        np.asarray(losses)
        ts = []
        for _ in range(n_rep):
            t0 = time.perf_counter()
            p, o, losses = chunk(p, o, inp)
            # Sync by HOST FETCH, never block_until_ready: through the
            # axon tunnel block_until_ready has been observed returning
            # before execution finishes (measured 0.64 ms for a chunk
            # whose FLOPs alone need >= 7 ms at peak — the source of the
            # round-2 84.7 us/step artifact). A device->host copy of the
            # result cannot be faked.
            np.asarray(losses[-1])
            ts.append(time.perf_counter() - t0)
        out[k] = float(np.median(ts))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--no-time", action="store_true",
                    help="skip the on-device timing (FLOP walk only)")
    ap.add_argument("--batch", type=int, default=100)
    args = ap.parse_args(argv)

    import jax

    from paig_reproduction_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    train_step, step_args, B, T = build_step(B=args.batch)

    jaxpr = jax.make_jaxpr(train_step)(*step_args)
    mxu_flops = matmul_flops(jaxpr)

    cost = jax.jit(train_step).lower(*step_args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    xla_flops = float(cost.get("flops", 0.0))

    res = {
        "mxu_flops_per_step": mxu_flops,
        "xla_cost_flops_per_step": xla_flops,
        "xla_over_mxu": round(xla_flops / mxu_flops, 3) if mxu_flops else None,
        "batch": B, "seq": T,
    }

    if not args.no_time:
        ka, kb = 10, 100
        times = chunk_times(train_step, step_args, ks=(ka, kb))
        dt_device = (times[kb] - times[ka]) / (kb - ka)
        dt_wall_k10 = times[ka] / ka
        kind = jax.devices()[0].device_kind
        peak = next((v for k, v in _PEAK_F32_TFLOPS.items()
                     if kind.startswith(k)), None)
        res.update({
            "device_kind": kind,
            "step_time_device_us": round(dt_device * 1e6, 1),
            "step_time_wall_k10_us": round(dt_wall_k10 * 1e6, 1),
            "dispatch_overhead_us_per_chunk": round(
                (times[ka] - ka * dt_device) * 1e6, 1),
        })
        if peak:
            res["mfu_mxu_pct"] = round(
                100.0 * mxu_flops / dt_device / 1e12 / peak, 2)
            res["mfu_xla_cost_pct"] = round(
                100.0 * xla_flops / dt_device / 1e12 / peak, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
