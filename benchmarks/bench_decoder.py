"""Micro-benchmark: ST-decoder backends on the available accelerator.

Compares, at the training shape (B*T' = 1000 decodes of 2 objects into
32x32x3 frames):
  1. gather-based grid_sample oracle (torch-parity path)
  2. separable-matmul XLA decoder (the model default)
  3. fused Pallas kernel

Run: python benchmarks/bench_decoder.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.realpath(__file__)), ".."))


def main():
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
    n, o, t, img, ch = 1000, 2, 16, 32, 3
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
    main()
