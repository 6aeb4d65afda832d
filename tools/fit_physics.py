"""Closed-form physical-parameter identification from encoder positions.

PAIG's hard part is that the pixel loss gives the physical parameters a
vanishing gradient once predicted and target objects stop overlapping, so
gradient descent parks (k, equil, g) in a ballistic local optimum. But
given a trained encoder, the parameters are identifiable by LINEAR least
squares on the encoder's own position sequences — no labels needed:

* spring (reference cells.py:22-51): the acceleration of object 0
  projected on the unit separation vector u satisfies
  a_par = -k * norm + 2*k*equil — linear in (k, k*equil).
* gravity (reference cells.py:86-106): a_par = -A / norm^2 with
  A = exp(g) * exp(2m) — linear in A.

Usage (after a discovery-phase run):

    python tools/fit_physics.py --task spring_color \
        --ckpt_dir runs/spring_s2 --data_dir data/datasets

Estimates the parameters from encoder positions over the train split,
reports the fit, and (with --write) updates log_k/log_equil (or log_g) in
the checkpoint so training can resume from the identified physics.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.realpath(__file__)), ".."))


def encoder_positions(task, ckpt_dir, data_dir, n_batches=8,
                      batch_size=100):
    import jax
    import jax.numpy as jnp

    from paig_reproduction_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from paig_reproduction_tpu.cli import TASK_TABLE
    from paig_reproduction_tpu.data.iterators import get_iterators
    from paig_reproduction_tpu.models import PhysicsNet
    from paig_reproduction_tpu.train.checkpoint import restore_checkpoint

    (data_file, _, cell_type, seq_len, _, input_steps, pred_steps,
     input_size) = TASK_TABLE[task]
    model = PhysicsNet(task=task, cell_type=cell_type, seq_len=seq_len,
                       input_steps=input_steps, pred_steps=pred_steps,
                       autoencoder_loss=3.0, color=True,
                       input_size=input_size)
    del restore_checkpoint  # params-only restore below
    its = get_iterators(os.path.join(data_dir, data_file), conv=True)
    sample = jnp.asarray(its[0].X[:1])
    params = model.init(jax.random.PRNGKey(0), sample)["params"]
    import orbax.checkpoint as ocp
    raw = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(os.path.join(ckpt_dir, "model.ckpt")))
    flat_ckpt = {"/".join(map(str, [getattr(k, 'key', k) for k in p])): v
                 for p, v in jax.tree_util.tree_flatten_with_path(
                     raw["params"])[0]}

    def fill(path, leaf):
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        return jnp.asarray(flat_ckpt.get(key, leaf)).reshape(leaf.shape) \
            if key in flat_ckpt else leaf

    params = jax.tree_util.tree_map_with_path(fill, params)

    fwd = jax.jit(lambda p, b: model.apply({"params": p}, b)[1]["enc_pos"])
    seqs = []
    for _ in range(n_batches):
        bx, _ = its[0].next_batch(batch_size)
        seqs.append(np.asarray(fwd(params, jnp.asarray(bx))))
    enc = np.concatenate(seqs, 0)          # [N, t_in, n_objs*2]

    # Render-measured per-object offsets: decode a few frames with
    # extras and take the centroid of each object's OWN rendered
    # appearance (composited softmax mask x content luminance) minus the
    # encoder position it was rendered at. This measures exactly the
    # offset a pixel tracker sees; the earlier template-centroid
    # estimate breaks on complex templates (mnist digits: up to 6 px /
    # wrong sign, because the content MLP is unconstrained outside the
    # mask support). Median over frames is robust to boundary clipping.
    _, aux = model.apply({"params": params},
                         jnp.asarray(its[0].X[:8]), with_extras=True)
    masks = np.asarray(aux["extras"]["transf_masks"])    # [F, o+1, H, W]
    conts = np.asarray(aux["extras"]["transf_contents"])  # [F, o, H, W, C]
    pos_at = np.asarray(aux["enc_pos"]).reshape(-1, model.n_objs, 2)
    lum = conts.mean(axis=-1)                             # [F, o, H, W]
    w = masks[:, : model.n_objs] * lum                    # [F, o, H, W]
    hh, ww = w.shape[-2:]
    xs = np.arange(ww, dtype=np.float64) + 0.5
    ys = np.arange(hh, dtype=np.float64) + 0.5
    tot = w.sum(axis=(2, 3)) + 1e-9                       # [F, o]
    cx = (w.sum(axis=2) * xs).sum(-1) / tot
    cy = (w.sum(axis=3) * ys).sum(-1) / tot
    per_frame = np.stack([cx, cy], axis=-1) - pos_at      # [F, o, 2]
    offsets = np.median(per_frame, axis=0).reshape(-1)    # obj-major x,y
    print("rendered-appearance offsets (image px, per object x,y):",
          np.round(offsets, 2))
    enc = enc + offsets[None, None, :]
    return enc, model, raw, offsets


# The fit math lives in the package so the Trainer's train-time
# self-identification hook (--fit_physics_every) shares one
# implementation with this offline CLI.
from paig_reproduction_tpu.ops.identify import (  # noqa: E402,F401
    fit_gravity,
    fit_gravity_trajectory,
    fit_spring,
    fit_spring_trajectory,
)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--task", required=True)
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--data_dir", default="data/datasets")
    ap.add_argument("--write", action="store_true",
                    help="write the fitted parameters into the checkpoint")
    ap.add_argument("--substeps", type=int, default=5,
                    help="Euler substeps the fitted cell will use "
                         "(match --cell_substeps; the data generators "
                         "integrate with 10)")
    args = ap.parse_args(argv)

    from paig_reproduction_tpu.ops import cells

    enc, model, raw, offsets = encoder_positions(args.task, args.ckpt_dir,
                                                 args.data_dir)
    _, dt = cells.CELLS[model.cell_type]

    if model.cell_type == "spring_ode_cell":
        k_pt, e_pt, rms = fit_spring(enc, dt)
        print(f"pointwise spring fit: k={k_pt:.4f} equil={e_pt:.4f} "
              f"(residual rms {rms:.3f})")
        k, equil, traj_err = fit_spring_trajectory(
            enc, dt, input_steps=model.input_steps,
            substeps=args.substeps)
        print(f"trajectory spring fit: k={k:.4f} equil={equil:.4f} "
              f"(median traj err {traj_err:.3f})")
        updates = {"log_k": np.log(max(k, 1e-3)),
                   "log_equil": np.log(max(equil, 1e-3))}
    elif model.cell_type == "gravity_ode_cell":
        A_pt, rms = fit_gravity(enc, dt)
        print(f"pointwise gravity fit: A=g*m^2={A_pt:.4f} "
              f"(residual rms {rms:.3f})")
        A, traj_err = fit_gravity_trajectory(
            enc, dt, input_steps=model.input_steps,
            substeps=args.substeps)
        # A = exp(log_g) * exp(2 log_m); log_m frozen at 0 -> log_g = log A
        print(f"trajectory gravity fit: A={A:.4f} "
              f"(median traj err {traj_err:.3f})")
        updates = {"log_g": np.log(max(A, 1e-3))}
    else:
        print(f"cell {model.cell_type} has no learnable physics")
        return

    if args.write:
        import orbax.checkpoint as ocp
        for name, val in updates.items():
            raw["params"][name] = np.asarray(val, np.float32)
        # Seed the frame-offset parameter (pos_phys = pos_enc + b) with
        # the measured template offsets, for --learn_frame_offset resumes.
        raw["params"]["frame_offset"] = offsets.astype(np.float32)
        path = os.path.abspath(os.path.join(args.ckpt_dir, "model.ckpt"))
        ocp.PyTreeCheckpointer().save(path, raw, force=True)
        print(f"wrote {sorted(updates)} + frame_offset into {path}")


if __name__ == "__main__":
    main()
