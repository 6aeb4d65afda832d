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

    # Template-content centroid offsets: the decoder renders each
    # object's content at pos + 2*(centroid(template content) - center)
    # image pixels (template->image scale is 2), so encoder positions are
    # object centers MINUS that offset. Correct before fitting.
    _, aux = model.apply({"params": params},
                         jnp.asarray(its[0].X[:2]), with_extras=True)
    tmpl = np.asarray(aux["extras"]["templates"])[:, 0]   # [o, T, T] raw
    cont = np.asarray(aux["extras"]["contents"])          # [o, C, T, T]
    weight = (1 / (1 + np.exp(-tmpl))) * \
        (1 / (1 + np.exp(-cont))).mean(axis=1)            # [o, T, T]
    t = weight.shape[-1]
    coords = np.arange(t)
    total = weight.sum(axis=(1, 2)) + 1e-9
    cy = (weight.sum(axis=2) * coords).sum(axis=1) / total
    cx = (weight.sum(axis=1) * coords).sum(axis=1) / total
    center = (t - 1) / 2.0
    # offset in image px, object-major (x, y) layout
    offsets = 2.0 * np.stack([cx - center, cy - center], 1).reshape(-1)
    print("template-content offsets (image px, per object x,y):",
          np.round(offsets, 2))
    enc = enc + offsets[None, None, :]
    return enc, model, raw, offsets


def fit_spring(enc, dt):
    """enc: [N, T, 4] object-major (x1,y1,x2,y2). Returns (k, equil,
    residual)."""
    p = enc.reshape(enc.shape[0], enc.shape[1], 2, 2)
    # central-difference acceleration per frame
    acc = (p[:, 2:] - 2 * p[:, 1:-1] + p[:, :-2]) / dt ** 2  # [N,T-2,2,2]
    mid = p[:, 1:-1]
    diff = mid[:, :, 0] - mid[:, :, 1]                       # [N,T-2,2]
    norm = np.linalg.norm(diff, axis=-1)
    u = diff / (norm[..., None] + 1e-9)
    # object 0: a0 = -(k*norm - 2*k*e)*u  ->  a0.u = -k*norm + 2ke
    a_par0 = np.sum(acc[:, :, 0] * u, axis=-1).ravel()
    a_par1 = np.sum(acc[:, :, 1] * (-u), axis=-1).ravel()
    a_par = np.concatenate([a_par0, a_par1])
    n = np.concatenate([norm.ravel(), norm.ravel()])
    A = np.stack([-n, np.ones_like(n)], 1)
    # robust: trim outliers once
    coef, *_ = np.linalg.lstsq(A, a_par, rcond=None)
    resid = A @ coef - a_par
    keep = np.abs(resid) < 3 * resid.std()
    coef, *_ = np.linalg.lstsq(A[keep], a_par[keep], rcond=None)
    k = coef[0]
    equil = coef[1] / (2 * k) if k > 1e-6 else float("nan")
    rms = float(np.sqrt(np.mean((A[keep] @ coef - a_par[keep]) ** 2)))
    return float(k), float(equil), rms


def fit_spring_trajectory(enc, dt, input_steps=4, horizon=6, substeps=5):
    """Trajectory-space fit: coarse-to-fine grid over (k, equil), scoring
    rollouts from finite-difference initial velocities against the
    encoder positions. Integration (vs the pointwise fit's double
    differentiation) suppresses the errors-in-variables attenuation that
    biases k toward zero under encoder noise."""
    p = enc.reshape(enc.shape[0], enc.shape[1], 2, 2)
    i0 = input_steps - 1
    horizon = min(horizon, enc.shape[1] - input_steps)

    def batched_spring_step(poss, vels, k, e, substeps=substeps):
        """One frame of spring dynamics for [N, 2, 2] states (vectorized
        version of ops/cells.spring_step / the generator integrator)."""
        h = dt / substeps
        for _ in range(substeps):
            diff = poss[:, 0] - poss[:, 1]
            norm = np.linalg.norm(diff, axis=-1, keepdims=True)
            force = k * (norm - 2 * e) * diff / (norm + 1e-9)
            vels = vels + h * np.stack([-force, force], axis=1)
            poss = poss + h * vels
        return poss, vels

    def score(k, e):
        err = 0.0
        poss = p[:, i0].copy()
        vels = (p[:, i0] - p[:, i0 - 1]) / dt
        for t in range(horizon):
            poss, vels = batched_spring_step(poss, vels, k, e)
            err += np.median(
                np.sum((poss - p[:, input_steps + t]) ** 2, axis=(1, 2)))
        return err

    ks = np.exp(np.linspace(np.log(0.25), np.log(16), 9))
    es = np.exp(np.linspace(np.log(1.0), np.log(12.0), 9))
    best = None
    for _ in range(3):   # coarse-to-fine
        scores = np.array([[score(k, e) for e in es] for k in ks])
        ik, ie = np.unravel_index(scores.argmin(), scores.shape)
        best = (ks[ik], es[ie], scores[ik, ie])
        ks = np.exp(np.linspace(np.log(ks[max(0, ik - 1)]),
                                np.log(ks[min(len(ks) - 1, ik + 1)]), 7))
        es = np.exp(np.linspace(np.log(es[max(0, ie - 1)]),
                                np.log(es[min(len(es) - 1, ie + 1)]), 7))
    return best


def fit_gravity(enc, dt):
    """enc: [N, T, 6]. Returns (A = g*m^2, residual). Matches the
    generator law a_i = -g m^2 sum_j (p_i - p_j)/|p_i - p_j|^3."""
    p = enc.reshape(enc.shape[0], enc.shape[1], 3, 2)
    acc = (p[:, 2:] - 2 * p[:, 1:-1] + p[:, :-2]) / dt ** 2
    mid = p[:, 1:-1]
    xs, ys = [], []
    for i in range(3):
        f = np.zeros_like(mid[:, :, i])
        for j in range(3):
            if i == j:
                continue
            d = mid[:, :, i] - mid[:, :, j]
            n = np.linalg.norm(d, axis=-1, keepdims=True)
            f = f + d / (n ** 3 + 1e-9)
        # acc_i = -A * f  -> regress componentwise
        xs.append(-f.reshape(-1, 2).ravel())
        ys.append(acc[:, :, i].reshape(-1, 2).ravel())
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    A = float(np.dot(x, y) / (np.dot(x, x) + 1e-12))
    rms = float(np.sqrt(np.mean((A * x - y) ** 2)))
    return A, rms


def fit_gravity_trajectory(enc, dt, input_steps=4, horizon=12,
                           substeps=5):
    """Trajectory-space 1-D fit of A = g*m^2: coarse-to-fine log-grid,
    scoring rollouts from finite-difference initial velocities against
    the encoder positions — the same errors-in-variables cure as
    fit_spring_trajectory (double differentiation attenuates the
    pointwise fit under encoder noise; integration does not)."""
    p = enc.reshape(enc.shape[0], enc.shape[1], 3, 2)
    i0 = input_steps - 1
    horizon = min(horizon, enc.shape[1] - input_steps)

    def step(poss, vels, A):
        """One frame of 3-body dynamics for [N, 3, 2] states (matches
        ops/cells.gravity_step / generator physics, norm floored like
        the cell's clamp, reference cells.py:99-100)."""
        h = dt / substeps
        for _ in range(substeps):
            acc = np.zeros_like(poss)
            for i in range(3):
                for j in range(3):
                    if i == j:
                        continue
                    d = poss[:, j] - poss[:, i]
                    n = np.linalg.norm(d, axis=-1, keepdims=True)
                    n = np.clip(n, 1.0, 170.0)
                    acc[:, i] += A * d / n ** 3
            vels = vels + h * acc
            poss = poss + h * vels
        return poss, vels

    def score(A):
        err = 0.0
        poss = p[:, i0].copy()
        # second-order one-sided velocity: the first-order difference
        # equals v - a*dt/2, a bias correlated with A that skews the fit
        vels = (3 * p[:, i0] - 4 * p[:, i0 - 1] + p[:, i0 - 2]) / (2 * dt)
        for t in range(horizon):
            poss, vels = step(poss, vels, A)
            err += np.median(
                np.sum((poss - p[:, input_steps + t]) ** 2, axis=(1, 2)))
        return err

    grid = np.exp(np.linspace(np.log(2.0), np.log(400.0), 13))
    best = None
    for _ in range(3):   # coarse-to-fine
        scores = np.array([score(a) for a in grid])
        ia = int(scores.argmin())
        best = (float(grid[ia]), float(scores[ia]))
        grid = np.exp(np.linspace(
            np.log(grid[max(0, ia - 1)]),
            np.log(grid[min(len(grid) - 1, ia + 1)]), 9))
    return best


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
