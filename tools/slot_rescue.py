"""Checkpoint surgery CLI: revive dead discovery slots / pin the background.

No reference counterpart (the reference has no recovery path when
unsupervised discovery kills a slot; see benchmarks/CONVERGENCE.md for the
measured dead-slot failure mode on mnist/3bp/bouncing).

Typical rescue (mnist: one digit discovered, the other absorbed by the
learned background):

    python tools/slot_rescue.py --ckpt_dir=runs/mnist_disc1 \
        --out_dir=runs/mnist_rescue_ckpt --task=mnist_spring_color \
        --rescue_slot=auto --disk_radius=9 --set_background=median

    python runners/run_physics.py --task=mnist_spring_color --use_ckpt \
        --ckpt_dir=runs/mnist_rescue_ckpt --save_dir=runs/mnist_rescue \
        --bg_lr_mult=0 ...     # frozen true background: the unexplained
                               # digit is the only residual left

The optimizer state is intentionally NOT carried over (stale RMSProp/Adam
moments for surgically edited layers point the wrong way); the trainer's
partial restore re-initializes it with a logged notice.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")   # surgery is host-side

from paig_reproduction_tpu.cli import TASK_TABLE  # noqa: E402
from paig_reproduction_tpu.train import surgery  # noqa: E402
from paig_reproduction_tpu.train.checkpoint import (  # noqa: E402
    CKPT_NAME,
    save_checkpoint,
)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--task", required=True, choices=sorted(TASK_TABLE))
    ap.add_argument("--rescue_slot", default="",
                    help="'auto' (measured-failure-mode policy: dead / "
                         "content-dead / ballooned / least-healthy; "
                         "salience-aware when --set_background=median "
                         "supplies frames), 'all', a comma list of slot "
                         "indices, or '' to skip slot surgery")
    ap.add_argument("--disk_radius", type=float, default=9.0,
                    help="template-disk prior radius (template px)")
    ap.add_argument("--template_init", type=float, default=0.0,
                    help="MUST match the --template_init the checkpoint "
                         "was trained with: the training-time prior is a "
                         "graph constant on top of the template MLP, so "
                         "health ranking and installed disks account for "
                         "it")
    ap.add_argument("--content_rgb", default="0.5,0.5,0.5",
                    help="flat content color for the rescued slot")
    ap.add_argument("--set_background", default="",
                    help="'median' (pixelwise median of the train split) "
                         "or a path to an [H,W,C] .npy in [0,1]")
    ap.add_argument("--data_dir", default="",
                    help="datasets root (default <repo>/data/datasets)")
    ap.add_argument("--keep_step", action="store_true",
                    help="keep the checkpoint's step counter (default: "
                         "reset to 0 so LR schedules restart)")
    args = ap.parse_args(argv)

    import orbax.checkpoint as ocp
    restored = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(os.path.join(args.ckpt_dir, CKPT_NAME)))
    params = restored["params"]

    _, _, _, _, _, _, _, input_size = TASK_TABLE[args.task]
    img = int(np.sqrt(input_size))
    tmpl = img // 2
    ch = 3
    n_objs = {"3bp_color": 3}.get(args.task, 2)

    health = surgery.slot_health(params, n_objs, tmpl,
                                 template_init=args.template_init)
    print(f"slot template mask mass (px): {health}")

    # With train frames on hand (--set_background=median), 'auto' slot
    # selection uses content salience: mask mass alone marks a
    # big-mask/background-colored slot healthiest (bounce_one1 mode).
    salience = None
    frames = bg = None
    if args.set_background == "median":
        root = args.data_dir or os.path.join(
            os.path.dirname(os.path.dirname(
                os.path.realpath(__file__))), "data", "datasets")
        data_file = TASK_TABLE[args.task][0]
        with np.load(os.path.join(root, data_file)) as d:
            frames = d[d.files[0]]
        bg = surgery.median_background(frames)
        salience = surgery.slot_salience(params, n_objs, tmpl, ch, bg,
                                         template_init=args.template_init)
        print(f"slot content salience vs background: "
              f"{np.round(salience, 3)}")

    if args.rescue_slot != "":
        if args.rescue_slot == "auto":
            slots = surgery.select_dead_slots(
                health, tmpl_px=tmpl * tmpl, salience=salience)
        elif args.rescue_slot == "all":
            slots = list(range(n_objs))
        else:
            slots = [int(v) for v in args.rescue_slot.split(",")]
        rgb = [float(v) for v in args.content_rgb.split(",")]
        for slot in slots:
            print(f"rescuing slot {slot}: disk r={args.disk_radius}, "
                  f"content {rgb}")
            params = surgery.rescue_slot(params, slot, n_objs, tmpl, ch,
                                         radius=args.disk_radius,
                                         content_rgb=rgb,
                                         template_init=args.template_init)

    if args.set_background:
        if args.set_background != "median":
            bg = np.load(args.set_background)
        assert bg.shape == (img, img, ch), bg.shape
        print(f"installing background (mean {bg.mean():.3f}) "
              "— freeze it on resume with --bg_lr_mult=0")
        params = surgery.set_background(params, bg)

    step = restored.get("step", 0) if args.keep_step else 0
    os.makedirs(args.out_dir, exist_ok=True)
    save_checkpoint(args.out_dir, {"params": params,
                                   "step": np.asarray(step)})
    print(f"wrote {args.out_dir}/{CKPT_NAME}")


if __name__ == "__main__":
    main()
