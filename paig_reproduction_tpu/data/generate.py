"""Dataset-generation CLI (new capability — the reference ships generator
library functions only, no wrapper; SURVEY.md §2.1 item 12).

Presets synthesize the exact dataset files the task table expects, e.g.::

    python -m paig_reproduction_tpu.data.generate --task spring_color \
        --out_dir data/datasets --train 5000 --valid 500 --test 500

generates ``spring_color/color_spring_vx8_vy8_sl12_r2_k4_e6.npz`` (seq_len
12 train file) and the sl30 test file.
"""
from __future__ import annotations

import argparse
import os

from paig_reproduction_tpu.data import generators as g

# task -> list of (relative npz path, generator fn, kwargs)


def _presets(train, valid, test):
    def spring(path, seq_len, half=False):
        return (path, g.generate_spring_balls_dataset, dict(
            train_set_size=train, valid_set_size=valid, test_set_size=test,
            seq_len=seq_len, img_size=[32, 32], radius=2, dt=0.3, k=4,
            equil=6, vx0_max=4.0 if half else 8.0,
            vy0_max=4.0 if half else 8.0, color=True))

    def bounce(path, seq_len):
        return (path, g.generate_bouncing_balls_video_dataset, dict(
            train_set_size=train, valid_set_size=valid, test_set_size=test,
            seq_len=seq_len, img_size=[32, 32], radius=2, dt=0.3,
            vx0_max=8.0, vy0_max=8.0, n_balls=2, color=True))

    def threebp(path, seq_len):
        return (path, g.generate_3_body_problem_dataset, dict(
            train_set_size=train, valid_set_size=valid, test_set_size=test,
            seq_len=seq_len, img_size=[36, 36], radius=2, dt=0.5, g=60.0,
            m=1.0, vx0_max=2.0, vy0_max=2.0, color=True))

    def mnist(path, seq_len):
        return (path, g.generate_spring_mnist_dataset, dict(
            train_set_size=train, valid_set_size=valid, test_set_size=test,
            seq_len=seq_len, img_size=[64, 64], dt=0.3, k=2, equil=12,
            vx0_max=8.0, vy0_max=8.0, color=True, cifar_background=True))

    return {
        "bouncing_balls": [
            bounce("bouncing/color_bounce_vx8_vy8_sl12_r2.npz", 12),
            bounce("bouncing/color_bounce_vx8_vy8_sl30_r2.npz", 30)],
        "spring_color": [
            spring("spring_color/color_spring_vx8_vy8_sl12_r2_k4_e6.npz",
                   12),
            spring("spring_color/color_spring_vx8_vy8_sl30_r2_k4_e6.npz",
                   30)],
        "spring_color_half": [
            spring("spring_color_half/"
                   "color_spring_vx4_vy4_sl12_r2_k4_e6_halfpane.npz", 12,
                   half=True),
            spring("spring_color_half/"
                   "color_spring_vx4_vy4_sl30_r2_k4_e6_halfpane.npz", 30,
                   half=True)],
        "3bp_color": [
            threebp("3bp_color/color_3bp_vx2_vy2_sl20_r2_g60_m1_dt05.npz",
                    20),
            threebp("3bp_color/color_3bp_vx2_vy2_sl40_r2_g60_m1_dt05.npz",
                    40)],
        "mnist_spring_color": [
            mnist("mnist_spring_color/"
                  "color_mnist_spring_vx8_vy8_sl12_r2_k2_e12.npz", 12),
            mnist("mnist_spring_color/"
                  "color_mnist_spring_vx8_vy8_sl30_r2_k2_e12.npz", 30)],
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", required=True,
                   help="one of the 5 task names, or 'all'")
    p.add_argument("--out_dir", default="data/datasets")
    p.add_argument("--train", type=int, default=5000)
    p.add_argument("--valid", type=int, default=500)
    p.add_argument("--test", type=int, default=500)
    args = p.parse_args(argv)

    presets = _presets(args.train, args.valid, args.test)
    tasks = list(presets) if args.task == "all" else [args.task]
    for task in tasks:
        for rel, fn, kwargs in presets[task]:
            dest = os.path.join(args.out_dir, rel)
            print(f"[{task}] generating {dest}")
            fn(dest, **kwargs)


if __name__ == "__main__":
    main()
