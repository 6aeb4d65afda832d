"""Distribution parity gate for the dataset generators (VERDICT item 7):
freshly generated data must match the physical spec encoded in the
reference dataset filenames (tools/data_parity.py does the measuring)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import data_parity  # noqa: E402

from paig_reproduction_tpu.data import generators  # noqa: E402


@pytest.fixture(scope="module")
def tmp_datasets(tmp_path_factory):
    return tmp_path_factory.mktemp("parity")


def _check(task, path):
    report = data_parity.check(task, str(path))
    assert report["pass"], report
    return report


def test_spring_color_distribution(tmp_datasets):
    dest = tmp_datasets / "spring.npz"
    generators.generate_spring_balls_dataset(
        str(dest), 40, 4, 4, seq_len=12, radius=2, k=4, equil=6,
        vx0_max=8.0, vy0_max=8.0, color=True, seed=11)
    r = _check("spring_color", dest)
    # tight physical agreement, not just threshold-pass
    assert r["oracle_rollout_median_err_px"] < 1.0
    assert abs(r["initial_speed"]["median"] - 8.0) < 1.0


def test_bouncing_balls_distribution(tmp_datasets):
    dest = tmp_datasets / "bounce.npz"
    generators.generate_bouncing_balls_video_dataset(
        str(dest), 40, 4, 4, seq_len=12, radius=2, vx0_max=8.0,
        vy0_max=8.0, color=True, seed=12)
    r = _check("bouncing_balls", dest)
    assert r["oracle_rollout_median_err_px"] < 1.0


def test_3bp_distribution(tmp_datasets):
    dest = tmp_datasets / "3bp.npz"
    generators.generate_3_body_problem_dataset(
        str(dest), 30, 4, 4, seq_len=20, img_size=[36, 36], radius=2,
        g=60.0, m=1.0, dt=0.5, vx0_max=2.0, vy0_max=2.0, color=True,
        seed=13)
    _check("3bp_color", dest)


def test_tracker_subpixel_accuracy():
    """The centroid tracker itself must be sub-pixel accurate — it is the
    measuring instrument every other check relies on."""
    rs = np.random.RandomState(0)
    true = rs.uniform(8, 24, (6, 2, 2))          # [N, n_objs, (x, y)]
    frames = np.stack([
        generators._render_balls(true[i], 2, [32, 32], 10, True)
        for i in range(6)])[:, None]             # [N, 1, H, W, C]
    est = data_parity.track_positions(frames, 2)[:, 0]
    err = np.linalg.norm(est - true, axis=-1)
    assert err.max() < 0.2, err.max()
