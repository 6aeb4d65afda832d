"""Distribution parity gate for the dataset generators (VERDICT item 7):
freshly generated data must match the physical spec encoded in the
reference dataset filenames (tools/data_parity.py does the measuring)."""
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # property-test scale; core gate runs -m 'not slow'

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


def _fixture_digits():
    """Two deterministic, distinctive 28x28 'digits' in keras mnist
    layout: a thick ring and a filled diagonal bar — enough ink for the
    parity tracker, unmistakable under correlation."""
    yy, xx = np.mgrid[:28, :28]
    rr = np.sqrt((yy - 13.5) ** 2 + (xx - 13.5) ** 2)
    ring = ((rr > 5) & (rr < 10)).astype(np.uint8) * 255
    bar = ((np.abs(yy - xx) < 4) & (rr < 11)).astype(np.uint8) * 255
    return np.stack([ring, bar])


def test_real_mnist_npz_ingestion(tmp_path, monkeypatch):
    """$PAIG_MNIST_NPZ must reach the digit pixels exactly: keras layout
    in, reference crop (x_train[:n, 3:-3, 3:-3]/255,
    reference generators.py:398-399) out."""
    from paig_reproduction_tpu.data.assets import load_mnist_digits

    x = _fixture_digits()
    npz = tmp_path / "mnist.npz"
    np.savez(npz, x_train=x, y_train=np.array([0, 1]))
    monkeypatch.setenv("PAIG_MNIST_NPZ", str(npz))
    got = load_mnist_digits(2)
    assert got.shape == (2, 22, 22)
    np.testing.assert_allclose(got, x[:, 3:-3, 3:-3] / 255.0, atol=1e-6)


def test_mnist_distribution(tmp_datasets, monkeypatch):
    """End-to-end real-MNIST-path parity: generate mnist_spring_color from
    a fixture npz and pass the full parity gate (fixed background, two
    channel-coded digits, k=2/equil=12 spring identified from pixels) —
    then confirm the fixture's own ink reached the frames."""
    x = _fixture_digits()
    npz = tmp_datasets / "mnist_fixture.npz"
    np.savez(npz, x_train=x)
    monkeypatch.setenv("PAIG_MNIST_NPZ", str(npz))

    dest = tmp_datasets / "mnist.npz"
    generators.generate_spring_mnist_dataset(
        str(dest), 36, 2, 2, seq_len=12, img_size=[64, 64], dt=0.3,
        k=2, equil=12, vx0_max=8.0, vy0_max=8.0, color=True,
        cifar_background=True, seed=14)
    r = _check("mnist_spring_color", dest)
    assert abs(r["spring_fit"]["k"] - 2.0) < 1.0, r["spring_fit"]

    # the frames must contain the fixture's ink: the render pipeline
    # (22x22 crop -> 5x bilinear upsample -> stamp -> 5x box downscale)
    # preserves ink mass, so each digit's per-frame residual mass must
    # track the fixture crop's own sum (minus antialias/clipping losses).
    data = np.load(dest)["train_x"].astype(np.float32) / 255.0
    flat = data.reshape(-1, *data.shape[2:])
    bg = np.median(flat, axis=0)
    import data_parity as dp
    _, mass = dp.track_digits(data, bg)
    expected = [(x[j, 3:-3, 3:-3] / 255.0).sum() for j in range(2)]
    for j in range(2):
        assert abs(mass[..., j].max() - expected[j]) < 0.35 * expected[j], (
            mass[..., j].max(), expected[j])
