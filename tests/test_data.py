"""Data layer tests: iterator semantics (epoch counting identical to the
reference), npz loading, generator output contracts, generator<->cell
physics consistency."""
import os

import numpy as np
import pytest

from paig_reproduction_tpu.data import generators as g
from paig_reproduction_tpu.data.iterators import DataIterator, get_iterators


class TestDataIterator:
    def test_epoch_counting_matches_reference(self):
        # N=250, batch=100: the reference increments epochs after the 2nd
        # batch (start+batch > N) and never emits a partial batch.
        it = DataIterator(np.arange(250)[:, None], seed=0)
        b1, _ = it.next_batch(100)
        assert it.epochs_completed == 0
        b2, _ = it.next_batch(100)
        assert it.epochs_completed == 1
        assert b1.shape == (100, 1) and b2.shape == (100, 1)
        # No overlap within the epoch (shuffled without replacement)
        assert len(set(b1[:, 0]) & set(b2[:, 0])) == 0

    def test_batches_always_full(self):
        it = DataIterator(np.arange(7)[:, None], seed=0)
        for _ in range(10):
            b, _ = it.next_batch(3)
            assert b.shape == (3, 1)

    def test_reset_epoch(self):
        it = DataIterator(np.arange(10)[:, None], seed=0)
        for _ in range(5):
            it.next_batch(5)
        it.reset_epoch()
        assert it.epochs_completed == 0
        assert it.start_idx == 0

    def test_sample_random_batch_fixed(self):
        # The reference draws a random start then ignores it; ours uses it.
        it = DataIterator(np.arange(100)[:, None], seed=0)
        np.random.seed(3)
        b, _ = it.sample_random_batch(10)
        assert b.shape == (10, 1)
        # contiguous slice from a random (not necessarily 0) start
        assert b[0, 0] + 9 == b[9, 0]


class TestGetIterators:
    def test_layout_and_datapoints(self, tmp_path):
        rs = np.random.RandomState(0)
        shape = (20, 5, 16, 16, 3)
        f = tmp_path / "toy.npz"
        np.savez_compressed(
            f, train_x=rs.randint(0, 255, shape, dtype=np.uint8),
            valid_x=rs.randint(0, 255, (6,) + shape[1:], dtype=np.uint8),
            test_x=rs.randint(0, 255, (6,) + shape[1:], dtype=np.uint8))
        tr, va, te = get_iterators(str(f), conv=True, datapoints=8)
        assert tr.X.shape == (8, 5, 3, 16, 16)   # datapoints bug fixed
        assert va.X.shape == (6, 5, 3, 16, 16)
        assert tr.X.dtype == np.float32
        assert tr.X.max() <= 1.0 and tr.X.min() >= 0.0


class TestGenerators:
    def test_spring_dataset_contract(self, tmp_path):
        dest = str(tmp_path / "spring" / "toy.npz")
        g.generate_spring_balls_dataset(
            dest, train_set_size=3, valid_set_size=1, test_set_size=1,
            seq_len=6, img_size=[32, 32], radius=2, dt=0.3, k=4, equil=6,
            vx0_max=3.0, vy0_max=3.0, color=True)
        with np.load(dest) as d:
            assert d["train_x"].shape == (3, 6, 32, 32, 3)
            assert d["valid_x"].shape == (1, 6, 32, 32, 3)
            assert d["train_x"].dtype == np.uint8
            # balls drawn: some bright pixels in ball channels
            assert d["train_x"][:, :, :, :, 1:].max() > 128
        assert os.path.exists(dest.replace(".npz", "_samples.jpg"))

    def test_bouncing_video_dataset_contract(self, tmp_path):
        dest = str(tmp_path / "bounce" / "toy.npz")
        g.generate_bouncing_balls_video_dataset(
            dest, train_set_size=2, valid_set_size=1, test_set_size=1,
            seq_len=4, img_size=[32, 32])
        with np.load(dest) as d:
            assert d["train_x"].shape == (2, 4, 32, 32, 3)

    def test_3bp_dataset_contract(self, tmp_path):
        dest = str(tmp_path / "3bp" / "toy.npz")
        g.generate_3_body_problem_dataset(
            dest, train_set_size=2, valid_set_size=1, test_set_size=1,
            seq_len=4, img_size=[36, 36], radius=2, dt=0.5, g=60.0, m=1.0,
            vx0_max=2.0, vy0_max=2.0, color=True)
        with np.load(dest) as d:
            assert d["train_x"].shape == (2, 4, 36, 36, 3)

    def test_mnist_dataset_contract(self, tmp_path):
        dest = str(tmp_path / "mnist" / "toy.npz")
        g.generate_spring_mnist_dataset(
            dest, train_set_size=2, valid_set_size=1, test_set_size=1,
            seq_len=4, img_size=[64, 64], dt=0.3, k=2, equil=12,
            vx0_max=3.0, vy0_max=3.0, color=True, cifar_background=False)
        with np.load(dest) as d:
            assert d["train_x"].shape == (2, 4, 64, 64, 3)

    def test_coordinate_dataset(self, tmp_path):
        dest = str(tmp_path / "coords.npz")
        g.generate_bouncing_ball_dataset(dest, 3, 1, 1, seq_len=5,
                                         box_size=32)
        with np.load(dest) as d:
            assert d["train_x"].shape == (3, 5, 2)

    def test_falling_datasets(self, tmp_path):
        d1 = str(tmp_path / "fall.npz")
        g.generate_falling_ball_dataset(d1, 2, 1, 1, seq_len=3)
        with np.load(d1) as d:
            assert d["train_x"].shape == (2, 3, 32, 32, 1)
        d2 = str(tmp_path / "fallb.npz")
        g.generate_falling_bouncing_ball_dataset(d2, 2, 1, 1, seq_len=3,
                                                 vx0_max=2.0, vy0_max=2.0)
        with np.load(d2) as d:
            assert d["train_x"].shape == (2, 3, 32, 32, 1)


def test_generator_physics_consistency():
    """The spring generator's trajectories must be reproducible by the
    learnable cell when given the true parameters — the core premise of
    the model (SURVEY.md §4 'property' tier)."""
    import jax.numpy as jnp

    from paig_reproduction_tpu.ops import cells

    rs = np.random.RandomState(0)
    k, equil, dt = 4.0, 6.0, 0.3
    poss = np.array([[10.0, 14.0], [20.0, 18.0]])
    vels = rs.randn(2, 2)

    # generator integration: ode_steps=10 at dt/10
    gp, gv = poss.copy(), vels.copy()
    for _ in range(1):
        gp, gv = cells.numpy_generator_spring(gp, gv, k, equil, dt, 10)

    # cell integration: 5 substeps at dt/5
    p = jnp.asarray(poss.reshape(1, 4), jnp.float32)
    v = jnp.asarray(vels.reshape(1, 4), jnp.float32)
    cp = cells.CellParams.initial()._replace(
        log_k=jnp.asarray(np.log(k)), log_equil=jnp.asarray(np.log(equil)))
    p, v = cells.spring_step(cp, p, v, dt)

    # 10 vs 5 substeps differ only by integration error: loose tolerance
    np.testing.assert_allclose(np.asarray(p).reshape(2, 2), gp, atol=0.3)
    np.testing.assert_allclose(np.asarray(v).reshape(2, 2), gv, atol=0.3)
