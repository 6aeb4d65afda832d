"""Unit tests for the ODE cells (SURVEY.md §4: analytic + generator-parity).

The cells are validated against the *generator* physics (the ground truth the
model is supposed to learn, reference generators.py:322-329,602-618), not
against the reference's torch cells, whose width-1 state splitting is a known
mistranslation (see ops/cells.py docstring).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paig_reproduction_tpu.ops import cells
from paig_reproduction_tpu.ops.cells import CellParams


def _params(**kw):
    p = CellParams.initial()
    return p._replace(**{k: jnp.asarray(v) for k, v in kw.items()})


class TestSpring:
    def test_matches_generator_physics(self):
        # With matching (k, equil, dt, substeps), the learned-cell
        # integrator must reproduce the generator integrator exactly.
        rs = np.random.RandomState(1)
        k, equil = 1.7, 1.3
        poss = rs.rand(2, 2) * 20 + 5
        vels = rs.randn(2, 2)

        pos = jnp.asarray(poss.reshape(1, 4), jnp.float32)
        vel = jnp.asarray(vels.reshape(1, 4), jnp.float32)
        p = _params(log_k=np.log(k), log_equil=np.log(equil))
        for _ in range(3):  # 3 frames
            pos, vel = cells.spring_step(p, pos, vel)

        ref_p, ref_v = np.array(poss), np.array(vels)
        for _ in range(3):
            ref_p, ref_v = cells.numpy_generator_spring(
                ref_p, ref_v, k, equil, cells.SPRING_DT, cells.SUBSTEPS)

        # The cell's 1e-4 direction epsilon is the only difference.
        np.testing.assert_allclose(np.asarray(pos).reshape(2, 2), ref_p,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(vel).reshape(2, 2), ref_v,
                                   rtol=1e-3, atol=1e-3)

    def test_conserves_center_of_mass_velocity(self):
        rs = np.random.RandomState(2)
        pos = jnp.asarray(rs.rand(8, 4) * 30, jnp.float32)
        vel = jnp.asarray(rs.randn(8, 4), jnp.float32)
        p = _params(log_k=0.5, log_equil=0.2)
        _, vel2 = cells.spring_step(p, pos, vel)
        com_before = vel.reshape(8, 2, 2).sum(axis=1)
        com_after = vel2.reshape(8, 2, 2).sum(axis=1)
        np.testing.assert_allclose(com_after, com_before, atol=1e-4)

    def test_gradients_reach_parameters(self):
        pos = jnp.ones((2, 4)) * jnp.asarray([5.0, 5.0, 10.0, 12.0])
        vel = jnp.zeros((2, 4))

        def loss(p):
            q, _ = cells.spring_step(p, pos, vel)
            return jnp.sum(q ** 2)

        g = jax.grad(loss)(_params(log_k=0.0, log_equil=0.0))
        assert abs(float(g.log_k)) > 1e-6
        assert abs(float(g.log_equil)) > 1e-6


class TestBouncing:
    def test_free_flight(self):
        pos = jnp.full((1, 4), 16.0)
        vel = jnp.asarray([[1.0, -2.0, 0.5, 0.25]])
        p = CellParams.initial()
        pos2, vel2 = cells.bouncing_step(p, pos, vel)
        np.testing.assert_allclose(pos2, pos + cells.BOUNCING_DT * vel,
                                   rtol=1e-6)
        np.testing.assert_allclose(vel2, vel, rtol=1e-6)

    def test_wall_reflection(self):
        # Start near the right wall moving right: must reflect.
        pos = jnp.asarray([[29.9, 16.0, 16.0, 16.0]])
        vel = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
        pos2, vel2 = cells.bouncing_step(CellParams.initial(), pos, vel)
        assert float(vel2[0, 0]) == -10.0
        assert float(pos2[0, 0]) <= cells.WALL_SIZE - cells.BALL_RADIUS
        # Other coords unaffected
        np.testing.assert_allclose(pos2[0, 1:], pos[0, 1:] , atol=1e-6)

    def test_both_objects_integrate(self):
        # Guards against the reference's bug where object 2 never moves.
        pos = jnp.full((1, 4), 16.0)
        vel = jnp.asarray([[0.0, 0.0, 3.0, -1.0]])
        pos2, _ = cells.bouncing_step(CellParams.initial(), pos, vel)
        assert float(jnp.abs(pos2[0, 2:] - pos[0, 2:]).sum()) > 0.1


class TestGravity:
    def test_matches_generator_physics(self):
        rs = np.random.RandomState(3)
        g, m = 9.8, 1.0
        center = np.array([18.0, 18.0])
        angles = [0.0, 2 * np.pi / 3, 4 * np.pi / 3]
        poss = np.stack([center + 9 * np.array([np.cos(a), np.sin(a)])
                         for a in angles])
        vels = rs.randn(3, 2) * 0.5

        pos = jnp.asarray(poss.reshape(1, 6), jnp.float32)
        vel = jnp.asarray(vels.reshape(1, 6), jnp.float32)
        p = _params(log_g=np.log(g), log_m=np.log(m))
        pos, vel = cells.gravity_step(p, pos, vel)

        ref_p, ref_v = cells.numpy_generator_gravity(
            poss, vels, g, m, cells.GRAVITY_DT, cells.SUBSTEPS)
        # Inter-object distances here stay inside the clamp-free band
        # ([1, 170] norm), so the cell must match the generator closely.
        np.testing.assert_allclose(np.asarray(pos).reshape(3, 2), ref_p,
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(vel).reshape(3, 2), ref_v,
                                   rtol=1e-4, atol=1e-3)

    def test_A_recomputed_gradient_flows(self):
        pos = jnp.asarray([[10., 10., 20., 10., 15., 20.]])
        vel = jnp.zeros((1, 6))

        def loss(p):
            q, _ = cells.gravity_step(p, pos, vel)
            return jnp.sum(q ** 2)

        g = jax.grad(loss)(_params(log_g=np.log(9.8)))
        assert abs(float(g.log_g)) > 1e-8

    def test_norm_clamps_active(self):
        # Two bodies nearly coincident: clamps must keep outputs finite.
        pos = jnp.asarray([[10., 10., 10.001, 10., 30., 30.]])
        vel = jnp.zeros((1, 6))
        p = _params(log_g=np.log(60.0))
        pos2, vel2 = cells.gravity_step(p, pos, vel)
        assert bool(jnp.all(jnp.isfinite(pos2)))
        assert bool(jnp.all(jnp.isfinite(vel2)))


def test_cells_registry():
    assert set(cells.CELLS) == {"spring_ode_cell", "bouncing_ode_cell",
                                "gravity_ode_cell"}


def test_cells_jit_and_vmap():
    p = CellParams.initial()
    pos = jnp.ones((4, 4)) * 10
    vel = jnp.ones((4, 4))
    for name, (fn, dt) in cells.CELLS.items():
        if name == "gravity_ode_cell":
            pos_, vel_ = jnp.ones((4, 6)) * 10, jnp.ones((4, 6))
        else:
            pos_, vel_ = pos, vel
        out_p, out_v = jax.jit(fn)(p, pos_, vel_)
        assert out_p.shape == pos_.shape
        assert out_v.shape == vel_.shape
