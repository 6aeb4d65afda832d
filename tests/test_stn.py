"""Golden tests: our affine_grid/grid_sample must match torch's defaults
bit-for-bit-ish (SURVEY.md §7 hard part (a)), and the separable MXU warp must
match the gather-based grid_sample.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from paig_reproduction_tpu.ops import stn

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand_theta(rs, n, axis_aligned=False):
    if axis_aligned:
        theta = np.zeros((n, 2, 3), np.float32)
        theta[:, 0, 0] = rs.rand(n) * 2 + 0.2
        theta[:, 1, 1] = rs.rand(n) * 2 + 0.2
        theta[:, 0, 2] = rs.randn(n)
        theta[:, 1, 2] = rs.randn(n)
    else:
        theta = (rs.randn(n, 2, 3) * 0.7).astype(np.float32)
        theta[:, 0, 0] += 1.0
        theta[:, 1, 1] += 1.0
    return theta


@pytest.mark.parametrize("hw_in,hw_out", [((16, 16), (32, 32)),
                                          ((18, 18), (36, 36)),
                                          ((7, 9), (13, 11))])
def test_affine_grid_matches_torch(hw_in, hw_out):
    rs = np.random.RandomState(0)
    n, c = 3, 2
    theta = _rand_theta(rs, n)
    size = (n, c, *hw_out)
    ours = stn.affine_grid(jnp.asarray(theta), size)
    ref = F.affine_grid(torch.from_numpy(theta), size,
                        align_corners=False).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


@pytest.mark.parametrize("axis_aligned", [False, True])
def test_grid_sample_matches_torch(axis_aligned):
    rs = np.random.RandomState(1)
    n, c, hi, wi = 4, 3, 16, 16
    ho, wo = 32, 32
    u = rs.rand(n, c, hi, wi).astype(np.float32)
    theta = _rand_theta(rs, n, axis_aligned)

    grid_t = F.affine_grid(torch.from_numpy(theta), (n, c, ho, wo),
                           align_corners=False)
    ref = F.grid_sample(torch.from_numpy(u), grid_t).numpy()

    grid_j = stn.affine_grid(jnp.asarray(theta), (n, c, ho, wo))
    ours = np.asarray(stn.grid_sample(jnp.asarray(u), grid_j))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_stn_entrypoint_matches_torch_reference_semantics():
    """Reproduces the exact call pattern of the reference decoder:
    theta = [sigma, 0, tx, 0, sigma, ty] as a flat [N, 6] vector
    (physics_models.py:175-182)."""
    rs = np.random.RandomState(2)
    n, c, t = 5, 6, 16
    img = 32
    u = rs.rand(n, c, t, t).astype(np.float32)
    sigma = 1.0
    locs = rs.rand(n, 2).astype(np.float32) * img
    theta = np.stack([
        np.full(n, sigma, np.float32),
        np.zeros(n, np.float32),
        (img / 2 - locs[:, 0]) / (img // 2) * sigma,
        np.zeros(n, np.float32),
        np.full(n, sigma, np.float32),
        (img / 2 - locs[:, 1]) / (img // 2) * sigma,
    ], axis=1)

    grid_t = F.affine_grid(torch.from_numpy(theta.reshape(n, 2, 3)),
                           (n, c, img, img), align_corners=False)
    ref = F.grid_sample(torch.from_numpy(u), grid_t).numpy()

    ours = np.asarray(stn.stn(jnp.asarray(u), jnp.asarray(theta),
                              (img, img)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_separable_warp_equals_grid_sample():
    rs = np.random.RandomState(3)
    n, c, t = 6, 4, 16
    ho = wo = 32
    u = jnp.asarray(rs.rand(n, c, t, t).astype(np.float32))
    sx = jnp.asarray(rs.rand(n).astype(np.float32) + 0.3)
    sy = jnp.asarray(rs.rand(n).astype(np.float32) + 0.3)
    tx = jnp.asarray(rs.randn(n).astype(np.float32))
    ty = jnp.asarray(rs.randn(n).astype(np.float32))

    theta = jnp.stack([sx, jnp.zeros(n), tx, jnp.zeros(n), sy, ty], axis=1)
    grid = stn.affine_grid(theta.reshape(n, 2, 3), (n, c, ho, wo))
    ref = stn.grid_sample(u, grid)

    ours = stn.separable_warp(u, sx, tx, sy, ty, (ho, wo))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)
