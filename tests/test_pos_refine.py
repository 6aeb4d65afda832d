"""Render-based subpixel position refinement (ops/pos_refine.py).

The refiner must recover true object positions from perturbed initials
using only the model's renderer — the capability the initial-state fits
build on (their output quality is bounded by observation noise)."""
import jax
import jax.numpy as jnp
import numpy as np

from paig_reproduction_tpu.models.decoder import (
    DecoderAssets,
    DecoderConfig,
    st_decode,
)
from paig_reproduction_tpu.ops.pos_refine import refine_positions
import pytest


def _toy_scene(n_objs=2, img=32, seed=0):
    rs = np.random.RandomState(seed)
    tmpl = img // 2
    cfg = DecoderConfig(img_hw=(img, img), tmpl_size=tmpl, n_objs=n_objs,
                        conv_ch=3)
    c = (tmpl - 1) / 2.0
    yy, xx = np.mgrid[:tmpl, :tmpl]
    disk = np.where((yy - c) ** 2 + (xx - c) ** 2 <= 9.0, 6.0, -6.0)
    template = jnp.asarray(np.tile(disk[None], (n_objs, 1, 1)), jnp.float32)
    colors = np.zeros((n_objs, tmpl, tmpl, 3), np.float32)
    for o in range(n_objs):
        colors[o, :, :, o % 3] = 4.0          # saturated distinct colors
    assets = DecoderAssets(
        template=template,
        contents=jnp.asarray(colors),
        background=jnp.zeros((img, img, 3), jnp.float32) + 0.1)
    render = lambda p: st_decode(assets, p, cfg)[0]
    return render, rs


def test_refine_recovers_true_positions():
    render, rs = _toy_scene()
    n = 16
    true = jnp.asarray(rs.uniform(8.0, 24.0, (n, 4)), jnp.float32)
    frames = render(true)
    noisy = true + jnp.asarray(rs.uniform(-0.6, 0.6, (n, 4)), jnp.float32)
    refined = refine_positions(render, frames, noisy, iters=5)
    err0 = float(jnp.abs(noisy - true).mean())
    err1 = float(jnp.abs(refined - true).mean())
    assert err1 < 0.05, (err0, err1)            # subpixel: >6x under init


def test_refine_straight_through_gradient():
    render, rs = _toy_scene()
    true = jnp.asarray(rs.uniform(10.0, 22.0, (4, 4)), jnp.float32)
    frames = render(true)
    noisy = true + 0.4

    def f(p):
        return jnp.sum(refine_positions(render, frames, p, iters=2))

    g = jax.grad(f)(noisy)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)


def test_refine_wired_into_model():
    """--refine_enc_pos changes the rollout start but not the recons
    path, and composes with the state fit."""
    from paig_reproduction_tpu.models import PhysicsNet

    rs = np.random.RandomState(3)
    inp = jnp.asarray(rs.rand(2, 12, 3, 32, 32), jnp.float32)
    kw = dict(task="spring_color", cell_type="spring_ode_cell",
              seq_len=12, input_steps=4, pred_steps=6,
              autoencoder_loss=3.0, color=True, input_size=32 * 32)
    m0 = PhysicsNet(**kw)
    m1 = PhysicsNet(refine_enc_pos=3, init_state_fit=2, **kw)
    params = m0.init(jax.random.PRNGKey(0), inp)
    out0, aux0 = m0.apply(params, inp)
    out1, aux1 = m1.apply(params, inp)
    assert bool(jnp.all(jnp.isfinite(out1)))
    np.testing.assert_allclose(np.asarray(aux0["recons_out"]),
                               np.asarray(aux1["recons_out"]), atol=1e-6)
    assert not np.allclose(aux0["pos_vel_seq"][:, 0],
                           aux1["pos_vel_seq"][:, 0])


@pytest.mark.slow
def test_refine_recons_pos_changes_recons_and_keeps_grads():
    """--refine_recons_pos refines EVERY encoded frame before the
    autoencoder decode: recons_out moves, the rollout window follows the
    refined positions, and gradients to the encoder stay finite
    (straight-through)."""
    from paig_reproduction_tpu.models import PhysicsNet
    from paig_reproduction_tpu.models.physics_net import compute_losses

    rs = np.random.RandomState(4)
    inp = jnp.asarray(rs.rand(2, 12, 3, 32, 32), jnp.float32)
    kw = dict(task="spring_color", cell_type="spring_ode_cell",
              seq_len=12, input_steps=4, pred_steps=6,
              autoencoder_loss=3.0, color=True, input_size=32 * 32)
    m0 = PhysicsNet(**kw)
    m2 = PhysicsNet(refine_recons_pos=2, **kw)
    params = m0.init(jax.random.PRNGKey(0), inp)
    out0, aux0 = m0.apply(params, inp)
    out2, aux2 = m2.apply(params, inp)
    assert bool(jnp.all(jnp.isfinite(out2)))
    assert not np.allclose(np.asarray(aux0["recons_out"]),
                           np.asarray(aux2["recons_out"]))
    assert not np.allclose(aux0["pos_vel_seq"][:, 0],
                           aux2["pos_vel_seq"][:, 0])

    def loss(p):
        o, a = m2.apply(p, inp)
        l, _ = compute_losses(m2, inp, o, a["recons_out"])
        return l

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)
