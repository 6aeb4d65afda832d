"""Model-level tests: shapes per task config, loss semantics, end-to-end
gradient flow (the reference's broken path, SURVEY.md §3.1), decoder
equivalence with the grid_sample oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paig_reproduction_tpu.models import PhysicsNet
from paig_reproduction_tpu.models.decoder import (
    DecoderAssets,
    DecoderConfig,
    st_decode,
)
from paig_reproduction_tpu.models.physics_net import compute_losses
from paig_reproduction_tpu.ops import stn

TASK_CFGS = {
    "bouncing_balls": dict(task="bouncing_balls",
                           cell_type="bouncing_ode_cell", seq_len=12,
                           input_steps=4, pred_steps=6, input_size=32 * 32),
    "spring_color": dict(task="spring_color", cell_type="spring_ode_cell",
                         seq_len=12, input_steps=4, pred_steps=6,
                         input_size=32 * 32),
    "3bp_color": dict(task="3bp_color", cell_type="gravity_ode_cell",
                      seq_len=20, input_steps=4, pred_steps=12,
                      input_size=36 * 36),
}


def _forward(cfg, batch=2, seed=0):
    model = PhysicsNet(color=True, autoencoder_loss=3.0, **cfg)
    img = int(np.sqrt(cfg["input_size"]))
    inp = jnp.asarray(
        np.random.RandomState(seed).rand(batch, cfg["seq_len"], 3, img,
                                         img), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), inp)
    out, aux = model.apply(params, inp)
    return model, params, inp, out, aux


@pytest.mark.parametrize("name", list(TASK_CFGS))
def test_forward_shapes(name):
    cfg = TASK_CFGS[name]
    model, params, inp, out, aux = _forward(cfg)
    img = int(np.sqrt(cfg["input_size"]))
    t_in = cfg["input_steps"] + cfg["pred_steps"]
    n_roll = cfg["seq_len"] - cfg["input_steps"]
    assert out.shape == (2, n_roll, 3, img, img)
    assert aux["recons_out"].shape == (2, t_in, 3, img, img)
    assert aux["pos_vel_seq"].shape == (2, n_roll - cfg["pred_steps"]
                                        + cfg["pred_steps"] + 1,
                                        model.coord_units)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_loss_definitions_match_reference():
    # Hand-computed small case: loss = sum over CHW, mean over batch/time.
    cfg = TASK_CFGS["spring_color"]
    model, params, inp, out, aux = _forward(cfg)
    train_loss, ev = compute_losses(model, inp, out, aux["recons_out"])

    inp_np, out_np = np.asarray(inp), np.asarray(out)
    rec_np = np.asarray(aux["recons_out"])
    t_in = model.input_steps + model.pred_steps
    rl = ((inp_np[:, :t_in] - rec_np) ** 2).sum(axis=(2, 3, 4)).mean()
    full = ((inp_np[:, model.input_steps:] - out_np) ** 2).sum(
        axis=(2, 3, 4))
    pl = full[:, :model.pred_steps].mean()
    el = full[:, model.pred_steps:].mean()
    np.testing.assert_allclose(float(ev["eval_pred_loss"]), pl, rtol=1e-5)
    np.testing.assert_allclose(float(ev["eval_extrap_loss"]), el,
                               rtol=1e-5)
    np.testing.assert_allclose(float(ev["eval_recons_loss"]), rl,
                               rtol=1e-5)
    np.testing.assert_allclose(float(train_loss),
                               pl + model.autoencoder_loss * rl, rtol=1e-5)


def test_end_to_end_gradients():
    """Physics parameters, velocity encoder AND encoder must all receive
    gradients from the training loss (intended semantics; the reference
    trains none of the first two, SURVEY.md §3.1)."""
    cfg = TASK_CFGS["spring_color"]
    model, params, inp, _, _ = _forward(cfg)

    def loss_fn(p):
        out, aux = model.apply(p, inp)
        l, _ = compute_losses(model, inp, out, aux["recons_out"])
        return l

    g = jax.grad(loss_fn)(params)["params"]
    assert abs(float(g["log_k"])) > 0
    assert abs(float(g["log_equil"])) > 0
    for sub in ("velocity_encoder", "encoder", "var_net_template"):
        norm = np.sqrt(sum(float(jnp.sum(x ** 2))
                           for x in jax.tree.leaves(g[sub])))
        assert norm > 0, f"no gradient reaching {sub}"


def test_reference_quirks_gradient_path():
    """--reference_quirks reproduces the reference's EFFECTIVE training
    gradients (recons-only: its pred term is a detached stale eval
    output, reference base.py:142,195 + physics_models.py:130): physics
    params and the velocity encoder get EXACTLY zero gradient, the
    encoder/decoder still train, and the loss VALUES are unchanged."""
    cfg = TASK_CFGS["spring_color"]
    model, params, inp, out, aux = _forward(cfg)
    qmodel = model.clone(reference_quirks=True)

    def loss_fn(p, m):
        out, aux = m.apply(p, inp)
        l, _ = compute_losses(m, inp, out, aux["recons_out"])
        return l

    g = jax.grad(loss_fn)(params, qmodel)["params"]
    assert float(g["log_k"]) == 0.0
    assert float(g["log_equil"]) == 0.0
    vel_norm = np.sqrt(sum(float(jnp.sum(x ** 2))
                           for x in jax.tree.leaves(g["velocity_encoder"])))
    assert vel_norm == 0.0, "velocity encoder must get no gradient"
    for sub in ("encoder", "var_net_template"):
        norm = np.sqrt(sum(float(jnp.sum(x ** 2))
                           for x in jax.tree.leaves(g[sub])))
        assert norm > 0, f"autoencoder path must still train {sub}"

    # metric values are identical to the intended-semantics mode
    l_q, ev_q = compute_losses(qmodel, inp, out, aux["recons_out"])
    l_i, ev_i = compute_losses(model, inp, out, aux["recons_out"])
    np.testing.assert_allclose(float(l_q), float(l_i), rtol=1e-6)
    for k in ev_i:
        np.testing.assert_allclose(float(ev_q[k]), float(ev_i[k]),
                                   rtol=1e-6)


def test_decoder_matches_grid_sample_oracle():
    """The separable-matmul decoder warp must equal the reference
    composition: stn(affine_grid) on (template+5, sigmoid contents) with
    theta from physics_models.py:175-181."""
    rs = np.random.RandomState(0)
    n, o, t, img, ch = 3, 2, 16, 32, 3
    assets = DecoderAssets(
        template=jnp.asarray(rs.randn(o, t, t), jnp.float32),
        contents=jnp.asarray(rs.randn(o, t, t, ch), jnp.float32),
        background=jnp.asarray(rs.rand(img, img, ch), jnp.float32),
    )
    cfg = DecoderConfig(img_hw=(img, img), tmpl_size=t, n_objs=o,
                        conv_ch=ch, log_sig=1.0)
    pos = jnp.asarray(rs.rand(n, o * 2) * img, jnp.float32)

    out, _ = st_decode(assets, pos, cfg)

    # oracle: per-object grid_sample warp + softmax composite
    sigma = 1.0
    joint = jnp.concatenate(
        [assets.template[..., None] + 5.0,
         jax.nn.sigmoid(assets.contents)], axis=-1)  # [o, T, T, C+1]
    joint_nchw = jnp.transpose(joint, (0, 3, 1, 2))
    mask_logits, contents_w = [], []
    pos_r = np.asarray(pos).reshape(n, o, 2)
    for j in range(o):
        theta = np.stack([
            np.full(n, sigma, np.float32), np.zeros(n, np.float32),
            (img / 2 - pos_r[:, j, 0]) / t * sigma,
            np.zeros(n, np.float32), np.full(n, sigma, np.float32),
            (img / 2 - pos_r[:, j, 1]) / t * sigma], axis=1)
        u = jnp.tile(joint_nchw[j][None], (n, 1, 1, 1))
        warped = stn.stn(u, jnp.asarray(theta), (img, img))
        mask_logits.append(warped[:, 0] - 5.0)
        contents_w.append(warped[:, 1:])
    logits = jnp.stack(mask_logits + [jnp.ones((n, img, img))], axis=1)
    masks = jax.nn.softmax(logits, axis=1)
    ref = sum(masks[:, j][:, None] * contents_w[j] for j in range(o))
    ref = ref + masks[:, o][:, None] * jnp.transpose(
        assets.background, (2, 0, 1))[None]
    ref = jnp.transpose(ref, (0, 2, 3, 1))

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_lstm_baseline_runs():
    """--lstm_layers is honored: a 2-layer stack creates both cells'
    params and still rolls out (reference exposes the flag but never wires
    it, torch_run_physics.py:27 / SURVEY.md §2.1)."""
    model = PhysicsNet(task="spring_color", cell_type="lstm", seq_len=12,
                       input_steps=4, pred_steps=6, color=True,
                       input_size=32 * 32, recurrent_units=32,
                       lstm_layers=2)
    inp = jnp.asarray(np.random.RandomState(0).rand(2, 12, 3, 32, 32),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), inp)
    assert "lstm_0" in params["params"] and "lstm_1" in params["params"]
    out, aux = model.apply(params, inp)
    assert out.shape == (2, 8, 3, 32, 32)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unknown_encoder_type_rejected():
    import pytest

    model = PhysicsNet(task="spring_color", cell_type="spring_ode_cell",
                       seq_len=12, input_steps=4, pred_steps=6, color=True,
                       input_size=32 * 32, encoder_type="nope")
    inp = jnp.zeros((1, 12, 3, 32, 32), jnp.float32)
    with pytest.raises(AssertionError, match="encoder_type"):
        model.init(jax.random.PRNGKey(0), inp)
