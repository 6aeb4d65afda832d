"""Golden-numerics regression test (SURVEY.md §4 'golden' tier): a
fixed-seed forward pass compared against stored values, catching silent
kernel/layout/init regressions."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from paig_reproduction_tpu.models import PhysicsNet
from paig_reproduction_tpu.models.physics_net import compute_losses

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "spring_color_fwd.npz")


def test_fixed_seed_forward_matches_golden():
    model = PhysicsNet(task="spring_color", cell_type="spring_ode_cell",
                       seq_len=12, input_steps=4, pred_steps=6,
                       autoencoder_loss=3.0, color=True,
                       input_size=32 * 32)
    inp = jnp.asarray(
        np.random.RandomState(123).rand(2, 12, 3, 32, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(42), inp)
    out, aux = model.apply(params, inp)
    tl, ev = compute_losses(model, inp, out, aux["recons_out"])

    with np.load(GOLDEN) as g:
        np.testing.assert_allclose(float(tl), g["train_loss"], rtol=1e-4)
        np.testing.assert_allclose(float(ev["eval_pred_loss"]),
                                   g["pred_loss"], rtol=1e-4)
        np.testing.assert_allclose(float(ev["eval_extrap_loss"]),
                                   g["extrap_loss"], rtol=1e-4)
        np.testing.assert_allclose(float(ev["eval_recons_loss"]),
                                   g["recons_loss"], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(aux["pos_vel_seq"]),
                                   g["pos_vel_seq"], rtol=1e-3,
                                   atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(out[:, :, :, ::8, ::8]), g["out_slice"],
            rtol=1e-3, atol=1e-4)
