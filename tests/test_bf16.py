"""--compute_dtype=bfloat16: the encoder conv stack runs bf16 with f32
master weights. The param tree must be byte-identical in structure to the
f32 model (checkpoints interoperate), positions must agree to well under a
pixel, and the train-step gradient must stay finite and f32."""
import jax
import jax.numpy as jnp
import numpy as np

from paig_reproduction_tpu.models import PhysicsNet
from paig_reproduction_tpu.models.physics_net import compute_losses
import pytest

pytestmark = pytest.mark.slow  # integration-scale; core gate runs -m 'not slow'


def _models():
    kw = dict(task="spring_color", cell_type="spring_ode_cell", seq_len=12,
              input_steps=4, pred_steps=6, autoencoder_loss=3.0,
              color=True, input_size=32 * 32)
    return (PhysicsNet(**kw),
            PhysicsNet(compute_dtype="bfloat16", **kw))


def test_bf16_param_tree_and_forward_parity():
    m32, m16 = _models()
    inp = jnp.asarray(np.random.RandomState(0).rand(2, 12, 3, 32, 32),
                      jnp.float32)
    p32 = m32.init(jax.random.PRNGKey(0), inp)
    p16 = m16.init(jax.random.PRNGKey(0), inp)

    # identical tree: same paths, shapes, and f32 storage (master weights)
    f32 = jax.tree_util.tree_leaves_with_path(p32)
    f16 = jax.tree_util.tree_leaves_with_path(p16)
    assert [(p, v.shape) for p, v in f32] == [(p, v.shape) for p, v in f16]
    assert all(v.dtype == jnp.float32 for _, v in f16)

    out32, aux32 = m32.apply(p32, inp)
    out16, aux16 = m16.apply(p32, inp)     # same params, bf16 compute
    assert out16.dtype == jnp.float32
    # encoded positions agree to well under a pixel (coordinate head +
    # tanh run f32; only the conv stack is bf16)
    err = np.abs(np.asarray(aux32["enc_pos"] - aux16["enc_pos"]))
    assert err.max() < 0.5, err.max()


def test_bf16_grads_finite_and_f32():
    _, m16 = _models()
    inp = jnp.asarray(np.random.RandomState(1).rand(2, 12, 3, 32, 32),
                      jnp.float32)
    params = m16.init(jax.random.PRNGKey(0), inp)

    def loss_fn(p):
        out, aux = m16.apply(p, inp)
        loss, _ = compute_losses(m16, inp, out, aux["recons_out"])
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(g.dtype == jnp.float32 for g in leaves)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the conv stack actually receives gradient through the bf16 path
    gsum = sum(float(np.abs(np.asarray(g)).sum()) for g in leaves)
    assert gsum > 0
