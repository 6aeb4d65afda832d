"""Sharding tests on the emulated 8-device CPU mesh: DP/TP train step
compiles, executes, and matches single-device numerics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paig_reproduction_tpu.models import PhysicsNet
from paig_reproduction_tpu.models.physics_net import compute_losses
from paig_reproduction_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
)


def _setup(batch=8):
    model = PhysicsNet(task="spring_color", cell_type="spring_ode_cell",
                       seq_len=12, input_steps=4, pred_steps=6,
                       autoencoder_loss=3.0, color=True,
                       input_size=32 * 32)
    inp = jnp.asarray(
        np.random.RandomState(0).rand(batch, 12, 3, 32, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), inp)["params"]

    def loss_fn(p, b):
        out, aux = model.apply({"params": p}, b)
        loss, _ = compute_losses(model, b, out, aux["recons_out"])
        return loss

    return model, params, inp, loss_fn


def test_device_count():
    assert jax.device_count() >= 8, (
        "tests must run with xla_force_host_platform_device_count=8")


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2)])
@pytest.mark.slow
def test_sharded_matches_single_device(n_data, n_model):
    model, params, inp, loss_fn = _setup(batch=8)

    # single-device reference
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params, inp)

    mesh = make_mesh(n_data=n_data, n_model=n_model)
    p_sharded = jax.device_put(params, param_shardings(params, mesh))
    b_sharded = jax.device_put(inp, batch_sharding(mesh))

    loss_s, grads_s = jax.jit(jax.value_and_grad(loss_fn))(p_sharded,
                                                           b_sharded)
    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=2e-4)
    # spot-check gradient parity on the physics parameter
    np.testing.assert_allclose(float(grads_s["log_k"]),
                               float(grads_ref["log_k"]), rtol=2e-3,
                               atol=1e-7)


@pytest.mark.parametrize("n_data", [1, 2, 4, 8])
def test_dp_scaling_loss_parity(n_data):
    """The scaling curve's correctness half: the same global batch must
    produce the same loss on every mesh size (XLA inserts the gradient
    psum; batch 8 divides every size)."""
    model, params, inp, loss_fn = _setup(batch=8)
    loss_ref = float(loss_fn(params, inp))

    mesh = make_mesh(n_data=n_data, n_model=1)
    p = jax.device_put(params, param_shardings(params, mesh))
    b = jax.device_put(inp, batch_sharding(mesh))
    loss = float(jax.jit(loss_fn)(p, b))
    np.testing.assert_allclose(loss, loss_ref, rtol=2e-4)


def test_tp_params_actually_sharded():
    model, params, inp, _ = _setup()
    mesh = make_mesh(n_data=4, n_model=2)
    shardings = param_shardings(params, mesh)
    p = jax.device_put(params, shardings)
    from jax.sharding import PartitionSpec as P

    k = p["var_net_background"]["TorchDense_1"]["kernel"]
    # [200, H*W*C] kernel must be split over 'model' on its output dim
    assert k.sharding.spec == P(None, "model"), k.sharding
    # a small kernel stays replicated
    small = p["velocity_encoder"]["TorchDense_0"]["kernel"]
    assert small.sharding.spec == P(), small.sharding


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out, loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))

    ge.dryrun_multichip(8)


def test_global_index_batches_and_put_replicated_single_process():
    """Single-process semantics of the multi-host placement helpers:
    global_index_batches shards [K, B] over the data axis; a gather
    through it equals the host gather. global_put_replicated is a plain
    device_put (numpy and jax.Array leaves alike)."""
    from paig_reproduction_tpu.parallel.distributed import (
        global_index_batches,
        global_put_replicated,
    )

    mesh = make_mesh(n_data=8, n_model=1)
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data"))
    rs = np.random.RandomState(0)
    idxs = rs.randint(0, 50, (3, 8)).astype(np.int32)
    arr = global_index_batches(idxs, spec)
    assert arr.shape == (3, 8)
    np.testing.assert_array_equal(np.asarray(arr), idxs)

    data = rs.rand(50, 4).astype(np.float32)
    data_d = global_put_replicated(
        data, jax.sharding.NamedSharding(mesh,
                                         jax.sharding.PartitionSpec()))
    out = jax.jit(lambda d, i: d[i])(data_d, arr)
    np.testing.assert_allclose(np.asarray(out), data[idxs], rtol=1e-6)

    # jax.Array input passes through placement unchanged in value
    again = global_put_replicated(
        data_d, jax.sharding.NamedSharding(mesh,
                                           jax.sharding.PartitionSpec()))
    np.testing.assert_array_equal(np.asarray(again), data)
