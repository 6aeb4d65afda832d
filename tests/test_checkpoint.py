"""Checkpoint round-trip tests.

The trainer saves {'params', 'opt_state', 'step'} (capability superset of
the reference's params-only torch.save, reference base.py:167-169). Orbax
restores namedtuples as dicts, so the name-aware matcher must equate
``GetAttrKey('nu')`` with ``DictKey('nu')`` — a regression here silently
resets optimizer moments on every resume.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytest

from paig_reproduction_tpu.train.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)


def _state():
    params = {"enc": {"kernel": jnp.arange(6.0).reshape(2, 3),
                      "bias": jnp.ones(3)}}
    tx = optax.rmsprop(1e-3)
    return params, tx, tx.init(params)


def test_full_state_roundtrip(tmp_path):
    params, tx, opt = _state()
    opt = jax.tree.map(lambda x: x + 7.0, opt)  # make moments observable
    tree = {"params": params, "opt_state": opt, "step": jnp.asarray(42)}
    save_checkpoint(str(tmp_path), tree)

    target = {"params": jax.tree.map(jnp.zeros_like, params),
              "opt_state": tx.init(params), "step": jnp.asarray(0)}
    out = restore_checkpoint(str(tmp_path), target)

    assert int(out["step"]) == 42
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_partial_restore_keeps_new_leaves(tmp_path):
    params, tx, opt = _state()
    save_checkpoint(str(tmp_path),
                    {"params": params, "opt_state": opt,
                     "step": jnp.asarray(1)})

    grown = dict(params, extra={"kernel": jnp.full((2,), 3.0)})
    target = {"params": jax.tree.map(jnp.zeros_like, grown),
              "opt_state": tx.init(params), "step": jnp.asarray(0)}
    out = restore_checkpoint(str(tmp_path), target)

    np.testing.assert_allclose(np.asarray(out["params"]["enc"]["kernel"]),
                               np.asarray(params["enc"]["kernel"]))
    # new leaf absent from the checkpoint keeps its initialized value
    np.testing.assert_allclose(np.asarray(out["params"]["extra"]["kernel"]),
                               0.0)


def test_rescue_history_rebased_on_resume(tmp_path):
    """Kill/resume around a rescue boundary (VERDICT r4 §7): the surgery
    epoch and the recons history persist and are REBASED into the resumed
    run's epoch frame, so the stall guard sees the pre-kill descent
    instead of blind-firing a second rescue."""
    import jax
    import jax.numpy as jnp

    from paig_reproduction_tpu.models import PhysicsNet
    from paig_reproduction_tpu.train.trainer import Trainer

    def mk():
        model = PhysicsNet(task="spring_color",
                           cell_type="spring_ode_cell", seq_len=6,
                           input_steps=2, pred_steps=2,
                           autoencoder_loss=3.0, color=True,
                           input_size=16 * 16)
        t = Trainer(model, seed=0)
        x = np.random.RandomState(0).rand(2, 6, 3, 16, 16).astype(
            np.float32)
        t.init_params(x[:1])
        t.build_optimizer(1e-3, "sgd", anneal_lr=False)
        return t

    t = mk()
    run_dir = str(tmp_path / "run")
    t.initialize_graph(run_dir, False)
    # state as of a kill at epoch 500 of a run whose rescue fired at 450
    # and which has been DESCENDING since (8.0 -> 5.0)
    t._cur_epoch = 500
    t._last_rescue_ep = 450
    t._rescue_count = 1
    t._rescue_step = 1234
    t._recons_history = [(480, 8.0), (490, 6.0), (500, 5.0)]
    t.save()

    t2 = mk()
    t2.auto_rescue = 20   # rescue machinery armed on the resumed run
    t2.max_rescues = 2
    t2.initialize_graph(run_dir, True)
    assert t2._rescue_count == 1
    assert t2._rescue_step == 1234
    # rebased into the resumed frame: epoch 450 of the old run is -50
    assert t2._last_rescue_ep == -50
    assert t2._recons_history == [(-20, 8.0), (-10, 6.0), (0, 5.0)]
    # The restored descent baseline blocks a blind re-fire: at resumed
    # epoch 10 (lookback 10 -> baseline 5.0 at rebased epoch 0), recons
    # 4.5 is a 10% improvement -> NOT stalled. Pre-fix, the empty
    # history made this return True and the rescue re-fired.
    assert not t2._discovery_stalled(10, 4.5)
    # a genuinely flat resumed run still rescues
    assert t2._discovery_stalled(10, 4.99)


@pytest.mark.slow
def test_cross_task_partial_restore(tmp_path):
    """A model of a DIFFERENT task (3 objects, 36px) restoring a 2-object
    32px checkpoint takes every name+shape-matching trunk leaf and keeps
    fresh values for incompatible heads (cross-task discovery transfer)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from paig_reproduction_tpu.models import PhysicsNet
    from paig_reproduction_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    rs = np.random.RandomState(0)
    m_src = PhysicsNet(task="spring_color", cell_type="spring_ode_cell",
                       seq_len=12, input_steps=4, pred_steps=6,
                       autoencoder_loss=3.0, color=True,
                       input_size=32 * 32)
    p_src = m_src.init(jax.random.PRNGKey(0),
                       jnp.asarray(rs.rand(1, 12, 3, 32, 32),
                                   jnp.float32))["params"]
    save_checkpoint(str(tmp_path), {"params": p_src})

    m_tgt = PhysicsNet(task="3bp_color", cell_type="gravity_ode_cell",
                       seq_len=20, input_steps=4, pred_steps=12,
                       autoencoder_loss=5.0, color=True,
                       input_size=36 * 36)
    p_tgt0 = m_tgt.init(jax.random.PRNGKey(1),
                        jnp.asarray(rs.rand(1, 20, 3, 36, 36),
                                    jnp.float32))["params"]
    restored = restore_checkpoint(str(tmp_path), {"params": p_tgt0})

    # a UNet trunk conv (shape-identical across tasks) transferred...
    src_leaf = jax.tree_util.tree_leaves_with_path(p_src)
    flat_src = {"/".join(str(getattr(k, "key", k)) for k in p): v
                for p, v in src_leaf}
    moved = kept = 0
    for p, v in jax.tree_util.tree_leaves_with_path(
            restored["params"]):
        key = "/".join(str(getattr(k, "key", k)) for k in p)
        if key in flat_src and flat_src[key].size == v.size:
            np.testing.assert_array_equal(
                np.asarray(v).ravel(), np.asarray(flat_src[key]).ravel())
            moved += 1
        else:
            kept += 1
    assert moved > 10, moved     # the shared trunk actually transferred
    assert kept > 0, kept        # and incompatible heads stayed fresh
