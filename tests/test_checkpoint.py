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
