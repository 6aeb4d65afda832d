"""Checkpoint save/restore via Orbax.

Capability superset of the reference's ``torch.save(state_dict())`` single
file (reference ``base.py:167-169``): optimizer state and the step counter
are saved too, so resume restores the LR schedule position — the reference
saves neither and its README warns the LR must be re-specified by hand
(reference README.md:37, SURVEY.md §5).

CLI semantics preserved: the checkpoint lives at ``save_dir/model.ckpt``
(a directory here), ``--ckpt_dir`` overrides the restore source, and
restoring into a model built with a different ``seq_len`` works because
parameters are sequence-length independent (the reference relies on the
same property for its test-mode rebuild, torch_run_physics.py:101-117).
"""
from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_NAME = "model.ckpt"


def save_checkpoint(save_dir: str, state_tree) -> str:
    path = os.path.abspath(os.path.join(save_dir, CKPT_NAME))
    ckptr = ocp.PyTreeCheckpointer()
    host_tree = jax.tree.map(np.asarray, state_tree)
    ckptr.save(path, host_tree, force=True)
    return path


def restore_checkpoint(restore_dir: str, target_tree):
    """Restore into the structure/dtypes of ``target_tree``."""
    path = os.path.abspath(os.path.join(restore_dir, CKPT_NAME))
    if not os.path.exists(path):
        raise FileNotFoundError(f"No checkpoint at {path}")
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)
    flat_r, treedef_r = jax.tree_util.tree_flatten(restored)
    flat_t, treedef_t = jax.tree_util.tree_flatten(target_tree)
    if treedef_r != treedef_t:
        # Orbax serializes tuples/namedtuples as dicts/lists; rebuild by
        # flattened order, which is stable for a fixed model config.
        if len(flat_r) != len(flat_t):
            raise ValueError(
                f"Checkpoint structure mismatch: {len(flat_r)} leaves vs "
                f"{len(flat_t)} expected")
    out = [jax.numpy.asarray(r, dtype=t.dtype).reshape(t.shape)
           for r, t in zip(flat_r, flat_t)]
    return jax.tree_util.tree_unflatten(treedef_t, out)
