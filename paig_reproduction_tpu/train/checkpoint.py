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


def _path_str(path) -> str:
    """Stringify a pytree key path, normalizing across container kinds:
    dicts (DictKey.key), sequences (SequenceKey.idx) and namedtuple fields
    (GetAttrKey.name). Orbax restores namedtuples/tuples as dicts, so the
    target's ``GetAttrKey('nu')`` must compare equal to the restored
    ``DictKey('nu')`` — without the ``name`` case, every optimizer-moment
    leaf silently failed to match and opt state reset on resume."""
    parts = []
    for p in path:
        for attr in ("key", "name", "idx"):
            if hasattr(p, attr):
                parts.append(str(getattr(p, attr)))
                break
        else:
            parts.append(str(p))
    return "/".join(parts)


def peek_checkpoint_leaf(restore_dir: str, key: str):
    """Raw value of one top-level checkpoint leaf, or None when the
    checkpoint or the leaf is absent. Used for variable-length state
    (e.g. the auto-rescue recons history) that cannot go through
    ``restore_checkpoint``'s exact-shape target matching."""
    path = os.path.abspath(os.path.join(restore_dir, CKPT_NAME))
    if not os.path.exists(path):
        return None
    restored = ocp.PyTreeCheckpointer().restore(path)
    if isinstance(restored, dict):
        return restored.get(key)
    return None


def restore_checkpoint(restore_dir: str, target_tree):
    """Restore into the structure/dtypes of ``target_tree``.

    Name-aware partial restore: leaves are matched by pytree path (orbax
    serializes tuples as lists, so paths are compared on key names where
    available and position otherwise). Leaves present in the target but
    absent from the checkpoint keep their (freshly initialized) values —
    so a model extended with new optional parameters (e.g.
    --learn_frame_offset) can resume an older run. Extra checkpoint
    leaves are ignored with the same warning.
    """
    path = os.path.abspath(os.path.join(restore_dir, CKPT_NAME))
    if not os.path.exists(path):
        raise FileNotFoundError(f"No checkpoint at {path}")
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)

    flat_r = {_path_str(p): v for p, v in
              jax.tree_util.tree_flatten_with_path(restored)[0]}
    flat_t, treedef_t = jax.tree_util.tree_flatten_with_path(target_tree)

    out = []
    missing = []
    shape_skipped = []
    for p, t in flat_t:
        key = _path_str(p)
        src = flat_r.get(key)
        # Exact-shape match only (modulo scalar/0-d normalization): a
        # same-size but differently-shaped leaf would silently restore
        # into a semantically wrong layout if reshaped, so it is skipped
        # like any other mismatch.
        if src is not None and (np.shape(src) == np.shape(t)
                                or np.size(src) == np.size(t) == 1):
            out.append(jax.numpy.asarray(
                src, dtype=t.dtype).reshape(np.shape(t)))
        else:
            # absent OR shape-incompatible (e.g. cross-task warm start:
            # a 3-object 36px model restoring a 2-object 32px checkpoint
            # keeps its fresh heads and takes every matching trunk leaf)
            (shape_skipped if src is not None else missing).append(key)
            out.append(t)
    if missing:
        import logging
        logging.getLogger("paig").info(
            "checkpoint restore: %d target leaves not in checkpoint, "
            "keeping initialized values: %s", len(missing), missing[:5])
    if shape_skipped:
        import logging
        logging.getLogger("paig").info(
            "checkpoint restore: %d leaves shape-incompatible, keeping "
            "initialized values: %s", len(shape_skipped), shape_skipped[:5])
    extra = set(flat_r) - {_path_str(p) for p, _ in flat_t}
    if extra:
        import logging
        logging.getLogger("paig").info(
            "checkpoint restore: ignoring %d extra leaves: %s",
            len(extra), sorted(extra)[:5])
    leaves_only = jax.tree_util.tree_structure(target_tree)
    return jax.tree_util.tree_unflatten(leaves_only, out)
