"""Optax optimizers matching the reference's torch optimizer table
(reference ``nn/network/base.py:12-17``) and a *working* LR anneal.

The reference divides ``self.lr`` by 5 at 75% of training but never pushes
the new value into the optimizer's param groups, so annealing is a no-op
(reference ``base.py:135-137``, SURVEY.md §3.1). Here the anneal is an optax
piecewise-constant schedule, applied for real — and restored correctly on
resume because the step counter is checkpointed.

Hyperparameters mirror torch defaults: RMSprop(alpha=0.99, eps=1e-8),
Adam(betas=(0.9, 0.999), eps=1e-8), SGD(momentum=0.9) for "momentum".

``frozen`` parameters (the reference's ``requires_grad=False`` physics
parameters, e.g. gravity's log_m, cells.py:93) get their updates zeroed via
an optax mask.
"""
from __future__ import annotations

from typing import Callable, Iterable, Union

import jax
import optax

OPTIMIZERS = {
    "adam": lambda lr: optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8),
    "rmsprop": lambda lr: optax.rmsprop(lr, decay=0.99, eps=1e-8),
    "momentum": lambda lr: optax.sgd(lr, momentum=0.9),
    "sgd": lambda lr: optax.sgd(lr),
}

# Parameter names that are never trained (reference requires_grad=False).
FROZEN_PARAM_NAMES = ("log_m",)

# The learnable physical parameters (scalar, log-space). The reference
# hints at but never implements per-group learning rates ("Uncomment
# lines below to have different learning rates for physics and vision
# components", physics_models.py:145); physics_lr_mult realizes it.
PHYSICS_PARAM_NAMES = ("log_k", "log_equil", "log_g")


def lr_schedule(base_lr: float, epochs: int, steps_per_epoch: int,
                anneal_lr: bool) -> Union[float, Callable]:
    """/5 at int(0.75 * epochs) epochs (reference base.py:135-137,
    README.md:40 says 70% — code wins)."""
    # Always return a schedule (not a float) so the optimizer state tree
    # has the same structure with and without annealing — checkpoints
    # restore across train/test-mode phases.
    if not anneal_lr or epochs <= 0:
        return optax.constant_schedule(base_lr)
    boundary = int(0.75 * epochs) * steps_per_epoch
    if boundary <= 0:
        return optax.constant_schedule(base_lr)
    return optax.piecewise_constant_schedule(
        base_lr, {boundary: 1.0 / 5.0})


def build_optimizer(name: str, schedule, params,
                    physics_lr_mult: float = 1.0,
                    grad_clip: float = 0.0,
                    bg_lr_mult: float = 1.0
                    ) -> optax.GradientTransformation:
    if name not in OPTIMIZERS:
        raise KeyError(f"Unknown optimizer {name!r}; "
                       f"available: {sorted(OPTIMIZERS)}")
    tx = OPTIMIZERS[name](schedule)
    if grad_clip > 0.0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)

    def label(path, _):
        names = [str(getattr(p, "key", getattr(p, "name", "")))
                 for p in path]
        if any(n in FROZEN_PARAM_NAMES for n in names):
            return "frozen"
        if physics_lr_mult != 1.0 and \
                any(n in PHYSICS_PARAM_NAMES for n in names):
            return "physics"
        if bg_lr_mult != 1.0 and "var_net_background" in names:
            return "background"
        return "train"

    labels = jax.tree_util.tree_map_with_path(label, params)
    label_set = set(jax.tree_util.tree_leaves(labels))
    if label_set == {"train"}:
        return tx
    branches = {"train": tx}
    if "frozen" in label_set:
        branches["frozen"] = optax.set_to_zero()
    if "physics" in label_set:
        branches["physics"] = optax.chain(
            OPTIMIZERS[name](schedule),
            optax.scale(physics_lr_mult))
    if "background" in label_set:
        # [extension] --bg_lr_mult: slow the learned background during
        # discovery. The background otherwise absorbs the blurred average
        # of any not-yet-discovered object, which kills the residual
        # gradient a dead slot needs to find it (measured failure mode on
        # bouncing/3bp/mnist — see benchmarks/CONVERGENCE.md).
        branches["background"] = optax.chain(
            OPTIMIZERS[name](schedule),
            optax.scale(bg_lr_mult))
    return optax.multi_transform(branches, labels)
