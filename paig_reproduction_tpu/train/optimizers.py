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


def build_optimizer(name: str, schedule, params) -> optax.GradientTransformation:
    if name not in OPTIMIZERS:
        raise KeyError(f"Unknown optimizer {name!r}; "
                       f"available: {sorted(OPTIMIZERS)}")
    tx = OPTIMIZERS[name](schedule)

    def label(path, _):
        names = [str(getattr(p, "key", getattr(p, "name", "")))
                 for p in path]
        return "frozen" if any(n in FROZEN_PARAM_NAMES for n in names) \
            else "train"

    labels = jax.tree_util.tree_map_with_path(label, params)
    if all(v == "train" for v in jax.tree_util.tree_leaves(labels)):
        return tx
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels)
