"""Model registry — the explicit, testable equivalent of the reference's
reflection-based lookup (``classes_in_module``, reference misc.py:11-17,
used at torch_run_physics.py:46-47)."""
from __future__ import annotations

from paig_reproduction_tpu.models.physics_net import PhysicsNet

MODELS = {
    "PhysicsNet": PhysicsNet,
}


def get_model(name: str):
    if name not in MODELS:
        raise KeyError(
            f"Unknown model {name!r}; available: {sorted(MODELS)}")
    return MODELS[name]
