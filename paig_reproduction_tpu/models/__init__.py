from paig_reproduction_tpu.models.physics_net import PhysicsNet  # noqa: F401
from paig_reproduction_tpu.models.registry import MODELS, get_model  # noqa: F401
