"""paig_reproduction_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the Luka140/paig_reproduction PyTorch repo.

Reproduces *Physics-as-Inverse-Graphics: Unsupervised Physical Parameter
Estimation from Video* (arXiv:1905.11169) as a fully jitted, shardable JAX
pipeline: conv encoder -> velocity estimator -> differentiable-physics ODE
rollout (``jax.lax.scan``) -> spatial-transformer decoder, trained end-to-end
from raw video.

Layout (mirrors the reference's layer map, SURVEY.md §1, but TPU-first):
  ops/        pure-functional numerics: ODE cells, STN/grid_sample, resize,
              Pallas kernels
  models/     flax.linen modules: UNets, encoders, PhysicsNet, losses
  data/       npz dataset iterators + offline dataset generators
  train/      trainer loop, optax optimizers, orbax checkpointing, artifacts
  parallel/   device mesh + sharding rules (dp/tp), multi-chip train step
  utils/      logging/metrics/viz helpers
"""

__version__ = "0.1.0"
