"""Differentiable-physics ODE cells as pure JAX functions.

Capability parity with the reference's ``nn/network/cells.py`` (reference
``cells.py:6-107``): per-task Euler integrators with ``SUBSTEPS`` = 5
sub-steps per frame at ``dt/5``, with learnable physical parameters stored in
log-space.

State layout: ``pos``/``vel`` are ``[batch, n_objs * 2]`` float arrays,
object-major ``[x1, y1, x2, y2, ...]`` — matching how the reference's encoder
concatenates per-object coordinate heads (reference ``blocks.py:101``).

Intended-semantics divergences from the reference (deliberate, documented):

* The reference's torch ``spring_ode_cell.forward`` / ``bouncing_ode_cell
  .forward`` split the state with width-1 chunks (``torch.split(poss, 1,
  dim=1)``, reference ``cells.py:32-33,61-62``), which treats object 1's x
  and y coordinates as two independent 1-D "objects" and never integrates
  object 2 at all — a mistranslation of the original PAIG TF code (which
  splits per object). Here the cells integrate every object's 2-D state, the
  physics the dataset generators actually simulate (reference
  ``generators.py:322-329``). Tests validate against the generator physics.
* ``gravity_step`` recomputes ``A = exp(g) * exp(2m)`` from the current
  parameters on every call, instead of freezing a stale tensor at module
  construction (reference ``cells.py:94`` computes ``self.A`` once in
  ``__init__``), so gradients reach ``log_g``.

Everything else — the 1e-4 norm epsilon, the gravity norm clamps
[1e-1, 1e5] / [1, 170], wall positions at 0/32 with radius 2, dt values —
matches the reference exactly.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

SUBSTEPS = 5  # Euler substeps per frame (reference cells.py:35,64,97)

# PER-SAMPLE norm ceiling for cotangents flowing backward through one
# rollout frame (see clip_cotangent). Generous: legitimate pixel/position-
# loss cotangents are O(10) per sample. Env-overridable ("inf" disables)
# for ablating the BPTT stabilizers' effect on object discovery.
#
# Per-sample, NOT global-norm: the explosion this guards against is
# per-sequence (near-coincident encoded objects in THAT sequence blow up
# the spring Jacobian), and a global clip would rescale EVERY sample's
# gradient by the worst sample's factor. Measured (round-3 bisect,
# runs/bisect_plain vs runs/probe_psclip): on the plain spring recipe the
# 1e3 clip never binds in either form — the two runs are bit-identical
# through 100 epochs — so this is a shape-of-the-failure-mode choice, not
# a tuning. The plain-recipe discovery stall traced to the FORWARD
# stabilizers instead (runs/probe_nostab descends where the clamped run
# is flat; see SPRING_FORCE_CLAMP below).
COTANGENT_LIMIT = float(os.environ.get("PAIG_COTANGENT_LIMIT", "1e3"))
# Spring-force clamp bound and sqrt epsilon (see spring_step), same
# ablation knobs. These change FORWARD numerics (the clamp also zeroes
# the Jacobian where it saturates): in the round-3 bisect the plain
# spring recipe with them active sat flat at recons ~17 for 200 epochs
# (runs/bisect_plain) while the same run with them disabled reached
# 12.9 by epoch 100 — but the 500-epoch extension (runs/probe_nostab500)
# plateaued at 11.2 with no discovery either, so the stabilizers are
# NOT the discovery blocker and stay on by default; single-command
# discovery is solved by the trainer machinery instead
# (--discovery_restarts + --auto_rescue + staged triggers).
SPRING_FORCE_CLAMP = float(os.environ.get("PAIG_SPRING_FORCE_CLAMP",
                                          "1e3"))
SPRING_SQRT_EPS = float(os.environ.get("PAIG_SPRING_SQRT_EPS", "1e-8"))


def clip_cotangent(x, limit: float = None):
    """Identity in the forward pass; clips each SAMPLE's cotangent norm
    (rows of the leading/batch axis) in the backward pass.

    Backward through the rollout multiplies per-substep Jacobians whose
    norm is unbounded near object collisions (the spring direction term
    scales like 1/(|p0-p1| + 1e-4), reference cells.py:37) — sustained
    near-coincident objects (typical early in training) overflow the
    cotangents to inf/NaN even though the forward stays finite (measured:
    the round-2 pre-stabilizer code NaNs by epoch 25 on the seeded plain
    spring run). Applying this between rollout frames is BPTT gradient
    clipping; per-sample so one exploding sequence can never rescale the
    rest of the batch's gradient (see COTANGENT_LIMIT note). It changes
    no forward numerics and is inactive for healthy gradients.
    """
    if limit is None:
        limit = COTANGENT_LIMIT
    if not np.isfinite(limit):
        return x

    @jax.custom_vjp
    def f(y):
        return y

    def fwd(y):
        return y, None

    def bwd(_, g):
        axes = tuple(range(1, g.ndim))
        nrm = jnp.sqrt(jnp.sum(g * g, axis=axes, keepdims=True))
        scale = jnp.minimum(1.0, limit / (nrm + 1e-30))
        return (g * scale,)

    f.defvjp(fwd, bwd)
    return f(x)

# Default integration step per frame for each cell (reference
# cells.py:27,58,91).
SPRING_DT = 0.3
BOUNCING_DT = 0.3
GRAVITY_DT = 0.5

# Bouncing-cell wall geometry (reference cells.py:73-77): image boundaries
# hard-coded at [0, 32] with an object radius of 2 px.
WALL_SIZE = 32.0
BALL_RADIUS = 2.0


class CellParams(NamedTuple):
    """Learnable physics parameters, all stored in log-space.

    Only the fields a given cell uses are meaningful; unused fields ride
    along as zeros so a single pytree shape serves every task (keeps the
    train step's pytree structure static across tasks).
    """

    log_k: jnp.ndarray      # spring constant      (spring cell)
    log_equil: jnp.ndarray  # equilibrium length   (spring cell)
    log_g: jnp.ndarray      # gravitational const  (gravity cell)
    log_m: jnp.ndarray      # mass (frozen)        (gravity cell)

    @classmethod
    def initial(cls) -> "CellParams":
        # Reference inits: log(1.0) = 0 for every parameter
        # (cells.py:28-29,92-93).
        z = jnp.zeros(())
        return cls(log_k=z, log_equil=z, log_g=z, log_m=z)


def _split_objects(state: jnp.ndarray, n_objs: int) -> jnp.ndarray:
    """[B, n_objs*2] -> [B, n_objs, 2]."""
    return state.reshape(state.shape[0], n_objs, 2)


def _merge_objects(state: jnp.ndarray) -> jnp.ndarray:
    """[B, n_objs, 2] -> [B, n_objs*2]."""
    return state.reshape(state.shape[0], -1)


def spring_step(params: CellParams, pos: jnp.ndarray, vel: jnp.ndarray,
                dt: float = SPRING_DT, substeps: int = SUBSTEPS):
    """One frame of 2-object Hooke's-law dynamics (reference cells.py:22-51).

    F = exp(k) * (|p0 - p1| - 2*exp(equil)) * (p0 - p1)/(|p0 - p1| + 1e-4),
    applied with opposite signs to the two objects, SUBSTEPS Euler substeps.
    """
    k = jnp.exp(params.log_k)
    two_equil = 2.0 * jnp.exp(params.log_equil)
    h = dt / substeps

    def body(_, carry):
        p, v = carry                      # [B, 2, 2] each
        diff = p[:, 0] - p[:, 1]          # [B, 2]
        # +1e-8 inside the sqrt: grad(sqrt) is infinite at 0 and the two
        # objects encode to near-identical positions at init; the
        # reference's sqrt(abs(.)) (cells.py:36) never sees a gradient
        # because its training path is broken (SURVEY.md §3.1).
        norm = jnp.sqrt(jnp.sum(diff * diff, axis=-1, keepdims=True)
                        + SPRING_SQRT_EPS)
        direction = diff / (norm + 1e-4)
        force = k * (norm - two_equil) * direction   # [B, 2]
        # Force clamp, analogous to the reference gravity cell's norm
        # clamps (cells.py:99-100): the force Jacobian scales like
        # 1/(norm + 1e-4), and backward through 5 substeps x T frames
        # multiplies those factors — sustained near-coincident objects
        # (typical at init) overflow the cotangents to inf/NaN. True
        # forces in the task family are O(1e2); the clamp is inactive on
        # physical trajectories and zeroes the Jacobian on explosive
        # ones.
        if np.isfinite(SPRING_FORCE_CLAMP):
            force = jnp.clip(force, -SPRING_FORCE_CLAMP,
                             SPRING_FORCE_CLAMP)
        v = v + h * jnp.stack([-force, force], axis=1)
        p = p + h * v
        return p, v

    p, v = jax.lax.fori_loop(
        0, substeps, body, (_split_objects(pos, 2), _split_objects(vel, 2)),
        unroll=True)
    return _merge_objects(p), _merge_objects(v)


def bouncing_step(params: CellParams, pos: jnp.ndarray, vel: jnp.ndarray,
                  dt: float = BOUNCING_DT, substeps: int = SUBSTEPS):
    """One frame of free flight with elastic wall bounces
    (reference cells.py:53-83). No learnable parameters.

    Walls at 0 and WALL_SIZE with radius BALL_RADIUS; position is reflected
    about the wall and velocity negated, per coordinate.
    """
    del params
    h = dt / substeps
    hi = WALL_SIZE - BALL_RADIUS
    lo = BALL_RADIUS

    def body(_, carry):
        p, v = carry                      # [B, n*2] flat; bounce is per-coord
        p = p + h * v
        hit_hi = p > hi
        hit_lo = p < lo
        v = jnp.where(hit_hi | hit_lo, -v, v)
        p = jnp.where(hit_hi, 2.0 * hi - p, p)
        p = jnp.where(hit_lo, 2.0 * lo - p, p)
        return p, v

    return jax.lax.fori_loop(0, substeps, body, (pos, vel), unroll=True)


def gravity_step(params: CellParams, pos: jnp.ndarray, vel: jnp.ndarray,
                 dt: float = GRAVITY_DT, substeps: int = SUBSTEPS):
    """One frame of 3-body inverse-square dynamics
    (reference cells.py:86-106).

    A = exp(g) * exp(2m) is recomputed from the live parameters every call
    (intended semantics; see module docstring). Norm clamps match the
    reference: sum-of-squares clamped to [1e-1, 1e5] before sqrt, the norm
    clamped to [1, 170] before cubing.
    """
    A = jnp.exp(params.log_g) * jnp.exp(2.0 * params.log_m)
    h = dt / substeps

    def pair_force(pa, pb):
        vec = pa - pb                                       # [B, 2]
        sq = jnp.clip(jnp.sum(vec * vec, axis=-1, keepdims=True), 1e-1, 1e5)
        norm = jnp.clip(jnp.sqrt(sq), 1.0, 170.0)
        return vec / (norm ** 3)

    def body(_, carry):
        p, v = carry                      # [B, 3, 2]
        f01 = pair_force(p[:, 0], p[:, 1])
        f12 = pair_force(p[:, 1], p[:, 2])
        f20 = pair_force(p[:, 2], p[:, 0])
        force = jnp.stack([f01 - f20, f12 - f01, f20 - f12], axis=1)
        v = v - h * A * force
        p = p + h * v
        return p, v

    p, v = jax.lax.fori_loop(
        0, substeps, body, (_split_objects(pos, 3), _split_objects(vel, 3)),
        unroll=True)
    return _merge_objects(p), _merge_objects(v)


# Registry mirroring the reference's CELLS dict (physics_models.py:22-27).
# "lstm" is handled at the model level (models/physics_net.py) because it
# carries its own neural parameters.
CELLS = {
    "spring_ode_cell": (spring_step, SPRING_DT),
    "bouncing_ode_cell": (bouncing_step, BOUNCING_DT),
    "gravity_ode_cell": (gravity_step, GRAVITY_DT),
}


def numpy_generator_spring(poss, vels, k, equil, dt, ode_steps):
    """Ground-truth spring physics as simulated by the dataset generator
    (reference generators.py:322-329). numpy, used by tests + generators."""
    poss = np.array(poss, dtype=np.float64)
    vels = np.array(vels, dtype=np.float64)
    for _ in range(ode_steps):
        norm = np.linalg.norm(poss[0] - poss[1])
        direction = (poss[0] - poss[1]) / norm
        F = k * (norm - 2 * equil) * direction
        vels[0] = vels[0] - dt / ode_steps * F
        vels[1] = vels[1] + dt / ode_steps * F
        poss = poss + dt / ode_steps * vels
    return poss, vels


def numpy_generator_gravity(poss, vels, g, m, dt, ode_steps):
    """Ground-truth 3-body physics as simulated by the dataset generator
    (reference generators.py:602-618). numpy, used by tests + generators."""
    poss = np.array(poss, dtype=np.float64)
    vels = np.array(vels, dtype=np.float64)
    for _ in range(ode_steps):
        n01 = np.linalg.norm(poss[0] - poss[1])
        n12 = np.linalg.norm(poss[1] - poss[2])
        n20 = np.linalg.norm(poss[2] - poss[0])
        v01 = poss[0] - poss[1]
        v12 = poss[1] - poss[2]
        v20 = poss[2] - poss[0]
        F = np.array([v01 / n01 ** 3 - v20 / n20 ** 3,
                      v12 / n12 ** 3 - v01 / n01 ** 3,
                      v20 / n20 ** 3 - v12 / n12 ** 3])
        F = -g * m * m * F
        vels = vels + dt / ode_steps * F
        poss = poss + dt / ode_steps * vels
    return poss, vels
