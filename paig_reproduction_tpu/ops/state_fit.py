"""Dynamics-consistent initial-state estimation (Gauss-Newton).

[extension, flag-gated via --init_state_fit] The reference model (and
round-1 build) initializes the physics rollout from (a) the encoder's
position at the last input frame and (b) an MLP velocity estimate
(reference physics_models.py:220-225, blocks.py:31-49). Both are noisy:
with per-frame encoder noise sigma, the rollout starts with O(sigma)
position error and the MLP velocity carries ~2x the 4-point estimation
noise floor — and every px/frame of velocity error becomes t px of
position error t frames out, which the quadratic pixel loss squares.

This module replaces that initializer with the statistically right one: a
least-squares fit of the initial state (p0, v0) to ALL encoded positions
of the input window, under the model's own learned dynamics — a
differentiable Gauss-Newton (Levenberg-damped) solve, entirely in-graph.
It uses only input-window information plus the learned cell, so eval
semantics stay fair (nothing from the prediction window leaks in), and it
is fully unsupervised (targets are the model's own encodings). Gradients
flow through the solve into the physical parameters and the encoder.

For a linear cell (the 2-body spring in relative coordinates) this IS the
optimal linear smoother: position noise drops ~sqrt(s)x and velocity
reaches the s-point estimation floor instead of anchoring to a 2-frame
finite difference.

Gradient semantics: STRAIGHT-THROUGH. The forward pass returns the fitted
state; the backward pass routes cotangents as if the naive initializer
(last observed position + the MLP velocity) had been used. Differentiating
through the Gauss-Newton internals requires second derivatives of the
rollout, whose f32 magnitude is unbounded near coincident objects
(measured: encoder gradients overflow to NaN within a few hundred steps of
from-scratch training) — and the naive-path gradient is exactly the
well-behaved training signal the model family was validated with. The
physical parameters keep their gradient through the main rollout; only
the (pathological) path through the solver is cut.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def fit_initial_state(step_fn, cell_params, obs, vel_init, dt, substeps,
                      iters: int, damping: float = 1e-2,
                      accept_rms: float = 0.75):
    """Fit the state at the LAST observed frame by Gauss-Newton.

    step_fn:     cell step ``(params, pos[B,cu2], vel[B,cu2], dt, substeps)``
    obs:         [B, s, cu2] observed positions for frames 0..s-1
                 (physical coordinate frame, i.e. frame offsets applied).
    vel_init:    [B, cu2] velocity initializer (the MLP head's output).
    iters:       Gauss-Newton iterations (2-3 suffice; the spring problem
                 is near-linear).

    Returns (pos, vel) at frame s-1, the rollout's starting state.
    """
    b, s, cu2 = obs.shape
    if s < 2 or iters < 1:
        return obs[:, -1], vel_init

    def step1(p, v):
        p2, v2 = step_fn(cell_params, p[None], v[None], dt,
                         substeps=substeps)
        return p2[0], v2[0]

    def roll_positions(x):
        """x: [2*cu2] state at frame 0 -> stacked positions, frames
        0..s-1, flattened to [s*cu2]."""
        p, v = x[:cu2], x[cu2:]

        def body(carry, _):
            p, v = carry
            p, v = step1(p, v)
            return (p, v), p

        (_, _), ps = jax.lax.scan(body, (p, v), None, length=s - 1)
        return jnp.concatenate([p[None], ps], axis=0).reshape(-1)

    eye = jnp.eye(2 * cu2, dtype=obs.dtype)
    # f32 safety rails. Mid-training encoders routinely emit
    # near-coincident object positions, where the spring-force Jacobian
    # grows like (h*k*2*equil/norm)^(substeps*(s-1)) and overflows f32 —
    # the resulting inf/NaN in J^T J poisons the solve, the loss, and
    # (via the VJP) every encoder gradient. Clipping J and the residual
    # bounds the forward AND kills the backward path through exploded
    # entries (clip's cotangent is zero outside the linear region); the
    # step clamp keeps one bad GN iterate from teleporting the state.
    jac_lim, res_lim, step_lim = 1e4, 1e4, 16.0

    def fit_one(y, v0):
        """y: [s, cu2]; v0: [cu2]. Returns (pos, vel) at frame s-1 plus
        the final window residual SSE of the fitted trajectory."""
        target = y.reshape(-1)

        def resid(x):
            return jnp.clip(roll_positions(x) - target, -res_lim, res_lim)

        def gn_iter(x, _):
            r = jnp.nan_to_num(resid(x), posinf=res_lim, neginf=-res_lim)
            jac = jax.jacfwd(resid)(x)             # [s*cu2, 2*cu2]
            jac = jnp.nan_to_num(jnp.clip(jac, -jac_lim, jac_lim))
            a = jac.T @ jac + damping * eye
            dx = jnp.linalg.solve(a, jac.T @ r)
            dx = jnp.clip(jnp.nan_to_num(dx), -step_lim, step_lim)
            return x - dx, None

        x0 = jnp.concatenate([y[0], v0])
        x, _ = jax.lax.scan(gn_iter, x0, None, length=iters)
        res = jnp.sum(jnp.nan_to_num(resid(x)) ** 2)

        # advance the fitted frame-0 state to frame s-1
        def adv(carry, _):
            p, v = carry
            return step1(p, v), None

        (p, v), _ = jax.lax.scan(adv, (x[:cu2], x[cu2:]), None,
                                 length=s - 1)
        return p, v, res

    pos_f, vel_f, res_f = jax.vmap(fit_one)(
        jax.lax.stop_gradient(obs), jax.lax.stop_gradient(vel_init))
    naive_p, naive_v = obs[:, -1], vel_init
    # Per-sample acceptance: the fit must EXPLAIN the window. If the
    # fitted trajectory cannot track the observations (residual above a
    # ~accept_rms px/frame/coordinate noise floor), the model family is
    # wrong for this sample — e.g. a wall reflection inside the window,
    # where the bouncing cell's discontinuous Jacobian breaks the GN
    # linearization (measured: unguarded GN doubles the velocity error on
    # bouncing while halving it on spring) — so fall back to the naive
    # initializer. Also rejects non-finite solves.
    ok = (jnp.isfinite(pos_f).all(axis=-1)
          & jnp.isfinite(vel_f).all(axis=-1)
          & (res_f < (accept_rms ** 2) * (s * cu2)))[:, None]
    pos_f = jnp.where(ok, pos_f, jax.lax.stop_gradient(naive_p))
    vel_f = jnp.where(ok, vel_f, jax.lax.stop_gradient(naive_v))
    # Straight-through: forward = fitted, backward = naive (see module
    # docstring).
    pos_out = naive_p + jax.lax.stop_gradient(pos_f - naive_p)
    vel_out = naive_v + jax.lax.stop_gradient(vel_f - naive_v)
    return pos_out, vel_out
