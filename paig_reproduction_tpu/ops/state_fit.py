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

from paig_reproduction_tpu.ops.cells import BALL_RADIUS, WALL_SIZE


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


def align_slot_identities(obs: jnp.ndarray) -> jnp.ndarray:
    """Permutation-consistent observation window for 2-object tasks.

    obs: [B, s, 4] encoded positions, object-major [x1, y1, x2, y2]. The
    encoder binds slots by appearance; at object crossings it can flicker
    the assignment for a frame (measured: 68/200 bouncing test sequences),
    which poisons any window fit. This aligns frames s-2..0 BACKWARD to
    frame s-1 (the rollout's identity frame, which stays untouched): each
    earlier frame keeps or swaps its two objects, whichever is closer to
    the already-aligned successor frame. Exact for 2 objects.
    """
    b, s, cu2 = obs.shape
    if cu2 != 4 or s < 2:
        return obs
    p = obs.reshape(b, s, 2, 2)

    def body(ref, pt):
        sw = pt[:, ::-1]
        cost_id = jnp.sum((pt - ref) ** 2, axis=(1, 2))
        cost_sw = jnp.sum((sw - ref) ** 2, axis=(1, 2))
        # Swap only on a clear margin: a real flicker leaves the swapped
        # config far off (objects are distinguishable), while for nearly
        # coincident objects either assignment fits equally — prefer the
        # encoder's own (identity), where any residual error is bounded
        # by the objects' separation anyway.
        chosen = jnp.where((cost_sw < 0.5 * cost_id)[:, None, None],
                           sw, pt)
        return chosen, chosen

    # frames s-2, s-3, ..., 0 (time-major for scan)
    earlier = jnp.moveaxis(p[:, :-1][:, ::-1], 1, 0)
    _, aligned_rev = jax.lax.scan(body, p[:, -1], earlier)
    aligned = jnp.concatenate(
        [jnp.moveaxis(aligned_rev, 0, 1)[:, ::-1], p[:, -1:]], axis=1)
    return aligned.reshape(b, s, cu2)


def fit_initial_state_bouncing(obs, vel_init, dt,
                               accept_rms: float = 0.75,
                               wall_lo: float = BALL_RADIUS,
                               wall_hi: float = WALL_SIZE - BALL_RADIUS):
    """Reflection-aware initial-state fit for the bouncing cell.

    The Gauss-Newton fit above assumes a smooth cell; the bouncing cell's
    reflections (reference cells.py:73-77) make its window Jacobian
    piecewise and break the linearization (measured in round 2: GN
    *doubles* the velocity error on bouncing). But free flight between
    elastic walls is exactly linear in UNFOLDED coordinates: reflecting
    the pre-bounce observations across the wall (u = 2w - p) recovers a
    straight line u_t = u_0 + v * t * dt, per coordinate, no matter where
    inside a frame interval the bounce lands. Window geometry bounds the
    bounce count: at vmax*dt ~ 2.4 px/frame the window spans < 8 px, so at
    most ONE bounce per coordinate occurs in the input window — enumerate
    all 1 + 2*(s-1) fold hypotheses (none, or one bounce at either wall
    before frame j), solve each by closed-form least squares, and keep the
    best-residual hypothesis. Slot-swapped frames are first re-aligned by
    align_slot_identities.

    obs: [B, s, cu2] positions in the physical frame; vel_init: [B, cu2]
    the MLP velocity head (naive fallback). Returns (pos, vel) at frame
    s-1. Per-COORDINATE acceptance: a coordinate whose best hypothesis
    still cannot explain the window (rms above accept_rms px) falls back
    to the naive initializer. Gradients: straight-through to the naive
    path, matching fit_initial_state.
    """
    b, s, cu2 = obs.shape
    if s < 2:
        return obs[:, -1], vel_init

    y_full = align_slot_identities(jax.lax.stop_gradient(obs))
    y = jnp.moveaxis(y_full, 1, 2)                      # [B, cu2, s]

    # Hypotheses: reflect frames t < j across wall w; j in 1..s-1, plus
    # the no-bounce hypothesis. Frame s-1 is always in the identity
    # segment, so the fitted line evaluated at t = s-1 IS the physical
    # state (position in [lo, hi], velocity with its true sign).
    js = jnp.arange(1, s)
    t_idx = jnp.arange(s)
    refl = t_idx[None, :] < js[:, None]                 # [s-1, s]
    masks = jnp.concatenate(
        [jnp.zeros((1, s), bool), refl, refl], axis=0)  # [H, s]
    walls = jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((s - 1,), wall_lo),
         jnp.full((s - 1,), wall_hi)], axis=0)          # [H]

    u = jnp.where(masks[:, None, None, :],
                  2.0 * walls[:, None, None, None] - y[None],
                  y[None])                              # [H, B, cu2, s]

    ts = t_idx.astype(obs.dtype) * dt                   # [s]
    sx, sxx = jnp.sum(ts), jnp.sum(ts * ts)
    su = jnp.sum(u, axis=-1)
    sxu = jnp.sum(u * ts, axis=-1)
    denom = s * sxx - sx * sx
    slope = (s * sxu - sx * su) / denom                 # [H, B, cu2]
    icept = (su - slope * sx) / s
    res = jnp.sum(
        (icept[..., None] + slope[..., None] * ts - u) ** 2, axis=-1)

    # Physical consistency: a bounce-before-frame-j hypothesis is only
    # admissible if the fitted unfolded line actually crosses its wall
    # inside the (j-1, j) frame interval — otherwise the "bounce" is a
    # noise artifact. (The crossing time solves a + b*t = w.)
    t_cross = (walls[:, None, None] - icept) / jnp.where(
        slope == 0.0, 1e-9, slope)
    j_all = jnp.concatenate([jnp.ones((1,), js.dtype), js, js])  # [H]
    t_lo = (j_all - 1).astype(obs.dtype)[:, None, None] * dt
    t_hi = j_all.astype(obs.dtype)[:, None, None] * dt
    consistent = (t_cross >= t_lo) & (t_cross <= t_hi)
    consistent = consistent.at[0].set(True)             # no-bounce: always
    res = jnp.where(consistent, res, jnp.inf)

    # Model selection favors the simpler hypothesis: take a bounce only
    # when it explains the window clearly better than free flight (a true
    # bounce leaves a kink free flight cannot fit; a spurious one wins by
    # noise-level margins and flips the velocity sign).
    res_none = res[0]
    res_bounce = jnp.min(res[1:], axis=0)
    use_bounce = res_bounce < 0.5 * res_none
    h_bounce = 1 + jnp.argmin(res[1:], axis=0)
    h_best = jnp.where(use_bounce, h_bounce,
                       jnp.zeros_like(h_bounce))        # [B, cu2]
    take = lambda a: jnp.take_along_axis(a, h_best[None], axis=0)[0]
    res_b, slope_b, icept_b = take(res), take(slope), take(icept)

    pos_f = icept_b + slope_b * (s - 1) * dt
    vel_f = slope_b
    # Wall clamp, NOT a fold: when the fitted last-frame position lands
    # marginally past a wall it is noise on a ball sitting AT the wall (a
    # genuine bounce inside the window is what the bounce hypotheses are
    # for, and one after the last frame hasn't happened yet) — folding
    # would flip the velocity sign of a correct fit. Measured: the
    # fold-on-violation variant put ~5% of near-wall coordinates at
    # exactly-wrong velocity.
    pos_f = jnp.clip(pos_f, wall_lo, wall_hi)

    naive_p, naive_v = obs[:, -1], vel_init
    ok = (jnp.isfinite(pos_f) & jnp.isfinite(vel_f)
          & (res_b < (accept_rms ** 2) * s))
    pos_f = jnp.where(ok, pos_f, jax.lax.stop_gradient(naive_p))
    vel_f = jnp.where(ok, vel_f, jax.lax.stop_gradient(naive_v))
    pos_out = naive_p + jax.lax.stop_gradient(pos_f - naive_p)
    vel_out = naive_v + jax.lax.stop_gradient(vel_f - naive_v)
    return pos_out, vel_out
