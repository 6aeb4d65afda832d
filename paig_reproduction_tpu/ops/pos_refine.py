"""Subpixel position refinement against the model's own renderer.

The encoder localizes objects to ~0.3-0.4 px (measured,
benchmarks/CONVERGENCE.md) and that noise — not the learned dynamics — is
the entire remaining prediction-error budget on tasks with known physics:
the initial-state fits (ops/state_fit.py) are exact given the
observations, so their output is only as good as the observations.

But the model carries a much sharper position sensor than the encoder
MLP: its own ST decoder. Given the learned templates/contents/background,
``||render(p) - frame||^2`` is a smooth function of the object positions
with a clear minimum at the true object location (the same objective the
autoencoder loss trains, reference physics_models.py:119-127, evaluated
per frame instead of averaged over training). Starting from the encoder's
estimate (within the ~2 px quadratic basin of a radius-2 object) a few
Gauss-Newton steps converge to the rendered-template alignment optimum —
in practice 3-10x below the encoder's noise floor.

TPU shape: the Jacobian of the render w.r.t. the (4-6)-dim position
vector is assembled from one forward-mode JVP per coordinate — each JVP
is the same fused matmul pipeline as the decode itself — and the GN solve
is a tiny batched (cu2 x cu2) linear system. Everything is jit-compatible
with static iteration count; gradients pass straight-through to the
initial positions (estimator semantics identical to
ops/state_fit.fit_initial_state).

No reference counterpart: the reference always starts its rollout from
the raw encoder output (physics_models.py:222-229).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def refine_positions(render_fn, frames: jnp.ndarray, pos0: jnp.ndarray,
                     iters: int = 3, damping: float = 1e-1,
                     max_step: float = 1.5) -> jnp.ndarray:
    """Gauss-Newton refinement of object positions against observed frames.

    render_fn: positions [N, cu2] -> frames [N, H, W, C] (batched,
    differentiable — the model's st_decode with fixed assets).
    frames: [N, H, W, C] observed frames; pos0: [N, cu2] initial positions
    (encoder output). Returns positions [N, cu2] with straight-through
    gradients to ``pos0``.

    Levenberg damping (relative, on diag(JtJ)) keeps steps sane where an
    object's rendered support barely overlaps the observed one; per-iter
    steps are clipped to ``max_step`` px so a pathological frame cannot
    throw a coordinate out of its basin.
    """
    y = jax.lax.stop_gradient(frames)
    p0 = jax.lax.stop_gradient(pos0)
    n, cu2 = p0.shape

    def gn_step(p, _):
        # Linearize once (one primal render), then one cheap tangent pass
        # per coordinate: J[:, k] = d render / d p_k. Forward mode
        # matches the problem shape (huge output, tiny input).
        out, lin = jax.linearize(render_fn, p)
        basis = jnp.eye(cu2, dtype=p.dtype)
        jvps = [lin(jnp.broadcast_to(basis[k], p.shape)).reshape(n, -1)
                for k in range(cu2)]
        j = jnp.stack(jvps, axis=-1)                  # [N, HWC, cu2]
        r = (out - y).reshape(n, -1)                  # [N, HWC]
        jtj = jnp.einsum("nik,nil->nkl", j, j)
        jtr = jnp.einsum("nik,ni->nk", j, r)
        diag = jnp.diagonal(jtj, axis1=1, axis2=2)
        lm = jtj + (damping * diag + 1e-8)[..., None] \
            * jnp.eye(cu2, dtype=p.dtype)
        dp = -jnp.linalg.solve(lm, jtr[..., None])[..., 0]
        dp = jnp.clip(dp, -max_step, max_step)
        return p + dp, None

    p, _ = jax.lax.scan(gn_step, p0, None, length=iters)
    # A coordinate whose refinement diverged (no rendered support at all
    # -> zero Jacobian -> damping holds it still, so this is rare) keeps
    # the encoder's estimate.
    p = jnp.where(jnp.isfinite(p), p, p0)
    return pos0 + jax.lax.stop_gradient(p - p0)
