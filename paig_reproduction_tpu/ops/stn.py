"""Spatial-transformer ops: affine grid + bilinear sampling.

Two implementations of the same math:

1. ``affine_grid`` / ``grid_sample`` — exact functional parity with
   ``torch.nn.functional.affine_grid`` / ``grid_sample`` at their default
   settings (``align_corners=False``, bilinear, zero padding), which is what
   the reference's ``stn()`` uses (reference ``nn/network/stn.py:5-16``).
   Golden-tested against torch CPU. Gather-based; used as the correctness
   oracle and for arbitrary thetas.

2. ``separable_warp`` — the TPU-native fast path. The PAIG decoder's theta is
   always axis-aligned (diagonal scale + translation, no rotation/shear;
   reference ``physics_models.py:175-181``), so the bilinear warp factorizes
   into two sparse interpolation matrices applied on either side of the
   template: ``out = Wy @ T @ Wx^T``. That turns a gather into batched
   matmuls that run on the MXU and fuse with the surrounding softmax
   composite. Tested equal to ``grid_sample`` to float32 tolerance.
"""
from __future__ import annotations

import jax.numpy as jnp


def _base_coords(n: int, dtype) -> jnp.ndarray:
    """Normalized output-pixel centers, align_corners=False convention:
    x_i = (2i + 1)/n - 1."""
    i = jnp.arange(n, dtype=dtype)
    return (2.0 * i + 1.0) / n - 1.0


def affine_grid(theta: jnp.ndarray, size) -> jnp.ndarray:
    """Equivalent of ``F.affine_grid(theta, size, align_corners=False)``.

    theta: [N, 2, 3]; size: (N, C, H, W). Returns grid [N, H, W, 2] whose
    last dim is (x, y) in normalized [-1, 1] input coordinates.
    """
    n, _, h, w = size
    dtype = theta.dtype
    xs = _base_coords(w, dtype)                      # [W]
    ys = _base_coords(h, dtype)                      # [H]
    gx = (theta[:, 0, 0, None, None] * xs[None, None, :]
          + theta[:, 0, 1, None, None] * ys[None, :, None]
          + theta[:, 0, 2, None, None])              # [N, H, W]
    gy = (theta[:, 1, 0, None, None] * xs[None, None, :]
          + theta[:, 1, 1, None, None] * ys[None, :, None]
          + theta[:, 1, 2, None, None])
    return jnp.stack([gx, gy], axis=-1)


def grid_sample(inp: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Equivalent of ``F.grid_sample(inp, grid)`` with torch defaults:
    bilinear, padding_mode='zeros', align_corners=False.

    inp: [N, C, Hi, Wi]; grid: [N, Ho, Wo, 2] (x, y normalized).
    Returns [N, C, Ho, Wo].
    """
    n, c, hi, wi = inp.shape
    # Unnormalize (align_corners=False): ix = ((x + 1) * Wi - 1) / 2
    ix = ((grid[..., 0] + 1.0) * wi - 1.0) / 2.0     # [N, Ho, Wo]
    iy = ((grid[..., 1] + 1.0) * hi - 1.0) / 2.0

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    wx1 = ix - ix0          # weight for ix1
    wy1 = iy - iy0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(iy_, ix_):
        valid = ((ix_ >= 0) & (ix_ <= wi - 1)
                 & (iy_ >= 0) & (iy_ <= hi - 1))     # [N, Ho, Wo]
        ixc = jnp.clip(ix_, 0, wi - 1).astype(jnp.int32)
        iyc = jnp.clip(iy_, 0, hi - 1).astype(jnp.int32)
        flat = inp.reshape(n, c, hi * wi)
        idx = (iyc * wi + ixc).reshape(n, 1, -1)     # [N, 1, Ho*Wo]
        vals = jnp.take_along_axis(
            flat, jnp.broadcast_to(idx, (n, c, idx.shape[-1])), axis=2)
        vals = vals.reshape(n, c, *ix_.shape[1:])
        return vals * valid[:, None].astype(inp.dtype)

    out = (gather(iy0, ix0) * (wy0 * wx0)[:, None]
           + gather(iy0, ix1) * (wy0 * wx1)[:, None]
           + gather(iy1, ix0) * (wy1 * wx0)[:, None]
           + gather(iy1, ix1) * (wy1 * wx1)[:, None])
    return out


def stn(inp: jnp.ndarray, theta: jnp.ndarray, out_size) -> jnp.ndarray:
    """Drop-in equivalent of the reference ``stn()`` (stn.py:5-16):
    theta is [N, 6] (or [N, 2, 3]); out_size is (H, W)."""
    n, c = inp.shape[:2]
    theta = theta.reshape(-1, 2, 3)
    grid = affine_grid(theta, (n, c, out_size[0], out_size[1]))
    return grid_sample(inp, grid)


def batch_transformer(inp: jnp.ndarray, thetas: jnp.ndarray, out_size):
    """Apply ``num_transforms`` thetas to each input (API parity with the
    reference's ``batch_transformer``, stn.py:18-23 — dead code there)."""
    num_batch, num_transforms = thetas.shape[:2]
    rep = jnp.repeat(inp[:, None], num_transforms, axis=1)
    rep = rep.reshape(-1, *inp.shape[1:])
    return stn(rep, thetas.reshape(num_batch * num_transforms, -1),
               out_size)


def _interp_matrix(src_coords: jnp.ndarray, n_in: int) -> jnp.ndarray:
    """Bilinear interpolation matrix with zero padding.

    src_coords: [..., n_out] fractional source pixel indices.
    Returns W: [..., n_out, n_in] with W @ signal == linear interp of the
    signal at src_coords (zero outside [0, n_in-1]).

    Built densely (each row has <= 2 nonzeros) — n_in/n_out are tmpl/image
    sizes (16..64), so these are tiny and the resulting contraction maps
    onto the MXU instead of scatter/gather units.
    """
    i = jnp.arange(n_in, dtype=src_coords.dtype)          # [n_in]
    d = src_coords[..., None] - i                          # [..., n_out, n_in]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    # Zero-padding: contributions from taps outside the support vanish
    # automatically because |d| >= 1 there; coords far outside produce
    # all-zero rows, matching grid_sample's zero padding.
    return w


def separable_warp(templates: jnp.ndarray, sx, tx, sy, ty, out_hw):
    """Axis-aligned bilinear warp as two MXU matmuls.

    Samples ``templates`` [..., Hi, Wi] at output pixel (h, w) whose
    normalized coords are (x_w * sx + tx, y_h * sy + ty) — exactly
    ``grid_sample(affine_grid(diag(sx, sy) + (tx, ty)))`` with torch
    align_corners=False semantics.

    templates: [N, C, Hi, Wi]; sx/tx/sy/ty: [N]; out_hw: (Ho, Wo).
    Returns [N, C, Ho, Wo].
    """
    n, c, hi, wi = templates.shape
    ho, wo = out_hw
    dtype = templates.dtype

    xs = _base_coords(wo, dtype)                           # [Wo]
    ys = _base_coords(ho, dtype)                           # [Ho]
    gx = sx[:, None] * xs[None, :] + tx[:, None]           # [N, Wo]
    gy = sy[:, None] * ys[None, :] + ty[:, None]           # [N, Ho]
    ix = ((gx + 1.0) * wi - 1.0) / 2.0                     # frac src col
    iy = ((gy + 1.0) * hi - 1.0) / 2.0                     # frac src row

    wx = _interp_matrix(ix, wi)                            # [N, Wo, Wi]
    wy = _interp_matrix(iy, hi)                            # [N, Ho, Hi]

    # out[n,c,h,w] = sum_{i,j} Wy[n,h,i] T[n,c,i,j] Wx[n,w,j]
    # precision='highest': JAX's default matmul precision truncates to
    # bf16 on the MXU; these interpolation matmuls are tiny (<=64x64x64),
    # so full f32 costs nothing and keeps exact parity with grid_sample.
    tmp = jnp.einsum("nhi,ncij->nchj", wy, templates,
                     precision="highest", preferred_element_type=dtype)
    return jnp.einsum("nchj,nwj->nchw", tmp, wx,
                      precision="highest", preferred_element_type=dtype)
