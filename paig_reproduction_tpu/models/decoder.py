"""Spatial-transformer decoder: place learned templates at 2D positions and
softmax-composite them over a learned background.

Functional re-design of the reference's ``PhysicsNet.conv_st_decoder``
(reference ``physics_models.py:151-199``):

* The template/contents/background networks are evaluated ONCE per forward
  pass (``DecoderAssets``) instead of once per rollout step — the reference
  recomputes them inside every decoder call (``physics_models.py:163-187``).
* The per-object affine warp (translation + fixed scale sigma, no rotation;
  ``physics_models.py:175-181``) is axis-aligned, so it is computed as two
  bilinear interpolation matmuls on the MXU (``ops/stn.separable_warp``
  math) instead of a grid_sample gather. Equality with the reference warp
  is covered by tests/test_stn.py + tests/test_decoder.py.
* The template is warped as a single channel and the mask softmax is taken
  once per pixel instead of per RGB channel; the reference tiles the
  template to 3 channels (``physics_models.py:165``) and softmaxes each
  channel identically, which is the same function (and broken for
  grayscale inputs — tiling 3 channels then splitting in half mixes
  template and contents channels when conv_ch == 1; we implement the
  intended semantics for any conv_ch).

The +5/-5 logit trick is preserved: the raw template logits are shifted by
+5 before the zero-padded warp and shifted back after, so pixels outside
the template's support get mask logit -5 and lose the softmax against the
background's constant logit of +1 (``physics_models.py:165,192-193``).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from paig_reproduction_tpu.ops.stn import _base_coords, _interp_matrix


class DecoderAssets(NamedTuple):
    """Per-forward constants produced by the VariableFromNetwork heads."""

    template: jnp.ndarray    # [n_objs, T, T]      raw logits
    contents: jnp.ndarray    # [n_objs, T, T, C]   raw (pre-sigmoid)
    background: jnp.ndarray  # [H, W, C]           sigmoid-ed


class DecoderConfig(NamedTuple):
    img_hw: tuple            # (H, W)
    tmpl_size: int           # H // 2
    n_objs: int
    conv_ch: int
    log_sig: float = 1.0     # reference physics_models.py:103 (sigma = 1.0)


def _warp_weights(pos_1d: jnp.ndarray, sigma: float, img_size: int,
                  tmpl_size: int, out_size: int, dtype) -> jnp.ndarray:
    """Interpolation matrix for one axis of the decoder warp.

    pos_1d: [N] object coordinate along this axis (pixels, in [0, img]).
    Returns W: [N, out_size, tmpl_size].

    Matches the reference theta construction: translation
    t = (img/2 - pos) / tmpl_size * sigma with scale sigma
    (physics_models.py:175-181), under torch align_corners=False
    normalization.
    """
    t = (img_size / 2.0 - pos_1d) / tmpl_size * sigma          # [N]
    grid = sigma * _base_coords(out_size, dtype)[None, :] + t[:, None]
    src = ((grid + 1.0) * tmpl_size - 1.0) / 2.0               # [N, out]
    return _interp_matrix(src, tmpl_size)                      # [N, out, in]


def st_decode(assets: DecoderAssets, pos: jnp.ndarray, cfg: DecoderConfig,
              return_extras: bool = False, backend: str = "xla"):
    """Decode per-object positions into composited frames.

    pos: [N, n_objs*2] object-major pixel coordinates [x1, y1, x2, y2, ...].
    Returns frames [N, H, W, C] (and a dict of visualization extras when
    requested: transformed masks/contents per object + background).

    backend: "xla" (separable-matmul, default) or "pallas" (fused VMEM
    kernel forward with the XLA path's VJP as the backward — the two are
    numerically identical, tests/test_pallas_decoder.py). The extras path
    always uses XLA (visualization-only, off the hot loop).
    """
    if backend == "pallas" and not return_extras:
        return _st_decode_pallas_st(assets, pos, cfg), None
    n = pos.shape[0]
    h, w = cfg.img_hw
    # Reference: sigma = exp(log(log_sig)) == log_sig (= 1.0 by default;
    # physics_models.py:160-161 — the name is historical).
    sigma = float(cfg.log_sig)
    dtype = assets.template.dtype

    pos = pos.reshape(n, cfg.n_objs, 2)
    # x translates the width axis (theta2), y the height axis (theta5).
    px = pos[..., 0].reshape(-1)                               # [N*o]
    py = pos[..., 1].reshape(-1)

    wx = _warp_weights(px, sigma, w, cfg.tmpl_size, w, dtype)
    wy = _warp_weights(py, sigma, h, cfg.tmpl_size, h, dtype)
    wx = wx.reshape(n, cfg.n_objs, w, cfg.tmpl_size)
    wy = wy.reshape(n, cfg.n_objs, h, cfg.tmpl_size)

    # Channel stack per object: [template+5, sigmoid(contents)...]
    joint = jnp.concatenate(
        [assets.template[..., None] + 5.0, jax.nn.sigmoid(assets.contents)],
        axis=-1)                                               # [o, T, T, C+1]

    # warped[b, o, H, W, c] = sum_ij Wy[b,o,H,i] joint[o,i,j,c] Wx[b,o,W,j]
    tmp = jnp.einsum("bohi,oijc->bohjc", wy, joint,
                     precision="highest", preferred_element_type=dtype)
    warped = jnp.einsum("bohjc,bowj->bohwc", tmp, wx,
                        precision="highest", preferred_element_type=dtype)

    mask_logits = warped[..., 0] - 5.0                         # [b, o, H, W]
    contents_w = warped[..., 1:]                               # [b, o, H, W, C]

    # Background gets a constant logit of +1 (reference ones_like mask,
    # physics_models.py:192-193).
    bg_logit = jnp.ones((n, 1, h, w), dtype)
    masks = jax.nn.softmax(
        jnp.concatenate([mask_logits, bg_logit], axis=1), axis=1
    )                                                          # [b, o+1, H, W]

    out = jnp.einsum("bohw,bohwc->bhwc", masks[:, :cfg.n_objs], contents_w,
                     precision="highest", preferred_element_type=dtype)
    out = out + masks[:, cfg.n_objs][..., None] * assets.background[None]

    if not return_extras:
        return out, None
    extras = {
        "transf_masks": masks,          # [b, o+1, H, W]
        "transf_contents": contents_w,  # [b, o, H, W, C]
    }
    return out, extras


@functools.lru_cache(maxsize=None)
def _pallas_decode_fn(cfg: DecoderConfig):
    """custom_vjp decode function for a (static, hashable) DecoderConfig:
    fused-Pallas forward, XLA-VJP backward (the kernel and the
    separable-matmul path compute the same function, so the XLA backward
    is exact, not approximate)."""

    def fwd_impl(template, contents, background, pos):
        from paig_reproduction_tpu.ops.pallas.st_decoder import (
            st_decode_pallas,
        )

        h, _ = cfg.img_hw
        joint = jnp.concatenate(
            [template[..., None] + 5.0, jax.nn.sigmoid(contents)],
            axis=-1)
        return st_decode_pallas(
            pos, joint, background, img=h, tmpl=cfg.tmpl_size,
            n_objs=cfg.n_objs, ch=cfg.conv_ch, sigma=float(cfg.log_sig),
            # Mosaic lowering needs a real TPU; every other backend
            # (emulated CPU meshes, GPU) runs the kernel interpreted.
            interpret=jax.default_backend() != "tpu")

    @jax.custom_vjp
    def run(template, contents, background, pos):
        return fwd_impl(template, contents, background, pos)

    def run_fwd(template, contents, background, pos):
        out = fwd_impl(template, contents, background, pos)
        return out, (template, contents, background, pos)

    def run_bwd(res, g):
        template, contents, background, pos = res

        def xla_fn(t, c, b, p):
            return st_decode(DecoderAssets(t, c, b), p, cfg)[0]

        _, vjp = jax.vjp(xla_fn, template, contents, background, pos)
        return vjp(g)

    run.defvjp(run_fwd, run_bwd)
    return run


def _st_decode_pallas_st(assets: DecoderAssets, pos: jnp.ndarray,
                         cfg: DecoderConfig):
    return _pallas_decode_fn(cfg)(assets.template, assets.contents,
                                  assets.background, pos)
