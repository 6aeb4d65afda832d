"""Pallas TPU kernel: fused ST-decoder warp + softmax composite.

Fuses the entire decode of one batch tile in VMEM — interpolation-weight
construction from the object positions, the separable bilinear warp
matmuls, the +5/-5 mask-logit trick, the softmax over objects+background,
and the content/background compositing — into a single kernel, so the
intermediate warped tensors ([B, n_objs, H, W, C+1]) never round-trip
through HBM. Functionally identical to ``models/decoder.st_decode``
(reference semantics: physics_models.py:151-199); parity is tested in
tests/test_pallas_decoder.py against the XLA path and transitively against
torch grid_sample.

Layout notes: compute is carried out in [H, W]-last 2D tiles per (batch
row, object, channel); all operands are tiny (<= 64x64), so each grid step
processes a tile of batch rows with everything resident in VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp_weights(src, n_in):
    """w[..., j] = max(0, 1 - |src[...] - j|); zero-padding falls out."""
    j = jax.lax.broadcasted_iota(jnp.float32, src.shape + (n_in,),
                                 len(src.shape))
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - j))


def _decode_kernel(pos_ref, joint_ref, bg_ref, out_ref, *, img, tmpl,
                   n_objs, ch, sigma):
    """One grid step: decode B_TILE batch rows.

    pos_ref:   [B_TILE, n_objs*2]
    joint_ref: [n_objs, tmpl, tmpl, ch+1]  (template+5 stacked on contents)
    bg_ref:    [img, img, ch]
    out_ref:   [B_TILE, img, img, ch]
    """
    bt = pos_ref.shape[0]
    pos = pos_ref[:]                                   # [bt, o*2]
    base = (2.0 * jax.lax.broadcasted_iota(jnp.float32, (1, img), 1)
            + 1.0) / img - 1.0                         # [1, img]

    def axis_weights(p):
        # p: [bt] coordinate; -> [bt, img, tmpl] interpolation matrix
        t = (img / 2.0 - p) / tmpl * sigma             # [bt]
        grid = sigma * base + t[:, None]               # [bt, img]
        src = ((grid + 1.0) * tmpl - 1.0) / 2.0
        return _interp_weights(src, tmpl)

    # Warp every object, keep logits for a max-subtracted (numerically
    # safe) softmax over objects + background.
    logits, contents = [], []
    for o in range(n_objs):
        wx = axis_weights(pos[:, 2 * o])               # [bt, img, tmpl]
        wy = axis_weights(pos[:, 2 * o + 1])           # [bt, img, tmpl]
        joint_o = joint_ref[o]                         # [tmpl, tmpl, ch+1]
        # warped[b, h, w, c] = wy[b,h,:] @ joint[:, :, c] @ wx[b,w,:]^T
        jmat = joint_o.reshape(tmpl, tmpl * (ch + 1))
        tmp = jax.lax.dot_general(
            wy, jmat, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [bt, img, tmpl*(c+1)]
        tmp = tmp.reshape(bt, img, tmpl, ch + 1)
        warped = jax.lax.dot_general(
            tmp, wx, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [bt, img, c+1, img]
        warped = warped.transpose(0, 1, 3, 2)          # [bt, H, W, c+1]
        logits.append(warped[..., 0] - 5.0)
        contents.append(warped[..., 1:])

    bg_logit = jnp.ones((bt, img, img), jnp.float32)
    m = bg_logit
    for lg in logits:
        m = jnp.maximum(m, lg)
    denom = jnp.exp(bg_logit - m)
    comp = denom[..., None] * bg_ref[:][None]
    for lg, ct in zip(logits, contents):
        e = jnp.exp(lg - m)
        denom = denom + e
        comp = comp + e[..., None] * ct

    out_ref[:] = comp / denom[..., None]


def st_decode_pallas(pos, joint, background, *, img, tmpl, n_objs, ch,
                     sigma=1.0, b_tile=8, interpret=False):
    """pos: [N, n_objs*2]; joint: [n_objs, T, T, ch+1] (template+5 in
    channel 0, sigmoid contents after); background: [img, img, ch].
    Returns [N, img, img, ch]."""
    n = pos.shape[0]
    b_tile = min(b_tile, n)
    pad = (-n) % b_tile
    if pad:
        pos = jnp.concatenate(
            [pos, jnp.zeros((pad, pos.shape[1]), pos.dtype)], 0)
    n_padded = pos.shape[0]

    kernel = functools.partial(_decode_kernel, img=img, tmpl=tmpl,
                               n_objs=n_objs, ch=ch, sigma=sigma)
    out = pl.pallas_call(
        kernel,
        grid=(n_padded // b_tile,),
        in_specs=[
            pl.BlockSpec((b_tile, pos.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_objs, tmpl, tmpl, ch + 1),
                         lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((img, img, ch), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_tile, img, img, ch),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_padded, img, img, ch),
                                       jnp.float32),
        interpret=interpret,
    )(pos, joint, background)
    return out[:n]
