"""Pallas TPU kernel: fused ST-decoder warp + softmax composite.

Fuses the entire decode of one batch tile in VMEM — interpolation-weight
construction from the object positions, the separable bilinear warp
matmuls, the +5/-5 mask-logit trick, the softmax over objects+background,
and the content/background compositing — into a single kernel, so the
intermediate warped tensors never round-trip through HBM. Functionally
identical to ``models/decoder.st_decode`` (reference semantics:
physics_models.py:151-199); parity is tested in
tests/test_pallas_decoder.py against the XLA path and transitively against
torch grid_sample.

Mosaic layout notes (learned on real v5e hardware): iota results must be
integer; minor-dim reshapes/transposes of >2D vectors are unsupported —
so the channel dimension is unrolled (channel-major [o, ch+1, T, T]
operand layout, one 2D [T, T] plane per (object, channel)) and every
in-kernel tensor is <= 3D with the image axes minor.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp_weights(src, n_in):
    """w[..., j] = max(0, 1 - |src[...] - j|); zero-padding falls out.
    (iota is materialized int32: Mosaic requires integer iota results.)"""
    j = jax.lax.broadcasted_iota(jnp.int32, src.shape + (n_in,),
                                 len(src.shape)).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - j))


def _decode_kernel(pos_ref, joint_ref, bg_ref, out_ref, *, img, tmpl,
                   n_objs, ch, sigma):
    """One grid step: decode B_TILE batch rows.

    pos_ref:   [B_TILE, n_objs*2]
    joint_ref: [n_objs, ch+1, tmpl, tmpl] (template+5 in channel 0,
               sigmoid contents after — channel-major so each (object,
               channel) plane slices on leading dims to a 2D operand)
    bg_ref:    [ch, img, img]
    out_ref:   [B_TILE, ch, img, img]
    """
    pos = pos_ref[:]                                   # [bt, o*2]
    base = (2.0 * jax.lax.broadcasted_iota(jnp.int32, (1, img), 1)
            .astype(jnp.float32) + 1.0) / img - 1.0    # [1, img]

    def axis_weights(p):
        # p: [bt] coordinate; -> [bt, img, tmpl] interpolation matrix
        t = (img / 2.0 - p) / tmpl * sigma             # [bt]
        grid = sigma * base + t[:, None]               # [bt, img]
        src = ((grid + 1.0) * tmpl - 1.0) / 2.0
        return _interp_weights(src, tmpl)

    def warp_plane(wy, wx, plane):
        # warped[b, h, w] = wy[b,h,:] @ plane @ wx[b,w,:]^T
        tmp = jax.lax.dot_general(
            wy, plane, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [bt, img, tmpl]
        return jax.lax.dot_general(
            tmp, wx, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [bt, img, img]

    # Warp every object, keep logits for a max-subtracted (numerically
    # safe) softmax over objects + background.
    logits, contents = [], []
    for o in range(n_objs):
        wx = axis_weights(pos[:, 2 * o])               # [bt, img, tmpl]
        wy = axis_weights(pos[:, 2 * o + 1])           # [bt, img, tmpl]
        logits.append(warp_plane(wy, wx, joint_ref[o, 0]) - 5.0)
        contents.append([warp_plane(wy, wx, joint_ref[o, 1 + c])
                         for c in range(ch)])

    bg_logit = jnp.ones_like(logits[0])
    m = bg_logit
    for lg in logits:
        m = jnp.maximum(m, lg)
    denom = jnp.exp(bg_logit - m)
    weights = []
    for lg in logits:
        e = jnp.exp(lg - m)
        weights.append(e)
        denom = denom + e
    bg_w = jnp.exp(bg_logit - m) / denom               # [bt, img, img]
    for c in range(ch):
        acc = bg_w * bg_ref[c][None]
        for w_o, ct in zip(weights, contents):
            acc = acc + (w_o / denom) * ct[c]
        out_ref[:, c] = acc


def st_decode_pallas(pos, joint, background, *, img, tmpl, n_objs, ch,
                     sigma=1.0, b_tile=16, interpret=False):
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

    # Channel-major operand layouts (see module docstring).
    joint_cm = jnp.transpose(joint, (0, 3, 1, 2))      # [o, ch+1, T, T]
    bg_cm = jnp.transpose(background, (2, 0, 1))       # [ch, img, img]

    kernel = functools.partial(_decode_kernel, img=img, tmpl=tmpl,
                               n_objs=n_objs, ch=ch, sigma=sigma)
    out = pl.pallas_call(
        kernel,
        grid=(n_padded // b_tile,),
        in_specs=[
            pl.BlockSpec((b_tile, pos.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_objs, ch + 1, tmpl, tmpl),
                         lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, img, img), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_tile, ch, img, img),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_padded, ch, img, img),
                                       jnp.float32),
        interpret=interpret,
    )(pos, joint_cm, bg_cm)
    # back to channels-last [N, img, img, ch]
    return jnp.transpose(out[:n], (0, 2, 3, 1))
