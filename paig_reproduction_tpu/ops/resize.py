"""Bilinear resize matching ``torchvision.transforms.Resize`` on tensors.

The reference UNets upsample with torchvision's bilinear Resize (reference
``blocks.py:137,148,160,260,269``). For upsampling, torchvision's
``F.interpolate(mode='bilinear', align_corners=False)`` uses half-pixel
source coordinates — the same convention as ``jax.image.resize`` with
method='linear' — and antialiasing is a no-op when scaling up, so the two
agree. Golden-tested against torch CPU in tests/test_resize.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """x: [..., H, W] -> [..., out_h, out_w], channels-first friendly."""
    out_shape = (*x.shape[:-2], out_hw[0], out_hw[1])
    return jax.image.resize(x, out_shape, method="linear", antialias=False)
