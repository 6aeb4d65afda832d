"""Visualization helpers (reference nn/utils/viz.py).

``gif`` writes with Pillow instead of moviepy (not installed here); same
artifact: an animated .gif at the requested fps/scale.
"""
from __future__ import annotations

import os

import numpy as np


def gallery(array, ncols=3):
    """Tile an image sequence [N, H, W, C] row-major into an
    (N//ncols)-row grid, each tile framed by a 1-px 0.5-gray border
    (artifact-layout contract of reference viz.py:4-20)."""
    array = np.asarray(array)
    n = array.shape[0]
    assert n % ncols == 0, (n, ncols)
    framed = np.pad(array, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=0.5)
    _, th, tw, c = framed.shape
    grid = framed.reshape(n // ncols, ncols, th, tw, c)
    return grid.transpose(0, 2, 1, 3, 4).reshape(
        (n // ncols) * th, ncols * tw, c)


def gif(filename, array, fps=10, scale=1.0):
    """Write an animated gif from [T, H, W, (C)] uint8-range frames
    (reference viz.py:22-56, moviepy replaced by Pillow)."""
    from PIL import Image

    fname, _ = os.path.splitext(filename)
    filename = fname + ".gif"

    array = np.asarray(array)
    if array.ndim == 3:
        array = array[..., np.newaxis] * np.ones(3)
    array = np.clip(array, 0, 255).astype(np.uint8)

    frames = []
    for frame in array:
        img = Image.fromarray(frame)
        if scale != 1.0:
            img = img.resize((int(img.width * scale),
                              int(img.height * scale)), Image.NEAREST)
        frames.append(img)
    frames[0].save(filename, save_all=True, append_images=frames[1:],
                   duration=max(1, int(1000 / fps)), loop=0)
    return filename


def sigmoid(x):
    """numpy sigmoid (reference nn/utils/math.py:3-4 — dead code there,
    kept for API parity)."""
    return 1.0 / (1.0 + np.exp(-x))
