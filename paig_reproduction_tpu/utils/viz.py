"""Visualization helpers (reference nn/utils/viz.py).

``gif`` writes with Pillow instead of moviepy (not installed here); same
artifact: an animated .gif at the requested fps/scale.
"""
from __future__ import annotations

import os

import numpy as np


def gallery(array, ncols=3):
    """Tile an image sequence [N, H, W, C] into a grid with 0.5-gray
    borders (reference viz.py:4-20)."""
    nindex, height, width, intensity = array.shape
    bordered = 0.5 * np.ones([nindex, height + 2, width + 2, intensity])
    for i in range(nindex):
        bordered[i, 1:-1, 1:-1, :] = array[i]
    array = bordered
    nindex, height, width, intensity = array.shape
    nrows = nindex // ncols
    assert nindex == nrows * ncols
    return (array.reshape(nrows, ncols, height, width, intensity)
            .swapaxes(1, 2)
            .reshape(height * nrows, width * ncols, intensity))


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
