"""MNIST/CIFAR asset loading without TensorFlow.

The reference imports TensorFlow's keras datasets inside its generators
(reference generators.py:164-165,385-398), which downloads from the network.
This environment has no egress and no TF, so assets resolve in order:

1. A local keras-layout cache (``~/.keras/datasets/mnist.npz``,
   ``cifar-10-batches-py``) or the paths in ``$PAIG_MNIST_NPZ`` /
   ``$PAIG_CIFAR_NPZ``.
2. A documented procedural fallback: digit glyphs rasterized with
   matplotlib's text renderer (visually digit-like, deterministic) and a
   smooth random-field background. The fallback keeps every task
   synthesizable on any machine; swap in real MNIST/CIFAR via the env vars
   for paper-exact data.
"""
from __future__ import annotations

import os
import pickle

import numpy as np


def _keras_cache(name):
    return os.path.join(os.path.expanduser("~"), ".keras", "datasets", name)


def load_mnist_digits(n: int = 2) -> np.ndarray:
    """Returns [n, 22, 22] float arrays in [0, 1]: the first n MNIST train
    digits center-cropped 3px per side (reference generators.py:398-399),
    or procedural glyphs when MNIST is unavailable."""
    path = os.environ.get("PAIG_MNIST_NPZ", _keras_cache("mnist.npz"))
    if os.path.exists(path):
        with np.load(path) as d:
            x = d["x_train"][:n, 3:-3, 3:-3] / 255.0
        return x.astype(np.float32)
    return _glyph_digits(n)


def _glyph_digits(n: int) -> np.ndarray:
    """Rasterize the characters '5', '0', '4', ... (MNIST's first train
    labels) with matplotlib as a deterministic digit-like fallback."""
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    chars = "50419213"  # first MNIST train labels
    out = []
    for i in range(n):
        fig = plt.figure(figsize=(1, 1), dpi=22)
        fig.patch.set_facecolor("black")
        ax = fig.add_axes([0, 0, 1, 1])
        ax.set_facecolor("black")
        ax.text(0.5, 0.45, chars[i % len(chars)], color="white",
                fontsize=16, ha="center", va="center", fontweight="bold")
        ax.set_xticks([])
        ax.set_yticks([])
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., 0] / 255.0
        plt.close(fig)
        h, w = buf.shape
        if (h, w) != (22, 22):  # crop/pad to 22x22
            img = np.zeros((22, 22), np.float32)
            hh, ww = min(22, h), min(22, w)
            img[:hh, :ww] = buf[:hh, :ww]
            buf = img
        out.append(buf.astype(np.float32))
    return np.stack(out)


def load_cifar_images() -> np.ndarray:
    """Returns [N, 32, 32, 3] uint8 CIFAR-10 train images from a local
    cache, or 64 smooth random-field backgrounds as the fallback."""
    npz = os.environ.get("PAIG_CIFAR_NPZ", "")
    if npz and os.path.exists(npz):
        with np.load(npz) as d:
            return d[d.files[0]]
    batch_dir = _keras_cache("cifar-10-batches-py")
    batch1 = os.path.join(batch_dir, "data_batch_1")
    if os.path.exists(batch1):
        with open(batch1, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        return x
    return _noise_backgrounds()


def _noise_backgrounds(n: int = 64) -> np.ndarray:
    """Smooth low-frequency RGB noise fields (deterministic)."""
    rs = np.random.RandomState(0)
    small = rs.rand(n, 4, 4, 3)
    big = np.stack([
        np.stack([np.kron(small[i, :, :, c], np.ones((8, 8)))
                  for c in range(3)], axis=-1)
        for i in range(n)])
    return (big * 255).astype(np.uint8)
