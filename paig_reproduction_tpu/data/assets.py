"""MNIST/CIFAR asset loading without TensorFlow.

The reference imports TensorFlow's keras datasets inside its generators
(reference generators.py:164-165,385-398), which downloads from the network.
This environment has no egress and no TF, so assets resolve in order:

1. A local keras-layout cache (``~/.keras/datasets/mnist.npz``,
   ``cifar-10-batches-py``) or the paths in ``$PAIG_MNIST_NPZ`` /
   ``$PAIG_CIFAR_NPZ``.
2. REAL handwritten digits from scikit-learn's bundled ``load_digits``
   (1797 genuine 8x8 handwriting samples, shipped with sklearn — no
   network), upsampled to MNIST's cropped 22x22 geometry and selected to
   match MNIST's first train labels (5, 0, 4, 1, ...).
3. A documented procedural fallback: digit glyphs rasterized with
   matplotlib's text renderer (visually digit-like, deterministic) and a
   smooth random-field background with natural-image statistics. The
   fallback keeps every task synthesizable on any machine; swap in real
   MNIST/CIFAR via the env vars for paper-exact data.
"""
from __future__ import annotations

import os
import pickle

import numpy as np

# MNIST's first train labels (reference uses x_train[:n],
# generators.py:398).
_MNIST_FIRST_LABELS = (5, 0, 4, 1, 9, 2, 1, 3)


def _keras_cache(name):
    return os.path.join(os.path.expanduser("~"), ".keras", "datasets", name)


def _bilinear_up(img: np.ndarray, out_hw) -> np.ndarray:
    """Minimal bilinear resize (align_corners=True) for 2D arrays."""
    h, w = img.shape
    oh, ow = out_hw
    ys = np.linspace(0, h - 1, oh)
    xs = np.linspace(0, w - 1, ow)
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 2)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 2)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    a = img[y0][:, x0]
    b = img[y0][:, x0 + 1]
    c = img[y0 + 1][:, x0]
    d = img[y0 + 1][:, x0 + 1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


def load_mnist_digits(n: int = 2) -> np.ndarray:
    """Returns [n, 22, 22] float arrays in [0, 1]: the first n MNIST train
    digits center-cropped 3px per side (reference generators.py:398-399).
    Fallbacks (in order): real sklearn handwriting, procedural glyphs."""
    path = os.environ.get("PAIG_MNIST_NPZ", _keras_cache("mnist.npz"))
    if os.path.exists(path):
        with np.load(path) as d:
            x = d["x_train"][:n, 3:-3, 3:-3] / 255.0
        return x.astype(np.float32)
    try:
        return _sklearn_digits(n)
    except Exception:
        return _glyph_digits(n)


def _sklearn_digits(n: int) -> np.ndarray:
    """Real 8x8 handwriting from sklearn's bundled digits dataset,
    upsampled to 22x22, one exemplar per MNIST-first-label."""
    from sklearn.datasets import load_digits

    d = load_digits()
    out = []
    for i in range(n):
        label = _MNIST_FIRST_LABELS[i % len(_MNIST_FIRST_LABELS)]
        # vary the exemplar when a label repeats
        which = sum(1 for j in range(i)
                    if _MNIST_FIRST_LABELS[j % len(_MNIST_FIRST_LABELS)]
                    == label)
        idx = np.where(d.target == label)[0][which]
        img = d.images[idx] / 16.0                    # 8x8 in [0, 1]
        up = _bilinear_up(img, (22, 22))
        up = np.clip((up - 0.1) / 0.8, 0.0, 1.0)      # restore ink contrast
        out.append(up.astype(np.float32))
    return np.stack(out)


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
    """Smooth low-frequency RGB fields with natural-image-like statistics
    (deterministic). Bilinear-interpolated (no block edges) and kept in a
    muted mid-intensity band so the task's saturated object colors stay
    separable from the background — like the CIFAR photos they stand in
    for."""
    rs = np.random.RandomState(0)
    out = np.empty((n, 32, 32, 3), np.float32)
    for i in range(n):
        base = rs.rand(4, 4)                     # shared luma structure
        for c in range(3):
            field = _bilinear_up(0.7 * base + 0.3 * rs.rand(4, 4),
                                 (32, 32))
            out[i, :, :, c] = field
    out = 0.15 + 0.5 * out                       # values in [0.15, 0.65]
    return (out * 255).astype(np.uint8)
