"""Logging / metrics / snapshot utilities.

Capability parity with reference ``nn/utils/misc.py`` (log line format,
module reflection, gray conversion, source snapshot); implementations are
this repo's own. The ``log_metrics`` output format is pinned byte-for-byte
by ``tests/test_trainer_integration.py`` so downstream log.txt tooling
ports.
"""
from __future__ import annotations

import inspect
import pathlib
import zipfile

import numpy as np

_GRAY_WEIGHTS = np.array([0.299, 0.587, 0.114])


def log_metrics(logger, prefix, metrics):
    """Emit one ``<prefix> k=v k=v ...`` info line, keys sorted
    (format contract of reference misc.py:6-9)."""
    body = " ".join(f"{k}={metrics[k]}" for k in sorted(metrics))
    logger.info(f"{prefix} {body}")


def classes_in_module(module):
    """Map class-name -> class for classes *defined in* ``module`` (API
    parity with reference misc.py:11-17; the explicit registry in
    models/registry.py is preferred)."""
    return {
        name: obj
        for name, obj in vars(module).items()
        if inspect.isclass(obj) and obj.__module__ == module.__name__
    }


def rgb2gray(rgb):
    """ITU-R BT.601 luma from an [..., 3+] RGB array (reference
    misc.py:19-20)."""
    return np.asarray(rgb)[..., :3] @ _GRAY_WEIGHTS


def zipdir(path, save_dir):
    """Snapshot every ``*.py`` under ``path`` into ``save_dir/code.zip``,
    archived relative to ``path``'s parent (artifact contract of reference
    misc.py:22-32)."""
    root = pathlib.Path(path)
    out = pathlib.Path(save_dir) / "code.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for src in sorted(root.rglob("*.py")):
            zf.write(src, src.relative_to(root.parent))
