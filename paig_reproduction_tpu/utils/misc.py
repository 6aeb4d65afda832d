"""Logging / metrics / snapshot utilities (reference nn/utils/misc.py)."""
from __future__ import annotations

import inspect
import os
import zipfile

import numpy as np


def log_metrics(logger, prefix, metrics):
    """k=v line logging, byte-identical format to the reference
    (misc.py:6-9) so downstream log.txt tooling ports."""
    metrics_string = " ".join(
        [k + "=%s" % metrics[k] for k in sorted(metrics.keys())])
    logger.info(prefix + " " + metrics_string)


def classes_in_module(module):
    """Model-registry-by-reflection (reference misc.py:11-17); kept for API
    parity — the explicit registry in models/registry.py is preferred."""
    classes = {}
    for name, obj in inspect.getmembers(module):
        if inspect.isclass(obj) and obj.__module__ == module.__name__:
            classes[name] = obj
    return classes


def rgb2gray(rgb):
    return np.dot(rgb[..., :3], [0.299, 0.587, 0.114])


def zipdir(path, save_dir):
    """Snapshot every .py under ``path`` into ``save_dir/code.zip``
    (reference misc.py:22-32)."""
    zipf = zipfile.ZipFile(os.path.join(save_dir, "code.zip"), "w",
                           zipfile.ZIP_DEFLATED)
    for root, _, files in os.walk(path):
        for file in files:
            if file.split(".")[-1] == "py":
                zipf.write(
                    os.path.join(root, file),
                    os.path.relpath(os.path.join(root, file),
                                    os.path.join(path, "..")))
    zipf.close()
