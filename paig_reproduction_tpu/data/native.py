"""ctypes bindings for the native C++ data loader (native/paig_data.cpp).

``NativeBatcher`` assembles shuffled, normalized float32 batches on a
background C++ thread with double buffering, overlapping host batch prep
with device compute. Serves the host input path (datasets too big for the
HBM-resident path in trainer.py). Builds the .so on first use if the
toolchain is available; callers must handle ``NativeLoaderUnavailable``
and fall back to the Python ``DataIterator``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpaig_data.so")

_lib = None


class NativeLoaderUnavailable(RuntimeError):
    pass


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        build = os.path.join(_NATIVE_DIR, "build.sh")
        if not os.path.exists(build):
            raise NativeLoaderUnavailable("native sources missing")
        try:
            subprocess.run(["sh", build], check=True,
                           capture_output=True, timeout=120)
        except (subprocess.SubprocessError, OSError) as e:
            raise NativeLoaderUnavailable(f"build failed: {e}") from e
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:  # pragma: no cover
        raise NativeLoaderUnavailable(str(e)) from e

    lib.pd_create.restype = ctypes.c_void_p
    lib.pd_create.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64, ctypes.c_int]
    lib.pd_next.restype = ctypes.c_int64
    lib.pd_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float)]
    lib.pd_epochs.restype = ctypes.c_int64
    lib.pd_epochs.argtypes = [ctypes.c_void_p]
    lib.pd_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeBatcher:
    """Prefetching batch source over a uint8 dataset [N, ...].

    API mirrors the subset of DataIterator the trainer's host path uses:
    ``next_batch_x()`` -> float32 [batch, ...] in [0, 1], and
    ``epochs_completed``.
    """

    def __init__(self, data_u8: np.ndarray, batch_size: int, seed: int = 0,
                 normalize: bool = True):
        lib = _load_lib()
        if data_u8.dtype != np.uint8:
            raise ValueError("NativeBatcher expects uint8 data")
        self._data = np.ascontiguousarray(data_u8)   # keep alive
        self.batch_size = int(batch_size)
        self.example_shape = self._data.shape[1:]
        eb = int(np.prod(self.example_shape))
        self._handle = lib.pd_create(
            self._data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._data.shape[0], eb, self.batch_size, seed,
            1 if normalize else 0)
        if not self._handle:
            raise NativeLoaderUnavailable("pd_create failed (check batch "
                                          "<= dataset size)")
        self._lib = lib
        self._out = np.empty((self.batch_size, eb), np.float32)
        self.epochs_completed = 0

    def next_batch_x(self) -> np.ndarray:
        ep = self._lib.pd_next(
            self._handle,
            self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if ep < 0:
            raise RuntimeError("native loader shut down")
        # pd_next returns the per-batch post-increment epoch (the global
        # counter may already include the prefetched NEXT batch).
        self.epochs_completed = int(ep)
        return self._out.reshape((self.batch_size,) + self.example_shape)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.pd_destroy(self._handle)
            self._handle = None
