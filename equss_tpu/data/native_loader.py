"""ctypes bindings for the native batched JPEG loader.

C++ thread-pool decode + NEAREST shorter-side resize + center crop
(native/imageloader.cpp) — the native IO runtime replacing the
reference's torch DataLoader workers for the inference/serving path.
The PIL path (data/transforms.py) remains the reference-parity default
for training (it supports random/five crops and labels)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libimageloader.so")

_lib: Optional[ctypes.CDLL] = None


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.load_image_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ]
    lib.load_image_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def load_image_batch(paths: Sequence[str], res: int,
                     n_threads: int = 4) -> np.ndarray:
    """Decode+resize+center-crop a batch of JPEGs -> (n, res, res, 3) u8."""
    lib = load_library()
    n = len(paths)
    out = np.empty((n, res, res, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.load_image_batch(arr, n, res, n_threads, out)
    if failures:
        raise IOError(f"native loader failed on {failures}/{n} images")
    return out
