"""ctypes bindings for the native batched image/label loader.

C++ thread-pool decode (JPEG + PNG) + NEAREST shorter-side resize +
center crop, or exact (res, res) stretch (native/imageloader.cpp) — the
native IO runtime replacing the reference's torch DataLoader workers
(/root/reference/build.py:167-199).  Geometry is bit-identical to the
PIL path in data/transforms.py (tested); labels decode to their raw
single channel (gray values / palette indices), matching
``np.asarray(Image.open(png))``.

The PIL path remains the reference-parity fallback (it additionally
supports random crops and exotic formats); `data/pipeline.py` routes
eligible center/none-crop batches here.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libimageloader.so")

_MODES = {"center": 0, "none": 1}

_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[Exception] = None


def load_library() -> ctypes.CDLL:
    global _lib, _load_error
    if _lib is not None:
        return _lib
    if _load_error is not None:
        # negative-cache a failed build/load: without this, native=auto
        # would re-spawn a failing `make` on every epoch's batches() call
        raise _load_error
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception as e:
        _load_error = e
        raise
    u8out = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.load_image_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, u8out,
    ]
    lib.load_image_batch.restype = ctypes.c_int
    lib.load_image_batch2.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, u8out,
    ]
    lib.load_image_batch2.restype = ctypes.c_int
    lib.load_label_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, u8out,
    ]
    lib.load_label_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    """True if the native library is importable (builds it on demand)."""
    try:
        load_library()
        return True
    except Exception:
        return False


def _paths_array(paths: Sequence[str]):
    return (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])


def load_image_batch(paths: Sequence[str], res: int, n_threads: int = 4,
                     mode: str = "center") -> np.ndarray:
    """Decode+resize+crop a batch of images -> (n, res, res, 3) uint8.

    mode 'center' = shorter-side NEAREST resize + center crop; 'none' =
    exact (res, res) NEAREST stretch (transforms.prepare_image parity).
    """
    lib = load_library()
    n = len(paths)
    out = np.empty((n, res, res, 3), np.uint8)
    failures = lib.load_image_batch2(_paths_array(paths), n, res,
                                     _MODES[mode], n_threads, out)
    if failures:
        raise IOError(f"native loader failed on {failures}/{n} images")
    return out


def load_label_batch(paths: Sequence[str], res: int, n_threads: int = 4,
                     mode: str = "center") -> np.ndarray:
    """Decode+resize+crop a batch of label maps -> (n, res, res) uint8
    (raw gray values / palette indices)."""
    lib = load_library()
    n = len(paths)
    out = np.empty((n, res, res), np.uint8)
    failures = lib.load_label_batch(_paths_array(paths), n, res,
                                    _MODES[mode], n_threads, out)
    if failures:
        raise IOError(f"native loader failed on {failures}/{n} labels")
    return out
