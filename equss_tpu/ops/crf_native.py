"""ctypes bindings for the native permutohedral-lattice CRF.

Host-side approximate-filtering path (native/permutohedral.cpp), the
C++ equivalent of the pydensecrf dependency the reference uses
(utils/crf_utils.py:1-2).  The library auto-builds on first use if the
shared object is missing (g++ is in the image; pybind11 is not, hence
the plain C ABI + ctypes).

The TPU path (ops/crf.py) computes the same mean field EXACTLY on the
MXU; this module serves CPU-only deployments and cross-checking.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from equss_tpu.ops.crf import CRFConfig

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libpermutohedral.so")

_lib: Optional[ctypes.CDLL] = None


def _build_library() -> None:
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                   capture_output=True)


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build_library()
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.dense_crf_inference.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, f32p,
    ]
    lib.dense_crf_inference.restype = ctypes.c_int
    lib.permutohedral_filter.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p,
    ]
    lib.permutohedral_filter.restype = ctypes.c_int
    _lib = lib
    return lib


def permutohedral_filter(features: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Gaussian filter of ``values`` (n, vd) over ``features`` (n, fd)."""
    lib = load_library()
    features = np.ascontiguousarray(features, np.float32)
    values = np.ascontiguousarray(values, np.float32)
    n, fd = features.shape
    vd = values.shape[1]
    out = np.empty((n, vd), np.float32)
    rc = lib.permutohedral_filter(features, values, n, fd, vd, out)
    if rc != 0:
        raise RuntimeError(f"permutohedral_filter failed rc={rc}")
    return out


def dense_crf_native(
    img_rgb255: np.ndarray,       # (H, W, 3) float in [0, 255]
    log_probs: np.ndarray,        # (H, W, C) log-softmax unary
    cfg: CRFConfig = CRFConfig(),
) -> np.ndarray:
    """Refined probabilities (H, W, C) — native mean-field inference."""
    lib = load_library()
    H, W, C = log_probs.shape
    lp = np.ascontiguousarray(log_probs.reshape(H * W, C), np.float32)
    rgb = np.ascontiguousarray(img_rgb255.reshape(H * W, 3), np.float32)
    out = np.empty((H * W, C), np.float32)
    rc = lib.dense_crf_inference(
        lp, rgb, H, W, C, cfg.max_iter,
        cfg.pos_w, cfg.pos_xy_std, cfg.bi_w, cfg.bi_xy_std, cfg.bi_rgb_std,
        out,
    )
    if rc != 0:
        raise RuntimeError(f"dense_crf_inference failed rc={rc}")
    return out.reshape(H, W, C)


def batched_crf_native(imgs_rgb255: np.ndarray, log_probs: np.ndarray,
                       cfg: CRFConfig = CRFConfig()) -> np.ndarray:
    """Serial batched refinement (the reference's batched_crf contract,
    crf_utils.py:62-71)."""
    return np.stack([
        dense_crf_native(imgs_rgb255[i], log_probs[i], cfg)
        for i in range(len(imgs_rgb255))
    ])
