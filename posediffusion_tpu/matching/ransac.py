"""ctypes binding for the native two-view RANSAC verifier.

Compiles ``csrc/ransac.cpp`` on first use (g++, cached next to the source)
and exposes :func:`verify_matches`.  This is the TPU-framework replacement
for the reference's pycolmap geometric verification
(reference: util/match_extraction.py:125-130; SURVEY.md N2) — the database
layer is gone, arrays flow straight through.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libransac.so")
_lock = threading.Lock()
_lib = None


def _build_library() -> str:
    src = os.path.join(_CSRC, "ransac.cpp")
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH, src],
            check=True,
            capture_output=True,
        )
    return _LIB_PATH


def _get_lib():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build_library())
            lib.ransac_fundamental.restype = ctypes.c_int
            lib.ransac_fundamental.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # kp1
                ctypes.POINTER(ctypes.c_float),  # kp2
                ctypes.c_int,                    # n
                ctypes.c_float,                  # threshold
                ctypes.c_int,                    # max_iters
                ctypes.c_double,                 # confidence
                ctypes.c_uint64,                 # seed
                ctypes.POINTER(ctypes.c_double), # F_out
                ctypes.POINTER(ctypes.c_uint8),  # inlier_mask
            ]
            _lib = lib
    return _lib


def verify_matches(
    kp1: np.ndarray,
    kp2: np.ndarray,
    threshold_px: float = 4.0,
    max_iters: int = 10000,
    confidence: float = 0.9999,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """RANSAC-verify putative correspondences.

    Args:
        kp1, kp2: (N, 2) pixel keypoints of putative matches.
        threshold_px: inlier threshold in pixels (Sampson distance compared
            against threshold_px^2, COLMAP-style max_error semantics).

    Returns:
        (inlier_mask (N,) bool, F (3, 3) with p2^T F p1 = 0, inlier_count).
    """
    kp1 = np.ascontiguousarray(kp1, np.float32)
    kp2 = np.ascontiguousarray(kp2, np.float32)
    n = len(kp1)
    if n != len(kp2):
        raise ValueError("kp1/kp2 length mismatch")
    F = np.zeros(9, np.float64)
    mask = np.zeros(n, np.uint8)
    if n == 0:
        return mask.astype(bool), F.reshape(3, 3), 0
    lib = _get_lib()
    count = lib.ransac_fundamental(
        kp1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        kp2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ctypes.c_float(threshold_px**2),
        max_iters,
        confidence,
        seed,
        F.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask.astype(bool), F.reshape(3, 3), int(count)
