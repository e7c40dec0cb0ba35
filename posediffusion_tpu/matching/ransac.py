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
            lib.verify_two_view.restype = ctypes.c_int
            lib.verify_two_view.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # kp1
                ctypes.POINTER(ctypes.c_float),  # kp2
                ctypes.c_int,                    # n
                ctypes.POINTER(ctypes.c_double), # K1 (or None)
                ctypes.POINTER(ctypes.c_double), # K2 (or None)
                ctypes.c_float,                  # max_error_px
                ctypes.c_int,                    # max_iters
                ctypes.c_double,                 # confidence
                ctypes.c_int,                    # min_num_inliers
                ctypes.c_uint64,                 # seed
                ctypes.POINTER(ctypes.c_double), # F_out
                ctypes.POINTER(ctypes.c_double), # H_out
                ctypes.POINTER(ctypes.c_double), # E_out
                ctypes.POINTER(ctypes.c_uint8),  # inlier_mask
                ctypes.POINTER(ctypes.c_int),    # config_out
            ]
            _lib = lib
    return _lib


# COLMAP TwoViewGeometry::ConfigurationType values emitted by the verifier.
DEGENERATE = 1
CALIBRATED = 2
UNCALIBRATED = 3
PLANAR_OR_PANORAMIC = 6

CONFIG_NAMES = {
    DEGENERATE: "degenerate",
    CALIBRATED: "calibrated",
    UNCALIBRATED: "uncalibrated",
    PLANAR_OR_PANORAMIC: "planar_or_panoramic",
}


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


def verify_two_view(
    kp1: np.ndarray,
    kp2: np.ndarray,
    K1: np.ndarray = None,
    K2: np.ndarray = None,
    max_error_px: float = 4.0,
    max_iters: int = 10000,
    confidence: float = 0.9999,
    min_num_inliers: int = 15,
    seed: int = 0,
):
    """COLMAP-style two-view geometric verification with model selection.

    Fits F and H (and E on K-normalized coordinates when both intrinsics
    are given), then classifies the pair like COLMAP's
    ``estimation_and_geometric_verification``
    (reference: util/match_extraction.py:125-130): CALIBRATED (E wins),
    UNCALIBRATED (F wins), PLANAR_OR_PANORAMIC (H explains >=80% of the
    epipolar model's inliers — planar scene or pure rotation; returned
    inliers are H's), or DEGENERATE (too few inliers for every model).

    Returns:
        dict with ``inlier_mask`` (N,) bool of the SELECTED model,
        ``num_inliers`` int, ``config`` int (COLMAP enum value),
        ``config_name`` str, and the fitted ``F``/``H``/``E`` (3, 3).
    """
    kp1 = np.ascontiguousarray(kp1, np.float32)
    kp2 = np.ascontiguousarray(kp2, np.float32)
    n = len(kp1)
    if n != len(kp2):
        raise ValueError("kp1/kp2 length mismatch")
    if (K1 is None) != (K2 is None):
        raise ValueError("pass both intrinsics or neither")
    F = np.zeros(9, np.float64)
    H = np.zeros(9, np.float64)
    E = np.zeros(9, np.float64)
    mask = np.zeros(max(n, 1), np.uint8)
    config = ctypes.c_int(DEGENERATE)
    count = 0
    if n > 0:
        lib = _get_lib()
        dptr = ctypes.POINTER(ctypes.c_double)
        if K1 is not None:
            K1 = np.ascontiguousarray(K1, np.float64)
            K2 = np.ascontiguousarray(K2, np.float64)
        count = lib.verify_two_view(
            kp1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            kp2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            K1.ctypes.data_as(dptr) if K1 is not None else None,
            K2.ctypes.data_as(dptr) if K2 is not None else None,
            ctypes.c_float(max_error_px),
            max_iters,
            confidence,
            min_num_inliers,
            seed,
            F.ctypes.data_as(dptr),
            H.ctypes.data_as(dptr),
            E.ctypes.data_as(dptr),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(config),
        )
    return {
        "inlier_mask": mask[:n].astype(bool),
        "num_inliers": int(count),
        "config": int(config.value),
        "config_name": CONFIG_NAMES[int(config.value)],
        "F": F.reshape(3, 3),
        "H": H.reshape(3, 3),
        "E": E.reshape(3, 3),
    }
