"""Device-side image preprocessing ops.

The reference does ImageNet normalization and bilinear multi-scale resize on
GPU through torch (reference: models/image_feature_extractor.py:24-25, 85-87;
util/load_img_folder.py:33-38).  Here they are jnp ops that fuse into the
feature-extractor XLA program, so the host only ships uint8/float32 frames.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def imagenet_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """Normalize (..., 3, H, W) float images in [0, 1] with ImageNet stats."""
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype).reshape(3, 1, 1)
    std = jnp.asarray(IMAGENET_STD, images.dtype).reshape(3, 1, 1)
    return (images - mean) / std


def _linear_weight_matrix(in_size: int, out_size: int, scale_factor=None):
    """(out, in) interpolation matrix with exact torch
    ``F.interpolate(mode="bilinear", align_corners=False)`` semantics:
    half-pixel centers, source index clamped at 0, edge clamping.  Sizes are
    static, so this is a trace-time numpy constant.

    ``scale_factor``: when resizing via ``F.interpolate(scale_factor=s)``
    (the reference's multiscale pyramid, image_feature_extractor.py:87),
    torch maps coordinates with the GIVEN scale, not out/in — for non-exact
    scales like 1/3 on 224px that shifts source coordinates by up to ~2px
    at the far edge.  Pass the original factor to reproduce it."""
    import numpy as np

    scale = (1.0 / scale_factor) if scale_factor else (in_size / out_size)
    src = np.maximum((np.arange(out_size) + 0.5) * scale - 0.5, 0.0)
    i0 = np.minimum(np.floor(src).astype(np.int64), in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    W = np.zeros((out_size, in_size), np.float32)
    np.add.at(W, (np.arange(out_size), i0), 1.0 - w1)
    np.add.at(W, (np.arange(out_size), i1), w1)
    return W


def resize_bilinear(
    images: jnp.ndarray, size_hw: Tuple[int, int], scale_factor=None
) -> jnp.ndarray:
    """Bilinear resize of (..., 3, H, W) images to (..., 3, h, w), matching
    torch ``F.interpolate(mode="bilinear", align_corners=False)`` (half-pixel
    centers, no antialias), which the reference uses for both the multiscale
    pyramid and demo-time preprocessing.  ``scale_factor`` reproduces the
    ``F.interpolate(scale_factor=s)`` coordinate mapping (see
    ``_linear_weight_matrix``).

    Separable resize as two matmuls with trace-time constant weight
    matrices: on TPU these tile onto the MXU, ~10x faster than the
    gather-based lowering of ``jax.image.resize``.
    """
    oh, ow = size_hw
    h, w = images.shape[-2:]
    if (oh, ow) == (h, w):
        return images
    Wh = jnp.asarray(_linear_weight_matrix(h, oh, scale_factor), images.dtype)
    Ww = jnp.asarray(_linear_weight_matrix(w, ow, scale_factor), images.dtype)
    out = jnp.einsum("oh,...hw->...ow", Wh, images)
    return jnp.einsum("pw,...ow->...op", Ww, out)


def scale_size(side: int, scale_factor: float) -> int:
    """Torch's floor semantics for ``F.interpolate(scale_factor=...)``."""
    return int(side * scale_factor)


def _cubic_weight_matrix(in_size: int, out_size: int, a: float = -0.75):
    """(out, in) interpolation matrix for torch bicubic semantics: Keys
    kernel with a=-0.75, half-pixel centers (align_corners=False), edge
    clamping.  Sizes are static, so this is a trace-time numpy constant."""
    import numpy as np

    def kernel(t):
        t = np.abs(t)
        w = np.where(
            t <= 1,
            (a + 2) * t**3 - (a + 3) * t**2 + 1,
            np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0),
        )
        return w

    scale = in_size / out_size
    x = (np.arange(out_size) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int64)
    W = np.zeros((out_size, in_size), np.float32)
    for tap in (-1, 0, 1, 2):
        idx = np.clip(x0 + tap, 0, in_size - 1)
        w = kernel(x - (x0 + tap))
        np.add.at(W, (np.arange(out_size), idx), w.astype(np.float32))
    return W


def resize_bicubic_torch(x: jnp.ndarray, out_hw: Tuple[int, int], a: float = -0.75):
    """Bicubic resize of (..., H, W, C) with exact torch
    ``F.interpolate(mode="bicubic", align_corners=False)`` semantics (Keys
    a=-0.75; jax.image's "cubic" uses a=-0.5).  Used for DINO position-
    embedding interpolation so converted checkpoints see the same grid."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    Wh = jnp.asarray(_cubic_weight_matrix(h, oh, a))
    Ww = jnp.asarray(_cubic_weight_matrix(w, ow, a))
    x = jnp.einsum("oh,...hwc->...owc", Wh, x)
    return jnp.einsum("pw,...owc->...opc", Ww, x)


def center_crop_square(image_hw3: jnp.ndarray) -> jnp.ndarray:
    """Center square crop of an (H, W, C) image (host-side helper twin lives
    in data/images.py for PIL inputs)."""
    h, w = image_hw3.shape[:2]
    m = min(h, w)
    top = (h - m) // 2
    left = (w - m) // 2
    return image_hw3[top : top + m, left : left + m]
