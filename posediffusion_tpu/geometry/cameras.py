"""NDC perspective camera model as a JAX pytree.

Replaces the PyTorch3D ``PerspectiveCameras`` subset the reference uses
(reference: pose_diffusion/util/camera_transform.py, get_fundamental_matrix.py,
normalize_cameras.py).  Conventions pinned here:

* Extrinsics are **row-vector** world-to-view: ``x_view = x_world @ R + T``.
* Intrinsics are NDC: the shorter image side spans [-1, 1]; +X points left and
  +Y points up on screen, so NDC -> pixel flips both axes around the image
  center (the same flip ``opencv_from_cameras_projection`` applies).
* Projection: ``x_ndc = fx * x_view / z_view + px`` (and likewise for y).

Everything is a pure function over the ``PerspectiveCameras`` dataclass so the
whole geometry stack jits, vmaps, and differentiates (GGS needs gradients
through ``cameras_to_opencv`` and the epipolar stack).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from posediffusion_tpu.utils.precision import highp
from flax import struct

from posediffusion_tpu.geometry.se3 import se3_matrix


@struct.dataclass
class PerspectiveCameras:
    """Batch of N NDC perspective cameras.

    Attributes:
        R: (N, 3, 3) row-vector world-to-view rotations.
        T: (N, 3) world-to-view translations.
        focal_length: (N, 2) NDC focal lengths (fx, fy).
        principal_point: (N, 2) NDC principal points (px, py).
    """

    R: jnp.ndarray
    T: jnp.ndarray
    focal_length: jnp.ndarray
    principal_point: jnp.ndarray

    @classmethod
    def create(cls, R=None, T=None, focal_length=None, principal_point=None, n=None):
        """Build cameras with broadcasting + defaults (I, 0, fl=1, pp=0)."""
        for ref in (R, T, focal_length, principal_point):
            if ref is not None:
                n = jnp.asarray(ref).shape[0] if n is None else n
                break
        if n is None:
            raise ValueError("need at least one field or an explicit n")
        if R is None:
            R = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
        if T is None:
            T = jnp.zeros((n, 3))
        if focal_length is None:
            focal_length = jnp.ones((n, 2))
        focal_length = jnp.asarray(focal_length, jnp.float32)
        if focal_length.ndim == 1:
            focal_length = focal_length[:, None]
        if focal_length.shape[-1] == 1:
            focal_length = jnp.broadcast_to(focal_length, (n, 2))
        if principal_point is None:
            principal_point = jnp.zeros((n, 2))
        return cls(
            R=jnp.asarray(R, jnp.float32),
            T=jnp.asarray(T, jnp.float32),
            focal_length=focal_length,
            principal_point=jnp.asarray(principal_point, jnp.float32),
        )

    def __len__(self):
        return self.R.shape[0]


def world_to_view_matrix(cam: PerspectiveCameras) -> jnp.ndarray:
    """(N, 4, 4) row-vector SE3 world-to-view matrices."""
    return se3_matrix(cam.R, cam.T)


@highp
def camera_center(cam: PerspectiveCameras) -> jnp.ndarray:
    """(N, 3) camera centers in world coordinates: C = -T @ R^T."""
    return -jnp.einsum("nj,nkj->nk", cam.T, cam.R)


@highp
def unproject_ndc_points(
    cam: PerspectiveCameras, xy_depth: jnp.ndarray
) -> jnp.ndarray:
    """Unproject per-camera NDC points (N, 3) = (x_ndc, y_ndc, depth) to world.

    Inverse of ``x_ndc = fx * x_view / z + px``:
    ``x_view = (x_ndc - px) * depth / fx``; then view -> world.
    """
    xy = (xy_depth[..., :2] - cam.principal_point) * xy_depth[..., 2:] / cam.focal_length
    view = jnp.concatenate([xy, xy_depth[..., 2:]], axis=-1)
    return jnp.einsum("nj,nkj->nk", view - cam.T, cam.R)


def optical_axes(cam: PerspectiveCameras) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-camera (center, direction) of the optical axis through the
    principal point (reference: util/normalize_cameras.py:53-73 unprojects
    (principal_point, depth=1) and subtracts the camera center)."""
    centers = camera_center(cam)
    pp_depth1 = jnp.concatenate(
        [cam.principal_point, jnp.ones_like(cam.principal_point[..., :1])], axis=-1
    )
    points = unproject_ndc_points(cam, pp_depth1)
    return centers, points - centers


@highp
def cameras_to_opencv(
    cam: PerspectiveCameras, image_size_hw: Tuple[int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Convert NDC cameras to OpenCV (R_cv, t_cv, K) with pixel intrinsics.

    Mirrors PyTorch3D ``opencv_from_cameras_projection`` (used by the
    reference's fundamental-matrix construction,
    util/get_fundamental_matrix.py:26-27): negate the x/y axes (screen flip),
    transpose R to the column-vector convention, and map NDC intrinsics to
    pixels with ``scale = min(h, w) / 2``:

        f_px = f_ndc * scale,  c_px = -p_ndc * scale + [w/2, h/2]

    Returns:
        R_cv: (N, 3, 3) column-vector rotations (``x_cam = R_cv x_world + t``).
        t_cv: (N, 3).
        K:    (N, 3, 3) pixel intrinsic matrices.
    """
    h, w = image_size_hw
    flip = jnp.asarray([-1.0, -1.0, 1.0], dtype=cam.R.dtype)
    # Negate the first two columns of R / components of T, then transpose.
    R_cv = jnp.swapaxes(cam.R * flip[None, None, :], -1, -2)
    t_cv = cam.T * flip[None, :]

    scale = min(h, w) / 2.0
    c0 = jnp.asarray([w / 2.0, h / 2.0], dtype=cam.R.dtype)
    principal_px = -cam.principal_point * scale + c0
    focal_px = cam.focal_length * scale

    n = cam.R.shape[0]
    zeros = jnp.zeros((n,), dtype=cam.R.dtype)
    ones = jnp.ones((n,), dtype=cam.R.dtype)
    K = jnp.stack(
        [
            jnp.stack([focal_px[:, 0], zeros, principal_px[:, 0]], axis=-1),
            jnp.stack([zeros, focal_px[:, 1], principal_px[:, 1]], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return R_cv, t_cv, K


# ---------------------------------------------------------------------------
# NDC <-> pixel intrinsics adjustment (crop / rescale), used by the datasets.
# Reference: util/camera_transform.py:20-61.
# ---------------------------------------------------------------------------


def ndc_to_pixel_intrinsics(focal_length, principal_point, image_size_wh):
    """NDC intrinsics -> pixel intrinsics for an image of size (w, h)."""
    focal_length = jnp.asarray(focal_length, jnp.float32)
    principal_point = jnp.asarray(principal_point, jnp.float32)
    image_size_wh = jnp.asarray(image_size_wh, jnp.float32)
    half = image_size_wh / 2.0
    rescale = jnp.min(half, axis=-1, keepdims=half.ndim > 1)
    principal_px = half - principal_point * rescale
    focal_px = focal_length * rescale
    return focal_px, principal_px


def pixel_to_ndc_intrinsics(focal_px, principal_px, image_size_wh):
    """Pixel intrinsics -> NDC intrinsics for an image of size (w, h)."""
    focal_px = jnp.asarray(focal_px, jnp.float32)
    principal_px = jnp.asarray(principal_px, jnp.float32)
    image_size_wh = jnp.asarray(image_size_wh, jnp.float32)
    half = image_size_wh / 2.0
    rescale = jnp.min(half, axis=-1, keepdims=half.ndim > 1)
    principal_point = (half - principal_px) / rescale
    focal_length = focal_px / rescale
    return focal_length, principal_point


def adjust_intrinsics_to_bbox_crop(
    focal_length, principal_point, image_size_wh, bbox_xywh
):
    """NDC intrinsics of the full image -> NDC intrinsics of a bbox crop."""
    bbox_xywh = jnp.asarray(bbox_xywh, jnp.float32)
    focal_px, principal_px = ndc_to_pixel_intrinsics(
        focal_length, principal_point, image_size_wh
    )
    principal_px_cropped = principal_px - bbox_xywh[..., :2]
    return pixel_to_ndc_intrinsics(focal_px, principal_px_cropped, bbox_xywh[..., 2:])


def adjust_intrinsics_to_image_scale(
    focal_length, principal_point, original_size_wh, new_size_wh
):
    """NDC intrinsics after resizing the image to ``new_size_wh``."""
    original_size_wh = jnp.asarray(original_size_wh, jnp.float32)
    new_size_wh = jnp.asarray(new_size_wh, jnp.float32)
    focal_px, principal_px = ndc_to_pixel_intrinsics(
        focal_length, principal_point, original_size_wh
    )
    scale = jnp.min(new_size_wh / original_size_wh, axis=-1, keepdims=new_size_wh.ndim > 1)
    return pixel_to_ndc_intrinsics(
        focal_px * scale, principal_px * scale, new_size_wh
    )
