"""GT camera canonicalization for training.

Replaces the reference's PyTorch3D-based normalization
(reference: pose_diffusion/util/normalize_cameras.py:15-148):

1. find the least-squares intersection of all optical axes, translate the
   world origin there,
2. scale the world so the first camera sits at distance 1,
3. optionally re-gauge so camera 0 has extrinsics [I | 0]
   (``first_camera_transform``),
4. optionally rescale translations (Re10K's ``normalize_T`` path).

All branches are expressed with ``jnp.where`` so the function jits with
static shapes (the reference's Python `if scale == 0` degenerate branch
becomes a select).
"""

from __future__ import annotations

import jax.numpy as jnp

from posediffusion_tpu.utils.precision import highp

from posediffusion_tpu.geometry.cameras import PerspectiveCameras, optical_axes
from posediffusion_tpu.geometry.lines import intersect_skew_lines


@highp
def compute_optical_axis_intersection(cam: PerspectiveCameras):
    """Intersection point of the cameras' optical axes and its distance to
    each camera center."""
    centers, directions = optical_axes(cam)
    p_intersect, _ = intersect_skew_lines(centers, directions)
    dist = jnp.linalg.norm(p_intersect[None, :] - centers, axis=-1)
    return p_intersect, dist


@highp
def first_camera_transform(
    cam: PerspectiveCameras, rotation_only: bool = False
) -> PerspectiveCameras:
    """Re-gauge the world so camera 0 has extrinsics [I | 0].

    In the row-vector convention, composing ``g^-1`` (with g = cam0's
    world-to-view) in front of every world-to-view yields
    R_i' = R_0^T R_i and T_i' = T_i - T_0 R_0^T R_i.
    """
    R0_t = cam.R[0].T
    if rotation_only:
        new_R = jnp.einsum("ij,njk->nik", R0_t, cam.R)
        new_T = cam.T
    else:
        new_R = jnp.einsum("ij,njk->nik", R0_t, cam.R)
        new_T = cam.T - jnp.einsum("j,njk->nk", cam.T[0], new_R)
    return cam.replace(R=new_R, T=new_T)


def normalize_translation_scale(cam: PerspectiveCameras) -> PerspectiveCameras:
    """Re10K extra T normalization (reference: normalize_cameras.py:118-128):
    divide all T by clamp(|T[1:]| / sqrt(N-1) / 2, 0.01, 100)."""
    t = cam.T[1:]
    scale = jnp.linalg.norm(t) / jnp.sqrt(jnp.asarray(t.shape[0], cam.T.dtype))
    scale = jnp.clip(scale / 2.0, 0.01, 100.0)
    return cam.replace(T=cam.T / scale)


@highp
def normalize_cameras(
    cam: PerspectiveCameras,
    compute_optical: bool = True,
    first_camera: bool = True,
    normalize_T: bool = False,
) -> PerspectiveCameras:
    """Canonicalize a camera batch (see module docstring)."""
    if compute_optical:
        p_intersect, dist = compute_optical_axis_intersection(cam)
        scale = dist[0]

        # Non-degenerate path: translate origin to the intersection point and
        # divide translations by the first camera's distance.  Composing the
        # world translation t in front of world-to-view adds p_intersect @ R_i
        # to T_i (row convention).
        new_T_main = (cam.T + jnp.einsum("j,njk->nk", p_intersect, cam.R)) / jnp.maximum(
            scale, 1e-12
        )

        # Degenerate path (scale == 0): divide T by sqrt(|T|_F) as the
        # reference does.
        fallback_scale = jnp.sqrt(jnp.maximum(jnp.linalg.norm(cam.T), 1e-12))
        new_T_fallback = cam.T / fallback_scale

        degenerate = scale == 0
        new_T = jnp.where(degenerate, new_T_fallback, new_T_main)
        cam = cam.replace(T=new_T)
    else:
        scale = jnp.sqrt(jnp.maximum(jnp.linalg.norm(cam.T), 1e-12))
        cam = cam.replace(T=cam.T / scale)

    if first_camera:
        cam = first_camera_transform(cam)

    if normalize_T:
        cam = normalize_translation_scale(cam)

    return cam
