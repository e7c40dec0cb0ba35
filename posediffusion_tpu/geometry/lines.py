"""Least-squares intersection of skew lines.

Replaces the reference's lstsq-based solver
(reference: pose_diffusion/util/normalize_cameras.py:24-41), which finds the
point minimizing the summed squared distance to a bundle of 3D lines
(https://en.wikipedia.org/wiki/Skew_lines, n-dimensional case):

    sum_i (I - r_i r_i^T) p = sum_i (I - r_i r_i^T) p_i

Pure ``jnp``; the solve uses ``jnp.linalg.lstsq`` (XLA QR, replacing the
LAPACK path noted in SURVEY.md N8).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from posediffusion_tpu.utils.precision import highp


@highp
def intersect_skew_lines(
    p: jnp.ndarray, r: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares intersection point of lines (points p, directions r).

    Args:
        p: (..., N, D) points on each line.
        r: (..., N, D) direction vectors (normalized internally).
        mask: optional (..., N) weights; masked-out lines are ignored.

    Returns:
        (intersection (..., D), normalized directions (..., N, D)).
    """
    dim = p.shape[-1]
    if mask is None:
        mask = jnp.ones(p.shape[:-1], dtype=p.dtype)
    r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-12)

    eye = jnp.eye(dim, dtype=p.dtype)
    proj = eye - r[..., :, None] * r[..., None, :]  # (..., N, D, D)
    proj = proj * mask[..., None, None]
    rhs = jnp.einsum("...nij,...nj->...i", proj, p)
    lhs = jnp.sum(proj, axis=-3)
    # Batched least-squares via pinv (jnp.linalg.lstsq does not batch); for the
    # generic full-rank case this equals the lstsq solution.
    solution = jnp.einsum("...ij,...j->...i", jnp.linalg.pinv(lhs), rhs)
    return solution, r


def point_line_distance(
    p1: jnp.ndarray, r1: jnp.ndarray, p2: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distance from points p2 to lines (p1, r1) and the nearest line points."""
    df = p2 - p1
    proj_vector = df - jnp.sum(df * r1, axis=-1, keepdims=True) * r1
    nearest = p2 - proj_vector
    return jnp.linalg.norm(proj_vector, axis=-1), nearest
