"""Quaternion <-> rotation-matrix conversions (wxyz convention).

Semantics match the PyTorch3D conversions the reference relies on
(reference: pose_diffusion/util/camera_transform.py:9 imports
pytorch3d.transforms.rotation_conversions.{matrix_to_quaternion,
quaternion_to_matrix}).  Two properties matter for parity:

* ``quaternion_to_matrix`` implicitly normalizes the quaternion through the
  ``2 / |q|^2`` scale, so non-unit quaternions (which occur mid-diffusion and
  inside GGS gradient steps) still map to valid rotations, and the map is
  differentiable in the un-normalized inputs.
* ``matrix_to_quaternion`` selects the numerically stable candidate among the
  four +/- component roots, so round trips hold up to sign (q == -q).

Pure ``jnp``; safe under ``jit``/``vmap``/``grad``.
"""

from __future__ import annotations

import jax.numpy as jnp


def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Convert quaternions (..., 4) wxyz to rotation matrices (..., 3, 3)."""
    w, x, y, z = (quaternions[..., i] for i in range(4))
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)

    m = jnp.stack(
        [
            1.0 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1.0 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1.0 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a zero subgradient at x <= 0."""
    positive = x > 0
    safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), 0.0)


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Convert rotation matrices (..., 3, 3) to quaternions (..., 4) wxyz.

    Picks, per element, the candidate derived from the largest of the four
    diagonal combinations, which is the numerically best-conditioned one.
    """
    batch_shape = matrix.shape[:-2]
    flat = matrix.reshape(batch_shape + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = (flat[..., i] for i in range(9))

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    # Candidate quaternions scaled by 2*q_abs[i]; rows indexed by which
    # component's magnitude anchors the reconstruction.
    quat_by_wxyz = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    quat_candidates = quat_by_wxyz / (2.0 * jnp.maximum(q_abs[..., None], 0.1))

    best = jnp.argmax(q_abs, axis=-1)
    return jnp.take_along_axis(
        quat_candidates, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]


def quaternion_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions (..., 4) wxyz."""
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_invert(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a unit quaternion (conjugate)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Force a non-negative real part (q and -q encode the same rotation)."""
    return jnp.where(q[..., :1] < 0, -q, q)
