"""Essential / fundamental matrices and the Sampson epipolar error.

Replaces the reference's PyTorch3D-based construction
(reference: pose_diffusion/util/get_fundamental_matrix.py:14-51 and the
Sampson residual in util/geometry_guided_sampling.py:129-172) with pure
``jnp`` so GGS can differentiate end-to-end with ``jax.grad``.

Convention: with OpenCV extrinsics (x_cam = R x_world + t), the fundamental
matrix between camera 1 and camera 2 satisfies ``p2^T F p1 = 0`` for pixel
homogeneous correspondences p1 <-> p2.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from posediffusion_tpu.utils.precision import highp

from posediffusion_tpu.geometry.cameras import PerspectiveCameras, cameras_to_opencv


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) vectors: hat(v) @ w = v x w."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


@highp
def essential_matrix(R1, t1, R2, t2) -> jnp.ndarray:
    """Essential matrix from two OpenCV extrinsics batches (..., 3, 3)/(..., 3).

    E = R12 @ hat(-R12^T t12) with the relative pose R12 = R2 R1^T,
    t12 = t2 - R12 t1 (same composition as the reference,
    util/get_fundamental_matrix.py:45-51).
    """
    R12 = jnp.matmul(R2, jnp.swapaxes(R1, -1, -2))
    t12 = t2 - jnp.matmul(R12, t1[..., None])[..., 0]
    E_t = -jnp.matmul(jnp.swapaxes(R12, -1, -2), t12[..., None])[..., 0]
    return jnp.matmul(R12, hat(E_t))


@highp
def fundamental_matrix(K1, R1, t1, K2, R2, t2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """F = K2^-T E K1^-1 so that p2^T F p1 = 0."""
    E = essential_matrix(R1, t1, R2, t2)
    K1_inv = jnp.linalg.inv(K1)
    K2_inv_T = jnp.swapaxes(jnp.linalg.inv(K2), -1, -2)
    F = jnp.matmul(K2_inv_T, jnp.matmul(E, K1_inv))
    return F, E


def _intrinsics_inverse(K: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of calibration matrices [[fx,0,cx],[0,fy,cy],[0,0,1]].

    Avoids the LU factorization (and its backward pass) of a general
    ``jnp.linalg.inv`` — this sits on the GGS hot loop, which runs thousands
    of sequential tiny iterations where per-op cost dominates.
    """
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    inv_fx = 1.0 / fx
    inv_fy = 1.0 / fy
    return jnp.stack(
        [
            jnp.stack([inv_fx, zero, -cx * inv_fx], axis=-1),
            jnp.stack([zero, inv_fy, -cy * inv_fy], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


@highp
def get_fundamental_matrices(
    cam: PerspectiveCameras,
    height: int,
    width: int,
    index1: jnp.ndarray,
    index2: jnp.ndarray,
    l2_normalize_F: bool = False,
) -> jnp.ndarray:
    """Per-pair fundamental matrices for an NDC camera batch.

    ``index1``/``index2`` are (P,) frame indices; the output is (P, 3, 3)
    with ``p2^T F p1 = 0`` in pixel coordinates of an (height, width) image.
    """
    R_cv, t_cv, K = cameras_to_opencv(cam, (height, width))
    E = essential_matrix(R_cv[index1], t_cv[index1], R_cv[index2], t_cv[index2])
    K_inv = _intrinsics_inverse(K)
    K1_inv = K_inv[index1]
    K2_inv_T = jnp.swapaxes(K_inv[index2], -1, -2)
    F = jnp.matmul(K2_inv_T, jnp.matmul(E, K1_inv))
    if l2_normalize_F:
        scale = jnp.maximum(
            jnp.linalg.norm(F, axis=(-2, -1), keepdims=True), 1e-4
        )
        F = F / scale
    return F


@highp
def sampson_distance(
    F: jnp.ndarray, kp1_homo: jnp.ndarray, kp2_homo: jnp.ndarray
) -> jnp.ndarray:
    """First-order geometric (Sampson) distance of correspondences.

    Args:
        F: (M, 3, 3) per-match fundamental matrices, convention
           ``kp1^T F kp2 = 0`` (note: the reference transposes its pairwise F
           before this step, util/geometry_guided_sampling.py:152-154).
        kp1_homo / kp2_homo: (M, 3) homogeneous pixel keypoints.

    Returns:
        (M,) Sampson distances:
        (kp1^T F kp2)^2 / ((F^T kp1)_x^2 + (F^T kp1)_y^2 + (F kp2)_x^2 + (F kp2)_y^2)
    """
    left = jnp.einsum("mi,mij->mj", kp1_homo, F)  # kp1^T F
    right = jnp.einsum("mij,mj->mi", F, kp2_homo)  # F kp2
    top = jnp.square(jnp.einsum("mj,mj->m", left, kp2_homo))
    bottom = (
        jnp.square(left[:, 0])
        + jnp.square(left[:, 1])
        + jnp.square(right[:, 0])
        + jnp.square(right[:, 1])
    )
    # Guard against the degenerate F = 0 case (e.g. padded matches gathered
    # from a self-pair): 0/0 would NaN the *gradient* even when the value is
    # masked downstream.  Real matches have bottom >> 1e-12, so this is inert.
    return top / jnp.maximum(bottom, 1e-12)
