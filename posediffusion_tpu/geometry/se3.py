"""SE(3) helpers in the row-vector convention.

A world-to-view transform maps points as ``x_view = x_world @ R + T`` and its
4x4 matrix therefore carries the translation in the **last row**:

    [[ R  0 ]
     [ T  1 ]]

This matches the convention the reference inherits from PyTorch3D
(reference: pose_diffusion/util/metric.py:40-46 builds such matrices through
``get_world_to_view_transform().get_matrix()``); getting it wrong silently
flips every relative pose, so it is pinned down here once.
"""

from __future__ import annotations

import jax.numpy as jnp

from posediffusion_tpu.utils.precision import highp


def se3_matrix(R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Build (..., 4, 4) row-vector SE3 matrices from R (..., 3, 3), T (..., 3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], T.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    T = jnp.broadcast_to(T, batch + (3,))
    top = jnp.concatenate([R, jnp.zeros(batch + (3, 1), R.dtype)], axis=-1)
    bottom = jnp.concatenate(
        [T[..., None, :], jnp.ones(batch + (1, 1), R.dtype)], axis=-1
    )
    return jnp.concatenate([top, bottom], axis=-2)


@highp
def se3_inverse(se3: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 4, 4) row-vector SE3 matrices.

    Avoids a general matrix inverse (reference: util/metric.py:119-143 uses the
    same closed form for numerical robustness): inv = [[R^T, 0], [-T R^T, 1]].
    """
    R = se3[..., :3, :3]
    T = se3[..., 3:4, :3]
    R_t = jnp.swapaxes(R, -1, -2)
    new_T = -jnp.matmul(T, R_t)
    top = jnp.concatenate([R_t, se3[..., :3, 3:]], axis=-1)
    bottom = jnp.concatenate([new_T, se3[..., 3:4, 3:]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


@highp
def se3_compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose row-vector SE3s: point @ (a ∘ b) == (point @ a) @ b."""
    return jnp.matmul(a, b)


@highp
def transform_points(points: jnp.ndarray, se3: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) row-vector SE3 to points (..., N, 3)."""
    R = se3[..., :3, :3]
    T = se3[..., 3:4, :3]
    return jnp.matmul(points, R) + T


@highp
def relative_se3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a^-1 ∘ b for row-vector SE3 matrices (..., 4, 4)."""
    return jnp.matmul(se3_inverse(a), b)
