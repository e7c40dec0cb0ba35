"""Pose encoding codec: ``absT_quaR_logFL``.

9 dims per frame = T(3) || quaternion wxyz(4) || log focal length(2), with a
log-FL bias of 1.8 and focal clamping to [0.1, 20]
(reference: pose_diffusion/util/camera_transform.py:64-129).

Both directions are differentiable: GGS back-propagates through
``pose_encoding_to_camera`` (the quaternion need not be unit — see
``quaternion_to_matrix``).  The clamp uses a straight ``jnp.clip`` whose
gradient is zero outside the bounds, same as torch's ``clamp``.
"""

from __future__ import annotations

import jax.numpy as jnp

from posediffusion_tpu.geometry.cameras import PerspectiveCameras
from posediffusion_tpu.geometry.quaternions import matrix_to_quaternion, quaternion_to_matrix

POSE_DIM = 9
LOG_FL_BIAS = 1.8
MIN_FL = 0.1
MAX_FL = 20.0


def pose_encoding_to_camera(
    pose_encoding: jnp.ndarray,
    pose_encoding_type: str = "absT_quaR_logFL",
    log_focal_length_bias: float = LOG_FL_BIAS,
    min_focal_length: float = MIN_FL,
    max_focal_length: float = MAX_FL,
) -> PerspectiveCameras:
    """Decode (..., 9) pose encodings into a flat camera batch.

    Leading dims are flattened: a (B, N, 9) input yields B*N cameras, matching
    the reference's reshape semantics.
    """
    if pose_encoding_type != "absT_quaR_logFL":
        raise ValueError(f"Unknown pose encoding {pose_encoding_type}")
    enc = pose_encoding.reshape(-1, pose_encoding.shape[-1])
    abs_T = enc[:, :3]
    quat = enc[:, 3:7]
    R = quaternion_to_matrix(quat)
    focal = jnp.exp(enc[:, 7:9] + log_focal_length_bias)
    focal = jnp.clip(focal, min_focal_length, max_focal_length)
    return PerspectiveCameras(
        R=R,
        T=abs_T,
        focal_length=focal,
        principal_point=jnp.zeros_like(focal),
    )


def camera_to_pose_encoding(
    camera: PerspectiveCameras,
    pose_encoding_type: str = "absT_quaR_logFL",
    log_focal_length_bias: float = LOG_FL_BIAS,
    min_focal_length: float = MIN_FL,
    max_focal_length: float = MAX_FL,
) -> jnp.ndarray:
    """Encode a flat camera batch into (num_cameras, 9) pose encodings."""
    if pose_encoding_type != "absT_quaR_logFL":
        raise ValueError(f"Unknown pose encoding {pose_encoding_type}")
    quat = matrix_to_quaternion(camera.R)
    log_fl = (
        jnp.log(jnp.clip(camera.focal_length, min_focal_length, max_focal_length))
        - log_focal_length_bias
    )
    return jnp.concatenate([camera.T, quat, log_fl], axis=-1)
