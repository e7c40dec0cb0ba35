"""Pairwise relative-pose error metrics (Racc/Tacc/AUC/ARE).

Replaces the reference metric stack (pose_diffusion/util/metric.py:14-192)
with pure ``jnp``: relative SE3s via the closed-form inverse, geodesic
rotation angles with linear acos extrapolation near +-1 (matching PyTorch3D
``so3_relative_angle(eps=1e-4)``), translation direction angles, and the
AUC@threshold (mAA) histogram statistic.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from posediffusion_tpu.utils.precision import highp
import numpy as np

from posediffusion_tpu.geometry.cameras import PerspectiveCameras, world_to_view_matrix
from posediffusion_tpu.geometry.se3 import se3_inverse


def batched_all_pairs(B: int, N: int) -> Tuple[np.ndarray, np.ndarray]:
    """All unordered frame pairs within each of B sequences of length N,
    flattened into indices over the (B*N,) frame axis."""
    i1, i2 = np.triu_indices(N, k=1)
    offs = np.arange(B)[:, None] * N
    return (i1[None] + offs).reshape(-1), (i2[None] + offs).reshape(-1)


def _acos_linear_extrapolation(x: jnp.ndarray, bound: float = 1.0 - 1e-4) -> jnp.ndarray:
    """acos clamped to [-bound, bound] with linear extrapolation outside,
    keeping the metric finite and differentiable at the boundaries."""
    inside = jnp.clip(x, -bound, bound)
    acos_inside = jnp.arccos(inside)
    dacos = -1.0 / jnp.sqrt(1.0 - bound * bound)
    upper = jnp.arccos(bound) + (x - bound) * dacos
    lower = jnp.arccos(-bound) + (x + bound) * dacos
    return jnp.where(x > bound, upper, jnp.where(x < -bound, lower, acos_inside))


@highp
def rotation_angle_deg(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between rotation batches (..., 3, 3), in degrees."""
    R12 = jnp.matmul(R1, jnp.swapaxes(R2, -1, -2))
    trace = jnp.trace(R12, axis1=-2, axis2=-1)
    cos = (trace - 1.0) * 0.5
    return _acos_linear_extrapolation(cos) * (180.0 / jnp.pi)


def translation_angle_deg(
    t1: jnp.ndarray, t2: jnp.ndarray, eps: float = 1e-15, default_err: float = 1e6
) -> jnp.ndarray:
    """Angle between translation directions (..., 3), in degrees.

    Matches the reference's formulation (metric.py:169-180):
    acos(sqrt(1 - clamp(1 - <t1_hat, t2_hat>^2))), with NaN/Inf mapped to a
    large default error.
    """
    t1n = t1 / (jnp.linalg.norm(t1, axis=-1, keepdims=True) + eps)
    t2n = t2 / (jnp.linalg.norm(t2, axis=-1, keepdims=True) + eps)
    loss_t = jnp.maximum(1.0 - jnp.sum(t1n * t2n, axis=-1) ** 2, eps)
    err = jnp.arccos(jnp.sqrt(1.0 - loss_t))
    err = jnp.where(jnp.isfinite(err), err, default_err)
    return err * (180.0 / jnp.pi)


@highp
def camera_to_rel_deg(
    pred: PerspectiveCameras, gt: PerspectiveCameras, batch_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise relative rotation / translation errors in degrees.

    Cameras are flat (B*N) batches; pairs are formed within each of the B
    sequences (reference: metric.py:14-48).
    """
    gt_se3 = world_to_view_matrix(gt)
    pred_se3 = world_to_view_matrix(pred)
    n_frames = gt_se3.shape[0] // batch_size
    i1, i2 = batched_all_pairs(batch_size, n_frames)

    rel_gt = jnp.matmul(se3_inverse(gt_se3[i1]), gt_se3[i2])
    rel_pred = jnp.matmul(se3_inverse(pred_se3[i1]), pred_se3[i2])

    r_deg = rotation_angle_deg(rel_gt[:, :3, :3], rel_pred[:, :3, :3])
    t_deg = translation_angle_deg(rel_gt[:, 3, :3], rel_pred[:, 3, :3])
    return r_deg, t_deg


def calculate_auc(
    r_error: jnp.ndarray,
    t_error: jnp.ndarray,
    max_threshold: int = 30,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """AUC@threshold (a.k.a. mAA): mean of the cumulative histogram of
    max(r_err, t_err) over integer-degree bins (reference: metric.py:51-108).

    ``weights`` (same shape as the errors, typically a 0/1 pair-validity mask
    from frame padding) restricts the statistic to valid pairs: the histogram
    counts and the normalizer both use the weights, so padded pairs cannot
    bias the result.
    """
    max_errors = jnp.maximum(r_error, t_error)
    if weights is None:
        w = jnp.ones_like(max_errors)
    else:
        w = weights.astype(max_errors.dtype)
    bins = jnp.arange(max_threshold + 1, dtype=max_errors.dtype)
    # histogram over [0,1), [1,2), ..., [th-1, th) like np.histogram
    in_bin = (max_errors[None, :] >= bins[:-1, None]) & (
        max_errors[None, :] < bins[1:, None]
    )
    # np.histogram's last bin is closed: [th-1, th]
    last = (max_errors >= bins[-2]) & (max_errors <= bins[-1])
    hist = jnp.sum(in_bin * w[None, :], axis=-1)
    hist = hist.at[-1].set(jnp.sum(last * w))
    normalized = hist / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(jnp.cumsum(normalized))


def calculate_auc_np(r_error: np.ndarray, t_error: np.ndarray, max_threshold: int = 30) -> float:
    """NumPy twin of :func:`calculate_auc` for host-side eval accumulation."""
    max_errors = np.maximum(np.asarray(r_error), np.asarray(t_error))
    bins = np.arange(max_threshold + 1)
    histogram, _ = np.histogram(max_errors, bins=bins)
    normalized = histogram.astype(float) / len(max_errors)
    return float(np.mean(np.cumsum(normalized)))


def compute_are(rotation1: np.ndarray, rotation2: np.ndarray) -> np.ndarray:
    """Absolute rotation error in degrees after alignment, folded at 180
    (reference: metric.py:182-192)."""
    r1 = np.asarray(rotation1)
    r2 = np.asarray(rotation2)
    R_rel = np.einsum("bij,bjk->bik", r1.transpose(0, 2, 1), r2)
    t = (np.trace(R_rel, axis1=1, axis2=2) - 1.0) / 2.0
    theta = np.arccos(np.clip(t, -1.0, 1.0))
    error = theta * 180.0 / np.pi
    return np.minimum(error, np.abs(180.0 - error))
