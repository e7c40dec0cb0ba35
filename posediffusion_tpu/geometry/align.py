"""7-DoF (similarity) camera alignment, Umeyama-style.

Replaces PyTorch3D ``corresponding_cameras_alignment(mode="extrinsics")``
used by the reference demo for the ARE metric
(reference: pose_diffusion/demo.py:127-129).

Model: find a world-frame similarity  y = s * x @ Q + t  (row-vector
convention) such that the source cameras, re-expressed in the target world
frame, best match the target cameras.  Re-expressing camera i under that
similarity gives

    R_i' = Q^T R_i          (orthogonal Procrustes over the rotation set)
    T_i' = s T_i - t @ R_i'

so view-space distances scale by s, exactly like PyTorch3D's
``_apply_similarity_transform``.
"""

from __future__ import annotations

import jax.numpy as jnp

from posediffusion_tpu.utils.precision import highp

from posediffusion_tpu.geometry.cameras import PerspectiveCameras, camera_center


def _procrustes_rotation(A: jnp.ndarray) -> jnp.ndarray:
    """Proper rotation M maximizing trace(M A) (projection onto SO(3))."""
    U, _, Vt = jnp.linalg.svd(A)
    det = jnp.linalg.det((U @ Vt).T)
    # Flip the last singular direction if det < 0 so M is a proper rotation.
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], A.dtype)).at[2, 2].set(det)
    return (U @ D @ Vt).T


@highp
def align_cameras(
    cameras_src: PerspectiveCameras,
    cameras_tgt: PerspectiveCameras,
    estimate_scale: bool = True,
    eps: float = 1e-9,
) -> PerspectiveCameras:
    """Align source cameras onto target cameras with a 7-DoF similarity.

    Returns the source cameras re-expressed in the target world frame.
    """
    # --- rotation: find M ~= Q_world^T with M R_src_i ~= R_tgt_i, i.e. M
    # maximizes trace(M sum_i R_src_i R_tgt_i^T).
    A = jnp.einsum("nij,nkj->ik", cameras_src.R, cameras_tgt.R)
    M = _procrustes_rotation(A)
    R_aligned = jnp.einsum("ij,njk->nik", M, cameras_src.R)

    # --- scale + translation from camera centers:
    # s * C_src_i @ Q_world + t ~= C_tgt_i, with Q_world = M^T.
    c_src = camera_center(cameras_src) @ M.T
    c_tgt = camera_center(cameras_tgt)
    mu_src = jnp.mean(c_src, axis=0)
    mu_tgt = jnp.mean(c_tgt, axis=0)
    cs = c_src - mu_src
    ct = c_tgt - mu_tgt
    if estimate_scale:
        s = jnp.sum(cs * ct) / jnp.maximum(jnp.sum(cs * cs), eps)
    else:
        s = jnp.asarray(1.0, cameras_src.R.dtype)
    t = mu_tgt - s * mu_src

    # New extrinsics: center C' = s C Q + t and R' as above =>
    # T' = -C' @ R' = s T_src - t @ R'.
    T_aligned = s * cameras_src.T - jnp.einsum("j,njk->nk", t, R_aligned)

    return cameras_src.replace(R=R_aligned, T=T_aligned)
