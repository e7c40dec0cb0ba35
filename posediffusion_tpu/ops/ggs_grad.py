"""Hand-derived Sampson loss + gradient for the GGS hot loop.

The GGS conditioning runs ~7000 sequential SGD iterations per inference;
under autodiff each iteration lowers to dozens of small XLA kernels whose
fixed per-op cost dominates (~2.4 ms/iter on v5e).  This module restates the
loss with

* a **pair-grouped match layout** (P = n(n-1)/2 pair slots x Q matches per
  slot, padded) so every array is either (P, Q) or (P,) — no gathers and no
  segment reductions, and
* **manual adjoints** for the whole chain (pose encoding -> quaternion
  rotation -> OpenCV flip -> relative pose -> essential -> fundamental ->
  Sampson -> masked mean), written componentwise so the same code runs
  unchanged inside a Pallas kernel (no autodiff available there).

Semantics match diffusion.ggs.compute_sampson_loss exactly: tied mean focal
length, zero principal point, stop-gradient flags per parameter block,
residuals >= sampson_max dropped, mean over contributing matches.
``tests/test_ggs_kernel.py`` pins value and gradient against
``jax.value_and_grad`` of the reference formulation.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posediffusion_tpu.geometry.pose_codec import LOG_FL_BIAS, MAX_FL, MIN_FL


def _mm(a, b):
    """Matmul with full f32 precision (Pallas-safe).

    ``precision=HIGHEST`` matters, not just the accumulator dtype: these
    matmuls are one-hot frame gathers (B1/B2 selectors against per-frame
    R/t tables), and the MXU's default bf16 input truncation injects ~1e-3
    relative error into every gathered rotation — which the GGS momentum
    loop then amplifies into a visibly worse optimum than the ``@highp``
    XLA autodiff path (measured on v5e: sampson 0.61 fused vs 0.11 XLA
    after 100 iters before this pin)."""
    return jnp.dot(
        a, b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


class GroupedMatches(NamedTuple):
    """Pair-grouped padded matches.

    kp1/kp2: (P, Q, 3) homogeneous pixel keypoints.
    valid: (P, Q) float32 0/1.
    B1/B2: (P, N) one-hot frame-selection matrices for each pair's first /
        second frame (gathers become tiny matmuls).
    """

    kp1: jnp.ndarray
    kp2: jnp.ndarray
    valid: jnp.ndarray
    B1: jnp.ndarray
    B2: jnp.ndarray


def pack_matches_grouped(
    kp1: np.ndarray,
    kp2: np.ndarray,
    i12: np.ndarray,
    n_frames: int,
    q_pad: int = None,
) -> GroupedMatches:
    """Group host-side matches by ordered pair and pad each group to Q."""
    P = n_frames * (n_frames - 1) // 2
    pair_rows = {}
    idx = 0
    pair_index = np.zeros((n_frames, n_frames), np.int64)
    pi1 = np.zeros(P, np.int64)
    pi2 = np.ones(P, np.int64)
    for a in range(n_frames):
        for b in range(a + 1, n_frames):
            pair_index[a, b] = idx
            pi1[idx], pi2[idx] = a, b
            idx += 1

    i12 = np.asarray(i12)
    if len(i12) and not np.all(i12[:, 0] < i12[:, 1]):
        raise ValueError(
            "pack_matches_grouped requires ordered pairs (i12[:, 0] < i12[:, 1]); "
            "unordered rows would be silently binned into pair slot 0"
        )
    slots = pair_index[i12[:, 0], i12[:, 1]]
    counts = np.bincount(slots, minlength=P)
    q = int(counts.max()) if len(kp1) else 1
    if q_pad is None:
        q_pad = max(((q + 127) // 128) * 128, 128)
    if q > q_pad:
        raise ValueError(f"q_pad={q_pad} < max matches per pair {q}")

    kp1g = np.zeros((P, q_pad, 3), np.float32)
    kp2g = np.zeros((P, q_pad, 3), np.float32)
    kp1g[..., 2] = 1.0  # homogeneous padding avoids 0/0 (see diffusion.ggs)
    kp2g[..., 2] = 1.0
    valid = np.zeros((P, q_pad), np.float32)
    fill = np.zeros(P, np.int64)
    for m in range(len(kp1)):
        p = slots[m]
        j = fill[p]
        kp1g[p, j, :2] = kp1[m]
        kp2g[p, j, :2] = kp2[m]
        valid[p, j] = 1.0
        fill[p] += 1

    B1 = np.zeros((P, n_frames), np.float32)
    B2 = np.zeros((P, n_frames), np.float32)
    B1[np.arange(P), pi1] = 1.0
    B2[np.arange(P), pi2] = 1.0
    return GroupedMatches(
        kp1=jnp.asarray(kp1g),
        kp2=jnp.asarray(kp2g),
        valid=jnp.asarray(valid),
        B1=jnp.asarray(B1),
        B2=jnp.asarray(B2),
    )


def pad_grouped_pairs(gm: GroupedMatches, multiple: int) -> GroupedMatches:
    """Pad the pair axis P to a multiple of ``multiple`` with inert rows.

    Pad rows mirror an empty real pair slot: B1/B2 one-hot at frames 0/1 (so
    every quantity stays finite — an all-zero selector row would divide by a
    zero quaternion norm) and valid == 0 (so they contribute nothing to the
    loss, count, or gradient)."""
    P = gm.kp1.shape[0]
    pad = (-P) % multiple
    if pad == 0:
        return gm
    n_frames = gm.B1.shape[1]
    kp_pad = np.zeros((pad,) + gm.kp1.shape[1:], np.float32)
    kp_pad[..., 2] = 1.0
    b1 = np.zeros((pad, n_frames), np.float32)
    b2 = np.zeros((pad, n_frames), np.float32)
    b1[:, 0] = 1.0
    b2[:, min(1, n_frames - 1)] = 1.0
    cat = lambda a, b: jnp.concatenate([a, jnp.asarray(b)], axis=0)
    return GroupedMatches(
        kp1=cat(gm.kp1, kp_pad),
        kp2=cat(gm.kp2, kp_pad),
        valid=cat(gm.valid, np.zeros((pad, gm.valid.shape[1]), np.float32)),
        B1=cat(gm.B1, b1),
        B2=cat(gm.B2, b2),
    )


def sampson_loss_and_grad(
    x: jnp.ndarray,  # (N, 9) pose encodings for ONE sequence
    gm: GroupedMatches,
    image_hw: Tuple[int, int],
    update_R: bool,
    update_T: bool,
    update_FL: bool,
    sampson_max: float,
):
    """Returns (loss, count, dL/dx) — all closed-form, no autodiff."""
    return loss_and_grad_core(
        x,
        gm.kp1[..., 0], gm.kp1[..., 1], gm.kp2[..., 0], gm.kp2[..., 1],
        gm.valid, gm.B1, gm.B2,
        image_hw, update_R, update_T, update_FL, sampson_max,
    )


def loss_and_grad_core(
    x: jnp.ndarray,  # (N, 9)
    kp1x, kp1y, kp2x, kp2y,  # (P, Q) pixel coordinates (z == 1 implicit)
    valid,  # (P, Q) float 0/1
    B1, B2,  # (P, N) one-hot frame selectors
    image_hw: Tuple[int, int],
    update_R: bool,
    update_T: bool,
    update_FL: bool,
    sampson_max: float,
    normalize: bool = True,
):
    """Component-array form of the loss+grad: pure elementwise/reduce/matmul
    jnp that lowers unchanged inside a Pallas kernel.

    ``normalize=False`` returns the UN-normalized loss sum and gradient
    (denominator 1 instead of the contributing-match count).  The whole
    backward chain is linear in the upstream adjoint, so a caller that
    partitions the (P, Q) match table into chunks can sum per-chunk
    unnormalized gradients and divide once by the global count — this is
    what the pair-chunked Pallas kernel does to stream match tables bigger
    than VMEM (ops/ggs_kernel.ggs_phase_fused_chunked)."""
    N = x.shape[0]
    h, w = image_hw
    f32 = jnp.float32

    T = x[:, 0:3]
    q = x[:, 3:7]
    lf = x[:, 7:9]

    # ---- focal chain: exp -> clamp -> mean tie -> pixel intrinsics
    e_fl = jnp.exp(lf + LOG_FL_BIAS)
    f_cl = jnp.clip(e_fl, MIN_FL, MAX_FL)
    fbar = jnp.mean(f_cl, axis=0)  # (2,)
    s_img = min(h, w) / 2.0
    fx = fbar[0] * s_img
    fy = fbar[1] * s_img
    cx, cy = w / 2.0, h / 2.0
    a = 1.0 / fx
    b = 1.0 / fy
    c = -cx / fx
    d = -cy / fy

    # ---- quaternion -> rotation (row-vector convention)
    qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    n2 = qw * qw + qx * qx + qy * qy + qz * qz
    s = 2.0 / n2
    # M such that R = I + s * M
    M00 = -(qy * qy + qz * qz)
    M01 = qx * qy - qz * qw
    M02 = qx * qz + qy * qw
    M10 = qx * qy + qz * qw
    M11 = -(qx * qx + qz * qz)
    M12 = qy * qz - qx * qw
    M20 = qx * qz - qy * qw
    M21 = qy * qz + qx * qw
    M22 = -(qx * qx + qy * qy)
    R00 = 1.0 + s * M00
    R01 = s * M01
    R02 = s * M02
    R10 = s * M10
    R11 = 1.0 + s * M11
    R12 = s * M12
    R20 = s * M20
    R21 = s * M21
    R22 = 1.0 + s * M22

    # ---- OpenCV conversion: R_cv[i, j] = flip_i * R[j, i]; t_cv = T * flip
    C00, C01, C02 = -R00, -R10, -R20
    C10, C11, C12 = -R01, -R11, -R21
    C20, C21, C22 = R02, R12, R22
    tc0, tc1, tc2 = -T[:, 0], -T[:, 1], T[:, 2]

    # ---- per-pair frame selection (one-hot matmuls, (P, N) @ (N, k))
    Rcv = jnp.stack([C00, C01, C02, C10, C11, C12, C20, C21, C22], axis=-1)
    tcv = jnp.stack([tc0, tc1, tc2], axis=-1)
    R1 = _mm(B1, Rcv)  # (P, 9)
    R2 = _mm(B2, Rcv)
    t1 = _mm(B1, tcv)  # (P, 3)
    t2 = _mm(B2, tcv)

    r1 = [R1[:, k] for k in range(9)]
    r2 = [R2[:, k] for k in range(9)]

    # ---- relative pose: R12[i, j] = sum_k R2[i, k] R1[j, k]
    G = [[sum(r2[3 * i + k] * r1[3 * j + k] for k in range(3)) for j in range(3)]
         for i in range(3)]

    t12 = [t2[:, i] - sum(G[i][k] * t1[:, k] for k in range(3)) for i in range(3)]
    Et = [-sum(G[i][k] * t12[i] for i in range(3)) for k in range(3)]

    # ---- essential: E_i = R12_i x Et (rows)
    E = [
        [
            G[i][1] * Et[2] - G[i][2] * Et[1],
            G[i][2] * Et[0] - G[i][0] * Et[2],
            G[i][0] * Et[1] - G[i][1] * Et[0],
        ]
        for i in range(3)
    ]

    # ---- fundamental (p2^T F p1 = 0): F = Kinv^T E Kinv
    # U = Kinv^T E
    U = [
        [a * E[0][j] for j in range(3)],
        [b * E[1][j] for j in range(3)],
        [c * E[0][j] + d * E[1][j] + E[2][j] for j in range(3)],
    ]
    Fm = [
        [a * U[i][0], b * U[i][1], c * U[i][0] + d * U[i][1] + U[i][2]]
        for i in range(3)
    ]
    # used convention: kp1^T F_used kp2 = 0 => F_used = Fm^T
    Fu = [[Fm[j][i] for j in range(3)] for i in range(3)]

    # ---- Sampson over (P, Q); homogeneous z == 1 as a scalar constant
    k1 = [kp1x, kp1y, 1.0]
    k2 = [kp2x, kp2y, 1.0]
    Fq = [[Fu[i][j][:, None] for j in range(3)] for i in range(3)]

    left = [sum(k1[i] * Fq[i][j] for i in range(3)) for j in range(3)]  # kp1^T F
    right = [sum(Fq[i][j] * k2[j] for j in range(3)) for i in range(3)]  # F kp2
    ev = sum(left[j] * k2[j] for j in range(3))
    top = ev * ev
    bot_raw = left[0] ** 2 + left[1] ** 2 + right[0] ** 2 + right[1] ** 2
    bot = jnp.maximum(bot_raw, 1e-12)
    samp = top / bot

    keep = valid * (samp < sampson_max).astype(f32)
    count = jnp.sum(keep)
    denom = jnp.maximum(count, 1.0) if normalize else jnp.asarray(1.0, f32)
    loss = jnp.sum(keep * samp) / denom

    # ======================== backward (dL = 1) ========================
    dsamp = keep / denom
    dtop = dsamp / bot
    dbot = jnp.where(bot_raw > 1e-12, -dsamp * top / (bot * bot), 0.0)
    dev = 2.0 * ev * dtop
    dleft = [
        dev * k2[0] + 2.0 * left[0] * dbot,
        dev * k2[1] + 2.0 * left[1] * dbot,
        dev * k2[2],
    ]
    dright = [2.0 * right[0] * dbot, 2.0 * right[1] * dbot, None]

    # dFu[i][j] = sum_Q (k1_i dleft_j + dright_i k2_j)  -> reduce over Q
    dFu = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            term = k1[i] * dleft[j]
            if dright[i] is not None:
                term = term + dright[i] * k2[j]
            dFu[i][j] = jnp.sum(term, axis=1)  # (P,)
    dFm = [[dFu[j][i] for j in range(3)] for i in range(3)]

    # backward F = U Kinv.  The intrinsics adjoints (da..dd) are (P,) -> ()
    # reductions; Mosaic cannot lower 1D multi_reductions, so the per-pair
    # contribution vectors are accumulated elementwise and reduced in one
    # (4, P) @ (P, 1) matmul at the end.
    dU = [[None] * 3 for _ in range(3)]
    va = vb = vc = vd = 0.0
    for i in range(3):
        dU[i][0] = a * dFm[i][0] + c * dFm[i][2]
        dU[i][1] = b * dFm[i][1] + d * dFm[i][2]
        dU[i][2] = dFm[i][2]
        va = va + U[i][0] * dFm[i][0]
        vb = vb + U[i][1] * dFm[i][1]
        vc = vc + U[i][0] * dFm[i][2]
        vd = vd + U[i][1] * dFm[i][2]

    # backward U = Kinv^T E
    dE = [[None] * 3 for _ in range(3)]
    for j in range(3):
        dE[0][j] = a * dU[0][j] + c * dU[2][j]
        dE[1][j] = b * dU[1][j] + d * dU[2][j]
        dE[2][j] = dU[2][j]
        va = va + E[0][j] * dU[0][j]
        vb = vb + E[1][j] * dU[1][j]
        vc = vc + E[0][j] * dU[2][j]
        vd = vd + E[1][j] * dU[2][j]

    P = va.shape[0]
    kinv_adj = _mm(jnp.stack([va, vb, vc, vd]), jnp.ones((P, 1), f32))  # (4, 1)
    da, db, dc, dd = (kinv_adj[i, 0] for i in range(4))

    # backward E_i = R12_i x Et:
    #   dR12_i += Et x dE_i ;  dEt += sum_i dE_i x R12_i
    dG = [[None] * 3 for _ in range(3)]
    dEt = [0.0, 0.0, 0.0]
    for i in range(3):
        g0, g1, g2 = dE[i][0], dE[i][1], dE[i][2]
        dG[i][0] = Et[1] * g2 - Et[2] * g1
        dG[i][1] = Et[2] * g0 - Et[0] * g2
        dG[i][2] = Et[0] * g1 - Et[1] * g0
        dEt[0] = dEt[0] + (g1 * G[i][2] - g2 * G[i][1])
        dEt[1] = dEt[1] + (g2 * G[i][0] - g0 * G[i][2])
        dEt[2] = dEt[2] + (g0 * G[i][1] - g1 * G[i][0])

    # backward Et_k = -sum_i G[i][k] t12_i
    dt12 = [0.0, 0.0, 0.0]
    for k in range(3):
        for i in range(3):
            dG[i][k] = dG[i][k] - dEt[k] * t12[i]
            dt12[i] = dt12[i] - G[i][k] * dEt[k]

    # backward t12_i = t2_i - sum_k G[i][k] t1_k
    dt2 = [dt12[i] for i in range(3)]
    dt1 = [0.0, 0.0, 0.0]
    for i in range(3):
        for k in range(3):
            dG[i][k] = dG[i][k] - dt12[i] * t1[:, k]
            dt1[k] = dt1[k] - G[i][k] * dt12[i]

    # backward G[i][j] = sum_k R2[3i+k] R1[3j+k]
    dR1 = [0.0] * 9
    dR2 = [0.0] * 9
    for i in range(3):
        for j in range(3):
            for k in range(3):
                dR2[3 * i + k] += dG[i][j] * r1[3 * j + k]
                dR1[3 * j + k] += dG[i][j] * r2[3 * i + k]

    # scatter to frames: dRcv = B1^T dR1 + B2^T dR2 (matmuls)
    dR1m = jnp.stack(dR1, axis=-1)  # (P, 9)
    dR2m = jnp.stack(dR2, axis=-1)
    dRcv = _mm(B1.T, dR1m) + _mm(B2.T, dR2m)  # (N, 9)
    dt1m = jnp.stack(dt1, axis=-1)
    dt2m = jnp.stack(dt2, axis=-1)
    dtcv = _mm(B1.T, dt1m) + _mm(B2.T, dt2m)  # (N, 3)

    # backward OpenCV flip: dR[j, i] = flip_i * dRcv[i, j]
    dR = [
        [-dRcv[:, 0], -dRcv[:, 3], dRcv[:, 6]],  # dR[0][i] over i = 0..2
        [-dRcv[:, 1], -dRcv[:, 4], dRcv[:, 7]],
        [-dRcv[:, 2], -dRcv[:, 5], dRcv[:, 8]],
    ]
    dT = jnp.stack([-dtcv[:, 0], -dtcv[:, 1], dtcv[:, 2]], axis=-1)

    if not update_T:
        dT = jnp.zeros_like(dT)

    # backward quaternion
    if update_R:
        dRf = [[dR[i][j] for j in range(3)] for i in range(3)]
        Ms = [[M00, M01, M02], [M10, M11, M12], [M20, M21, M22]]
        ds = sum(dRf[i][j] * Ms[i][j] for i in range(3) for j in range(3))
        dM = [[s * dRf[i][j] for j in range(3)] for i in range(3)]
        dn2 = ds * (-2.0 / (n2 * n2))
        dqw = 2.0 * qw * dn2
        dqx = 2.0 * qx * dn2
        dqy = 2.0 * qy * dn2
        dqz = 2.0 * qz * dn2
        dqx += (qy * dM[0][1] + qz * dM[0][2] + qy * dM[1][0]
                - 2.0 * qx * dM[1][1] - qw * dM[1][2] + qz * dM[2][0]
                + qw * dM[2][1] - 2.0 * qx * dM[2][2])
        dqy += (-2.0 * qy * dM[0][0] + qx * dM[0][1] + qw * dM[0][2]
                + qx * dM[1][0] + qz * dM[1][2] - qw * dM[2][0]
                + qz * dM[2][1] - 2.0 * qy * dM[2][2])
        dqz += (-2.0 * qz * dM[0][0] - qw * dM[0][1] + qx * dM[0][2]
                + qw * dM[1][0] - 2.0 * qz * dM[1][1] + qy * dM[1][2]
                + qx * dM[2][0] + qy * dM[2][1])
        dqw += (-qz * dM[0][1] + qy * dM[0][2] + qz * dM[1][0]
                - qx * dM[1][2] - qy * dM[2][0] + qx * dM[2][1])
        dq = jnp.stack([dqw, dqx, dqy, dqz], axis=-1)
    else:
        dq = jnp.zeros((N, 4), f32)

    # backward focal
    if update_FL:
        dfx = -da / (fx * fx) + dc * cx / (fx * fx)
        dfy = -db / (fy * fy) + dd * cy / (fy * fy)
        dfbar = jnp.stack([dfx * s_img, dfy * s_img])  # (2,)
        df = jnp.broadcast_to(dfbar[None, :] / N, (N, 2))
        de_fl = df * ((e_fl >= MIN_FL) & (e_fl <= MAX_FL)).astype(f32)
        dlf = de_fl * e_fl
    else:
        dlf = jnp.zeros((N, 2), f32)

    dx = jnp.concatenate([dT, dq, dlf], axis=-1)
    return loss, count, dx
