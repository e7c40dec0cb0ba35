"""Geometry-Guided Sampling (GGS) as a fused, differentiable JAX program.

Replaces the reference's autograd-in-a-no-grad-sampler construction
(reference: pose_diffusion/util/geometry_guided_sampling.py:14-172): five
SGD-with-momentum phases on the posterior mean — all-params (2x iters),
FL-only, R-only, T-only, all-params (2x iters) — each minimizing the mean
Sampson epipolar distance of verified 2D matches, with an adaptive gradient
clip ``max_norm = alpha * ||x * grad_mask|| / lr``.

TPU-native differences (semantics-preserving, SURVEY.md "hard parts"):
* matches are fixed-size padded arrays with a validity mask, so the whole
  cond_fn jits with static shapes (the reference boolean-filters,
  geometry_guided_sampling.py:170);
* the data-dependent early ``break`` on insufficient valid matches becomes a
  sticky "stopped" flag carried through ``lax.fori_loop`` — updates are
  masked out from the iteration the reference would have broken at;
* gradients come from ``jax.grad`` of the Sampson loss; per-parameter
  selectivity (R-only etc.) is ``stop_gradient`` on the non-updated camera
  components, matching the reference's ``.detach()`` calls.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from posediffusion_tpu.geometry.epipolar import hat, sampson_distance
from posediffusion_tpu.geometry.pose_codec import pose_encoding_to_camera
from posediffusion_tpu.utils.precision import highp


@struct.dataclass
class MatchesData:
    """Fixed-size padded match set for one sequence.

    kp1/kp2: (M, 3) homogeneous pixel keypoints (x, y, 1).
    pair_i1/pair_i2: (P,) frame indices of the unique ordered pairs present
        (padded to P = n*(n-1)/2 slots); fundamental matrices are computed
        only for these P pairs, not the full n^2 grid the reference builds
        (geometry_guided_sampling.py:36) — same math, ~2x fewer pair ops on
        the sequential GGS hot loop.
    pair_slot: (M,) per-match index into the pair table.
    valid: (M,) bool — padding mask.
    """

    kp1: jnp.ndarray
    kp2: jnp.ndarray
    pair_i1: jnp.ndarray
    pair_i2: jnp.ndarray
    pair_slot: jnp.ndarray
    valid: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class GGSConfig:
    """Static GGS hyperparameters (reference: cfgs/default.yaml:6-13)."""

    enable: bool = True
    start_step: int = 10
    learning_rate: float = 1e-2
    iter_num: int = 100
    sampson_max: float = 10.0
    min_matches: int = 10
    alpha: float = 1e-4
    momentum: float = 0.9
    pose_encoding_type: str = "absT_quaR_logFL"


def pack_matches(kp1, kp2, i12, n_frames: int, pad_to: int) -> MatchesData:
    """Pad host-side match arrays to a static size (rounded bucket)."""
    import numpy as np

    m = len(kp1)
    if m > pad_to:
        raise ValueError(f"pad_to={pad_to} < number of matches {m}")
    kp1h = np.concatenate([kp1, np.ones((m, 1), kp1.dtype)], axis=1)
    kp2h = np.concatenate([kp2, np.ones((m, 1), kp2.dtype)], axis=1)

    # compress to the unique ordered pairs present
    i12 = np.asarray(i12, np.int64)
    flat = i12[:, 0] * n_frames + i12[:, 1]
    unique_flat, slot = np.unique(flat, return_inverse=True)
    n_pairs = n_frames * (n_frames - 1) // 2
    if len(unique_flat) > n_pairs:
        raise ValueError("more unique pairs than n*(n-1)/2 — expected a < b")
    pair_i1 = np.zeros(n_pairs, np.int32)
    pair_i2 = np.ones(n_pairs, np.int32)  # padded slots point at pair (0, 1)
    pair_i1[: len(unique_flat)] = unique_flat // n_frames
    pair_i2[: len(unique_flat)] = unique_flat % n_frames

    pad = pad_to - m
    kp1h = np.pad(kp1h, ((0, pad), (0, 0)))
    kp2h = np.pad(kp2h, ((0, pad), (0, 0)))
    # Padded rows are homogeneous (0, 0, 1), not all-zero: an all-zero row
    # makes the Sampson denominator 0 and NaNs leak into gradients even
    # through the validity mask.
    kp1h[m:, 2] = 1.0
    kp2h[m:, 2] = 1.0
    slot = np.pad(slot.astype(np.int32), (0, pad))
    valid = np.arange(pad_to) < m
    return MatchesData(
        kp1=jnp.asarray(kp1h, jnp.float32),
        kp2=jnp.asarray(kp2h, jnp.float32),
        pair_i1=jnp.asarray(pair_i1),
        pair_i2=jnp.asarray(pair_i2),
        pair_slot=jnp.asarray(slot),
        valid=jnp.asarray(valid),
    )


@highp
def _ggs_pair_fundamentals(
    R: jnp.ndarray,  # (N, 3, 3) row-vector NDC rotations
    T: jnp.ndarray,  # (N, 3)
    fl: jnp.ndarray,  # (N, 2) tied NDC focal lengths
    image_hw: Tuple[int, int],
    pair_i1: jnp.ndarray,
    pair_i2: jnp.ndarray,
) -> jnp.ndarray:
    """Fundamental matrices (kp1^T F kp2 = 0) for the compressed pair table.

    Specialization of geometry.get_fundamental_matrices for the GGS loop:
    the decoded cameras have zero principal point and a tied focal length, so
    every camera shares one calibration matrix — K^-1 is a single analytic
    3x3 instead of a batched LU inverse.  Fewer sequential ops matter here:
    this graph re-executes ~7000 times per conditioned sampling phase.
    """
    h, w = image_hw
    flip = jnp.asarray([-1.0, -1.0, 1.0], R.dtype)
    R_cv = jnp.swapaxes(R * flip[None, None, :], -1, -2)
    t_cv = T * flip[None, :]

    scale = min(h, w) / 2.0
    fx = fl[0, 0] * scale
    fy = fl[0, 1] * scale
    cx, cy = w / 2.0, h / 2.0
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    K_inv = jnp.stack(
        [
            jnp.stack([1.0 / fx, zero, -cx / fx], -1),
            jnp.stack([zero, 1.0 / fy, -cy / fy], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        axis=-2,
    )

    R1, t1 = R_cv[pair_i1], t_cv[pair_i1]
    R2, t2 = R_cv[pair_i2], t_cv[pair_i2]
    R12 = jnp.matmul(R2, jnp.swapaxes(R1, -1, -2))
    t12 = t2 - jnp.matmul(R12, t1[..., None])[..., 0]
    E_t = -jnp.matmul(jnp.swapaxes(R12, -1, -2), t12[..., None])[..., 0]
    E = jnp.matmul(R12, hat(E_t))
    F = jnp.matmul(K_inv.T, jnp.matmul(E, K_inv))  # p2^T F p1 = 0
    return jnp.swapaxes(F, -1, -2)  # kp1^T F kp2 = 0


@highp
def compute_sampson_loss(
    model_mean: jnp.ndarray,
    matches: MatchesData,
    image_hw: Tuple[int, int],
    update_R: bool,
    update_T: bool,
    update_FL: bool,
    sampson_max: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked mean Sampson distance (loss) + number of contributing matches.

    Mirrors reference compute_sampson_distance
    (geometry_guided_sampling.py:129-172): decode cameras, tie the focal
    length to the per-sequence mean, detach non-optimized components, build
    pairwise fundamental matrices, drop residuals >= sampson_max.
    """
    cam = pose_encoding_to_camera(model_mean)

    fl = jnp.broadcast_to(
        jnp.mean(cam.focal_length, axis=0, keepdims=True), cam.focal_length.shape
    )
    R = cam.R if update_R else jax.lax.stop_gradient(cam.R)
    T = cam.T if update_T else jax.lax.stop_gradient(cam.T)
    fl = fl if update_FL else jax.lax.stop_gradient(fl)

    F = _ggs_pair_fundamentals(
        R, T, fl, image_hw, matches.pair_i1, matches.pair_i2
    )
    sampson = sampson_distance(F[matches.pair_slot], matches.kp1, matches.kp2)
    keep = matches.valid & (sampson < sampson_max)
    count = jnp.sum(keep)
    loss = jnp.sum(jnp.where(keep, sampson, 0.0)) / jnp.maximum(count, 1)
    return loss, count


def sampson_report(
    model_mean: jnp.ndarray,
    matches: MatchesData,
    image_hw: Tuple[int, int],
    sampson_max: float = 10.0,
) -> jnp.ndarray:
    """Clamped mean Sampson distance over all valid matches — the progress
    statistic the reference logs per conditioned step
    (geometry_guided_sampling.py:169 ``sampson_to_print``)."""
    cam = pose_encoding_to_camera(model_mean)
    fl = jnp.broadcast_to(
        jnp.mean(cam.focal_length, axis=0, keepdims=True), cam.focal_length.shape
    )
    F = _ggs_pair_fundamentals(
        cam.R, cam.T, fl, image_hw, matches.pair_i1, matches.pair_i2
    )
    sampson = sampson_distance(F[matches.pair_slot], matches.kp1, matches.kp2)
    clamped = jnp.minimum(sampson, sampson_max)
    nvalid = jnp.maximum(jnp.sum(matches.valid), 1)
    return jnp.sum(jnp.where(matches.valid, clamped, 0.0)) / nvalid


def _ggs_phase(
    model_mean: jnp.ndarray,
    matches: MatchesData,
    image_hw: Tuple[int, int],
    cfg: GGSConfig,
    update_R: bool = True,
    update_T: bool = True,
    update_FL: bool = True,
) -> jnp.ndarray:
    """One SGD(momentum) phase over the posterior mean
    (reference GGS_optimize, geometry_guided_sampling.py:66-126)."""
    iters = cfg.iter_num * (2 if (update_R and update_T and update_FL) else 1)
    n_frames = model_mean.shape[1]
    lr = cfg.learning_rate

    def loss_fn(x):
        return compute_sampson_loss(
            x, matches, image_hw, update_R, update_T, update_FL, cfg.sampson_max
        )

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def body(_, carry):
        x, buf, stopped = carry
        (loss, count), grads = grad_fn(x)

        # Early-exit gate: the reference breaks before applying the update
        # when valid matches per frame fall below min_matches.
        if cfg.min_matches > 0:
            stop_now = (count / n_frames) < cfg.min_matches
        else:
            stop_now = jnp.asarray(False)
        stopped = jnp.logical_or(stopped, stop_now)

        # Adaptive clip (reference: geometry_guided_sampling.py:111-121).
        grad_mask = (jnp.abs(grads) > 0).astype(x.dtype)
        max_norm = cfg.alpha * jnp.linalg.norm(x * grad_mask) / lr
        total_norm = jnp.linalg.norm(grads)
        clip_coef = jnp.minimum(1.0, max_norm / (total_norm + 1e-6))
        grads = grads * clip_coef

        # SGD with momentum (torch semantics: buf = m*buf + g; x -= lr*buf).
        buf_new = cfg.momentum * buf + grads
        x_new = x - lr * buf_new

        x = jnp.where(stopped, x, x_new)
        buf = jnp.where(stopped, buf, buf_new)
        return x, buf, stopped

    init = (model_mean, jnp.zeros_like(model_mean), jnp.asarray(False))
    x, _, _ = jax.lax.fori_loop(0, iters, body, init)
    return x


def geometry_guided_sampling(
    model_mean: jnp.ndarray,
    t,
    matches: MatchesData,
    image_hw: Tuple[int, int],
    cfg: GGSConfig,
) -> jnp.ndarray:
    """Full 5-phase GGS conditioning of the posterior mean
    (reference: geometry_guided_sampling.py:48-63)."""
    del t  # kept for cond_fn signature parity; phases don't depend on t
    run = lambda **kw: _ggs_phase(kw.pop("x"), matches, image_hw, cfg, **kw)
    x = run(x=model_mean)
    x = run(x=x, update_T=False, update_R=False, update_FL=True)
    x = run(x=x, update_T=False, update_R=True, update_FL=False)
    x = run(x=x, update_T=True, update_R=False, update_FL=False)
    x = run(x=x)
    return x


# VMEM budget for the resident fused kernel: every (P, Q) operand plus
# ~dozens of temporaries stay resident in the ~16 MB core VMEM.  Above this
# the pair-chunked kernel streams the match table from HBM instead (a few MB
# per iteration — tens of microseconds at v5e bandwidth), so the fused path
# has no practical upper size limit and the XLA autodiff fallback is only
# for CPU or batched (B > 1) conditioning.
MAX_FUSED_ELEMENTS = 96 * 1024  # P * Q


def fused_fits(grouped) -> bool:
    """Whether a GroupedMatches layout fits the RESIDENT fused kernel's VMEM
    budget; bigger tables use the pair-chunked streaming kernel."""
    return (
        grouped is not None
        and grouped.kp1.shape[0] * grouped.kp1.shape[1] <= MAX_FUSED_ELEMENTS
    )


def geometry_guided_sampling_fused(
    model_mean: jnp.ndarray,
    t,
    grouped,  # ops.ggs_grad.GroupedMatches
    image_hw: Tuple[int, int],
    cfg: GGSConfig,
) -> jnp.ndarray:
    """5-phase GGS where each phase is ONE fused Pallas kernel (SGD loop,
    hand-derived gradients, clip, early-stop all in VMEM).  Semantics match
    :func:`geometry_guided_sampling`; see ops/ggs_kernel.py.

    Match tables within MAX_FUSED_ELEMENTS run the VMEM-resident kernel;
    bigger ones (e.g. 4096-keypoint detection densities) run the
    pair-chunked kernel that streams the table from HBM per iteration."""
    del t
    from posediffusion_tpu.ops.ggs_kernel import (
        ggs_phase_fused,
        ggs_phase_fused_chunked,
    )

    if model_mean.shape[0] != 1:
        raise ValueError(
            "fused GGS conditions a single sequence (B == 1); got "
            f"B={model_mean.shape[0]} — use the autodiff path for batches"
        )
    x = model_mean[0]  # (N, 9)
    resident = fused_fits(grouped)

    def phase(x, uR, uT, uF):
        iters = cfg.iter_num * (2 if (uR and uT and uF) else 1)
        kw = dict(
            iters=iters, lr=cfg.learning_rate, momentum=cfg.momentum,
            alpha=cfg.alpha, min_matches=float(cfg.min_matches),
        )
        if resident:
            return ggs_phase_fused(
                x, grouped, image_hw, uR, uT, uF, cfg.sampson_max, **kw
            )
        return ggs_phase_fused_chunked(
            x, grouped, image_hw, uR, uT, uF, cfg.sampson_max, **kw
        )

    x = phase(x, True, True, True)
    x = phase(x, False, False, True)
    x = phase(x, True, False, False)
    x = phase(x, False, True, False)
    x = phase(x, True, True, True)
    return x[None]


def make_ggs_cond_fn(
    matches: MatchesData,
    image_hw: Tuple[int, int],
    cfg: GGSConfig,
    grouped=None,
):
    """Build the cond_fn hook for the sampler.

    With ``grouped`` (ops.ggs_grad.GroupedMatches) on a TPU backend, each GGS
    phase runs as a single fused Pallas kernel; otherwise the jnp/autodiff
    path is used (CPU, or no grouped layout supplied).
    """
    import jax as _jax

    use_fused = grouped is not None and _jax.devices()[0].platform != "cpu"

    def cond_fn(mean, t):
        if use_fused:
            return geometry_guided_sampling_fused(mean, t, grouped, image_hw, cfg)
        return geometry_guided_sampling(mean, t, matches, image_hw, cfg)

    return cond_fn


def build_cond_fn(kp1, kp2, i12, n_frames: int, image_hw: Tuple[int, int], cfg: GGSConfig):
    """Pack raw host matches into exactly one layout and build the cond_fn.

    On an accelerator the fused Pallas path always runs (VMEM-resident
    kernel for small tables, pair-chunked HBM-streaming kernel above
    MAX_FUSED_ELEMENTS); on CPU the flat autodiff path runs — packing only
    the layout that will actually be used.
    """
    import jax as _jax
    import numpy as np

    from posediffusion_tpu.ops.ggs_grad import pack_matches_grouped

    if _jax.devices()[0].platform != "cpu":
        grouped = pack_matches_grouped(kp1, kp2, i12, n_frames)

        def cond_fn(mean, t):
            return geometry_guided_sampling_fused(mean, t, grouped, image_hw, cfg)

        return cond_fn

    pad_to = 1 << int(np.ceil(np.log2(max(len(kp1), 1))))
    matches = pack_matches(kp1, kp2, i12, n_frames, pad_to=pad_to)

    def cond_fn(mean, t):
        return geometry_guided_sampling(mean, t, matches, image_hw, cfg)

    return cond_fn
