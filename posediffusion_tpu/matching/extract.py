"""End-to-end 2D match extraction for GGS.

Replaces the reference's hloc + COLMAP pipeline
(reference: pose_diffusion/util/match_extraction.py:27-153): SuperPoint on
every frame, exhaustive pairing, SuperGlue matching, native COLMAP-style
two-view verification (F + H model selection with planar/pure-rotation
degeneracy classification; no SQLite database — arrays flow through), then
keypoint remapping from original-image pixels into the cropped/rescaled
frame the pose model sees.

Output matches the reference's ``extract_match`` contract:
``(kp1 (M, 2), kp2 (M, 2), i12 (M, 2))`` with frame indices 0-based, ready
for ``diffusion.pack_matches``.  Weights: converted MagicLeap checkpoints
from ``weights_dir`` (superpoint_v1.pth + superglue_outdoor.pth), or
explicit param pytrees.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posediffusion_tpu.matching.ransac import PLANAR_OR_PANORAMIC, verify_two_view
from posediffusion_tpu.matching.superglue import match_pair

_GRAY_W = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def load_matcher_weights(weights_dir: str):
    """Load + convert MagicLeap checkpoints from a directory."""
    import torch

    from posediffusion_tpu.matching.convert import (
        convert_superglue,
        convert_superpoint,
    )

    def _load(names):
        for n in names:
            p = os.path.join(weights_dir, n)
            if os.path.isfile(p):
                sd = torch.load(p, map_location="cpu", weights_only=True)
                return {k: v.numpy() for k, v in sd.items()}
        raise FileNotFoundError(f"none of {names} in {weights_dir}")

    sp = convert_superpoint(_load(["superpoint_v1.pth"]))
    sg = convert_superglue(
        _load(["superglue_outdoor.pth", "superglue_indoor.pth"])
    )
    return sp, sg


@functools.partial(jax.jit, static_argnames=("max_keypoints", "nms_radius"))
def _detect_batched(sp_params, grays, max_keypoints, nms_radius):
    from posediffusion_tpu.matching.superpoint import detect_keypoints_batched

    return detect_keypoints_batched(
        sp_params, grays, max_keypoints=max_keypoints, nms_radius=nms_radius
    )


# cap frames per batched-detection forward by ACTIVATION budget: the first
# conv alone is F x 64 x H x W f32, so large or high-resolution groups are
# processed in sub-batches rather than one giant jit call
_DETECT_ACT_BUDGET_BYTES = 2 * 1024**3


def _detect_frames_per_call(h: int, w: int) -> int:
    return max(1, int(_DETECT_ACT_BUDGET_BYTES // (64 * h * w * 4)))


@functools.partial(
    jax.jit,
    static_argnames=("image_hw0", "image_hw1", "sinkhorn_iterations", "match_threshold"),
)
def _match(sg_params, d0, d1, k0, k1, s0, s1, m0, m1, image_hw0, image_hw1,
           sinkhorn_iterations, match_threshold):
    return match_pair(
        sg_params, d0[None], d1[None], k0[None], k1[None], s0[None], s1[None],
        m0[None], m1[None], image_hw0,
        sinkhorn_iterations=sinkhorn_iterations,
        match_threshold=match_threshold,
        image_hw1=image_hw1,
    )


@functools.partial(
    jax.jit, static_argnames=("sinkhorn_iterations", "match_threshold", "impl")
)
def _match_chunk(x, v_all, sa, sb, stacks, sinkhorn_iterations, match_threshold,
                 impl="pallas"):
    """Gather a pair chunk + run the batched matcher in ONE dispatch (the
    eager per-chunk take/stack ops otherwise rate-limit through the host).

    ``impl="pallas"`` is the VMEM-resident fused kernel; ``impl="xla"`` is
    the batched fori-loop GNN for keypoint counts past the kernel's VMEM
    budget (matching.superglue.match_pairs_batched_xla)."""
    xp = jnp.stack([jnp.take(x, sa, axis=0), jnp.take(x, sb, axis=0)], axis=1)
    m0 = jnp.take(v_all, sa, axis=0)
    m1 = jnp.take(v_all, sb, axis=0)
    if impl == "xla":
        from posediffusion_tpu.matching.superglue import match_pairs_batched_xla

        return match_pairs_batched_xla(
            xp, m0, m1, stacks,
            sinkhorn_iterations=sinkhorn_iterations,
            match_threshold=match_threshold,
        )
    from posediffusion_tpu.ops.superglue_kernel import fused_match_pairs

    return fused_match_pairs(
        xp, m0, m1, stacks, sinkhorn_iters=sinkhorn_iterations,
        match_threshold=match_threshold,
    )


# VMEM model for the fused SuperGlue kernel: token scratch C x 2 x K x D f32
# plus ~4 live (K+8)^2 f32 Sinkhorn/attention temporaries and ~8 MB of
# streamed weights, against the 100 MB vmem limit the kernel requests.
_FUSED_VMEM_BUDGET = 100 * 1024 * 1024


def _fused_pair_chunk(K: int, cap: int) -> int:
    """Pairs per fused-kernel launch that fit the VMEM model; 0 means the
    fused kernel cannot run at this K (use the batched XLA matcher)."""
    temps = 4 * (K + 8) ** 2 * 4 + 8 * 1024 * 1024
    per_pair = 2 * K * 256 * 4
    return int(max(0, min(cap, (_FUSED_VMEM_BUDGET - temps) // per_pair)))


@functools.partial(jax.jit)
def _encode_frames(sg_params, d_all, k_all, s_all, hw):
    from posediffusion_tpu.matching.superglue import encode_keypoints

    return encode_keypoints(sg_params, d_all, k_all, s_all, hw)


def _fused_all_pairs(
    sg_params, feats, sizes, pairs, chunk, sinkhorn_iterations,
    match_threshold, impl="pallas",
):
    """Match every pair through the batched device matcher in ceil(P/chunk)
    launches — the fused Pallas kernel (``impl="pallas"``,
    ops/superglue_kernel.py) or the batched XLA GNN (``impl="xla"``).
    Returns host arrays (P, K) matches0 / mscores."""
    from posediffusion_tpu.ops.superglue_kernel import stack_superglue_params

    k_all = jnp.stack([f[0] for f in feats])
    s_all = jnp.stack([f[1] for f in feats])
    d_all = jnp.stack([f[2] for f in feats])
    v_all = jnp.stack([f[3] for f in feats])
    x = _encode_frames(
        sg_params, d_all, k_all, s_all, jnp.asarray(sizes, jnp.float32)
    )
    stacks = stack_superglue_params(sg_params)
    a_idx = np.array([p[0] for p in pairs])
    b_idx = np.array([p[1] for p in pairs])
    P = len(pairs)
    out_m, out_s = [], []
    for i0 in range(0, P, chunk):
        sa, sb = a_idx[i0 : i0 + chunk], b_idx[i0 : i0 + chunk]
        pad = chunk - len(sa)
        if pad:  # repeat the first pair; results discarded
            sa = np.pad(sa, (0, pad))
            sb = np.pad(sb, (0, pad))
        mm, ss = _match_chunk(
            x, v_all, jnp.asarray(sa), jnp.asarray(sb), stacks,
            sinkhorn_iterations=sinkhorn_iterations,
            match_threshold=match_threshold, impl=impl,
        )
        n_real = chunk - pad
        out_m.append(mm[:n_real])
        out_s.append(ss[:n_real])
    # device-side concat, ONE host transfer for all pairs
    return (
        np.asarray(jnp.concatenate(out_m)),
        np.asarray(jnp.concatenate(out_s)),
    )


def extract_match(
    image_paths: Optional[Sequence[str]] = None,
    image_folder_path: Optional[str] = None,
    image_info: Optional[Dict] = None,
    weights_dir: Optional[str] = None,
    weights: Optional[Tuple] = None,
    max_keypoints: int = 4096,
    nms_radius: int = 4,
    sinkhorn_iterations: int = 50,
    match_threshold: float = 0.2,
    ransac_threshold_px: float = 4.0,
    min_pair_matches: int = 8,
    use_fused: Optional[bool] = None,
    pair_chunk: int = 32,
    keep_planar: bool = True,
):
    """Extract verified matches across all frame pairs.

    Mirrors the reference entry (match_extraction.py:27-48); returns
    (kp1, kp2, i12) in the cropped/rescaled pixel frame, or (None,)*3 when
    no matcher weights are available or nothing verifies.

    ``max_keypoints`` defaults to 4096 per image — hloc's
    ``superpoint_inloc`` detection config, which the reference uses
    (match_extraction.py:91).  After detection the keypoint arrays are
    TRIMMED to the densest frame's actual count (top-k is score-sorted), so
    small images pay for the keypoints they have, not the cap.

    ``use_fused`` (default: auto — on except CPU) batches SuperGlue over
    ``pair_chunk`` pairs per device launch instead of ~290 XLA dispatches
    per pair.  The launch is the VMEM-resident fused Pallas kernel when the
    trimmed K fits its VMEM model (roughly K <= 2048; chunk size adapts via
    ``_fused_pair_chunk``), else the batched fori-loop XLA matcher whose
    (K, K) buffers live in HBM; numerics of both are pinned in
    tests/test_superglue_kernel.py.
    """
    if weights is not None:
        sp_params, sg_params = weights
    elif weights_dir:
        sp_params, sg_params = load_matcher_weights(weights_dir)
    else:
        raise ValueError("no matcher weights (set GGS.matcher_ckpt_dir)")

    if image_paths is None:
        from posediffusion_tpu.data.images import IMAGE_EXTENSIONS

        image_paths = sorted(
            os.path.join(image_folder_path, f)
            for f in os.listdir(image_folder_path)
            if f.lower().endswith(IMAGE_EXTENSIONS)
        )

    from posediffusion_tpu.data.images import load_image_chw

    grays = []
    sizes = []
    for path in image_paths:
        img = load_image_chw(path)
        gray = np.tensordot(_GRAY_W, img, axes=(0, 0))
        # pad to a multiple of 8 so the 65-cell head tiles exactly
        h, w = gray.shape
        ph, pw = (-h) % 8, (-w) % 8
        gray = np.pad(gray, ((0, ph), (0, pw)))
        sizes.append(gray.shape)  # per-frame size for keypoint normalization
        grays.append(gray)

    # batched detection per same-size group: one forward for the whole
    # stack instead of F dispatch-bound per-frame calls
    feats: list = [None] * len(grays)
    by_shape: Dict[Tuple[int, int], list] = {}
    for i, g in enumerate(grays):
        by_shape.setdefault(g.shape, []).append(i)
    for shape, idxs in by_shape.items():
        per_call = _detect_frames_per_call(*shape)
        for g0 in range(0, len(idxs), per_call):
            sub = idxs[g0 : g0 + per_call]
            arr = [grays[i] for i in sub]
            if len(idxs) > per_call:
                # pad the tail so every sub-batch compiles to one shape
                arr += [arr[0]] * (per_call - len(arr))
            stack = jnp.asarray(np.stack(arr))[:, None]
            kb, sb, db, vb = _detect_batched(
                sp_params, stack, max_keypoints, nms_radius
            )
            for j, i in enumerate(sub):
                feats[i] = (kb[j], sb[j], db[j], vb[j])

    n = len(feats)
    pairs = [(a, b) for a in range(n) for b in range(a + 1, n)]
    if use_fused is None:
        use_fused = jax.devices()[0].platform not in ("cpu",)
    # batched-matcher constraints: >=1 pair and K uniform across frames
    # (tiny images can truncate top-k); otherwise the per-pair XLA path
    # below handles it
    Ks = {int(f[0].shape[0]) for f in feats}
    if not pairs or len(Ks) != 1:
        use_fused = False
    if use_fused:
        # trim to the densest frame's detection count (top-k is sorted by
        # score, so a prefix keeps the best): at the 4096 cap most frames
        # detect far fewer, and matcher cost scales ~K^2
        K_full = next(iter(Ks))
        k_max = int(
            np.asarray(jnp.max(jnp.stack([jnp.sum(f[3]) for f in feats])))
        )
        K_eff = min(K_full, max(128, ((max(k_max, 1) + 127) // 128) * 128))
        if K_eff < K_full:
            feats = [tuple(a[:K_eff] for a in f) for f in feats]
        chunk = _fused_pair_chunk(K_eff, pair_chunk)
        impl = "pallas" if (chunk > 0 and K_eff % 8 == 0) else "xla"
        if impl == "xla":
            # HBM transient model: ~4 live (C, K, K) f32 buffers <= 2 GB
            chunk = max(1, min(pair_chunk, int(2e9 // (16 * K_eff * K_eff))))
        all_matches, _ = _fused_all_pairs(
            sg_params, feats, sizes, pairs, chunk,
            sinkhorn_iterations, match_threshold, impl=impl,
        )
    else:
        all_matches = None

    # one host transfer for all keypoints (the RANSAC loop is host-side)
    kpts_np = np.asarray(jnp.stack([f[0] for f in feats]))

    kp1_all, kp2_all, i12_all = [], [], []
    for pi, (a, b) in enumerate(pairs):
        if all_matches is not None:
            matches0 = all_matches[pi]
        else:
            k0, s0, d0, v0 = feats[a]
            k1, s1, d1, v1 = feats[b]
            matches0, _ = _match(
                sg_params, d0, d1, k0, k1, s0, s1, v0, v1,
                sizes[a], sizes[b],
                sinkhorn_iterations, match_threshold,
            )
            matches0 = np.asarray(matches0)
        sel = matches0 >= 0
        if sel.sum() < min_pair_matches:
            continue
        p0 = kpts_np[a][sel]
        p1 = kpts_np[b][matches0[sel]]
        # COLMAP-style model selection (F + H + degeneracy classification):
        # a planar scene or pure-rotation pair is flagged PLANAR_OR_PANORAMIC
        # and its inliers come from H — an F fit on such a pair is arbitrary
        # and would pass bogus matches into GGS (reference parity:
        # pycolmap estimation_and_geometric_verification,
        # util/match_extraction.py:125-130).
        res = verify_two_view(
            p0, p1, max_error_px=ransac_threshold_px,
            min_num_inliers=min_pair_matches, seed=a * n + b,
        )
        count = res["num_inliers"]
        if count < min_pair_matches:
            continue
        if res["config"] == PLANAR_OR_PANORAMIC and not keep_planar:
            continue
        mask = res["inlier_mask"]
        kp1_all.append(p0[mask])
        kp2_all.append(p1[mask])
        i12_all.append(np.repeat([[a, b]], count, axis=0))

    if not kp1_all:
        return None, None, None

    kp1 = np.concatenate(kp1_all).astype(np.float32)
    kp2 = np.concatenate(kp2_all).astype(np.float32)
    i12 = np.concatenate(i12_all)

    if image_info is not None:
        bbox = np.asarray(image_info["bboxes_xyxy"])
        scale = np.asarray(image_info["resized_scales"])
        # remap original-image pixels into the cropped+rescaled frame
        kp1 = (kp1 - bbox[i12[:, 0], :2]) * scale[i12[:, 0], None]
        kp2 = (kp2 - bbox[i12[:, 1], :2]) * scale[i12[:, 1], None]

    return kp1, kp2, i12
