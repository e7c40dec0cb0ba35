"""SuperPoint keypoint detector + descriptor in Flax.

TPU-native replacement for the hloc SuperPoint stage the reference calls
(reference: pose_diffusion/util/match_extraction.py:91-98, feature conf
``superpoint_inloc``; SURVEY.md N3).  Architecture-parity port of the
MagicLeap SuperPointNet so the released ``superpoint_v1.pth`` weights load
through :func:`posediffusion_tpu.matching.convert.convert_superpoint`:

* VGG-style shared encoder (64-64 / 64-64 / 128-128 / 128-128, 2x2 pools),
* detector head -> 65-channel cell scores (8x8 cell + dustbin) -> softmax ->
  depth-to-space heatmap,
* descriptor head -> 256-d coarse grid, bilinear-sampled at keypoints and
  L2-normalized.

Everything static-shape: NMS is reduce_window max-pooling, keypoints are a
fixed top-K with a validity mask (score threshold + border), so the whole
detector jits once per image size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _max_pool(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sliding max with kernel 2r+1, stride 1, same padding (B, H, W)."""
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1), "SAME"
    )


def simple_nms(scores: jnp.ndarray, radius: int, iterations: int = 2) -> jnp.ndarray:
    """Iterative non-maximum suppression on (B, H, W) score maps (MagicLeap
    ``simple_nms`` semantics: keep local maxima, re-admit maxima of the
    suppressed remainder)."""
    max_mask = scores == _max_pool(scores, radius)
    for _ in range(iterations):
        supp_mask = _max_pool(max_mask.astype(scores.dtype), radius) > 0
        supp_scores = jnp.where(supp_mask, 0.0, scores)
        new_max = supp_scores == _max_pool(supp_scores, radius)
        max_mask = max_mask | (new_max & ~supp_mask)
    return jnp.where(max_mask, scores, 0.0)


class SuperPointNet(nn.Module):
    """Raw network: grayscale (B, 1, H, W) -> (cell logits, descriptor grid)."""

    @nn.compact
    def __call__(self, image: jnp.ndarray):
        x = image.transpose(0, 2, 3, 1)  # NHWC

        def conv(x, ch, name, kernel=3):
            return nn.Conv(ch, (kernel, kernel), padding="SAME" if kernel == 3 else "VALID", name=name)(x)

        def pool(x):
            return nn.max_pool(x, (2, 2), strides=(2, 2))

        x = nn.relu(conv(x, 64, "conv1a"))
        x = nn.relu(conv(x, 64, "conv1b"))
        x = pool(x)
        x = nn.relu(conv(x, 64, "conv2a"))
        x = nn.relu(conv(x, 64, "conv2b"))
        x = pool(x)
        x = nn.relu(conv(x, 128, "conv3a"))
        x = nn.relu(conv(x, 128, "conv3b"))
        x = pool(x)
        x = nn.relu(conv(x, 128, "conv4a"))
        x = nn.relu(conv(x, 128, "conv4b"))

        cPa = nn.relu(conv(x, 256, "convPa"))
        semi = conv(cPa, 65, "convPb", kernel=1)  # (B, H/8, W/8, 65)

        cDa = nn.relu(conv(x, 256, "convDa"))
        desc = conv(cDa, 256, "convDb", kernel=1)  # (B, H/8, W/8, 256)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
        )
        return semi, desc


def _depth_to_space_scores(semi: jnp.ndarray) -> jnp.ndarray:
    """(B, Hc, Wc, 65) cell logits -> (B, H, W) keypoint probability map."""
    probs = jax.nn.softmax(semi, axis=-1)[..., :-1]  # drop dustbin
    B, Hc, Wc, _ = probs.shape
    probs = probs.reshape(B, Hc, Wc, 8, 8)
    probs = probs.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)
    return probs


def _sample_descriptors(kpts_xy: jnp.ndarray, desc_grid: jnp.ndarray, s: int = 8):
    """Bilinear descriptor sampling at pixel keypoints.

    kpts_xy: (K, 2) (x, y) pixel coords; desc_grid: (Hc, Wc, C).
    Matches MagicLeap's grid_sample(align_corners=True) on cell centers.
    """
    Hc, Wc, C = desc_grid.shape
    # MagicLeap normalization: kp' = (kp - s/2 + 0.5) / (dim*s - s/2 - 0.5)
    # mapped by grid_sample(align_corners=True) onto [0, dim_c - 1].
    gx = (kpts_xy[:, 0] - s / 2 + 0.5) * (Wc - 1) / (Wc * s - s / 2 - 0.5)
    gy = (kpts_xy[:, 1] - s / 2 + 0.5) * (Hc - 1) / (Hc * s - s / 2 - 0.5)
    x = jnp.clip(gx, 0.0, Wc - 1.0)
    y = jnp.clip(gy, 0.0, Hc - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, Wc - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, Hc - 1)
    x1 = jnp.clip(x0 + 1, 0, Wc - 1)
    y1 = jnp.clip(y0 + 1, 0, Hc - 1)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    d = (
        desc_grid[y0, x0] * (1 - fx) * (1 - fy)
        + desc_grid[y0, x1] * fx * (1 - fy)
        + desc_grid[y1, x0] * (1 - fx) * fy
        + desc_grid[y1, x1] * fx * fy
    )
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def detect_keypoints(
    params,
    image_gray: jnp.ndarray,  # (1, 1, H, W) in [0, 1]
    max_keypoints: int = 4096,
    nms_radius: int = 4,
    keypoint_threshold: float = 0.005,
    border: int = 4,
):
    """Full detector: returns (kpts_xy (K, 2), scores (K,), desc (K, 256),
    valid (K,)) with static K = max_keypoints.  Thin single-frame wrapper
    over ``detect_keypoints_batched`` (one implementation to maintain)."""
    kpts, scores, descs, valid = detect_keypoints_batched(
        params, image_gray, max_keypoints=max_keypoints,
        nms_radius=nms_radius, keypoint_threshold=keypoint_threshold,
        border=border,
    )
    return kpts[0], scores[0], descs[0], valid[0]


def detect_keypoints_batched(
    params,
    images_gray: jnp.ndarray,  # (F, 1, H, W) in [0, 1]
    max_keypoints: int = 4096,
    nms_radius: int = 4,
    keypoint_threshold: float = 0.005,
    border: int = 4,
):
    """Batched detector over F same-size frames: one forward/NMS/top-k for
    the whole stack (F sequential calls pay F x the per-fusion dispatch
    cost for identical math).  Returns (kpts (F, K, 2), scores (F, K),
    desc (F, K, 256), valid (F, K))."""
    net = SuperPointNet()
    semi, desc_grid = net.apply(params, images_gray)
    scores = _depth_to_space_scores(semi)  # (F, H, W)
    scores = simple_nms(scores, nms_radius)
    F, H, W = scores.shape

    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    in_border = (
        (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    )
    scores = jnp.where(in_border[None], scores, 0.0)

    flat = scores.reshape(F, -1)
    k = min(max_keypoints, flat.shape[1])
    top_scores, top_idx = jax.lax.top_k(flat, k)  # (F, K)
    ys = top_idx // W
    xs = top_idx % W
    kpts = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)  # (F, K, 2)
    valid = top_scores > keypoint_threshold

    descs = jax.vmap(_sample_descriptors)(kpts, desc_grid)
    return kpts, top_scores, descs, valid
