"""SuperGlue attentional matcher in Flax.

TPU-native replacement for the hloc SuperGlue stage the reference calls
(reference: pose_diffusion/util/match_extraction.py:92-98; SURVEY.md N3).
Architecture-parity port of the MagicLeap SuperGlue network so the released
``superglue_outdoor.pth`` weights load through ``convert.convert_superglue``:

* keypoint encoder: MLP([3, 32, 64, 128, 256]) over (x, y, score), added to
  the visual descriptors,
* attentional GNN: 18 alternating self/cross attention layers (4 heads,
  dim 256), message MLP([512, 512, 256]) with residual,
* final projection + scaled dot scores + log-domain Sinkhorn optimal
  transport with a learned dustbin score,
* mutual-nearest filtering with a match threshold.

Padded keypoint sets carry validity masks so pair matching jits at a fixed
K; the BatchNorms run in inference mode on the loaded running statistics.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from posediffusion_tpu.ops.attention import mha_attention

_NEG = -1e9


class ConvBNBlock(nn.Module):
    """Conv1d (pointwise Dense) + BatchNorm(inference) + optional ReLU."""

    features: int
    relu: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.features, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        x = (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias
        return nn.relu(x) if self.relu else x


class PointMLP(nn.Module):
    """MLP over the channel dim of (..., N, C) token sets (torch Conv1d
    stacks with BN+ReLU between layers, none after the last)."""

    channels: Sequence[int]
    final_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.channels)
        for i, ch in enumerate(self.channels):
            last = i == n - 1
            if last and not self.final_bn:
                x = nn.Dense(ch, name=f"layers_{i}")(x)
            else:
                x = ConvBNBlock(ch, relu=not last, name=f"layers_{i}")(x)
        return x


class MultiHeadedAttention(nn.Module):
    """MagicLeap's head layout is channel-INTERLEAVED: the (B, C, N) conv
    output is viewed as (B, Dh, H, N), so head h owns channels {d*H + h} —
    not the contiguous {h*Dh + d} split of torch.nn.MultiheadAttention.
    The runtime module uses the CONTIGUOUS split (a (..., Dh, 4) view is
    layout-hostile on TPU: minor dim 4 pads to the 128-lane tile);
    ``convert._head_perm`` folds the interleaved->contiguous permutation
    into the q/k/v and merge weights, so converted released checkpoints
    produce identical end-to-end outputs — pinned by
    tests/test_superglue_twin.py, whose torch side independently implements
    MagicLeap's interleaved ``view(B, Dh, H, N)`` layout."""

    num_heads: int = 4
    d_model: int = 256

    @nn.compact
    def __call__(self, query, key, value, mask: Optional[jnp.ndarray] = None):
        B, Nq, _ = query.shape
        Nk = key.shape[1]
        Dh = self.d_model // self.num_heads
        q = nn.Dense(self.d_model, name="proj_q")(query)
        k = nn.Dense(self.d_model, name="proj_k")(key)
        v = nn.Dense(self.d_model, name="proj_v")(value)

        def heads(a, n):
            # contiguous: channel c = h * Dh + d  ->  (B, H, n, Dh)
            return a.reshape(B, n, self.num_heads, Dh).transpose(0, 2, 1, 3)

        out = mha_attention(heads(q, Nq), heads(k, Nk), heads(v, Nk), mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, self.d_model)
        return nn.Dense(self.d_model, name="merge")(out)


class AttentionalPropagation(nn.Module):
    d_model: int = 256
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, source, source_mask=None):
        message = MultiHeadedAttention(self.num_heads, self.d_model, name="attn")(
            x, source, source, mask=source_mask
        )
        # MagicLeap MLP([512, 512, 256]): two convs (512 -> 512 BN+ReLU -> 256)
        return PointMLP([2 * self.d_model, self.d_model], name="mlp")(
            jnp.concatenate([x, message], axis=-1)
        )


def normalize_keypoints(kpts, hw):
    """MagicLeap keypoint normalization: center at the image midpoint,
    divide by 0.7 * max side.  ``hw``: a static (h, w) tuple, or a
    (..., 2) array of per-frame sizes (broadcast against (..., K, 2) kpts).
    Single source of truth for SuperGlueNet and the fused-kernel front half
    (encode_keypoints)."""
    if isinstance(hw, tuple):
        h, w = hw
        center = jnp.asarray([w / 2.0, h / 2.0])
        return (kpts - center) / (0.7 * max(w, h))
    hw = jnp.asarray(hw, jnp.float32)
    center = hw[..., ::-1] / 2.0                       # (..., 2) = (cx, cy)
    denom = 0.7 * jnp.max(hw, axis=-1, keepdims=True)  # (..., 1)
    return (kpts - center[..., None, :]) / denom[..., None, :]


class SuperGlueNet(nn.Module):
    d_model: int = 256
    num_heads: int = 4
    gnn_layers: int = 9  # self+cross pairs

    @nn.compact
    def __call__(
        self,
        desc0, desc1,          # (1, K, 256) visual descriptors
        kpts0, kpts1,          # (1, K, 2) pixel keypoints
        scores0, scores1,      # (1, K) detector scores
        mask0, mask1,          # (1, K) validity
        image_hw0: Tuple[int, int],
        image_hw1: Tuple[int, int] = None,
    ):
        image_hw1 = image_hw1 or image_hw0

        n0 = normalize_keypoints(kpts0, image_hw0)
        n1 = normalize_keypoints(kpts1, image_hw1)

        # MagicLeap KeypointEncoder: MLP([3] + [32, 64, 128, 256] + [256])
        # -> 5 convs, BN+ReLU after all but the last
        kenc = PointMLP([32, 64, 128, 256, 256], name="kenc")
        x0 = desc0 + kenc(jnp.concatenate([n0, scores0[..., None]], -1))
        x1 = desc1 + kenc(jnp.concatenate([n1, scores1[..., None]], -1))

        for i in range(2 * self.gnn_layers):
            layer = AttentionalPropagation(
                self.d_model, self.num_heads, name=f"gnn_{i}"
            )
            if i % 2 == 0:  # self attention
                x0 = x0 + layer(x0, x0, source_mask=mask0)
                x1 = x1 + layer(x1, x1, source_mask=mask1)
            else:  # cross attention
                x0, x1 = (
                    x0 + layer(x0, x1, source_mask=mask1),
                    x1 + layer(x1, x0, source_mask=mask0),
                )

        proj = nn.Dense(self.d_model, name="final_proj")
        m0 = proj(x0)
        m1 = proj(x1)
        scores = jnp.einsum("bnd,bmd->bnm", m0, m1) / self.d_model**0.5
        return scores


def encode_keypoints(params, desc, kpts, scores, image_hw):
    """Batched keypoint-encoder initialization: x = desc + kenc(pos, score).

    The per-frame front half of SuperGlueNet, exposed separately so the
    fused pair-matching kernel (ops/superglue_kernel.py) can consume
    kenc-initialized tokens; one jit call covers all frames.

    Args:
        params: converted SuperGlue params ({"net": ..., "bin_score": ...}).
        desc: (F, K, 256) descriptors; kpts: (F, K, 2) pixel keypoints;
        scores: (F, K) detector scores; image_hw: (F, 2) per-frame (h, w).
    Returns (F, K, 256) initialized tokens.
    """
    n = normalize_keypoints(kpts, image_hw)
    kenc = PointMLP([32, 64, 128, 256, 256])
    feats = kenc.apply(
        {"params": params["net"]["params"]["kenc"]},
        jnp.concatenate([n, scores[..., None]], -1),
    )
    return desc + feats


def log_sinkhorn(scores, bin_score, mask0, mask1, iterations: int):
    """Log-domain Sinkhorn over the (K0+1) x (K1+1) augmented score matrix.

    Padded rows/cols are masked to -inf against real entries; marginals count
    only valid keypoints (MagicLeap ``log_optimal_transport`` semantics with
    per-set cardinalities).
    """
    b, m, n = scores.shape
    valid0 = mask0.astype(scores.dtype)
    valid1 = mask1.astype(scores.dtype)
    pair_mask = valid0[:, :, None] * valid1[:, None, :]
    scores = jnp.where(pair_mask > 0, scores, _NEG)

    bins0 = jnp.full((b, m, 1), bin_score)
    bins1 = jnp.full((b, 1, n), bin_score)
    alpha = jnp.full((b, 1, 1), bin_score)
    couplings = jnp.concatenate(
        [
            jnp.concatenate([scores, bins0], -1),
            jnp.concatenate([bins1, alpha], -1),
        ],
        1,
    )  # (b, m+1, n+1)

    ms = jnp.sum(valid0, axis=1)  # (b,)
    ns = jnp.sum(valid1, axis=1)
    norm = -jnp.log(ms + ns)  # (b,)

    log_mu = jnp.concatenate(
        [jnp.where(mask0, norm[:, None], _NEG), (jnp.log(ns) + norm)[:, None]], 1
    )  # (b, m+1)
    log_nu = jnp.concatenate(
        [jnp.where(mask1, norm[:, None], _NEG), (jnp.log(ms) + norm)[:, None]], 1
    )  # (b, n+1)

    # padded row/col entries of the coupling: -inf except against the bin
    row_valid = jnp.concatenate([mask0, jnp.ones((b, 1), bool)], 1)
    col_valid = jnp.concatenate([mask1, jnp.ones((b, 1), bool)], 1)
    cell_mask = row_valid[:, :, None] & col_valid[:, None, :]
    couplings = jnp.where(cell_mask, couplings, _NEG)

    u = jnp.zeros_like(log_mu)
    v = jnp.zeros_like(log_nu)

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
        return u, v

    u, v = jax.lax.fori_loop(0, iterations, body, (u, v))
    Z = couplings + u[:, :, None] + v[:, None, :]
    return Z - norm[:, None, None]


def match_pairs_batched_xla(
    x, mask0, mask1, stacks,
    sinkhorn_iterations: int = 50,
    match_threshold: float = 0.2,
    nhead: int = 4,
):
    """Batched matcher over C pairs from kenc-initialized tokens, pure XLA.

    The large-K path: the fused Pallas kernel (ops/superglue_kernel.py)
    holds per-pair (K, K) score matrices in VMEM, which stops fitting above
    K ~ 2048; here the whole 18-layer GNN is ONE ``lax.fori_loop`` over the
    stacked per-layer weights (so the chunk costs a handful of XLA
    dispatches, not ~290 per pair) and the (C, K, K) buffers live in HBM.
    Batching over C pairs keeps the K x K x D matmuls MXU-shaped.

    Args:
        x: (C, 2, K, D) kenc-initialized descriptors
           (matching.superglue.encode_keypoints).
        mask0/mask1: (C, K) validity for set 0 / set 1.
        stacks: stacked folded weights (ops.superglue_kernel.
            stack_superglue_params) — wq/bq/... (L2, D, D)/(L2, 1, D),
            wf/bf final projection, bin dustbin score.
    Returns (matches0 (C, K) int32 into set 1 or -1, mscores0 (C, K) f32),
    the contract of ops.superglue_kernel.fused_match_pairs.
    """
    C, two, K, D = x.shape
    Dh = D // nhead
    scale = 1.0 / (Dh ** 0.5)
    bias0 = jnp.where(mask0.astype(bool), 0.0, _NEG).astype(jnp.float32)
    bias1 = jnp.where(mask1.astype(bool), 0.0, _NEG).astype(jnp.float32)
    L2 = stacks["wq"].shape[0]

    def attn_message(xq, src, key_bias, w):
        (wq, bq, wk, bk, wv, bv, wm, bm, w1, b1, w2, b2) = w
        q = jnp.einsum("ckd,de->cke", xq, wq) + bq
        k = jnp.einsum("ckd,de->cke", src, wk) + bk
        v = jnp.einsum("ckd,de->cke", src, wv) + bv
        qh = q.reshape(C, K, nhead, Dh)
        kh = k.reshape(C, K, nhead, Dh)
        vh = v.reshape(C, K, nhead, Dh)
        logits = (
            jnp.einsum("cqhd,ckhd->chqk", qh, kh) * scale
            + key_bias[:, None, None, :]
        )
        p = jax.nn.softmax(logits, axis=-1)
        msg = jnp.einsum("chqk,ckhd->cqhd", p, vh).reshape(C, K, D)
        msg = jnp.einsum("ckd,de->cke", msg, wm) + bm
        cat = jnp.concatenate([xq, msg], axis=-1)
        hmid = jnp.maximum(jnp.einsum("ckd,df->ckf", cat, w1) + b1, 0.0)
        return jnp.einsum("ckf,fd->ckd", hmid, w2) + b2

    def layer(i, x01):
        x0, x1 = x01
        w = tuple(
            stacks[n][i] for n in
            ("wq", "bq", "wk", "bk", "wv", "bv", "wm", "bm",
             "w1", "b1", "w2", "b2")
        )
        sel = (i % 2 == 1).astype(jnp.float32)  # cross layers are odd
        src0 = (1.0 - sel) * x0 + sel * x1
        src1 = (1.0 - sel) * x1 + sel * x0
        kb0 = (1.0 - sel) * bias0 + sel * bias1
        kb1 = (1.0 - sel) * bias1 + sel * bias0
        x0 = x0 + attn_message(x0, src0, kb0, w)
        x1 = x1 + attn_message(x1, src1, kb1, w)
        return x0, x1

    x0, x1 = jax.lax.fori_loop(
        0, L2, layer, (x[:, 0].astype(jnp.float32), x[:, 1].astype(jnp.float32))
    )

    m0 = jnp.einsum("ckd,de->cke", x0, stacks["wf"]) + stacks["bf"]
    m1 = jnp.einsum("ckd,de->cke", x1, stacks["wf"]) + stacks["bf"]
    scores = jnp.einsum("cnd,cmd->cnm", m0, m1) / D**0.5

    mask0b = mask0.astype(bool)
    mask1b = mask1.astype(bool)
    Z = log_sinkhorn(
        scores, stacks["bin"][0, 0], mask0b, mask1b, sinkhorn_iterations
    )[:, :-1, :-1]

    max0 = jnp.max(Z, axis=2)
    idx0 = jnp.argmax(Z, axis=2)
    idx1 = jnp.argmax(Z, axis=1)
    mutual = (
        jnp.take_along_axis(idx1, idx0, axis=1) == jnp.arange(K)[None]
    )
    mscores = jnp.exp(max0)
    ok = mutual & (mscores > match_threshold) & mask0b
    ok = ok & jnp.take_along_axis(mask1b, idx0, axis=1)
    return jnp.where(ok, idx0, -1), jnp.where(ok, mscores, 0.0)


def match_pair(
    params,
    desc0, desc1, kpts0, kpts1, scores0, scores1, mask0, mask1,
    image_hw: Tuple[int, int],
    sinkhorn_iterations: int = 50,
    match_threshold: float = 0.2,
    image_hw1: Tuple[int, int] = None,
):
    """Match two padded keypoint sets.

    Returns (matches0 (K0,) int32 index into set 1 or -1, mscores0 (K0,)).
    ``image_hw`` normalizes set 0's keypoints; pass ``image_hw1`` when the
    two frames have different resolutions.
    """
    net = SuperGlueNet()
    scores = net.apply(
        params["net"], desc0, desc1, kpts0, kpts1, scores0, scores1,
        mask0, mask1, image_hw, image_hw1,
    )
    Z = log_sinkhorn(
        scores, params["bin_score"], mask0, mask1, sinkhorn_iterations
    )[:, :-1, :-1]

    max0 = jnp.max(Z, axis=2)
    idx0 = jnp.argmax(Z, axis=2)
    idx1 = jnp.argmax(Z, axis=1)
    mutual = jnp.take_along_axis(idx1, idx0, axis=1) == jnp.arange(Z.shape[1])[None]
    mscores = jnp.exp(max0)
    ok = mutual & (mscores > match_threshold) & mask0
    ok = ok & jnp.take_along_axis(mask1, idx0, axis=1)
    matches0 = jnp.where(ok, idx0, -1)
    return matches0[0], jnp.where(ok, mscores, 0.0)[0]
