"""DINO-compatible ViT backbone (ViT-S/16 by default) in Flax.

Replaces the torch.hub DINO backbone the reference loads
(reference: pose_diffusion/models/image_feature_extractor.py:41-43;
SURVEY.md N5).  Architecture parity with facebookresearch/dino's
``vit_small(patch_size=16)``:

* Conv patch embed (16x16, stride 16) -> 384 dims, CLS token, learned
  absolute position embeddings with **bicubic interpolation** for non-224
  inputs (the multiscale extractor feeds 1, 1/2, 1/3 scales),
* 12 pre-norm blocks: LN(eps 1e-6) -> packed-QKV attention (6 heads) ->
  LN -> MLP(4x, exact GELU),
* final LN; the forward feature is the CLS token.

Attention dispatches through the fused Pallas kernel on TPU.  Position
embeddings interpolate with exact torch bicubic semantics (Keys a=-0.75,
ops.image.resize_bicubic_torch, pinned against F.interpolate in tests);
DINO's +0.1 scale-factor fudge shifts the grid by <2% of a cell and is the
only remaining (negligible) deviation.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from posediffusion_tpu.ops.attention import mha_attention


class ViTAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias=None) -> jnp.ndarray:
        B, N, C = x.shape
        Dh = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(a):
            return a.reshape(B, N, self.num_heads, Dh).transpose(0, 2, 1, 3)

        out = mha_attention(heads(q), heads(k), heads(v), attn_bias=attn_bias)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C).astype(self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTMlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU is the exact erf form
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layer_scale: bool = False  # DINOv2-style LayerScale (ls1/ls2 gamma)
    dtype: jnp.dtype = jnp.float32  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias=None) -> jnp.ndarray:
        # The residual stream arrives at the trunk's compute dtype (the
        # trunk casts once after pos-embed add): in bfloat16 mode that
        # halves the HBM traffic of every LayerNorm/residual/GELU pass,
        # which dominates once matmuls run at the MXU's bf16 rate.
        # LayerNorm statistics are pinned to f32 regardless (params are f32
        # too); matmul-heavy blocks run in self.dtype.
        h = ViTAttention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(
            nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x),
            attn_bias,
        ).astype(x.dtype)
        if self.layer_scale:
            h = h * self.param("ls1_gamma", nn.initializers.ones, (self.dim,))
        x = x + h
        h = ViTMlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        ).astype(x.dtype)
        if self.layer_scale:
            h = h * self.param("ls2_gamma", nn.initializers.ones, (self.dim,))
        return x + h


class VisionTransformer(nn.Module):
    """DINO-style ViT. Input NCHW float images; output CLS feature (B, dim)."""

    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    pos_grid: int = 14  # pos_embed trained at 224/16 = 14x14 patches
    layer_scale: bool = False  # DINOv2 variants
    dtype: jnp.dtype = jnp.float32  # block compute dtype (bfloat16 option)
    # Rematerialize blocks in the backward pass: at the reference's training
    # scale (512 images x 197 tokens) the saved fc1 activations alone are
    # ~7 GB, blowing the 16 GB HBM; remat trades ~1/3 extra forward FLOPs for
    # O(1) activation memory.  Inference (no grad) is unaffected.
    remat: bool = True

    def interpolate_pos_encoding(self, pos_embed: jnp.ndarray, h0: int, w0: int):
        """Bicubic-resample the patch position grid to (h0, w0) with exact
        torch bicubic semantics (Keys a=-0.75, DINO
        vision_transformer.interpolate_pos_encoding)."""
        from posediffusion_tpu.ops.image import resize_bicubic_torch

        cls_pos = pos_embed[:, :1]
        patch_pos = pos_embed[:, 1:]
        g = self.pos_grid
        if h0 == g and w0 == g:
            return pos_embed
        patch_pos = patch_pos.reshape(1, g, g, self.embed_dim)
        patch_pos = resize_bicubic_torch(patch_pos, (h0, w0))
        patch_pos = patch_pos.reshape(1, h0 * w0, self.embed_dim)
        return jnp.concatenate([cls_pos, patch_pos], axis=1)

    @nn.compact
    def __call__(
        self, images_nchw: jnp.ndarray, scale_factors=None
    ) -> jnp.ndarray:
        """Single-scale: (B, 3, H, W) -> (B, dim) CLS feature.

        ``scale_factors``: run the multiscale pyramid in ONE trunk pass by
        packing each image's per-scale token sequences into a single row
        under a block-diagonal attention bias (exactly equivalent to
        independent per-scale forwards — token counts add with zero
        linear-layer FLOP waste, and one pass replaces len(scales) passes).
        Returns (B, n_scales, dim) per-scale CLS features.
        """
        B = images_nchw.shape[0]
        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, self.embed_dim)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, 1 + self.pos_grid**2, self.embed_dim),
        )
        patch_embed = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            name="patch_embed",
        )

        def embed(img_nchw):
            if min(img_nchw.shape[-2:]) < self.patch_size:
                raise ValueError(
                    f"image {img_nchw.shape[-2:]} smaller than one "
                    f"{self.patch_size}px patch — raise img_size or drop "
                    "the offending scale factor"
                )
            x = patch_embed(img_nchw.transpose(0, 2, 3, 1))
            _, h0, w0, _ = x.shape
            x = x.reshape(B, h0 * w0, self.embed_dim)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)), x], axis=1
            )
            return x + self.interpolate_pos_encoding(pos_embed, h0, w0)

        attn_bias = None
        if scale_factors is None:
            x = embed(images_nchw)
        else:
            from posediffusion_tpu.ops.image import resize_bilinear, scale_size

            import numpy as np

            H, W = images_nchw.shape[-2:]
            toks = []
            for s in scale_factors:
                inp = images_nchw if s == 1 else resize_bilinear(
                    images_nchw, (scale_size(H, s), scale_size(W, s)),
                    scale_factor=s,
                )
                toks.append(embed(inp))
            offsets = np.cumsum([0] + [t.shape[1] for t in toks])
            if len(toks) > 1:
                seg = np.concatenate(
                    [np.full(t.shape[1], i) for i, t in enumerate(toks)]
                )
                attn_bias = jnp.asarray(
                    np.where(seg[:, None] == seg[None, :], 0.0, -1e30)
                    .astype(np.float32)
                )
            x = jnp.concatenate(toks, axis=1) if len(toks) > 1 else toks[0]

        # one cast into the compute dtype for the whole trunk: the residual
        # stream (and so every LN/residual/GELU HBM pass) runs at bf16 width
        # in bfloat16 mode; the final norm below is pinned f32, so trunk
        # OUTPUTS are f32 either way
        x = x.astype(self.dtype)
        block_cls = nn.remat(ViTBlock) if self.remat else ViTBlock
        for i in range(self.depth):
            x = block_cls(
                self.embed_dim, self.num_heads, self.mlp_ratio,
                layer_scale=self.layer_scale, dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, attn_bias)

        norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")
        if scale_factors is None:
            return norm(x)[:, 0]
        return norm(
            jnp.stack([x[:, int(o)] for o in offsets[:-1]], axis=1)
        )


def vit_small(patch_size: int = 16) -> VisionTransformer:
    return VisionTransformer(
        patch_size=patch_size, embed_dim=384, depth=12, num_heads=6
    )


def vit_base(patch_size: int = 16) -> VisionTransformer:
    return VisionTransformer(
        patch_size=patch_size, embed_dim=768, depth=12, num_heads=12
    )


def vit_small_dinov2() -> VisionTransformer:
    """DINOv2 ViT-S/14 (reference: image_feature_extractor.py:38-40 accepts
    ``dinov2_*`` backbones): patch 14, LayerScale, pos grid 37 (518px)."""
    return VisionTransformer(
        patch_size=14, embed_dim=384, depth=12, num_heads=6,
        pos_grid=37, layer_scale=True,
    )
