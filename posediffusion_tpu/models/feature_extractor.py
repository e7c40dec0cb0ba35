"""Multi-scale image feature extractor.

Replaces the reference extractor
(pose_diffusion/models/image_feature_extractor.py:28-87): ImageNet-normalize,
run the ViT backbone at scale factors [1, 1/2, 1/3] (bilinear resize with
torch floor-size semantics) and average the CLS features.  All three scales
trace into one XLA program; the resizes fuse with the normalize.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from posediffusion_tpu.models.vit import VisionTransformer
from posediffusion_tpu.ops.image import imagenet_normalize, resize_bilinear, scale_size


class MultiScaleImageFeatureExtractor(nn.Module):
    """Backbone choices follow the reference's ``modelname`` contract
    (image_feature_extractor.py:34-43): ``dino_vits16`` / ``dino_vitb16``
    (default), ``dinov2_vits14`` (LayerScale, patch 14), or ``resnet50`` /
    ``resnet101`` (pooled features, fc removed)."""

    scale_factors: Sequence[float] = (1.0, 1.0 / 2, 1.0 / 3)
    modelname: str = "dino_vits16"
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    dtype: jnp.dtype = jnp.float32  # ViT block compute dtype

    @property
    def output_dim(self) -> int:
        if "resnet" in self.modelname:
            return 2048
        return self.embed_dim

    @nn.compact
    def __call__(self, images_nchw: jnp.ndarray) -> jnp.ndarray:
        """(B, 3, H, W) float images in [0, 1] -> (B, output_dim) features."""
        if "resnet" in self.modelname:
            from posediffusion_tpu.models.resnet import ResNet

            layers = (3, 4, 23, 3) if "101" in self.modelname else (3, 4, 6, 3)
            net = ResNet(layers=layers, dtype=self.dtype, name="net")
        elif "dinov2" in self.modelname:
            net = VisionTransformer(
                patch_size=14, embed_dim=self.embed_dim, depth=self.depth,
                num_heads=self.num_heads, pos_grid=37, layer_scale=True,
                dtype=self.dtype, name="net",
            )
        else:
            net = VisionTransformer(
                patch_size=self.patch_size,
                embed_dim=self.embed_dim,
                depth=self.depth,
                num_heads=self.num_heads,
                dtype=self.dtype,
                name="net",
            )
        img = imagenet_normalize(images_nchw)
        h, w = img.shape[-2:]

        total = None
        for s in self.scale_factors:
            if s == 1:
                inp = img
            else:
                inp = resize_bilinear(img, (scale_size(h, s), scale_size(w, s)))
            feat = net(inp)
            total = feat if total is None else total + feat
        return total / len(self.scale_factors)
