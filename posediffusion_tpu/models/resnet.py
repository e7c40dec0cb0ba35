"""ResNet backbone (torchvision-compatible) in Flax.

The reference's feature extractor optionally uses torchvision ResNets as the
backbone (reference: models/image_feature_extractor.py:34-37, selected by
``modelname: resnet50`` etc.); this provides the same capability with a
converter-friendly layout.  Output is the global-average-pooled feature
(the reference replaces ``fc`` with Identity).

BatchNorms run in inference mode on loaded running statistics (training the
backbone from scratch is out of scope for parity; the reference fine-tunes
from ImageNet weights, which convert via ``convert_resnet``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BatchNormInference(nn.Module):
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) / jnp.sqrt(var + self.eps) * scale + bias


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32  # conv compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNormInference(self.features, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = BatchNormInference(self.features, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features * self.expansion, (1, 1), use_bias=False,
            dtype=self.dtype, name="conv3",
        )(out)
        out = BatchNormInference(self.features * self.expansion, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.features * self.expansion, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = BatchNormInference(
                self.features * self.expansion, name="downsample_bn"
            )(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Bottleneck ResNet; layers=(3, 4, 6, 3) is ResNet-50.

    Input NCHW float images; output (B, 512 * expansion) pooled features.
    """

    layers: Tuple[int, ...] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images_nchw: jnp.ndarray) -> jnp.ndarray:
        x = images_nchw.transpose(0, 2, 3, 1)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = BatchNormInference(64, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        features = 64
        for stage, blocks in enumerate(self.layers):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = Bottleneck(
                    features,
                    stride=stride,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            features *= 2

        return jnp.mean(x, axis=(1, 2))  # global average pool


def resnet50() -> ResNet:
    return ResNet(layers=(3, 4, 6, 3))


def resnet101() -> ResNet:
    return ResNet(layers=(3, 4, 23, 3))


def convert_resnet(sd) -> dict:
    """torchvision ResNet state dict -> ResNet params (no 'params' wrapper)."""

    def conv(key):
        return {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].transpose(2, 3, 1, 0))}

    def bn(key):
        return {
            "scale": sd[f"{key}.weight"],
            "bias": sd[f"{key}.bias"],
            "mean": sd[f"{key}.running_mean"],
            "var": sd[f"{key}.running_var"],
        }

    params = {"conv1": conv("conv1"), "bn1": bn("bn1")}
    stage = 1
    while f"layer{stage}.0.conv1.weight" in sd:
        b = 0
        while f"layer{stage}.{b}.conv1.weight" in sd:
            prefix = f"layer{stage}.{b}"
            entry = {
                "conv1": conv(f"{prefix}.conv1"),
                "bn1": bn(f"{prefix}.bn1"),
                "conv2": conv(f"{prefix}.conv2"),
                "bn2": bn(f"{prefix}.bn2"),
                "conv3": conv(f"{prefix}.conv3"),
                "bn3": bn(f"{prefix}.bn3"),
            }
            if f"{prefix}.downsample.0.weight" in sd:
                entry["downsample_conv"] = conv(f"{prefix}.downsample.0")
                entry["downsample_bn"] = bn(f"{prefix}.downsample.1")
            params[f"layer{stage}_{b}"] = entry
            b += 1
        stage += 1
    return params
