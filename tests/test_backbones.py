"""Alternate feature-extractor backbones (reference modelname contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posediffusion_tpu.models import MultiScaleImageFeatureExtractor
from posediffusion_tpu.models.resnet import ResNet, convert_resnet, resnet50
from posediffusion_tpu.models.vit import VisionTransformer, vit_small_dinov2


class TestResNet:
    def test_resnet50_shapes(self, rng):
        model = ResNet(layers=(1, 1, 1, 1))  # tiny depth for test speed
        img = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), img)
        out = model.apply(params, img)
        assert out.shape == (1, 2048)
        assert bool(jnp.isfinite(out).all())

    def test_converter_accepts_torchvision_layout(self, rng):
        torch = pytest.importorskip("torch")

        # synthetic torchvision-style state dict for layers (1,1,1,1)
        sd = {}

        def conv(key, o, i, k):
            sd[f"{key}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.05

        def bn(key, c):
            sd[f"{key}.weight"] = np.ones(c, np.float32)
            sd[f"{key}.bias"] = np.zeros(c, np.float32)
            sd[f"{key}.running_mean"] = np.zeros(c, np.float32)
            sd[f"{key}.running_var"] = np.ones(c, np.float32)

        conv("conv1", 64, 3, 7)
        bn("bn1", 64)
        in_ch = 64
        feats = [64, 128, 256, 512]
        for stage in range(1, 5):
            f = feats[stage - 1]
            prefix = f"layer{stage}.0"
            conv(f"{prefix}.conv1", f, in_ch, 1)
            bn(f"{prefix}.bn1", f)
            conv(f"{prefix}.conv2", f, f, 3)
            bn(f"{prefix}.bn2", f)
            conv(f"{prefix}.conv3", f * 4, f, 1)
            bn(f"{prefix}.bn3", f * 4)
            conv(f"{prefix}.downsample.0", f * 4, in_ch, 1)
            bn(f"{prefix}.downsample.1", f * 4)
            in_ch = f * 4

        params = {"params": convert_resnet(sd)}
        model = ResNet(layers=(1, 1, 1, 1))
        img = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)).astype(np.float32))
        out = model.apply(params, img)
        assert out.shape == (1, 2048)


class TestDinoV2:
    def test_layer_scale_variant_runs(self, rng):
        model = VisionTransformer(
            patch_size=14, embed_dim=48, depth=2, num_heads=2,
            pos_grid=4, layer_scale=True,
        )
        img = jnp.asarray(rng.uniform(size=(1, 3, 56, 56)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), img)
        assert "ls1_gamma" in params["params"]["blocks_0"]
        out = model.apply(params, img)
        assert out.shape == (1, 48)

    def test_converter_handles_ls_gamma(self, rng):
        from posediffusion_tpu.utils.convert import convert_dino_vit

        # minimal dinov2-style state dict, 1 block
        d = 48
        sd = {
            "cls_token": rng.normal(size=(1, 1, d)).astype(np.float32),
            "pos_embed": rng.normal(size=(1, 17, d)).astype(np.float32),
            "patch_embed.proj.weight": rng.normal(size=(d, 3, 14, 14)).astype(np.float32),
            "patch_embed.proj.bias": np.zeros(d, np.float32),
            "norm.weight": np.ones(d, np.float32),
            "norm.bias": np.zeros(d, np.float32),
        }
        b = "blocks.0"
        for n in ("norm1", "norm2"):
            sd[f"{b}.{n}.weight"] = np.ones(d, np.float32)
            sd[f"{b}.{n}.bias"] = np.zeros(d, np.float32)
        sd[f"{b}.attn.qkv.weight"] = rng.normal(size=(3 * d, d)).astype(np.float32)
        sd[f"{b}.attn.qkv.bias"] = np.zeros(3 * d, np.float32)
        sd[f"{b}.attn.proj.weight"] = rng.normal(size=(d, d)).astype(np.float32)
        sd[f"{b}.attn.proj.bias"] = np.zeros(d, np.float32)
        sd[f"{b}.mlp.fc1.weight"] = rng.normal(size=(4 * d, d)).astype(np.float32)
        sd[f"{b}.mlp.fc1.bias"] = np.zeros(4 * d, np.float32)
        sd[f"{b}.mlp.fc2.weight"] = rng.normal(size=(d, 4 * d)).astype(np.float32)
        sd[f"{b}.mlp.fc2.bias"] = np.zeros(d, np.float32)
        sd[f"{b}.ls1.gamma"] = np.full(d, 0.5, np.float32)
        sd[f"{b}.ls2.gamma"] = np.full(d, 0.5, np.float32)

        params = {"params": convert_dino_vit(sd)}
        model = VisionTransformer(
            patch_size=14, embed_dim=d, depth=1, num_heads=2,
            pos_grid=4, layer_scale=True,
        )
        img = jnp.asarray(rng.uniform(size=(1, 3, 56, 56)).astype(np.float32))
        out = model.apply(params, img)
        assert bool(jnp.isfinite(out).all())


class TestExtractorBackbones:
    @pytest.mark.parametrize("name,dim", [("dino_vits16", 384)])
    def test_extractor_output_dim(self, rng, name, dim):
        m = MultiScaleImageFeatureExtractor(
            modelname=name, scale_factors=(1.0,), depth=1
        )
        assert m.output_dim == dim

    def test_dinov2_multiscale_packed_equals_per_scale(self, rng):
        """Scale packing must be exactly per-scale forwards for the patch-14
        LayerScale (dinov2) variant too."""
        from posediffusion_tpu.ops.image import (
            imagenet_normalize,
            resize_bilinear,
            scale_size,
        )

        d = 32
        ext = MultiScaleImageFeatureExtractor(
            modelname="dinov2_vits14", scale_factors=(1.0, 0.5),
            embed_dim=d, depth=1, num_heads=2,
        )
        img = jnp.asarray(rng.uniform(size=(2, 3, 56, 56)).astype(np.float32))
        params = ext.init(jax.random.PRNGKey(0), img)
        out = ext.apply(params, img)

        vit = VisionTransformer(
            patch_size=14, embed_dim=d, depth=1, num_heads=2,
            pos_grid=37, layer_scale=True,
        )
        norm = imagenet_normalize(img)
        f1 = vit.apply({"params": params["params"]["net"]}, norm)
        small = resize_bilinear(norm, (scale_size(56, 0.5),) * 2)
        f2 = vit.apply({"params": params["params"]["net"]}, small)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray((f1 + f2) / 2), atol=2e-5
        )

    def test_resnet_extractor_forward(self, rng):
        m = MultiScaleImageFeatureExtractor(
            modelname="resnet50", scale_factors=(1.0,)
        )
        # note: full resnet50 init is heavy; use one scale + small image
        img = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), img)
        out = m.apply(params, img)
        assert out.shape == (1, 2048)
