"""Model parity tests: flax modules + converted weights vs torch twins.

The torch twins are built with torch's own nn primitives configured exactly
like the reference (TransformerEncoder norm_first, MultiheadAttention packed
QKV, exact GELU), state dicts are emitted under the reference's key names,
run through the converter, and outputs compared.  This validates both the
module math and the checkpoint-conversion path without network access to the
released weights.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

from posediffusion_tpu.models import Denoiser, VisionTransformer
from posediffusion_tpu.utils.convert import (
    convert_denoiser,
    convert_dino_vit,
    convert_pose_diffusion_checkpoint,
)


def torch_harmonic(x, n=10):
    freqs = 2.0 ** torch.arange(n, dtype=torch.float32)
    embed = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    return torch.cat([embed.sin(), embed.cos(), x], dim=-1)


def torch_time_embedding(t, dim=256, max_period=10000.0):
    half = dim // 2
    freqs = torch.exp(-math.log(max_period) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TorchDenoiserTwin(tnn.Module):
    """Reference-architecture denoiser twin producing reference key names."""

    def __init__(self, d_model=512, nhead=4, layers=8, ff=1024, z_dim=384):
        super().__init__()

        class TimeEmbed(tnn.Module):
            def __init__(self):
                super().__init__()
                self.linear = tnn.Sequential(
                    tnn.Linear(256, 128), tnn.SiLU(), tnn.Linear(128, 128)
                )

            def forward(self, t):
                return self.linear(torch_time_embedding(t))

        self.time_embed = TimeEmbed()
        self._first = tnn.Linear(189 + 128 + z_dim + 1, d_model)
        layer = tnn.TransformerEncoderLayer(
            d_model=d_model, nhead=nhead, dim_feedforward=ff, dropout=0.1,
            batch_first=True, norm_first=True,
        )
        self._trunk = tnn.TransformerEncoder(layer, layers)
        self._last = tnn.Sequential(
            tnn.Linear(d_model, 128), tnn.LayerNorm(128), tnn.ReLU(), tnn.Linear(128, 9)
        )
        self.z_dim = z_dim

    def forward(self, x, t, z):
        B, N, _ = x.shape
        t_emb = self.time_embed(t).view(B, 1, -1).expand(-1, N, -1)
        x_emb = torch_harmonic(x)
        pivot = torch.zeros_like(z[..., :1])
        pivot[:, 0, :] = 1.0
        z = torch.cat([z, pivot], dim=-1)
        feed = torch.cat([x_emb, t_emb, z], dim=-1)
        h = self._first(feed)
        h = self._trunk(h)
        return self._last(h)


class TestDenoiserParity:
    def test_matches_torch_twin_with_converted_weights(self, rng):
        torch.manual_seed(0)
        twin = TorchDenoiserTwin().eval()
        sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
        params = {"params": convert_denoiser(sd, prefix="")}

        B, N = 2, 7
        x = rng.normal(size=(B, N, 9)).astype(np.float32)
        t = np.array([13, 77], dtype=np.int64)
        z = rng.normal(size=(B, N, 384)).astype(np.float32)

        with torch.no_grad():
            ref = twin(torch.tensor(x), torch.tensor(t), torch.tensor(z)).numpy()

        model = Denoiser()
        out = model.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(z))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

    def test_mask_equals_truncation(self, rng):
        """Padded frames with mask must reproduce the shorter-batch output."""
        model = Denoiser(num_encoder_layers=2, d_model=64, nhead=2, dim_feedforward=128, z_dim=16)
        key = jax.random.PRNGKey(0)
        x = jnp.asarray(rng.normal(size=(1, 8, 9)).astype(np.float32))
        z = jnp.asarray(rng.normal(size=(1, 8, 16)).astype(np.float32))
        t = jnp.asarray([5])
        params = model.init(key, x, t, z)
        mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0, 0]], dtype=bool)
        full = model.apply(params, x, t, z, mask=mask)
        trunc = model.apply(params, x[:, :5], t, z[:, :5])
        np.testing.assert_allclose(
            np.asarray(full[:, :5]), np.asarray(trunc), atol=1e-5
        )


class TorchViTTwin(tnn.Module):
    """DINO-architecture ViT twin (CLS output) with torch primitives."""

    def __init__(self, dim=96, depth=3, heads=3, patch=16, img=64):
        super().__init__()
        self.patch = patch
        self.proj = tnn.Conv2d(3, dim, kernel_size=patch, stride=patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        n = (img // patch) ** 2
        self.pos_embed = tnn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = tnn.ModuleList()
        for _ in range(depth):
            blk = tnn.Module()
            blk.norm1 = tnn.LayerNorm(dim, eps=1e-6)
            blk.attn = tnn.MultiheadAttention(dim, heads, batch_first=True)
            blk.norm2 = tnn.LayerNorm(dim, eps=1e-6)
            blk.fc1 = tnn.Linear(dim, dim * 4)
            blk.fc2 = tnn.Linear(dim * 4, dim)
            self.blocks.append(blk)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        B = x.shape[0]
        x = self.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            h = blk.norm1(x)
            h, _ = blk.attn(h, h, h, need_weights=False)
            x = x + h
            h = blk.norm2(x)
            h = blk.fc2(tnn.functional.gelu(blk.fc1(h)))
            x = x + h
        return self.norm(x)[:, 0]

    def dino_state_dict(self):
        """Emit DINO hub key names for the converter."""
        sd = {}
        sd["cls_token"] = self.cls_token.detach().numpy()
        sd["pos_embed"] = self.pos_embed.detach().numpy()
        sd["patch_embed.proj.weight"] = self.proj.weight.detach().numpy()
        sd["patch_embed.proj.bias"] = self.proj.bias.detach().numpy()
        for i, blk in enumerate(self.blocks):
            p = f"blocks.{i}"
            sd[f"{p}.norm1.weight"] = blk.norm1.weight.detach().numpy()
            sd[f"{p}.norm1.bias"] = blk.norm1.bias.detach().numpy()
            sd[f"{p}.attn.qkv.weight"] = blk.attn.in_proj_weight.detach().numpy()
            sd[f"{p}.attn.qkv.bias"] = blk.attn.in_proj_bias.detach().numpy()
            sd[f"{p}.attn.proj.weight"] = blk.attn.out_proj.weight.detach().numpy()
            sd[f"{p}.attn.proj.bias"] = blk.attn.out_proj.bias.detach().numpy()
            sd[f"{p}.norm2.weight"] = blk.norm2.weight.detach().numpy()
            sd[f"{p}.norm2.bias"] = blk.norm2.bias.detach().numpy()
            sd[f"{p}.mlp.fc1.weight"] = blk.fc1.weight.detach().numpy()
            sd[f"{p}.mlp.fc1.bias"] = blk.fc1.bias.detach().numpy()
            sd[f"{p}.mlp.fc2.weight"] = blk.fc2.weight.detach().numpy()
            sd[f"{p}.mlp.fc2.bias"] = blk.fc2.bias.detach().numpy()
        sd["norm.weight"] = self.norm.weight.detach().numpy()
        sd["norm.bias"] = self.norm.bias.detach().numpy()
        return sd


class TestViTParity:
    def test_matches_torch_twin_at_native_resolution(self, rng):
        torch.manual_seed(1)
        twin = TorchViTTwin().eval()
        sd = twin.dino_state_dict()
        params = {"params": convert_dino_vit(sd)}

        img = rng.uniform(size=(2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = twin(torch.tensor(img)).numpy()

        model = VisionTransformer(patch_size=16, embed_dim=96, depth=3, num_heads=3, pos_grid=4)
        out = model.apply(params, jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

    def test_bf16_trunk_close_to_f32(self, rng):
        """bfloat16 mode (bf16 residual stream, f32 LayerNorm statistics,
        f32 trunk output) tracks the f32 trunk to bf16-roundoff accuracy —
        the accuracy contract behind the fast train path."""
        import jax.numpy as jnp_

        model32 = VisionTransformer(
            patch_size=16, embed_dim=96, depth=3, num_heads=3, pos_grid=4
        )
        model16 = VisionTransformer(
            patch_size=16, embed_dim=96, depth=3, num_heads=3, pos_grid=4,
            dtype=jnp_.bfloat16,
        )
        img = jnp.asarray(rng.uniform(size=(2, 3, 64, 64)).astype(np.float32))
        params = model32.init(jax.random.PRNGKey(0), img)
        out32 = np.asarray(model32.apply(params, img))
        out16 = np.asarray(model16.apply(params, img))
        assert out16.dtype == np.float32  # final norm pins f32
        scale = np.abs(out32).mean()
        assert np.abs(out16 - out32).mean() < 0.03 * scale

    def test_pos_embed_interpolation_at_other_scales(self, rng):
        """Non-native input sizes run (fractional patch grids); outputs finite
        and scale-dependent."""
        model = VisionTransformer(patch_size=16, embed_dim=96, depth=2, num_heads=3, pos_grid=4)
        img64 = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), img64)
        for size in (32, 42, 64):
            img = jnp.asarray(rng.uniform(size=(1, 3, size, size)).astype(np.float32))
            out = model.apply(params, img)
            assert out.shape == (1, 96)
            assert bool(jnp.isfinite(out).all())


class TestFullConverter:
    def test_full_checkpoint_roundtrip_keys(self, rng):
        """A synthetic full reference checkpoint converts into a pytree that
        the real modules accept."""
        torch.manual_seed(2)
        vit_twin = TorchViTTwin(dim=96, depth=2, heads=3, img=64)
        den_twin = TorchDenoiserTwin(d_model=64, nhead=2, layers=2, ff=128, z_dim=96)
        sd = {}
        for k, v in vit_twin.dino_state_dict().items():
            sd[f"image_feature_extractor._net.{k}"] = v
        for k, v in den_twin.state_dict().items():
            sd[f"diffuser.model.{k}"] = v.detach().numpy()
        params = convert_pose_diffusion_checkpoint(sd)

        den = Denoiser(z_dim=96, d_model=64, nhead=2, num_encoder_layers=2, dim_feedforward=128)
        x = jnp.asarray(rng.normal(size=(1, 3, 9)).astype(np.float32))
        z = jnp.asarray(rng.normal(size=(1, 3, 96)).astype(np.float32))
        out = den.apply(params["denoiser"], x, jnp.asarray([0]), z)
        assert out.shape == (1, 3, 9)

        vit = VisionTransformer(patch_size=16, embed_dim=96, depth=2, num_heads=3, pos_grid=4)
        img = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)).astype(np.float32))
        feat = vit.apply({"params": params["extractor"]["params"]["net"]}, img)
        assert feat.shape == (1, 96)

    def test_manifest_trunk_matches_torch_transformer_encoder(self):
        """The hand-written trunk manifest must equal the exact state-dict
        layout of torch.nn.TransformerEncoder (the reference's trunk,
        denoiser.py:79-98) — keys AND shapes."""
        from posediffusion_tpu.utils.manifest import denoiser_manifest

        layer = torch.nn.TransformerEncoderLayer(
            512, 4, 1024, dropout=0.1, batch_first=True, norm_first=True
        )
        trunk = torch.nn.TransformerEncoder(layer, 8)
        torch_keys = {
            f"diffuser.model._trunk.{k}": tuple(v.shape)
            for k, v in trunk.state_dict().items()
        }
        ours = {
            k: v for k, v in denoiser_manifest().items() if "._trunk." in k
        }
        assert ours == torch_keys

    def test_converter_consumes_full_reference_manifest(self):
        """Converter hardening (VERDICT r1 #9): every key a released
        reference checkpoint contains must be consumed by the converter (or
        be a known recomputed constant), and the converted pytree must match
        the Flax model's init tree leaf-for-leaf — so a real .pth either
        converts completely or fails loudly, never silently drops weights."""
        from posediffusion_tpu.models import PoseDiffusionConfig, PoseDiffusionModel
        from posediffusion_tpu.utils.convert import extract_schedule_buffers
        from posediffusion_tpu.utils.manifest import (
            OPTIONAL_CONSTANT_KEYS,
            reference_checkpoint_manifest,
        )

        manifest = reference_checkpoint_manifest("co3d")

        class TrackingDict(dict):
            def __init__(self, base):
                super().__init__(base)
                self.consumed = set()

            def __getitem__(self, k):
                self.consumed.add(k)
                return super().__getitem__(k)

        sd = TrackingDict(
            {k: np.full(s, 0.01, np.float32) for k, s in manifest.items()}
        )
        params = convert_pose_diffusion_checkpoint(sd)
        buffers = extract_schedule_buffers(sd)
        assert len(buffers) == 13

        unconsumed = set(manifest) - sd.consumed - set(OPTIONAL_CONSTANT_KEYS)
        assert not unconsumed, f"converter silently drops: {sorted(unconsumed)}"

        model = PoseDiffusionModel(PoseDiffusionConfig())
        init = model.init(jax.random.PRNGKey(0), image_hw=(224, 224))
        conv_shapes = jax.tree.map(np.shape, params)
        init_shapes = jax.tree.map(np.shape, init)
        assert conv_shapes == init_shapes
