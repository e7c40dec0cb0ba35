"""Fused ViT-trunk kernel vs the Flax ViT (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import posediffusion_tpu.ops.vit_kernel as vk
from posediffusion_tpu.models.feature_extractor import (
    MultiScaleImageFeatureExtractor,
    extract_features_fused,
)
from posediffusion_tpu.models.vit import ViTBlock, VisionTransformer
from posediffusion_tpu.ops.vit_kernel import fused_vit_trunk, stack_vit_params


class TestFusedVitTrunk:
    def _make(self, rng, depth=2, d=64, nhead=2, B=3, N=11):
        # build standalone per-block params through a tiny VisionTransformer
        vit = VisionTransformer(
            patch_size=16, embed_dim=d, depth=depth, num_heads=nhead
        )
        img = jnp.asarray(rng.uniform(size=(B, 3, 32, 32)).astype(np.float32))
        params = vit.init(jax.random.PRNGKey(0), img)
        x = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
        return vit, params, x

    def _flax_blocks(self, vit, params, x):
        """Apply only the trunk blocks, reusing the ViT's block params."""
        h = x
        for i in range(vit.depth):
            block = ViTBlock(vit.embed_dim, vit.num_heads)
            h = block.apply({"params": params["params"][f"blocks_{i}"]}, h)
        return h

    def test_f32_weights_match_flax_exactly(self, rng):
        vit, params, x = self._make(rng)
        ref = self._flax_blocks(vit, params, x)
        stacks = stack_vit_params(
            params["params"], vit.depth, weight_dtype=jnp.float32
        )
        out = fused_vit_trunk(x, stacks, nhead=vit.num_heads, chunk=2,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)

    def test_bf16_activations_close(self, rng):
        # MXU fast path: bf16 dot operands, f32 accumulation + residuals
        vit, params, x = self._make(rng)
        ref = self._flax_blocks(vit, params, x)
        stacks = stack_vit_params(params["params"], vit.depth)
        out = fused_vit_trunk(x, stacks, nhead=vit.num_heads, chunk=2,
                              act_bf16=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.15)

    def test_bf16_weights_close(self, rng):
        vit, params, x = self._make(rng)
        ref = self._flax_blocks(vit, params, x)
        stacks = stack_vit_params(params["params"], vit.depth)  # bf16 default
        out = fused_vit_trunk(x, stacks, nhead=vit.num_heads, chunk=2,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05)

    def test_batch_padding_is_inert(self, rng):
        # B=3 with chunk=2 pads to B=4; padded image must not leak into real
        vit, params, x = self._make(rng, B=3)
        stacks = stack_vit_params(
            params["params"], vit.depth, weight_dtype=jnp.float32
        )
        out3 = fused_vit_trunk(x, stacks, nhead=vit.num_heads, chunk=2,
                               interpret=True)
        out1 = fused_vit_trunk(x[:1], stacks, nhead=vit.num_heads, chunk=1,
                               interpret=True)
        np.testing.assert_allclose(
            np.asarray(out3[0]), np.asarray(out1[0]), atol=5e-6
        )

    def test_token_padding_is_inert(self, rng):
        # N=11 pads to 16; the key bias must exclude padded tokens so results
        # match an unpadded run (N=8, no padding needed)
        vit, params, _ = self._make(rng, N=8)
        x8 = jnp.asarray(rng.normal(size=(2, 8, 64)).astype(np.float32))
        stacks = stack_vit_params(
            params["params"], vit.depth, weight_dtype=jnp.float32
        )
        ref = self._flax_blocks(vit, params, x8)
        out = fused_vit_trunk(x8, stacks, nhead=vit.num_heads, chunk=2,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)

    def test_block_diag_bias_equals_separate_runs(self, rng):
        # scale packing: two segments in one row with a block-diagonal bias
        # must equal running each segment as its own sequence
        vit, params, _ = self._make(rng)
        stacks = stack_vit_params(
            params["params"], vit.depth, weight_dtype=jnp.float32
        )
        n1, n2 = 9, 5
        xa = jnp.asarray(rng.normal(size=(2, n1, 64)).astype(np.float32))
        xb = jnp.asarray(rng.normal(size=(2, n2, 64)).astype(np.float32))
        seg = np.concatenate([np.zeros(n1), np.ones(n2)])
        bias = jnp.asarray(
            np.where(seg[:, None] == seg[None, :], 0.0, -1e30).astype(np.float32)
        )
        packed = fused_vit_trunk(
            jnp.concatenate([xa, xb], axis=1), stacks, nhead=vit.num_heads,
            chunk=2, interpret=True, attn_bias=bias,
        )
        ra = fused_vit_trunk(xa, stacks, nhead=vit.num_heads, chunk=2,
                             interpret=True)
        rb = fused_vit_trunk(xb, stacks, nhead=vit.num_heads, chunk=2,
                             interpret=True)
        np.testing.assert_allclose(
            np.asarray(packed[:, :n1]), np.asarray(ra), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(packed[:, n1:]), np.asarray(rb), atol=5e-6
        )

    def test_erf_matches_scipy_grid(self):
        from scipy.special import erf as scipy_erf

        x = np.linspace(-6, 6, 2001).astype(np.float32)
        approx = np.asarray(vk._erf(jnp.asarray(x)))
        # 1.5e-7 formula bound + f32 polynomial rounding
        np.testing.assert_allclose(approx, scipy_erf(x), atol=5e-7)


class TestExtractFeaturesFused:
    def test_matches_flax_extractor(self, rng, monkeypatch):
        orig_trunk = vk.fused_vit_trunk
        monkeypatch.setattr(
            vk, "fused_vit_trunk",
            lambda x, stacks, nhead=6, chunk=4, act_bf16=False,
            interpret=False, attn_bias=None: orig_trunk(
                x, stacks, nhead=nhead, chunk=chunk, act_bf16=act_bf16,
                interpret=True, attn_bias=attn_bias,
            ),
        )
        orig_stack = vk.stack_vit_params
        monkeypatch.setattr(
            vk, "stack_vit_params",
            lambda p, d, weight_dtype=jnp.float32: orig_stack(p, d, jnp.float32),
        )
        ext = MultiScaleImageFeatureExtractor(
            scale_factors=(1.0, 0.5), embed_dim=64, depth=2, num_heads=2
        )
        img = jnp.asarray(rng.uniform(size=(3, 3, 64, 64)).astype(np.float32))
        params = ext.init(jax.random.PRNGKey(0), img)
        ref = ext.apply(params, img)
        out = extract_features_fused(
            params, img, scale_factors=(1.0, 0.5), embed_dim=64, depth=2,
            num_heads=2, chunk=2,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)
