"""Tests for embeddings and the fused attention op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posediffusion_tpu.ops import (
    harmonic_embedding,
    harmonic_embedding_dim,
    imagenet_normalize,
    mha_attention,
    resize_bilinear,
    sinusoidal_time_embedding,
)


class TestHarmonicEmbedding:
    def test_output_dim_matches_reference_config(self):
        # 10 harmonics + append_input on 9 dims -> 189 (SURVEY.md C10)
        assert harmonic_embedding_dim(9, 10, True) == 189
        x = jnp.ones((2, 5, 9))
        out = harmonic_embedding(x)
        assert out.shape == (2, 5, 189)

    def test_layout_dim_major_sin_cos_input(self):
        """Feature order: sin(x_d * f_j) dim-major, then cos block, then x."""
        x = jnp.asarray([[1.0, 2.0]])
        out = np.asarray(harmonic_embedding(x, n_harmonic_functions=2))
        freqs = [1.0, 2.0]
        expected = np.array(
            [
                [
                    np.sin(1.0 * 1.0), np.sin(1.0 * 2.0),
                    np.sin(2.0 * 1.0), np.sin(2.0 * 2.0),
                    np.cos(1.0 * 1.0), np.cos(1.0 * 2.0),
                    np.cos(2.0 * 1.0), np.cos(2.0 * 2.0),
                    1.0, 2.0,
                ]
            ]
        )
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_matches_torch_twin(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.normal(size=(4, 9)).astype(np.float32)
        n = 10
        tx = torch.tensor(x)
        freqs = 2.0 ** torch.arange(n, dtype=torch.float32)
        embed = (tx[..., None] * freqs).reshape(4, -1)
        expected = torch.cat([embed.sin(), embed.cos(), tx], dim=-1).numpy()
        out = np.asarray(harmonic_embedding(jnp.asarray(x)))
        np.testing.assert_allclose(out, expected, atol=1e-5)


class TestTimeEmbedding:
    def test_layout_cos_then_sin(self):
        t = jnp.asarray([0.0])
        out = np.asarray(sinusoidal_time_embedding(t, dim=8))
        # at t=0: cos block = 1, sin block = 0
        np.testing.assert_allclose(out[0, :4], 1.0)
        np.testing.assert_allclose(out[0, 4:], 0.0)

    def test_matches_guided_diffusion_formula(self, rng):
        import math

        t = jnp.asarray([3.0, 17.0])
        dim, max_period = 256, 10000.0
        out = np.asarray(sinusoidal_time_embedding(t, dim, max_period))
        half = dim // 2
        freqs = np.exp(-math.log(max_period) * np.arange(half) / half)
        args = np.asarray(t)[:, None] * freqs[None]
        expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
        np.testing.assert_allclose(out, expected, atol=1e-5)


class TestImageOps:
    def test_imagenet_normalize(self, rng):
        img = jnp.asarray(rng.uniform(size=(2, 3, 8, 8)).astype(np.float32))
        out = np.asarray(imagenet_normalize(img))
        expected = (np.asarray(img) - np.array([0.485, 0.456, 0.406]).reshape(1, 3, 1, 1)) / np.array(
            [0.229, 0.224, 0.225]
        ).reshape(1, 3, 1, 1)
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_bicubic_matches_torch(self, rng):
        """resize_bicubic_torch == F.interpolate(mode='bicubic') exactly
        (both up- and down-sampling)."""
        torch = pytest.importorskip("torch")
        from posediffusion_tpu.ops.image import resize_bicubic_torch

        x = rng.normal(size=(1, 14, 14, 5)).astype(np.float32)
        for out in ((7, 7), (4, 4), (20, 20), (9, 13)):
            ours = np.asarray(resize_bicubic_torch(jnp.asarray(x), out))
            ref = torch.nn.functional.interpolate(
                torch.tensor(x).permute(0, 3, 1, 2), size=out,
                mode="bicubic", align_corners=False,
            ).permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(ours, ref, atol=2e-5, err_msg=str(out))

    def test_resize_matches_torch_bilinear(self, rng):
        torch = pytest.importorskip("torch")
        img = rng.uniform(size=(1, 3, 16, 16)).astype(np.float32)
        out = np.asarray(resize_bilinear(jnp.asarray(img), (8, 8)))
        expected = torch.nn.functional.interpolate(
            torch.tensor(img), size=(8, 8), mode="bilinear", align_corners=False
        ).numpy()
        np.testing.assert_allclose(out, expected, atol=1e-5)


class TestAttention:
    def _rand_qkv(self, rng, B=2, H=4, N=12, Dh=16):
        q = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))
        return q, k, v

    def test_block_diag_bias_fwd_and_grad_equal_separate(self, rng):
        """Scale packing's attention bias: packed forward AND its custom-VJP
        gradients must equal independently-attended segments (the train
        path differentiates through this)."""
        from posediffusion_tpu.ops.attention import mha_attention

        n1, n2 = 7, 5
        q, k, v = self._rand_qkv(rng, B=2, H=2, N=n1 + n2, Dh=8)
        seg = np.concatenate([np.zeros(n1), np.ones(n2)])
        bias = jnp.asarray(
            np.where(seg[:, None] == seg[None, :], 0.0, -1e30).astype(np.float32)
        )

        def packed_loss(q, k, v):
            out = mha_attention(q, k, v, attn_bias=bias, impl="xla")
            return jnp.sum(out * jnp.arange(out.size).reshape(out.shape))

        def separate_loss(q, k, v):
            o1 = mha_attention(
                q[:, :, :n1], k[:, :, :n1], v[:, :, :n1], impl="xla"
            )
            o2 = mha_attention(
                q[:, :, n1:], k[:, :, n1:], v[:, :, n1:], impl="xla"
            )
            out = jnp.concatenate([o1, o2], axis=2)
            return jnp.sum(out * jnp.arange(out.size).reshape(out.shape))

        np.testing.assert_allclose(
            float(packed_loss(q, k, v)), float(separate_loss(q, k, v)),
            rtol=1e-5,
        )
        gp = jax.grad(packed_loss, argnums=(0, 1, 2))(q, k, v)
        gs = jax.grad(separate_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gs):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            )

    def test_xla_matches_manual_softmax(self, rng):
        q, k, v = self._rand_qkv(rng)
        out = mha_attention(q, k, v, impl="xla")
        scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        expected = np.einsum("bhqk,bhkd->bhqd", probs, v)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_pallas_interpret_matches_xla(self, rng):
        q, k, v = self._rand_qkv(rng, N=10)  # non-multiple of 8: exercises padding
        ref = mha_attention(q, k, v, impl="xla")
        out = mha_attention(q, k, v, impl="interpret")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_mask_excludes_padded_keys(self, rng):
        q, k, v = self._rand_qkv(rng, B=1, N=8)
        mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0, 0]], dtype=bool)
        out_masked = mha_attention(q, k, v, mask=mask, impl="xla")
        out_trunc = mha_attention(q[:, :, :5], k[:, :, :5], v[:, :, :5], impl="xla")
        np.testing.assert_allclose(
            np.asarray(out_masked[:, :, :5]), np.asarray(out_trunc), atol=1e-5
        )

    def test_custom_vjp_matches_autodiff(self, rng):
        """Gradients through the kernel dispatch (custom VJP) must equal
        autodiff through the plain XLA formulation."""
        q, k, v = self._rand_qkv(rng, B=1, H=2, N=9, Dh=8)
        mask = jnp.asarray(rng.uniform(size=(1, 9)) > 0.3).at[:, 0].set(True)

        from posediffusion_tpu.ops.attention import _reference_attention

        bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)

        def f_auto(q, k, v):  # plain autodiff baseline (no custom VJP)
            return jnp.sum(_reference_attention(q, k, v, bias) ** 2)

        def f_custom(q, k, v):  # custom VJP path via the public entry
            return jnp.sum(mha_attention(q, k, v, mask=mask, impl="interpret") ** 2)

        g_auto = jax.grad(f_auto, argnums=(0, 1, 2))(q, k, v)
        g_custom = jax.grad(f_custom, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_auto, g_custom):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_mask_pallas_interpret(self, rng):
        q, k, v = self._rand_qkv(rng, B=2, N=16)
        mask = jnp.asarray(rng.uniform(size=(2, 16)) > 0.3)
        mask = mask.at[:, 0].set(True)
        ref = mha_attention(q, k, v, mask=mask, impl="xla")
        out = mha_attention(q, k, v, mask=mask, impl="interpret")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
