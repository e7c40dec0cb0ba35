"""Fused denoiser-trunk kernel vs the Flax trunk (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

import posediffusion_tpu.ops.denoiser_kernel as dk
from posediffusion_tpu.models.denoiser import Denoiser, denoiser_apply_fused
from posediffusion_tpu.models.layers import TransformerEncoder
from posediffusion_tpu.ops.denoiser_kernel import fused_trunk, stack_trunk_params


class TestFusedTrunk:
    def test_f32_weights_match_flax_exactly(self, rng):
        enc = TransformerEncoder(
            d_model=128, nhead=4, num_encoder_layers=3, dim_feedforward=256
        )
        x = jnp.asarray(rng.normal(size=(1, 12, 128)).astype(np.float32))
        params = enc.init(jax.random.PRNGKey(0), x)
        ref = enc.apply(params, x)
        stacks = stack_trunk_params(params["params"], 3, weight_dtype=jnp.float32)
        out = fused_trunk(
            x[0], jnp.zeros((12,), jnp.float32), stacks, nhead=4, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]), atol=5e-6)

    def test_bf16_weights_close(self, rng):
        enc = TransformerEncoder(
            d_model=128, nhead=4, num_encoder_layers=3, dim_feedforward=256
        )
        x = jnp.asarray(rng.normal(size=(1, 12, 128)).astype(np.float32))
        params = enc.init(jax.random.PRNGKey(0), x)
        ref = enc.apply(params, x)
        stacks = stack_trunk_params(params["params"], 3)  # bf16 default
        out = fused_trunk(
            x[0], jnp.zeros((12,), jnp.float32), stacks, nhead=4, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]), atol=0.05)

    def test_mask_matches_flax(self, rng):
        enc = TransformerEncoder(
            d_model=128, nhead=4, num_encoder_layers=2, dim_feedforward=256
        )
        x = jnp.asarray(rng.normal(size=(1, 12, 128)).astype(np.float32))
        params = enc.init(jax.random.PRNGKey(0), x)
        mask = jnp.asarray(rng.uniform(size=(1, 12)) > 0.3).at[:, 0].set(True)
        ref = enc.apply(params, x, mask=mask)
        stacks = stack_trunk_params(params["params"], 2, weight_dtype=jnp.float32)
        bias = jnp.where(mask[0], 0.0, -1e30).astype(jnp.float32)
        out = fused_trunk(x[0], bias, stacks, nhead=4, interpret=True)
        valid = np.asarray(mask[0])
        diff = np.abs(np.asarray(out) - np.asarray(ref[0]))[valid]
        assert diff.max() < 5e-6


class TestFusedDenoiserForward:
    def test_matches_flax_denoiser(self, rng, monkeypatch):
        # interpret-mode pallas + f32 stacks for exactness
        orig_trunk = dk.fused_trunk
        monkeypatch.setattr(
            dk, "fused_trunk", functools.partial(orig_trunk, interpret=True)
        )
        orig_stack = dk.stack_trunk_params
        monkeypatch.setattr(
            dk, "stack_trunk_params",
            lambda p, n, weight_dtype=jnp.float32: orig_stack(p, n, jnp.float32),
        )

        den = Denoiser(z_dim=32, d_model=64, nhead=2, num_encoder_layers=2,
                       dim_feedforward=128)
        x = jnp.asarray(rng.normal(size=(1, 7, 9)).astype(np.float32))
        t = jnp.asarray([42])
        z = jnp.asarray(rng.normal(size=(1, 7, 32)).astype(np.float32))
        params = den.init(jax.random.PRNGKey(0), x, t, z)
        ref = den.apply(params, x, t, z)
        out = denoiser_apply_fused(
            params, x, t, z, nhead=2, num_encoder_layers=2
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)
