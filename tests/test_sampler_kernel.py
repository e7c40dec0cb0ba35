"""Whole-loop fused sampler kernel vs the scan-based sampler (interpret
mode, identical PRNG key — the streams are split-for-split aligned)."""

import jax
import jax.numpy as jnp
import numpy as np

from posediffusion_tpu.diffusion.gaussian import p_sample_loop
from posediffusion_tpu.diffusion.schedule import make_schedule
from posediffusion_tpu.models.denoiser import Denoiser
from posediffusion_tpu.ops.sampler_kernel import fused_sample_loop


def tiny_setup(rng, N=5, T=6, z_dim=16):
    den = Denoiser(
        z_dim=z_dim, d_model=64, nhead=2, num_encoder_layers=2,
        dim_feedforward=96, mlp_hidden_dim=128,
    )
    x = jnp.zeros((1, N, 9), jnp.float32)
    t = jnp.asarray([0])
    z = jnp.asarray(rng.normal(size=(1, N, z_dim)).astype(np.float32))
    params = den.init(jax.random.PRNGKey(0), x, t, z)
    schedule = make_schedule(timesteps=T)
    return den, params, z, schedule


class TestFusedSampleLoop:
    def test_matches_scan_sampler_same_key(self, rng):
        den, params, z, schedule = tiny_setup(rng)
        N = z.shape[1]
        key = jax.random.PRNGKey(7)

        ref, _ = p_sample_loop(
            schedule,
            lambda x, tt: den.apply(params, x, tt, z),
            (1, N, 9),
            key,
        )
        out, _ = fused_sample_loop(
            params, schedule, z, key,
            nhead=2, num_encoder_layers=2,
            weight_dtype=jnp.float32, rng_chain=True, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-4
        )

    def test_mask_matches_scan_sampler(self, rng):
        den, params, z, schedule = tiny_setup(rng)
        N = z.shape[1]
        mask = jnp.asarray([[1, 1, 1, 0, 0]], jnp.float32)
        key = jax.random.PRNGKey(3)

        ref, _ = p_sample_loop(
            schedule,
            lambda x, tt: den.apply(params, x, tt, z, mask=mask),
            (1, N, 9),
            key,
        )
        out, _ = fused_sample_loop(
            params, schedule, z, key, mask=mask,
            nhead=2, num_encoder_layers=2,
            weight_dtype=jnp.float32, rng_chain=True, interpret=True,
        )
        valid = np.asarray(mask[0]).astype(bool)
        np.testing.assert_allclose(
            np.asarray(out)[0, valid], np.asarray(ref)[0, valid],
            atol=5e-4, rtol=1e-4,
        )

    def test_cond_tail_continues_prng_stream(self, rng):
        """Fused phase down to n_cond + warm-started scan tail == full scan
        (same key), because the kernel reproduces the scan's split chain."""
        den, params, z, schedule = tiny_setup(rng)
        N = z.shape[1]
        key = jax.random.PRNGKey(11)
        n_cond = 2

        # identity cond_fn isolates the control-flow/PRNG plumbing
        cond = lambda mean, t: mean

        ref, _ = p_sample_loop(
            schedule,
            lambda x, tt: den.apply(params, x, tt, z),
            (1, N, 9),
            key,
            cond_fn=cond,
            cond_start_step=n_cond,
        )
        x_mid, key_mid = fused_sample_loop(
            params, schedule, z, key, n_cond=n_cond,
            nhead=2, num_encoder_layers=2,
            weight_dtype=jnp.float32, rng_chain=True, interpret=True,
        )
        out, _ = p_sample_loop(
            schedule,
            lambda x, tt: den.apply(params, x, tt, z),
            (1, N, 9),
            key_mid,
            cond_fn=cond,
            cond_start_step=n_cond,
            x_init=x_mid,
            from_t=n_cond,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-4
        )

    def test_resident_and_streamed_weights_identical(self, rng, monkeypatch):
        """The VMEM-resident trunk-weight mode (whole (L, ...) stacks DMA'd
        once) must be bit-compatible with per-layer streaming — same math,
        different HBM traffic schedule."""
        den, params, z, schedule = tiny_setup(rng)
        key = jax.random.PRNGKey(5)
        outs = {}
        for mode in ("resident", "streamed"):
            monkeypatch.setenv("POSEDIFFUSION_SAMPLER_WEIGHTS", mode)
            out, _ = fused_sample_loop(
                params, schedule, z, key,
                nhead=2, num_encoder_layers=2,
                weight_dtype=jnp.float32, rng_chain=True, interpret=True,
            )
            outs[mode] = np.asarray(out)
        np.testing.assert_array_equal(outs["resident"], outs["streamed"])
