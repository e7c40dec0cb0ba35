"""Inference-path compile-probe fallback (ops/sample_probe.py).

Round 4 shipped a sampler kernel that compile-failed at reference scale on
the target hardware, and because ``PoseDiffusionModel.sample`` routed into
it unconditionally, every inference entry point (demo.py / test.py /
bench.py) crashed.  These tests pin the guard that prevents that failure
class: every fused inference kernel is compile-probed once per
configuration, and a probe failure degrades to the scan/Flax path with a
warning — never a crash.  (Mirror of tests/test_training.py's
test_broken_fused_kernel_falls_back_to_flax for the train path.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posediffusion_tpu.models import PoseDiffusionConfig, PoseDiffusionModel


def _clear_probe_caches():
    from posediffusion_tpu.ops import sample_probe, train_probe

    sample_probe.sampler_loop_ok.cache_clear()
    sample_probe.vit_infer_kernel_ok.cache_clear()
    sample_probe.denoiser_step_kernel_ok.cache_clear()
    train_probe.encoder_train_kernel_ok.cache_clear()


def tiny_model(**over):
    cfg = PoseDiffusionConfig(
        z_dim=32, d_model=32, nhead=2, num_encoder_layers=2,
        dim_feedforward=64, mlp_hidden_dim=128, vit_depth=1, vit_heads=2,
        timesteps=8, scale_factors=(1.0,), **over,
    )
    return PoseDiffusionModel(cfg)


class TestSampleProbeFallback:
    def test_broken_fused_kernels_fall_back_to_scan_sampler(
        self, rng, monkeypatch
    ):
        """With a faked TPU platform (so all fused inference gates engage)
        and the probes' `fail` hook (so every kernel reports broken),
        sample() must complete on CPU via the Flax extractor + scan
        sampler, warning once per kernel family."""
        from unittest import mock

        _clear_probe_caches()
        monkeypatch.setenv("POSEDIFFUSION_FUSED_SAMPLE_PROBE", "fail")
        monkeypatch.setenv("POSEDIFFUSION_FUSED_TRAIN_PROBE", "fail")
        # the Flax paths' (working) Pallas attention would also engage
        # under the faked platform; pin it to XLA so the test runs on CPU
        monkeypatch.setenv("POSEDIFFUSION_ATTN_IMPL", "xla")

        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0), image_hw=(32, 32))
        images = jnp.asarray(
            rng.uniform(size=(1, 3, 3, 32, 32)).astype(np.float32)
        )

        class _FakeTpu:
            platform = "tpu"

        real_devices = jax.devices

        def fake_devices(*args):
            if args:
                return real_devices(*args)
            return [_FakeTpu()]

        with mock.patch.object(jax, "devices", fake_devices), \
                pytest.warns(UserWarning, match="falling back"):
            # eager (unjitted) sample: if any gate wrongly engaged a fused
            # path, the CPU pallas_call would raise here
            enc, _ = model.sample(params, images, jax.random.PRNGKey(1))
        assert enc.shape == (1, 3, 9)
        assert np.isfinite(np.asarray(enc)).all()
        _clear_probe_caches()

    def test_probe_off_env_forces_fallback_without_compiling(
        self, monkeypatch
    ):
        monkeypatch.setenv("POSEDIFFUSION_FUSED_SAMPLE_PROBE", "off")
        from posediffusion_tpu.ops import sample_probe

        _clear_probe_caches()
        assert not sample_probe.sampler_loop_ok(
            20, 512, 1024, 128, 4, 8, 9, 10, 384, True, 100, "auto"
        )
        assert not sample_probe.vit_infer_kernel_ok(
            20, 264, 384, 1536, 6, 4, False
        )
        assert not sample_probe.denoiser_step_kernel_ok(
            20, 512, 1024, 128, 4, 8, 9, 10, 384, True
        )
        _clear_probe_caches()

    def test_synthetic_probe_params_match_real_denoiser_tree(self):
        """The probes compile on synthetic weights; they only have the
        production kernel's true VMEM liveness if the synthetic pytree has
        exactly the real denoiser's structure AND shapes."""
        from posediffusion_tpu.ops.sample_probe import (
            _synth_denoiser_variables,
        )

        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0), image_hw=(32, 32))
        real = params["denoiser"]["params"]
        c = model.config
        synth = _synth_denoiser_variables(
            c.d_model, c.dim_feedforward, c.mlp_hidden_dim,
            c.num_encoder_layers, c.target_dim, 10,
            c.z_dim + (1 if c.pivot_cam_onehot else 0),
        )["params"]
        real_shapes = jax.tree.map(lambda a: tuple(a.shape), real)
        synth_shapes = jax.tree.map(lambda a: tuple(a.shape), synth)
        assert real_shapes == synth_shapes

    def test_sampler_weights_env_validation(self, monkeypatch):
        """Unrecognized POSEDIFFUSION_SAMPLER_WEIGHTS values raise instead
        of silently selecting streaming (advisor finding, round 4)."""
        from posediffusion_tpu.diffusion.schedule import make_schedule
        from posediffusion_tpu.ops.sampler_kernel import fused_sample_loop

        monkeypatch.setenv("POSEDIFFUSION_SAMPLER_WEIGHTS", "residant")
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0), image_hw=(32, 32))
        z = jnp.zeros((1, 3, 32))
        with pytest.raises(ValueError, match="SAMPLER_WEIGHTS"):
            fused_sample_loop(
                params["denoiser"], make_schedule(8), z,
                jax.random.PRNGKey(0), nhead=2, num_encoder_layers=2,
                interpret=True,
            )
