"""On-chip coverage for the INFERENCE kernel families — the lane hole that
let round 4's sampler regression ship.

The round-4 resident-weights sampler mode compile-failed (Mosaic scoped-VMEM
OOM) at reference scale on the v5e while passing its interpret-mode CPU
test, and none of tests_tpu/ covered the inference kernels that produce the
headline latency number.  These tests run every inference kernel family at
REFERENCE SCALE (20 frames, d_model 512, 8 layers, T=100; ViT-S/16 at
224 px) on the real chip:

- ops/sampler_kernel.fused_sample_loop: compiles + matches the scan sampler
  (same PRNG chain), in BOTH weight-residency modes, resident == streamed;
- ops/vit_kernel.fused_vit_trunk via extract_features: matches the Flax
  extractor;
- ops/denoiser_kernel.fused_trunk via denoiser_apply_fused: matches the
  Flax denoiser;
- the ops/sample_probe.py guard: with simulated kernel failure, the full
  model.sample still completes on the chip via the scan/Flax path.

Reference contrast: the reference's inference entry points are plain torch
(pose_diffusion/demo.py:108, test.py:212) and cannot compile-fail; this
lane is what makes our fused default equally trustworthy.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posediffusion_tpu.diffusion.gaussian import p_sample_loop
from posediffusion_tpu.models import PoseDiffusionConfig, PoseDiffusionModel

N_FRAMES = 20
IMAGE_SIZE = 224


@pytest.fixture(scope="module")
def ref_model():
    model = PoseDiffusionModel(PoseDiffusionConfig())
    params = model.init(jax.random.PRNGKey(0), image_hw=(IMAGE_SIZE, IMAGE_SIZE))
    return model, params


@pytest.fixture(scope="module")
def z_feats(ref_model):
    model, params = ref_model
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(size=(1, N_FRAMES, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(
            np.float32
        )
    )
    return images, model.extract_features(params, images, fused=False)


class TestSamplerOnChip:
    def _fused(self, ref_model, z, mode, **kw):
        from posediffusion_tpu.ops.sampler_kernel import fused_sample_loop

        model, params = ref_model
        old = os.environ.get("POSEDIFFUSION_SAMPLER_WEIGHTS")
        os.environ["POSEDIFFUSION_SAMPLER_WEIGHTS"] = mode
        try:
            out, _ = fused_sample_loop(
                params["denoiser"], model.schedule, z,
                jax.random.PRNGKey(7), rng_chain=True, **kw,
            )
            return np.asarray(jax.device_get(out))
        finally:
            if old is None:
                del os.environ["POSEDIFFUSION_SAMPLER_WEIGHTS"]
            else:
                os.environ["POSEDIFFUSION_SAMPLER_WEIGHTS"] = old

    def test_reference_scale_compiles_and_matches_scan_both_modes(
        self, ref_model, z_feats
    ):
        """The EXACT round-4 failure case: reference-scale trunk (~32 MB
        bf16), auto-residency.  Must compile (r04: Mosaic scoped-VMEM OOM,
        BENCH_r04 rc=1) and match the scan sampler split-for-split."""
        model, params = ref_model
        _, z = z_feats

        ref, _ = p_sample_loop(
            model.schedule,
            lambda x, tt: model.denoiser.apply(
                params["denoiser"], x, tt, z
            ),
            (1, N_FRAMES, 9),
            jax.random.PRNGKey(7),
        )
        ref = np.asarray(jax.device_get(ref))

        res = self._fused(ref_model, z, "resident", weight_dtype=jnp.float32)
        stream = self._fused(ref_model, z, "streamed", weight_dtype=jnp.float32)

        # resident and streamed run the same arithmetic — bit-identical
        np.testing.assert_array_equal(res, stream)
        # f32 weights vs the Flax scan: same math, different op schedule.
        # An UNTRAINED random-init denoiser iterated 100 reverse steps is an
        # expansive map, so per-step f32 reassociation noise (~1e-6 rel)
        # amplifies chaotically; measured on the v5e: max |diff| ~0.7% of the
        # output scale (|out| up to ~58).  Exact-math parity is pinned by the
        # interpret-mode CPU tests; this on-chip bound guards gross layout /
        # indexing / Mosaic-lowering bugs, which produce O(scale) errors.
        scale = float(np.max(np.abs(ref)))
        assert np.max(np.abs(res - ref)) <= 0.02 * scale
        assert np.mean(np.abs(res - ref)) <= 0.005 * scale

    def test_bf16_weight_streaming_stays_close(self, ref_model, z_feats):
        """Production default (bf16 trunk weights): accuracy envelope vs
        the f32 scan reference — the bf16-truncation guard that caught the
        round-4 GGS bug, applied to the sampler."""
        model, params = ref_model
        _, z = z_feats
        ref, _ = p_sample_loop(
            model.schedule,
            lambda x, tt: model.denoiser.apply(params["denoiser"], x, tt, z),
            (1, N_FRAMES, 9),
            jax.random.PRNGKey(7),
        )
        out = self._fused(ref_model, z, "auto")
        ref = np.asarray(jax.device_get(ref))
        # Same chaotic-amplification caveat as the f32 test above, plus bf16
        # weight truncation; measured ~0.85% of scale on the v5e.  A bf16
        # gather/layout bug (the round-4 GGS class) produces O(scale) errors.
        scale = float(np.max(np.abs(ref)))
        assert np.max(np.abs(out - ref)) <= 0.04 * scale
        assert np.mean(np.abs(out - ref)) <= 0.01 * scale


class TestVitInferKernelOnChip:
    def test_fused_extractor_matches_flax(self, ref_model, z_feats):
        model, params = ref_model
        images, z_ref = z_feats
        z_fused = model.extract_features(params, images, fused=True)
        # bf16 trunk weights stream through the fused kernel; the Flax
        # reference runs f32
        np.testing.assert_allclose(
            np.asarray(jax.device_get(z_fused)),
            np.asarray(jax.device_get(z_ref)),
            atol=0.05, rtol=0.05,
        )


class TestDenoiserStepKernelOnChip:
    def test_fused_step_matches_flax(self, ref_model, z_feats):
        from posediffusion_tpu.models.denoiser import denoiser_apply_fused

        model, params = ref_model
        _, z = z_feats
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(1, N_FRAMES, 9)).astype(np.float32))
        t = jnp.asarray([42])
        ref = model.denoiser.apply(params["denoiser"], x, t, z)
        out = denoiser_apply_fused(params["denoiser"], x, t, z)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(out)),
            np.asarray(jax.device_get(ref)),
            atol=0.02, rtol=0.02,
        )


class TestProbeFallbackOnChip:
    def test_simulated_kernel_failure_still_samples(
        self, ref_model, z_feats, monkeypatch
    ):
        """END-TO-END guard on real hardware: all inference probes report
        broken kernels -> model.sample completes via the scan/Flax path.
        This is the exact run demo.py/test.py/bench.py need to survive."""
        from posediffusion_tpu.ops import sample_probe, train_probe

        sample_probe.sampler_loop_ok.cache_clear()
        sample_probe.vit_infer_kernel_ok.cache_clear()
        sample_probe.denoiser_step_kernel_ok.cache_clear()
        train_probe.encoder_train_kernel_ok.cache_clear()
        monkeypatch.setenv("POSEDIFFUSION_FUSED_SAMPLE_PROBE", "fail")
        monkeypatch.setenv("POSEDIFFUSION_FUSED_TRAIN_PROBE", "fail")

        model, params = ref_model
        images, _ = z_feats
        with pytest.warns(UserWarning, match="falling back"):
            enc, _ = model.sample(params, images, jax.random.PRNGKey(1))
        enc = np.asarray(jax.device_get(enc))
        assert enc.shape == (1, N_FRAMES, 9)
        assert np.isfinite(enc).all()

        sample_probe.sampler_loop_ok.cache_clear()
        sample_probe.vit_infer_kernel_ok.cache_clear()
        sample_probe.denoiser_step_kernel_ok.cache_clear()
        train_probe.encoder_train_kernel_ok.cache_clear()
