"""Diffusion math: schedule golden values, loss/posterior identities, the
scan sampler, and GGS optimization behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posediffusion_tpu.diffusion import (
    GGSConfig,
    MatchesData,
    compute_sampson_loss,
    geometry_guided_sampling,
    make_schedule,
    p_losses,
    p_sample_loop,
    pack_matches,
    predict_start_from_noise,
    q_posterior,
    q_sample,
)
from posediffusion_tpu.geometry import (
    PerspectiveCameras,
    camera_to_pose_encoding,
    cameras_to_opencv,
    first_camera_transform,
)


class TestSchedule:
    def test_custom_schedule_matches_torch_float64(self):
        torch = pytest.importorskip("torch")
        sched = make_schedule(100, 1e-4, 0.1, "custom")
        betas = torch.linspace(1e-4, 0.1, 100, dtype=torch.float64)
        alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
        np.testing.assert_array_equal(
            np.asarray(sched.betas), betas.float().numpy()
        )
        np.testing.assert_array_equal(
            np.asarray(sched.alphas_cumprod), alphas_cumprod.float().numpy()
        )
        # posterior buffers
        acp_prev = torch.cat([torch.ones(1, dtype=torch.float64), alphas_cumprod[:-1]])
        post_var = betas * (1 - acp_prev) / (1 - alphas_cumprod)
        np.testing.assert_array_equal(
            np.asarray(sched.posterior_variance), post_var.float().numpy()
        )
        np.testing.assert_array_equal(
            np.asarray(sched.posterior_mean_coef1),
            (betas * torch.sqrt(acp_prev) / (1 - alphas_cumprod)).float().numpy(),
        )

    def test_linear_and_cosine_schedules(self):
        lin = make_schedule(100, beta_schedule="linear")
        cos = make_schedule(100, beta_schedule="cosine")
        assert lin.num_timesteps == cos.num_timesteps == 100
        assert float(lin.betas[0]) == pytest.approx(1e-3, rel=1e-5)
        assert np.all(np.asarray(cos.betas) <= 0.999)

    def test_alphas_cumprod_monotonic(self):
        s = make_schedule()
        acp = np.asarray(s.alphas_cumprod)
        assert np.all(np.diff(acp) < 0)
        assert acp[0] < 1.0 and acp[-1] > 0.0


class TestDiffusionMath:
    def test_q_sample_then_predict_start_roundtrip(self, rng):
        s = make_schedule()
        x0 = jnp.asarray(rng.normal(size=(4, 5, 9)).astype(np.float32))
        noise = jnp.asarray(rng.normal(size=(4, 5, 9)).astype(np.float32))
        t = jnp.asarray([0, 17, 50, 99])
        xt = q_sample(s, x0, t, noise)
        x0_rec = predict_start_from_noise(s, xt, t, noise)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)

    def test_posterior_at_t0(self, rng):
        """At t=0 the posterior mean collapses onto x_start."""
        s = make_schedule()
        x0 = jnp.asarray(rng.normal(size=(1, 3, 9)).astype(np.float32))
        xt = jnp.asarray(rng.normal(size=(1, 3, 9)).astype(np.float32))
        mean, var, _ = q_posterior(s, x0, xt, jnp.asarray([0]))
        np.testing.assert_allclose(np.asarray(mean), np.asarray(x0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(var), 0.0, atol=1e-7)

    def test_p_losses_l1_unreduced(self, rng):
        s = make_schedule()
        x0 = jnp.asarray(rng.normal(size=(2, 4, 9)).astype(np.float32))
        noise = jnp.asarray(rng.normal(size=(2, 4, 9)).astype(np.float32))
        t = jnp.asarray([10, 60])

        def model_fn(x, tt):  # "predicts" half the true noise
            return 0.5 * noise

        out = p_losses(s, model_fn, x0, t, noise)
        assert out.loss.shape == x0.shape
        np.testing.assert_allclose(
            np.asarray(out.loss), 0.5 * np.abs(np.asarray(noise)), atol=1e-6
        )

    def test_p_losses_perfect_model_zero_loss(self, rng):
        s = make_schedule()
        x0 = jnp.asarray(rng.normal(size=(2, 4, 9)).astype(np.float32))
        noise = jnp.asarray(rng.normal(size=(2, 4, 9)).astype(np.float32))
        t = jnp.asarray([5, 95])
        out = p_losses(s, lambda x, tt: noise, x0, t, noise)
        np.testing.assert_allclose(np.asarray(out.loss), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.x_0_pred), np.asarray(x0), atol=1e-4)


class TestSampler:
    def test_shapes_and_trajectory(self):
        s = make_schedule(timesteps=20)
        model_fn = lambda x, t: jnp.zeros_like(x)
        x, traj = p_sample_loop(
            s, model_fn, (2, 5, 9), jax.random.PRNGKey(0), return_trajectory=True
        )
        assert x.shape == (2, 5, 9)
        assert traj.shape == (21, 2, 5, 9)
        assert bool(jnp.isfinite(x).all())

    def test_deterministic_given_key(self):
        s = make_schedule(timesteps=10)
        model_fn = lambda x, t: 0.1 * x
        x1, _ = p_sample_loop(s, model_fn, (1, 3, 9), jax.random.PRNGKey(7))
        x2, _ = p_sample_loop(s, model_fn, (1, 3, 9), jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        x3, _ = p_sample_loop(s, model_fn, (1, 3, 9), jax.random.PRNGKey(8))
        assert np.abs(np.asarray(x1) - np.asarray(x3)).max() > 1e-3

    def test_matches_python_loop_reference(self, rng):
        """The scan sampler must equal an eager python-loop transcription of
        the reference p_sample recursion, given the same noise draws."""
        s = make_schedule(timesteps=15)

        def model_fn(x, t):
            return 0.3 * x + 0.01  # arbitrary deterministic "denoiser"

        key = jax.random.PRNGKey(3)
        x_scan, _ = p_sample_loop(s, model_fn, (1, 2, 9), key)

        # python twin with identical key splitting
        k = key
        k, init_key = jax.random.split(k)
        x = jax.random.normal(init_key, (1, 2, 9))
        for t in range(14, -1, -1):
            k, nk = jax.random.split(k)
            tb = jnp.asarray([t])
            eps = model_fn(x, tb)
            x0 = predict_start_from_noise(s, x, tb, eps)
            mean, _, logv = q_posterior(s, x0, x, tb)
            noise = jax.random.normal(nk, x.shape) if t > 0 else 0.0
            x = mean + jnp.exp(0.5 * logv) * noise
        np.testing.assert_allclose(np.asarray(x_scan), np.asarray(x), atol=1e-5)

    def test_cond_fn_applied_below_start_step(self):
        s = make_schedule(timesteps=10)
        model_fn = lambda x, t: jnp.zeros_like(x)
        calls = []

        def cond_fn(mean, t):
            calls.append(1)
            return mean + 100.0  # large marker offset

        x, _ = p_sample_loop(
            s, model_fn, (1, 2, 9), jax.random.PRNGKey(0),
            cond_fn=cond_fn, cond_start_step=3,
        )
        # cond steps traced (scan traces once)
        assert len(calls) >= 1
        # the marker offsets must dominate the output
        assert float(jnp.abs(x).max()) > 50.0


class TestDDIM:
    def test_full_step_ddim_matches_ancestral_statistics(self, rng):
        """eta=0 DDIM with S=T steps recovers x0 for a perfect denoiser."""
        from posediffusion_tpu.diffusion.gaussian import ddim_sample_loop

        s = make_schedule(timesteps=50)
        target = jnp.asarray(rng.normal(size=(1, 4, 9)).astype(np.float32))

        def oracle(x, t):
            # oracle noise prediction consistent with x0 = target
            from posediffusion_tpu.diffusion.schedule import extract

            nd = x.ndim
            return (
                extract(s.sqrt_recip_alphas_cumprod, t, nd) * x - target
            ) / extract(s.sqrt_recipm1_alphas_cumprod, t, nd)

        x, _ = ddim_sample_loop(
            s, oracle, (1, 4, 9), jax.random.PRNGKey(0), sampling_timesteps=50
        )
        np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-3)

    def test_few_step_ddim_close_to_oracle(self, rng):
        from posediffusion_tpu.diffusion.gaussian import ddim_sample_loop

        s = make_schedule(timesteps=100)
        target = jnp.asarray(rng.normal(size=(1, 4, 9)).astype(np.float32))

        def oracle(x, t):
            from posediffusion_tpu.diffusion.schedule import extract

            nd = x.ndim
            return (
                extract(s.sqrt_recip_alphas_cumprod, t, nd) * x - target
            ) / extract(s.sqrt_recipm1_alphas_cumprod, t, nd)

        x, _ = ddim_sample_loop(
            s, oracle, (1, 4, 9), jax.random.PRNGKey(0), sampling_timesteps=10
        )
        np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=1e-2)

    def test_deterministic_for_eta_zero(self):
        from posediffusion_tpu.diffusion.gaussian import ddim_sample_loop

        s = make_schedule(timesteps=30)
        f = lambda x, t: 0.2 * x
        x1, _ = ddim_sample_loop(s, f, (1, 3, 9), jax.random.PRNGKey(5), 10)
        x2, _ = ddim_sample_loop(s, f, (1, 3, 9), jax.random.PRNGKey(5), 10)
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))

    def test_model_sample_api_ddim(self, rng):
        from posediffusion_tpu.models import PoseDiffusionConfig, PoseDiffusionModel

        cfg = PoseDiffusionConfig(
            z_dim=16, d_model=32, nhead=2, num_encoder_layers=1,
            dim_feedforward=32, vit_depth=1, vit_heads=2, timesteps=20,
            scale_factors=(1.0,),
        )
        model = PoseDiffusionModel(cfg)
        params = model.init(jax.random.PRNGKey(0), image_hw=(32, 32))
        images = jnp.asarray(rng.uniform(size=(1, 3, 3, 32, 32)).astype(np.float32))
        enc, _ = model.sample(
            params, images, jax.random.PRNGKey(1), sampling_timesteps=5
        )
        assert enc.shape == (1, 3, 9)
        assert bool(jnp.isfinite(enc).all())


def make_gt_scene(rng, n=5, n_points=60, hw=(224, 224)):
    """Cameras looking at the origin + projected world points as matches."""
    target = np.zeros(3)
    centers = rng.normal(size=(n, 3)) * 0.8 + np.array([0, 0, -4.0])
    Rs, Ts = [], []
    for c in centers:
        z = target - c
        z /= np.linalg.norm(z)
        x = np.cross([0, 1.0, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], 1)
        Rs.append(R)
        Ts.append(-c @ R)
    cam = PerspectiveCameras.create(
        R=np.stack(Rs), T=np.stack(Ts), focal_length=np.full((n, 2), 2.0)
    )
    cam = first_camera_transform(cam)

    R_cv, t_cv, K = cameras_to_opencv(cam, hw)
    X = rng.normal(size=(n_points, 3)) * 0.3

    def project(i):
        xc = np.einsum("ij,nj->ni", np.asarray(R_cv[i]), X) + np.asarray(t_cv[i])
        pix = np.einsum("ij,nj->ni", np.asarray(K[i]), xc)
        return pix[:, :2] / pix[:, 2:3]

    kp1, kp2, i12 = [], [], []
    for a in range(n):
        for b in range(a + 1, n):
            kp1.append(project(a))
            kp2.append(project(b))
            i12.append(np.repeat([[a, b]], n_points, axis=0))
    kp1, kp2, i12 = map(np.concatenate, (kp1, kp2, i12))
    return cam, kp1.astype(np.float32), kp2.astype(np.float32), i12


class TestGGS:
    def test_sampson_loss_zero_on_gt(self, rng):
        cam, kp1, kp2, i12 = make_gt_scene(rng)
        n = len(cam)
        enc = camera_to_pose_encoding(cam).reshape(1, n, 9)
        matches = pack_matches(kp1, kp2, i12, n, pad_to=1024)
        loss, count = compute_sampson_loss(
            enc, matches, (224, 224), True, True, True, 10.0
        )
        assert int(count) == len(kp1)
        assert float(loss) < 1e-3

    def test_ggs_reduces_sampson_of_perturbed_poses(self, rng):
        from posediffusion_tpu.diffusion.ggs import sampson_report

        cam, kp1, kp2, i12 = make_gt_scene(rng)
        n = len(cam)
        enc = np.asarray(camera_to_pose_encoding(cam)).reshape(1, n, 9)
        perturbed = enc + rng.normal(size=enc.shape).astype(np.float32) * 0.05
        matches = pack_matches(kp1, kp2, i12, n, pad_to=1024)
        cfg = GGSConfig(iter_num=50)

        # progress metric: clamped mean over all matches (the reference's
        # sampson_to_print), not the inlier mean (which rises as new inliers
        # enter near the threshold)
        before = float(sampson_report(jnp.asarray(perturbed), matches, (224, 224)))
        out = geometry_guided_sampling(
            jnp.asarray(perturbed), 5, matches, (224, 224), cfg
        )
        after = float(sampson_report(out, matches, (224, 224)))
        assert after < before * 0.6

    def test_ggs_stops_on_insufficient_matches(self, rng):
        cam, kp1, kp2, i12 = make_gt_scene(rng, n_points=60)
        n = len(cam)
        enc = np.asarray(camera_to_pose_encoding(cam)).reshape(1, n, 9)
        perturbed = jnp.asarray(enc + 0.05)
        # mark almost all matches invalid -> below min_matches per frame
        matches = pack_matches(kp1[:8], kp2[:8], i12[:8], n, pad_to=64)
        cfg = GGSConfig(iter_num=10, min_matches=10)
        out = geometry_guided_sampling(perturbed, 5, matches, (224, 224), cfg)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(perturbed))

    def test_fl_only_phase_keeps_R_T(self, rng):
        from posediffusion_tpu.diffusion.ggs import _ggs_phase

        cam, kp1, kp2, i12 = make_gt_scene(rng)
        n = len(cam)
        enc = np.asarray(camera_to_pose_encoding(cam)).reshape(1, n, 9) + 0.03
        matches = pack_matches(kp1, kp2, i12, n, pad_to=1024)
        cfg = GGSConfig(iter_num=5)
        out = _ggs_phase(
            jnp.asarray(enc), matches, (224, 224), cfg,
            update_R=False, update_T=False, update_FL=True,
        )
        out = np.asarray(out)
        np.testing.assert_array_equal(out[..., :7], enc[..., :7])  # T, quat frozen
        assert np.abs(out[..., 7:9] - enc[..., 7:9]).max() > 0  # logFL moved
