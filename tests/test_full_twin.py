"""Full-composition torch-twin parity at released scale (VERDICT r2 #3).

Every stage (ViT, denoiser, schedule, codec) has its own twin test; this
file composes FULL-SIZE random weights in the exact released-checkpoint key
layout through the complete production path —

    torch .pth file -> load_reference_checkpoint converter
    -> multiscale DINO ViT-S/16 extractor (scales 1, 1/2, 1/3 with the
       reference's scale_factor resize semantics)
    -> 100-step ancestral sampler / diffusion loss

— and pins the outputs against an independently written torch twin composed
like the reference root (reference:
pose_diffusion/models/pose_diffusion_model.py:76-142), with the torch
sampler fed the exact noise sequence our ``lax.scan`` sampler draws.  This
is where convention bugs (codec widths, pivot one-hot ordering, multiscale
resize/pos-embed interpolation, scan vs Python-loop sampler) would hide.

Full widths are the point (ViT-S/16 384x12, denoiser 512x8); the frame
count is reduced to keep CI time sane.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

# full-scale twins: minutes of wall-clock; excluded from the default
# run by pytest.ini addopts, executed via `pytest -m nightly`
pytestmark = pytest.mark.nightly
import torch.nn as tnn
import torch.nn.functional as tF

from tests.test_models import TorchDenoiserTwin, TorchViTTwin

IMG = 224
N_FRAMES = 6
SCALES = (1.0, 1.0 / 2, 1.0 / 3)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class FullTorchViT(TorchViTTwin):
    """TorchViTTwin + DINO-style bicubic pos-embed interpolation so the
    multiscale pyramid's non-native grids (7x7 at 1/2, 4x4 at 1/3) run."""

    def forward(self, x):
        B = x.shape[0]
        x = self.proj(x)
        h0, w0 = x.shape[-2:]
        x = x.flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        pe = self.pos_embed
        g = int(math.isqrt(pe.shape[1] - 1))
        if (h0, w0) != (g, g):
            patch_pos = pe[:, 1:].reshape(1, g, g, -1).permute(0, 3, 1, 2)
            patch_pos = tF.interpolate(
                patch_pos, size=(h0, w0), mode="bicubic", align_corners=False
            )
            patch_pos = patch_pos.permute(0, 2, 3, 1).reshape(1, h0 * w0, -1)
            pe = torch.cat([pe[:, :1], patch_pos], dim=1)
        x = x + pe
        for blk in self.blocks:
            h = blk.norm1(x)
            h, _ = blk.attn(h, h, h, need_weights=False)
            x = x + h
            h = blk.norm2(x)
            h = blk.fc2(tnn.functional.gelu(blk.fc1(h)))
            x = x + h
        return self.norm(x)[:, 0]


def torch_multiscale_extract(vit, images):
    """Reference extractor semantics (image_feature_extractor.py:57-87):
    ImageNet-normalize, backbone at scale factors via
    F.interpolate(scale_factor=s), average the CLS features."""
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    img = (images - mean) / std
    total = None
    for s in SCALES:
        inp = img if s == 1 else tF.interpolate(
            img, scale_factor=s, mode="bilinear", align_corners=False
        )
        feat = vit(inp)
        total = feat if total is None else total + feat
    return total / len(SCALES)


def torch_sample_loop(denoiser, z, schedule, x0, noises):
    """Reference ancestral sampler (gaussian_diffuser.py:231-300) fed an
    explicit noise sequence; noises[t] is the step-t injection."""
    sra = torch.tensor(np.asarray(schedule.sqrt_recip_alphas_cumprod))
    srm1 = torch.tensor(np.asarray(schedule.sqrt_recipm1_alphas_cumprod))
    c1 = torch.tensor(np.asarray(schedule.posterior_mean_coef1))
    c2 = torch.tensor(np.asarray(schedule.posterior_mean_coef2))
    logv = torch.tensor(np.asarray(schedule.posterior_log_variance_clipped))
    x = x0
    B = x.shape[0]
    T = len(sra)
    for t in range(T - 1, -1, -1):
        t_b = torch.full((B,), t, dtype=torch.long)
        eps = denoiser(x, t_b, z)
        x_start = sra[t] * x - srm1[t] * eps
        mean = c1[t] * x_start + c2[t] * x
        x = mean + math.exp(0.5 * float(logv[t])) * noises[t]
    return x


def replay_sampler_noise(key, shape, T):
    """Replicate p_sample_loop's PRNG splits host-side: init split for x0,
    then one split per step (noise zeroed at t=0)."""
    key, init_key = jax.random.split(key)
    x0 = np.asarray(jax.random.normal(init_key, shape))
    noises = {}
    for t in range(T - 1, -1, -1):
        key, nk = jax.random.split(key)
        n = np.asarray(jax.random.normal(nk, shape))
        noises[t] = np.zeros(shape, np.float32) if t == 0 else n
    return x0, noises


@pytest.fixture(scope="module")
def full_twin(tmp_path_factory):
    """Full-size torch twins + the converted JAX model params, via a real
    .pth round trip through load_reference_checkpoint."""
    from posediffusion_tpu.models import PoseDiffusionConfig, PoseDiffusionModel
    from posediffusion_tpu.training import load_reference_checkpoint

    torch.manual_seed(7)
    vit = FullTorchViT(dim=384, depth=12, heads=6, patch=16, img=IMG).eval()
    den = TorchDenoiserTwin().eval()  # defaults ARE released scale

    # Full widths, reduced T: with random (untrained) weights the reverse
    # chain amplifies by prod(1/sqrt(alpha_t)) ~ 12x over the released
    # T=100 schedule, compounding benign per-step f32 associativity
    # differences (~2e-4) into O(0.3) — T=20 keeps amplification ~1.6x so
    # the composition pin stays meaningful.
    model = PoseDiffusionModel(PoseDiffusionConfig(timesteps=20))

    sd = {}
    for k, v in vit.dino_state_dict().items():
        sd[f"image_feature_extractor._net.{k}"] = torch.tensor(v)
    for k, v in den.state_dict().items():
        sd[f"diffuser.model.{k}"] = v.detach().clone()
    # schedule buffers are part of the released checkpoint layout
    from posediffusion_tpu.utils.manifest import SCHEDULE_BUFFER_NAMES

    for name in SCHEDULE_BUFFER_NAMES:
        arr = getattr(model.schedule, name, None)
        if arr is None:
            arr = np.zeros(model.schedule.num_timesteps, np.float32)
        sd[f"diffuser.{name}"] = torch.tensor(np.asarray(arr, np.float32))

    path = tmp_path_factory.mktemp("ckpt") / "full_twin.pth"
    torch.save(sd, str(path))
    params = load_reference_checkpoint(str(path))
    return vit, den, model, params


@pytest.mark.slow
class TestFullComposition:
    def test_multiscale_features_match(self, full_twin, rng):
        """Extractor composition: normalize + 3-scale pyramid + CLS average
        at full width and 224px."""
        vit, _, model, params = full_twin
        images = rng.uniform(size=(1, 2, 3, IMG, IMG)).astype(np.float32)
        z = model.extract_features(params, jnp.asarray(images))
        with torch.no_grad():
            ref = torch_multiscale_extract(
                vit, torch.tensor(images[0])
            ).numpy()
        np.testing.assert_allclose(np.asarray(z[0]), ref, atol=5e-4)

    def test_full_sample_matches(self, full_twin, rng):
        """The headline composition: full sample() vs the torch twin with a
        shared noise sequence, pinned on the final pose encodings."""
        _, den, model, params = full_twin
        vit = full_twin[0]
        images = rng.uniform(size=(1, N_FRAMES, 3, IMG, IMG)).astype(np.float32)
        key = jax.random.PRNGKey(42)

        ours, _ = model.sample(params, jnp.asarray(images), key)
        ours = np.asarray(ours)

        shape = (1, N_FRAMES, 9)
        x0, noises = replay_sampler_noise(
            key, shape, model.schedule.num_timesteps
        )
        t_noises = {t: torch.tensor(n) for t, n in noises.items()}
        with torch.no_grad():
            z = torch_multiscale_extract(vit, torch.tensor(images[0]))[None]
            ref = torch_sample_loop(
                den, z, model.schedule, torch.tensor(x0), t_noises
            ).numpy()
        assert np.isfinite(ours).all()
        # Full composition: the ~5e-4 extractor deltas (see
        # test_multiscale_features_match) feed every step and amplify
        # through the chain — 3e-2 on O(1-3) values is ~1% relative.
        np.testing.assert_allclose(ours, ref, atol=3e-2)

        # Same-z split: feed the torch sampler OUR features.  Note the
        # multi-step drift is dominated by per-step chaos, not feature
        # deltas: the pose harmonic embedding multiplies x perturbations by
        # up to 2^9 per step, so ~1e-5 per-step f32 associativity noise
        # compounds to ~0.02 over 20 steps on BOTH compositions alike.  A
        # convention bug (codec widths, pivot ordering) would produce O(1)
        # deviations; 3e-2 cleanly separates the two.
        z_jax = np.asarray(
            model.extract_features(params, jnp.asarray(images))
        )
        with torch.no_grad():
            ref_same_z = torch_sample_loop(
                den, torch.tensor(z_jax), model.schedule,
                torch.tensor(x0), t_noises,
            ).numpy()
        np.testing.assert_allclose(ours, ref_same_z, atol=3e-2)

    def test_single_reverse_step_tight(self, full_twin, rng):
        """Amplification-free pin: ONE reverse step (t = T-1) through the
        full composition, compared tightly — this is where a real
        composition bug shows up undiluted."""
        _, den, model, params = full_twin
        vit = full_twin[0]
        images = rng.uniform(size=(1, N_FRAMES, 3, IMG, IMG)).astype(np.float32)
        key = jax.random.PRNGKey(11)

        _, traj = model.sample(
            params, jnp.asarray(images), key, return_trajectory=True
        )
        traj = np.asarray(traj)  # (T+1, 1, N, 9), traj[0] = x0

        T = model.schedule.num_timesteps
        shape = (1, N_FRAMES, 9)
        x0, noises = replay_sampler_noise(key, shape, T)
        np.testing.assert_allclose(traj[0], x0, atol=1e-6)

        t = T - 1
        sra = float(model.schedule.sqrt_recip_alphas_cumprod[t])
        srm1 = float(model.schedule.sqrt_recipm1_alphas_cumprod[t])
        c1 = float(model.schedule.posterior_mean_coef1[t])
        c2 = float(model.schedule.posterior_mean_coef2[t])
        logv = float(model.schedule.posterior_log_variance_clipped[t])
        with torch.no_grad():
            z = torch_multiscale_extract(vit, torch.tensor(images[0]))[None]
            eps = den(
                torch.tensor(x0), torch.full((1,), t, dtype=torch.long), z
            ).numpy()
        x_start = sra * x0 - srm1 * eps
        mean = c1 * x_start + c2 * x0
        ref_x1 = mean + math.exp(0.5 * logv) * noises[t]
        np.testing.assert_allclose(traj[1], ref_x1, atol=2e-3)

    def test_full_loss_matches(self, full_twin, rng):
        """Training-path composition: model.loss with a replayed (t, noise)
        draw vs the reference loss formula through the torch twins."""
        vit, den, model, params = full_twin
        B, N = 1, 3
        images = rng.uniform(size=(B, N, 3, IMG, IMG)).astype(np.float32)
        enc = (rng.normal(size=(B, N, 9)) * 0.3).astype(np.float32)
        key = jax.random.PRNGKey(5)

        out = model.loss(
            params, jnp.asarray(images), jnp.asarray(enc), key, train=False
        )

        # replay the loss's internal draws (models/pose_diffusion.py:182-184)
        key_t, key_noise, _ = jax.random.split(key, 3)
        t = np.asarray(
            jax.random.randint(key_t, (B,), 0, model.schedule.num_timesteps)
        )
        noise = np.asarray(jax.random.normal(key_noise, enc.shape))

        sac = np.asarray(model.schedule.sqrt_alphas_cumprod)
        som = np.asarray(model.schedule.sqrt_one_minus_alphas_cumprod)
        x_t = sac[t][:, None, None] * enc + som[t][:, None, None] * noise
        with torch.no_grad():
            z = torch_multiscale_extract(vit, torch.tensor(images[0]))[None]
            eps_hat = den(
                torch.tensor(x_t), torch.tensor(t), z
            ).numpy()
        ref_loss = np.abs(eps_hat - noise)
        np.testing.assert_allclose(np.asarray(out.loss), ref_loss, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.x_t), x_t, atol=1e-5)
