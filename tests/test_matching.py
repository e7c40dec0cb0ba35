"""Matching stack tests: native RANSAC, SuperPoint (torch-twin parity),
SuperGlue invariants, end-to-end extraction plumbing."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from posediffusion_tpu.matching import (
    convert_superglue,
    convert_superpoint,
    detect_keypoints,
    log_sinkhorn,
    match_pair,
    simple_nms,
    verify_matches,
    verify_two_view,
)
from posediffusion_tpu.matching.superpoint import SuperPointNet


def synthetic_two_view(rng, n=300, n_outliers=0, noise=0.0):
    """Projected 3D points in two views + injected outliers."""
    import scipy.spatial.transform as st

    K = np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]])
    R2 = st.Rotation.from_rotvec([0.05, 0.1, 0.02]).as_matrix()
    t2 = np.array([0.3, 0.05, 0.02])
    X = rng.normal(size=(n, 3)) * 1.5 + np.array([0, 0, 6.0])

    def proj(R, t):
        xc = X @ R.T + t
        p = xc @ K.T
        return p[:, :2] / p[:, 2:3]

    p1 = proj(np.eye(3), np.zeros(3)) + rng.normal(size=(n, 2)) * noise
    p2 = proj(R2, t2) + rng.normal(size=(n, 2)) * noise
    if n_outliers:
        p2[:n_outliers] = rng.uniform(0, 320, size=(n_outliers, 2))
    return p1.astype(np.float32), p2.astype(np.float32)


class TestRansac:
    def test_noise_free_all_inliers(self, rng):
        p1, p2 = synthetic_two_view(rng)
        mask, F, count = verify_matches(p1, p2, threshold_px=1.0)
        assert count == len(p1)
        # epipolar identity under the estimated F
        hom = lambda p: np.concatenate([p, np.ones((len(p), 1))], 1)
        res = np.einsum("ni,ij,nj->n", hom(p2), F, hom(p1))
        assert np.abs(res).max() / np.linalg.norm(F) < 1e-2

    def test_rejects_outliers(self, rng):
        p1, p2 = synthetic_two_view(rng, n_outliers=90, noise=0.3)
        mask, F, count = verify_matches(p1, p2, threshold_px=2.0, seed=1)
        assert mask[:90].sum() <= 8  # few false positives
        assert mask[90:].sum() >= 180  # most true inliers kept

    def test_majority_outliers(self, rng):
        p1, p2 = synthetic_two_view(rng, n_outliers=150, noise=0.2)
        mask, F, count = verify_matches(p1, p2, threshold_px=2.0, seed=1)
        assert mask[150:].sum() >= 120

    def test_degenerate_inputs(self):
        mask, F, count = verify_matches(np.zeros((5, 2)), np.zeros((5, 2)))
        assert count == 0
        mask, F, count = verify_matches(np.zeros((0, 2)), np.zeros((0, 2)))
        assert count == 0 and mask.shape == (0,)


K_SYN = np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]])


def synthetic_planar_two_view(rng, n=300, n_outliers=0, noise=0.0):
    """Points on a single 3D plane seen from two views (degenerate for F)."""
    import scipy.spatial.transform as st

    R2 = st.Rotation.from_rotvec([0.05, 0.12, 0.03]).as_matrix()
    t2 = np.array([0.4, 0.1, 0.05])
    # plane z = 6 + 0.2 x + 0.1 y
    xy = rng.uniform(-2, 2, size=(n, 2))
    X = np.concatenate([xy, 6.0 + 0.2 * xy[:, :1] + 0.1 * xy[:, 1:2]], axis=1)

    def proj(R, t):
        xc = X @ R.T + t
        p = xc @ K_SYN.T
        return p[:, :2] / p[:, 2:3]

    p1 = proj(np.eye(3), np.zeros(3)) + rng.normal(size=(n, 2)) * noise
    p2 = proj(R2, t2) + rng.normal(size=(n, 2)) * noise
    if n_outliers:
        p2[:n_outliers] = rng.uniform(0, 320, size=(n_outliers, 2))
    return p1.astype(np.float32), p2.astype(np.float32)


def synthetic_pure_rotation(rng, n=300, noise=0.0):
    """Two views related by rotation only — no parallax, epipolar geometry
    undefined; any F 'fit' is arbitrary."""
    import scipy.spatial.transform as st

    R2 = st.Rotation.from_rotvec([0.03, 0.15, 0.02]).as_matrix()
    X = rng.normal(size=(n, 3)) * 1.5 + np.array([0, 0, 6.0])

    def proj(R):
        xc = X @ R.T
        p = xc @ K_SYN.T
        return p[:, :2] / p[:, 2:3]

    p1 = proj(np.eye(3)) + rng.normal(size=(n, 2)) * noise
    p2 = proj(R2) + rng.normal(size=(n, 2)) * noise
    return p1.astype(np.float32), p2.astype(np.float32)


class TestTwoViewVerification:
    """COLMAP-parity model selection (reference: pycolmap
    estimation_and_geometric_verification, util/match_extraction.py:125-130)."""

    def test_general_scene_uncalibrated(self, rng):
        from posediffusion_tpu.matching.ransac import UNCALIBRATED

        p1, p2 = synthetic_two_view(rng)
        res = verify_two_view(p1, p2, max_error_px=1.0)
        assert res["config"] == UNCALIBRATED
        assert res["num_inliers"] == len(p1)

    def test_general_scene_calibrated(self, rng):
        from posediffusion_tpu.matching.ransac import CALIBRATED

        p1, p2 = synthetic_two_view(rng)
        res = verify_two_view(p1, p2, K1=K_SYN, K2=K_SYN, max_error_px=1.0)
        assert res["config"] == CALIBRATED
        assert res["num_inliers"] >= 0.98 * len(p1)
        # E lives on the essential manifold: singular values (s, s, 0)
        s = np.linalg.svd(res["E"], compute_uv=False)
        assert s[0] == pytest.approx(s[1], rel=1e-6)
        assert s[2] == pytest.approx(0.0, abs=1e-9 * s[0])
        # epipolar identity on normalized coordinates
        Kinv = np.linalg.inv(K_SYN)
        hom = lambda p: np.concatenate([p, np.ones((len(p), 1))], 1)
        n1 = hom(p1) @ Kinv.T
        n2 = hom(p2) @ Kinv.T
        res_e = np.einsum("ni,ij,nj->n", n2, res["E"], n1)
        assert np.abs(res_e).max() / np.linalg.norm(res["E"]) < 1e-3

    def test_planar_scene_flagged(self, rng):
        from posediffusion_tpu.matching.ransac import PLANAR_OR_PANORAMIC

        p1, p2 = synthetic_planar_two_view(rng)
        res = verify_two_view(p1, p2, max_error_px=1.0)
        assert res["config"] == PLANAR_OR_PANORAMIC
        # H transfers every point correctly
        hom = lambda p: np.concatenate([p, np.ones((len(p), 1))], 1)
        t = hom(p1) @ res["H"].T
        t = t[:, :2] / t[:, 2:3]
        assert np.abs(t - p2).max() < 1.0

    def test_pure_rotation_flagged(self, rng):
        from posediffusion_tpu.matching.ransac import PLANAR_OR_PANORAMIC

        p1, p2 = synthetic_pure_rotation(rng)
        res = verify_two_view(p1, p2, max_error_px=1.0)
        assert res["config"] == PLANAR_OR_PANORAMIC

    def test_planar_outliers_rejected_by_H(self, rng):
        """The VERDICT scenario: on a planar pair, an F fit is arbitrary and
        can absorb bogus matches as 'inliers'; the H model must reject them."""
        from posediffusion_tpu.matching.ransac import PLANAR_OR_PANORAMIC

        p1, p2 = synthetic_planar_two_view(rng, n_outliers=60, noise=0.2)
        res = verify_two_view(p1, p2, max_error_px=2.0, seed=3)
        assert res["config"] == PLANAR_OR_PANORAMIC
        mask = res["inlier_mask"]
        assert mask[:60].sum() <= 3       # bogus matches rejected
        assert mask[60:].sum() >= 220     # true planar matches kept

    def test_too_few_inliers_degenerate(self, rng):
        from posediffusion_tpu.matching.ransac import DEGENERATE

        p1 = rng.uniform(0, 320, size=(30, 2)).astype(np.float32)
        p2 = rng.uniform(0, 320, size=(30, 2)).astype(np.float32)
        res = verify_two_view(p1, p2, max_error_px=0.5, min_num_inliers=25, seed=2)
        assert res["config"] == DEGENERATE
        assert res["num_inliers"] == 0


class TestSuperPoint:
    def test_matches_torch_twin(self, rng):
        """Converted random torch SuperPoint weights produce identical cell
        logits + descriptor grids."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        class Twin(tnn.Module):
            def __init__(self):
                super().__init__()
                r = lambda i, o, k=3, p=1: tnn.Conv2d(i, o, k, padding=p)
                self.conv1a, self.conv1b = r(1, 64), r(64, 64)
                self.conv2a, self.conv2b = r(64, 64), r(64, 64)
                self.conv3a, self.conv3b = r(64, 128), r(128, 128)
                self.conv4a, self.conv4b = r(128, 128), r(128, 128)
                self.convPa, self.convPb = r(128, 256), r(256, 65, 1, 0)
                self.convDa, self.convDb = r(128, 256), r(256, 256, 1, 0)
                self.pool = tnn.MaxPool2d(2, 2)

            def forward(self, x):
                F = tnn.functional
                x = F.relu(self.conv1b(F.relu(self.conv1a(x))))
                x = self.pool(x)
                x = F.relu(self.conv2b(F.relu(self.conv2a(x))))
                x = self.pool(x)
                x = F.relu(self.conv3b(F.relu(self.conv3a(x))))
                x = self.pool(x)
                x = F.relu(self.conv4b(F.relu(self.conv4a(x))))
                semi = self.convPb(F.relu(self.convPa(x)))
                desc = self.convDb(F.relu(self.convDa(x)))
                desc = desc / desc.norm(dim=1, keepdim=True)
                return semi, desc

        torch.manual_seed(0)
        twin = Twin().eval()
        sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
        params = convert_superpoint(sd)

        img = rng.uniform(size=(1, 1, 64, 80)).astype(np.float32)
        with torch.no_grad():
            semi_t, desc_t = twin(torch.tensor(img))
        semi_j, desc_j = SuperPointNet().apply(params, jnp.asarray(img))
        np.testing.assert_allclose(
            np.asarray(semi_j), semi_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(desc_j), desc_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
        )

    def test_nms_suppresses_neighbors(self, rng):
        scores = jnp.asarray(rng.uniform(size=(1, 32, 32)).astype(np.float32))
        out = np.asarray(simple_nms(scores, radius=4))[0]
        ys, xs = np.nonzero(out)
        pts = np.stack([ys, xs], 1)
        if len(pts) > 1:
            from scipy.spatial.distance import pdist

            d = pdist(pts, metric="chebyshev")
            assert d.min() > 4

    def test_detect_keypoints_finds_corner(self, rng):
        """With random weights, the detector returns fixed-size padded output
        with coherent validity."""
        params = SuperPointNet().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64))
        )
        img = jnp.asarray(rng.uniform(size=(1, 1, 64, 64)).astype(np.float32))
        kpts, scores, desc, valid = detect_keypoints(
            params, img, max_keypoints=128, keypoint_threshold=0.0001
        )
        assert kpts.shape == (128, 2) and desc.shape == (128, 256)
        assert np.all(np.asarray(scores)[:-1] >= np.asarray(scores)[1:])  # sorted
        # descriptors unit-norm
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(desc), axis=1), 1.0, atol=1e-4
        )
        # keypoints inside the border
        k = np.asarray(kpts)[np.asarray(valid)]
        if len(k):
            assert k.min() >= 4 and k.max() < 60

    def test_batched_matches_per_frame(self, rng):
        from posediffusion_tpu.matching.superpoint import (
            detect_keypoints_batched,
        )

        params = SuperPointNet().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64))
        )
        imgs = jnp.asarray(rng.uniform(size=(3, 1, 64, 64)).astype(np.float32))
        kb, sb, db, vb = detect_keypoints_batched(
            params, imgs, max_keypoints=64, keypoint_threshold=0.0001
        )
        for i in range(3):
            k1, s1, d1, v1 = detect_keypoints(
                params, imgs[i : i + 1], max_keypoints=64,
                keypoint_threshold=0.0001,
            )
            np.testing.assert_allclose(
                np.asarray(sb[i]), np.asarray(s1), atol=1e-6
            )
            np.testing.assert_array_equal(np.asarray(kb[i]), np.asarray(k1))
            np.testing.assert_allclose(
                np.asarray(db[i]), np.asarray(d1), atol=1e-5
            )
            np.testing.assert_array_equal(np.asarray(vb[i]), np.asarray(v1))


def random_superglue_sd(rng, gnn_layers=9):
    """Synthetic MagicLeap-layout state dict (random weights)."""
    sd = {}

    def conv1d(key, i, o):
        # fan-in scaling keeps activations bounded through the 18-layer
        # residual GNN (random weights, BN stats are identity)
        sd[f"{key}.weight"] = rng.normal(size=(o, i, 1)).astype(np.float32) / np.sqrt(i) * 0.5
        sd[f"{key}.bias"] = np.zeros(o, np.float32)

    def bn(key, c):
        sd[f"{key}.weight"] = np.ones(c, np.float32)
        sd[f"{key}.bias"] = np.zeros(c, np.float32)
        sd[f"{key}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{key}.running_var"] = np.ones(c, np.float32)

    dims = [3, 32, 64, 128, 256, 256]
    seq = [0, 3, 6, 9, 12]
    for li, idx in enumerate(seq):
        conv1d(f"kenc.encoder.{idx}", dims[li], dims[li + 1])
        if li < len(seq) - 1:
            bn(f"kenc.encoder.{idx + 1}", dims[li + 1])
    for i in range(2 * gnn_layers):
        for p in range(3):
            conv1d(f"gnn.layers.{i}.attn.proj.{p}", 256, 256)
        conv1d(f"gnn.layers.{i}.attn.merge", 256, 256)
        conv1d(f"gnn.layers.{i}.mlp.0", 512, 512)
        bn(f"gnn.layers.{i}.mlp.1", 512)
        conv1d(f"gnn.layers.{i}.mlp.3", 512, 256)
    conv1d("final_proj", 256, 256)
    sd["bin_score"] = np.asarray(1.0, np.float32)
    return sd


class TestSuperGlue:
    def setup_method(self):
        rng = np.random.default_rng(3)
        self.params = convert_superglue(random_superglue_sd(rng))

    def _inputs(self, rng, k=32):
        mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
        desc = lambda: mk(1, k, 256) / 16.0
        kpts = lambda: jnp.asarray(
            rng.uniform(10, 100, size=(1, k, 2)).astype(np.float32)
        )
        scores = lambda: jnp.asarray(rng.uniform(size=(1, k)).astype(np.float32))
        return desc(), desc(), kpts(), kpts(), scores(), scores()

    def test_sinkhorn_doubly_stochastic(self, rng):
        scores = jnp.asarray(rng.normal(size=(1, 12, 15)).astype(np.float32))
        mask0 = jnp.ones((1, 12), bool)
        mask1 = jnp.ones((1, 15), bool)
        Z = log_sinkhorn(scores, jnp.asarray(1.0), mask0, mask1, iterations=100)
        P = np.exp(np.asarray(Z))[0]
        # row sums: each keypoint's probability mass = 1 (incl. dustbin)
        np.testing.assert_allclose(P[:-1].sum(axis=1), 1.0, atol=1e-3)
        np.testing.assert_allclose(P[:, :-1].sum(axis=0), 1.0, atol=1e-3)

    def test_match_pair_runs_and_is_mutual(self, rng):
        d0, d1, k0, k1, s0, s1 = self._inputs(rng)
        mask = jnp.ones((1, 32), bool)
        matches0, mscores0 = match_pair(
            self.params, d0, d1, k0, k1, s0, s1, mask, mask, (120, 120),
            sinkhorn_iterations=30, match_threshold=0.0,
        )
        matches0 = np.asarray(matches0)
        assert matches0.shape == (32,)
        assert matches0.max() < 32

    def test_identical_descriptors_match_identity(self, rng):
        """Two identical keypoint sets must match i -> i."""
        d0, _, k0, _, s0, _ = self._inputs(rng)
        mask = jnp.ones((1, 32), bool)
        matches0, mscores0 = match_pair(
            self.params, d0, d0, k0, k0, s0, s0, mask, mask, (120, 120),
            sinkhorn_iterations=50, match_threshold=0.0,
        )
        matches0 = np.asarray(matches0)
        matched = matches0 >= 0
        # identical sets: the diagonal dominates, every match is i -> i
        assert matched.sum() >= 30
        np.testing.assert_array_equal(
            matches0[matched], np.nonzero(matched)[0]
        )

    def test_padding_invariance(self, rng):
        """Padded keypoints must not change the matches of valid ones."""
        d0, d1, k0, k1, s0, s1 = self._inputs(rng, k=16)
        mask_full = jnp.ones((1, 16), bool)
        m_full, _ = match_pair(
            self.params, d0, d1, k0, k1, s0, s1, mask_full, mask_full,
            (120, 120), sinkhorn_iterations=30, match_threshold=0.0,
        )

        pad = lambda a: jnp.pad(a, [(0, 0), (0, 8)] + [(0, 0)] * (a.ndim - 2))
        mask_pad = jnp.concatenate([mask_full, jnp.zeros((1, 8), bool)], 1)
        m_pad, _ = match_pair(
            self.params, pad(d0), pad(d1), pad(k0), pad(k1), pad(s0), pad(s1),
            mask_pad, mask_pad, (120, 120),
            sinkhorn_iterations=30, match_threshold=0.0,
        )
        np.testing.assert_array_equal(np.asarray(m_full), np.asarray(m_pad)[:16])
        # padded queries never match
        assert np.all(np.asarray(m_pad)[16:] == -1)


class TestExtractEndToEnd:
    def test_single_frame_returns_none(self, rng, tmp_path):
        """No pairs to match: graceful (None, None, None) even when the
        fused path is requested (kernel needs >=1 pair)."""
        from PIL import Image

        from posediffusion_tpu.matching import extract_match
        from posediffusion_tpu.matching.superpoint import SuperPointNet

        arr = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
        p = tmp_path / "only.png"
        Image.fromarray(arr).save(p)
        sp_params = SuperPointNet().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, 48, 64))
        )
        sg_params = convert_superglue(random_superglue_sd(np.random.default_rng(1)))
        out = extract_match(
            image_paths=[str(p)], weights=(sp_params, sg_params),
            max_keypoints=64, use_fused=True,
        )
        assert out == (None, None, None)

    def test_extract_match_plumbing(self, rng, tmp_path):
        """Random weights through the full pipeline on synthetic images:
        structure + remap contract (not match quality)."""
        from PIL import Image

        from posediffusion_tpu.matching import extract_match
        from posediffusion_tpu.matching.superpoint import SuperPointNet

        paths = []
        for i in range(3):
            arr = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
            p = tmp_path / f"f{i}.png"
            Image.fromarray(arr).save(p)
            paths.append(str(p))

        sp_params = SuperPointNet().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, 48, 64))
        )
        sg_params = convert_superglue(random_superglue_sd(np.random.default_rng(1)))

        out = extract_match(
            image_paths=paths,
            weights=(sp_params, sg_params),
            max_keypoints=64,
            sinkhorn_iterations=10,
            match_threshold=0.0,
            min_pair_matches=4,
            ransac_threshold_px=50.0,
        )
        kp1, kp2, i12 = out
        if kp1 is not None:  # random weights may or may not produce matches
            assert kp1.shape[1] == 2 and i12.shape[1] == 2
            assert i12.min() >= 0 and i12.max() < 3

    def test_matching_stack_drives_ggs_sampler_on_apple(self, tmp_path):
        """Full GGS plumbing proof (VERDICT r1 #5): SuperPoint -> SuperGlue ->
        RANSAC -> remap -> build_cond_fn -> conditioned sampling, end-to-end
        on real frames from samples/apple with NO precomputed matches.
        Random matcher weights — this pins shapes/jit/plumbing, not accuracy
        (mirrors reference demo.py:79-89)."""
        from PIL import Image

        from posediffusion_tpu.data import load_and_preprocess_images
        from posediffusion_tpu.diffusion.ggs import GGSConfig, build_cond_fn
        from posediffusion_tpu.matching import extract_match
        from posediffusion_tpu.matching.superpoint import SuperPointNet
        from posediffusion_tpu.models import PoseDiffusionConfig, PoseDiffusionModel

        # downscaled copies of real apple frames (full-res SuperPoint on a
        # 1-core CPU host is out of budget; geometry survives the resize)
        src = sorted(
            os.path.join("samples/apple", f)
            for f in os.listdir("samples/apple")
            if f.endswith(".jpg")
        )[:4]
        n = len(src)
        for p in src:
            im = Image.open(p)
            im.resize((im.width // 8, im.height // 8), Image.BILINEAR).save(
                tmp_path / os.path.basename(p)
            )

        img_size = 64
        images, image_info = load_and_preprocess_images(str(tmp_path), img_size)
        assert images.shape[0] == n

        sp_params = SuperPointNet().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64))
        )
        sg_params = convert_superglue(random_superglue_sd(np.random.default_rng(1)))
        kp1, kp2, i12 = extract_match(
            image_paths=image_info["paths"],
            image_info=image_info,
            weights=(sp_params, sg_params),
            max_keypoints=64,
            sinkhorn_iterations=10,
            match_threshold=0.0,
            min_pair_matches=8,
            ransac_threshold_px=1e6,  # accept-all: plumbing, not quality
        )
        assert kp1 is not None and len(kp1) >= 8
        assert i12.min() >= 0 and i12.max() < n

        cfg = GGSConfig(iter_num=2, min_matches=0)
        cond_fn = build_cond_fn(kp1, kp2, i12, n, (img_size, img_size), cfg)

        model = PoseDiffusionModel(
            PoseDiffusionConfig(
                z_dim=32, d_model=32, nhead=2, num_encoder_layers=2,
                dim_feedforward=64, mlp_hidden_dim=16, vit_depth=1,
                vit_heads=2, timesteps=8, scale_factors=(1.0,),
            )
        )
        params = model.init(jax.random.PRNGKey(0), image_hw=(img_size, img_size))
        enc, _ = jax.jit(
            lambda p, im, k: model.sample(
                p, im, k, cond_fn=cond_fn, cond_start_step=2
            )
        )(params, jnp.asarray(images)[None], jax.random.PRNGKey(1))
        assert enc.shape == (1, n, 9)
        assert bool(jnp.isfinite(enc).all())
