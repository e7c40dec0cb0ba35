"""Data pipeline tests on synthetic fixtures (no real Co3D/Re10K needed)."""

import gzip
import json
import os

import numpy as np
import pytest
from PIL import Image

from posediffusion_tpu.data import (
    Co3dDataset,
    DynamicBatchSampler,
    Re10KDataset,
    collate_batch,
    load_and_preprocess_images,
)
from posediffusion_tpu.data import camera_np
from posediffusion_tpu.data.images import resize_bilinear_np


def _random_rotation(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    Q[:, 0] *= np.linalg.det(Q)
    return Q


def make_co3d_fixture(root, rng, n_seqs=2, n_frames=6, hw=(60, 80)):
    """Synthetic Co3D tree: images + one-category annotation file."""
    img_dir = os.path.join(root, "data")
    ann_dir = os.path.join(root, "ann")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    annotation = {}
    for s in range(n_seqs):
        frames = []
        for f in range(n_frames):
            rel = f"apple/seq{s}/frame{f:03d}.jpg"
            path = os.path.join(img_dir, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            arr = rng.integers(0, 255, size=(hw[0], hw[1], 3), dtype=np.uint8)
            Image.fromarray(arr).save(path)
            R = _random_rotation(rng)
            C = rng.normal(size=3) * 0.5 + np.array([0, 0, -4.0])
            T = -C @ R
            frames.append(
                {
                    "filepath": rel,
                    "bbox": [10, 10, 70, 50],
                    "R": R.tolist(),
                    "T": T.tolist(),
                    "focal_length": [2.1, 2.0],
                    "principal_point": [0.02, -0.01],
                }
            )
        annotation[f"seq{s}"] = frames
    with gzip.open(os.path.join(ann_dir, "apple_train.jgz"), "wt") as f:
        f.write(json.dumps(annotation))
    return img_dir, ann_dir


class TestImages:
    def test_resize_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        img = rng.uniform(size=(3, 37, 53)).astype(np.float32)
        ours = resize_bilinear_np(img, (224, 224))
        ref = torch.nn.functional.interpolate(
            torch.tensor(img)[None], size=(224, 224), mode="bilinear",
            align_corners=False,
        )[0].numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_resize_scale_factor_matches_torch(self, rng):
        """The reference's multiscale pyramid resizes with
        F.interpolate(scale_factor=s) (image_feature_extractor.py:87), whose
        coordinate mapping uses the GIVEN scale, not out/in — at s=1/3 on
        224px that differs from a size-based resize by ~2px at the edges."""
        import jax.numpy as jnp

        torch = pytest.importorskip("torch")
        from posediffusion_tpu.ops.image import resize_bilinear, scale_size

        img = rng.uniform(size=(1, 3, 224, 224)).astype(np.float32)
        for s in (1 / 2, 1 / 3):
            out = scale_size(224, s)
            ours = np.asarray(
                resize_bilinear(jnp.asarray(img), (out, out), scale_factor=s)
            )
            ref = torch.nn.functional.interpolate(
                torch.tensor(img), scale_factor=s, mode="bilinear",
                align_corners=False,
            ).numpy()
            np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_load_and_preprocess_images(self, rng, tmp_path):
        for i in range(3):
            arr = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(tmp_path / f"im{i}.jpg")
        images, info = load_and_preprocess_images(str(tmp_path), image_size=32)
        assert images.shape == (3, 3, 32, 32)
        assert images.min() >= 0 and images.max() <= 1
        # center square crop of 64x48: left = 8, bbox = [8, 0, 56, 48]
        np.testing.assert_array_equal(info["bboxes_xyxy"][0], [8, 0, 56, 48])
        np.testing.assert_allclose(info["resized_scales"], 32 / 48)


class TestCameraNpTwins:
    def test_intrinsics_adjust_matches_jnp(self, rng):
        import jax.numpy as jnp

        from posediffusion_tpu.geometry import (
            adjust_intrinsics_to_bbox_crop as j_crop,
            adjust_intrinsics_to_image_scale as j_scale,
        )

        fl = rng.uniform(1, 3, size=2)
        pp = rng.uniform(-0.1, 0.1, size=2)
        wh = np.array([80.0, 60.0])
        bbox = np.array([12.0, 8.0, 40.0, 40.0])  # xywh
        fl_n, pp_n = camera_np.adjust_intrinsics_to_bbox_crop(fl, pp, wh, bbox)
        fl_j, pp_j = j_crop(fl, pp, wh, bbox)
        np.testing.assert_allclose(fl_n, np.asarray(fl_j), rtol=1e-5)
        np.testing.assert_allclose(pp_n, np.asarray(pp_j), rtol=1e-4, atol=1e-5)

        fl_n2, pp_n2 = camera_np.adjust_intrinsics_to_image_scale(
            fl_n, pp_n, np.array([40.0, 40.0]), np.array([224.0, 224.0])
        )
        fl_j2, pp_j2 = j_scale(
            np.asarray(fl_n, np.float32), np.asarray(pp_n, np.float32),
            np.array([40.0, 40.0]), np.array([224.0, 224.0]),
        )
        np.testing.assert_allclose(fl_n2, np.asarray(fl_j2), rtol=1e-4)

    def test_normalize_matches_jnp(self, rng):
        import jax.numpy as jnp

        from posediffusion_tpu.geometry import PerspectiveCameras, normalize_cameras

        n = 5
        R = np.stack([_random_rotation(rng) for _ in range(n)])
        C = rng.normal(size=(n, 3)) + np.array([0, 0, -4.0])
        T = -np.einsum("nj,njk->nk", C, R)
        fl = np.full((n, 2), 2.0)
        pp = np.zeros((n, 2))

        Rn, Tn = camera_np.normalize_cameras(
            R, T, fl, pp, compute_optical=True, first_camera=True
        )
        cam = PerspectiveCameras.create(R=R, T=T, focal_length=fl, principal_point=pp)
        out = normalize_cameras(cam, compute_optical=True, first_camera=True)
        np.testing.assert_allclose(Rn, np.asarray(out.R), atol=1e-4)
        np.testing.assert_allclose(Tn, np.asarray(out.T), atol=1e-4)

    def test_quaternion_twin(self, rng):
        from posediffusion_tpu.geometry import matrix_to_quaternion as j_m2q
        import jax.numpy as jnp

        R = np.stack([_random_rotation(rng) for _ in range(8)])
        q_np = camera_np.matrix_to_quaternion(R)
        q_j = np.asarray(j_m2q(jnp.asarray(R)))
        np.testing.assert_allclose(q_np, q_j, atol=1e-5)


class TestCo3dDataset:
    def test_getitem_and_shapes(self, rng, tmp_path):
        img_dir, ann_dir = make_co3d_fixture(str(tmp_path), rng)
        ds = Co3dDataset(
            category=("apple",), split="train", CO3D_DIR=img_dir,
            CO3D_ANNOTATION_DIR=ann_dir, min_num_images=2, img_size=32,
            normalize_cameras=True, compute_optical=True, color_aug=True,
        )
        assert len(ds) == 2
        item = ds[(0, 4)]
        assert item["image"].shape == (4, 3, 32, 32)
        assert item["R"].shape == (4, 3, 3)
        assert np.isfinite(item["T"]).all()
        # first-camera gauge
        np.testing.assert_allclose(item["R"][0], np.eye(3), atol=1e-4)
        np.testing.assert_allclose(item["T"][0], 0.0, atol=1e-4)

    def test_threaded_loader_reproducible(self, rng, tmp_path):
        """Two loader runs with equal seeds yield identical batches even
        under thread-pool scheduling: item RNG comes from per-item seeds
        drawn in the sampler's deterministic iteration order, not from
        SeedSequence.spawn-call order (which depends on which worker thread
        gets which item first)."""
        from concurrent.futures import ThreadPoolExecutor

        img_dir, ann_dir = make_co3d_fixture(str(tmp_path), rng, n_seqs=3, n_frames=8)

        def run():
            ds = Co3dDataset(
                category=("apple",), split="train", CO3D_DIR=img_dir,
                CO3D_ANNOTATION_DIR=ann_dir, min_num_images=2, img_size=32,
                normalize_cameras=True, compute_optical=True, color_aug=True,
                seed=5,
            )
            s = DynamicBatchSampler(
                len(ds), dataset_len=3, max_images=16, images_per_seq=(3, 7),
                frame_buckets=(4, 8), seed=9,
            )
            out = []
            with ThreadPoolExecutor(max_workers=4) as pool:
                for spec in s:
                    items = list(pool.map(ds.__getitem__, spec))
                    out.append(
                        collate_batch(items, pad_frames_to=s.bucket_for(spec[0][1]))
                    )
            return out

        for ba, bb in zip(run(), run()):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k])

    def test_eval_time_deterministic_crop(self, rng, tmp_path):
        img_dir, ann_dir = make_co3d_fixture(str(tmp_path), rng)
        ds = Co3dDataset(
            category=("apple",), split="train", CO3D_DIR=img_dir,
            CO3D_ANNOTATION_DIR=ann_dir, min_num_images=2, img_size=32,
            normalize_cameras=True, compute_optical=True, eval_time=True,
            sort_by_filename=True,
        )
        a = ds.get_data(sequence_name="seq0", ids=[0, 2, 3])
        b = ds.get_data(sequence_name="seq0", ids=[0, 2, 3])
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["R"], b["R"])

    def test_mask_images(self, rng, tmp_path):
        """mask_images whites out the background via the Co3D mask files."""
        img_dir, ann_dir = make_co3d_fixture(str(tmp_path), rng)
        # write all-zero masks (everything is background) for seq0
        mask_dir = os.path.join(img_dir, "apple", "seq0", "masks")
        os.makedirs(mask_dir, exist_ok=True)
        for f in range(6):
            Image.fromarray(np.zeros((60, 80), np.uint8)).save(
                os.path.join(mask_dir, f"frame{f:03d}.png")
            )
        ds = Co3dDataset(
            category=("apple",), split="train", CO3D_DIR=img_dir,
            CO3D_ANNOTATION_DIR=ann_dir, min_num_images=2, img_size=32,
            normalize_cameras=True, compute_optical=True, eval_time=True,
            mask_images=True,
        )
        item = ds.get_data(sequence_name="seq0", ids=[0, 1])
        np.testing.assert_allclose(item["image"], 1.0, atol=1e-5)

    def test_min_num_images_filter(self, rng, tmp_path):
        img_dir, ann_dir = make_co3d_fixture(str(tmp_path), rng, n_frames=4)
        ds = Co3dDataset(
            category=("apple",), split="train", CO3D_DIR=img_dir,
            CO3D_ANNOTATION_DIR=ann_dir, min_num_images=5, img_size=32,
        )
        assert len(ds) == 0


class TestSamplerAndCollation:
    def test_dynamic_batches_respect_budget(self):
        s = DynamicBatchSampler(
            num_sequences=100, dataset_len=20, max_images=64,
            images_per_seq=(3, 20), frame_buckets=(4, 8, 16, 24),
        )
        for batch in s:
            n = batch[0][1]
            bucket = s.bucket_for(n)
            assert len(batch) == max(64 // bucket, 1)
            assert all(b[1] == n for b in batch)

    def test_bucket_rounding(self):
        s = DynamicBatchSampler(10, frame_buckets=(4, 8, 16), images_per_seq=(3, 17))
        assert s.bucket_for(3) == 4
        assert s.bucket_for(8) == 8
        assert s.bucket_for(9) == 16

    def test_sequence_indices_shard_disjoint(self):
        """Per-host eval sharding (train.py): samplers restricted to disjoint
        index subsets must never emit each other's sequences."""
        n_eval, n_proc = 37, 3
        seen = []
        for p in range(n_proc):
            shard = np.arange(n_eval)[p::n_proc]
            s = DynamicBatchSampler(
                n_eval, dataset_len=10, max_images=32, images_per_seq=(3, 9),
                frame_buckets=(4, 8), seed=1 + 1000 * p,
                sequence_indices=shard,
            )
            idx = {i for batch in s for i, *_ in batch}
            assert idx <= set(shard.tolist())
            seen.append(idx)
        for a in range(n_proc):
            for b in range(a + 1, n_proc):
                assert not (seen[a] & seen[b])

    def test_collate_padding_and_mask(self, rng, tmp_path):
        img_dir, ann_dir = make_co3d_fixture(str(tmp_path), rng)
        ds = Co3dDataset(
            category=("apple",), split="train", CO3D_DIR=img_dir,
            CO3D_ANNOTATION_DIR=ann_dir, min_num_images=2, img_size=32,
            normalize_cameras=True, compute_optical=True,
        )
        items = [ds[(0, 3)], ds[(1, 3)]]
        batch = collate_batch(items, pad_frames_to=4)
        assert batch["images"].shape == (2, 4, 3, 32, 32)
        assert batch["pose_encodings"].shape == (2, 4, 9)
        np.testing.assert_array_equal(batch["mask"], [[1, 1, 1, 0]] * 2)
        # padded slots zeroed
        assert batch["images"][:, 3].max() == 0

    def test_pose_encoding_matches_device_codec(self, rng, tmp_path):
        import jax.numpy as jnp

        from posediffusion_tpu.geometry import (
            PerspectiveCameras, camera_to_pose_encoding,
        )

        img_dir, ann_dir = make_co3d_fixture(str(tmp_path), rng)
        ds = Co3dDataset(
            category=("apple",), split="train", CO3D_DIR=img_dir,
            CO3D_ANNOTATION_DIR=ann_dir, min_num_images=2, img_size=32,
            normalize_cameras=True, compute_optical=True,
        )
        item = ds[(0, 3)]
        batch = collate_batch([item])
        cam = PerspectiveCameras.create(
            R=item["R"], T=item["T"], focal_length=item["fl"]
        )
        ref = np.asarray(camera_to_pose_encoding(cam))
        np.testing.assert_allclose(batch["pose_encodings"][0], ref, atol=1e-4)


class TestRe10K:
    def make_fixture(self, root, rng, n_frames=6):
        frames_dir = os.path.join(root, "frames/train/scene1")
        ann_dir = os.path.join(root, "ann/train")
        os.makedirs(frames_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        with open(os.path.join(root, "frames/train/video_loc.txt"), "w") as f:
            f.write("scene1\n")
        lines = ["https://example.com/video"]
        for i in range(n_frames):
            ts = 1000 + i
            arr = rng.integers(0, 255, size=(36, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(frames_dir, f"{ts}.png"))
            R = _random_rotation(rng)
            C = rng.normal(size=3) * 0.3 + np.array([0, 0, -3.0])
            t = (-R @ C).tolist()  # column-vector convention
            vals = [ts, 0.9, 1.2, 0.5, 0.5, 0, 0] + list(
                np.concatenate([np.concatenate([R, np.asarray(t)[:, None]], 1).reshape(-1)])
            )
            lines.append(" ".join(str(v) for v in vals))
        with open(os.path.join(ann_dir, "scene1.txt"), "w") as f:
            f.write("\n".join(lines))
        return root

    def test_getitem(self, rng, tmp_path):
        root = self.make_fixture(str(tmp_path), rng)
        ds = Re10KDataset(
            Re10K_DIR=root, Re10K_ANNOTATION_DIR=os.path.join(root, "ann"),
            min_num_images=3, img_size=32, normalize_cameras=True,
            compute_optical=True,
        )
        assert len(ds) == 1
        item = ds[(0, 4)]
        assert item["image"].shape == (4, 3, 32, 32)
        assert np.isfinite(item["T"]).all()
        np.testing.assert_allclose(item["R"][0], np.eye(3), atol=1e-4)
        # rotations stay orthonormal through the COLMAP->NDC flip
        RtR = np.einsum("nij,nkj->nik", item["R"], item["R"])
        np.testing.assert_allclose(RtR, np.eye(3)[None].repeat(4, 0), atol=1e-4)
