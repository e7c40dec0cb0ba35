"""End-to-end entry-point tests: config system + demo on the apple fixture
(tiny model, CPU) + train loop on a synthetic Co3D fixture."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from posediffusion_tpu.utils.config import (
    build_ggs_config,
    build_model_config,
    cli_config,
    load_config,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TEST_ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    PALLAS_AXON_POOL_IPS="",
    XLA_FLAGS=os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)


class TestConfig:
    def test_load_default_and_overrides(self):
        cfg = load_config("default", ["GGS.enable=False", "image_size=64", "seed=3"])
        assert cfg.GGS.enable is False
        assert cfg.image_size == 64
        assert cfg.seed == 3
        assert cfg.MODEL.DENOISER.TRANSFORMER.d_model == 512

    def test_injecting_new_keys(self):
        cfg = load_config("default", ["GGS.pose_encoding_type=absT_quaR_logFL"])
        assert cfg.GGS.pose_encoding_type == "absT_quaR_logFL"

    def test_list_override(self):
        cfg = load_config("default_train", ["train.images_per_seq=[3,10]"])
        assert cfg.train.images_per_seq == [3, 10]

    def test_build_model_config(self):
        cfg = load_config("default")
        mc = build_model_config(cfg.MODEL)
        assert mc.d_model == 512 and mc.num_encoder_layers == 8
        assert mc.z_dim == 384 and mc.timesteps == 100

    def test_build_ggs_config(self):
        cfg = load_config("default")
        g = build_ggs_config(cfg.GGS)
        assert g.start_step == 10 and g.iter_num == 100
        assert g.learning_rate == pytest.approx(0.01)

    def test_cli_config_argv(self):
        cfg = cli_config("default", argv=["GGS.enable=False"])
        assert cfg.GGS.enable is False


@pytest.mark.slow
class TestDemoEndToEnd:
    def test_demo_apple_no_ggs(self, tmp_path):
        """Reference demo smoke test (samples/apple, GGS off, tiny model)."""
        out_dir = tmp_path / "out"
        cmd = [
            sys.executable, "demo.py",
            "GGS.enable=False", "ckpt=random",
            "MODEL.IMAGE_FEATURE_EXTRACTOR.depth=1",
            "MODEL.IMAGE_FEATURE_EXTRACTOR.scale_factors=[1.0]",
            "MODEL.DENOISER.TRANSFORMER.num_encoder_layers=1",
            "MODEL.DIFFUSER.timesteps=5",
            "image_size=64",
            f"out_dir={out_dir}",
        ]
        res = subprocess.run(
            cmd, cwd=REPO, env=TEST_ENV, capture_output=True, text=True, timeout=600
        )
        assert res.returncode == 0, res.stderr[-3000:]
        assert "absolute rotation error" in res.stdout
        preds = np.load(out_dir / "predictions.npz")
        assert preds["R"].shape == (20, 3, 3)
        assert np.isfinite(preds["ARE_deg"])
        assert (out_dir / "cameras.png").exists()

    def test_demo_with_ggs_precomputed_matches(self, tmp_path, rng):
        """GGS path through the demo with synthetic precomputed matches."""
        # synthetic matches among the first frames (random kps; validates the
        # plumbing, not accuracy)
        m = 200
        kp1 = rng.uniform(0, 64, size=(m, 2)).astype(np.float32)
        kp2 = rng.uniform(0, 64, size=(m, 2)).astype(np.float32)
        i12 = np.stack([rng.integers(0, 10, m), rng.integers(10, 20, m)], 1)
        matches_file = tmp_path / "matches.npz"
        np.savez(matches_file, kp1=kp1, kp2=kp2, i12=i12)
        out_dir = tmp_path / "out"
        cmd = [
            sys.executable, "demo.py",
            "GGS.enable=True", f"GGS.matches_file={matches_file}",
            "GGS.iter_num=2", "GGS.start_step=2",
            "ckpt=random",
            "MODEL.IMAGE_FEATURE_EXTRACTOR.depth=1",
            "MODEL.IMAGE_FEATURE_EXTRACTOR.scale_factors=[1.0]",
            "MODEL.DENOISER.TRANSFORMER.num_encoder_layers=1",
            "MODEL.DIFFUSER.timesteps=5",
            "image_size=64",
            f"out_dir={out_dir}",
        ]
        res = subprocess.run(
            cmd, cwd=REPO, env=TEST_ENV, capture_output=True, text=True, timeout=600
        )
        assert res.returncode == 0, res.stderr[-3000:]
        assert "Sampling with GGS" in res.stdout
        preds = np.load(out_dir / "predictions.npz")
        assert np.isfinite(preds["R"]).all()


@pytest.mark.slow
class TestEvalEndToEnd:
    def test_eval_harness_synthetic(self, tmp_path, rng):
        """test.py over a synthetic Co3D fixture: per-sequence errors,
        category table, results JSON."""
        import shutil

        from tests.test_data import make_co3d_fixture

        img_dir, ann_dir = make_co3d_fixture(str(tmp_path), rng, n_seqs=2, n_frames=6)
        shutil.copy(
            os.path.join(ann_dir, "apple_train.jgz"),
            os.path.join(ann_dir, "apple_test.jgz"),
        )
        results = tmp_path / "results.json"
        cmd = [
            sys.executable, "test.py",
            f"test.CO3D_DIR={img_dir}", f"test.CO3D_ANNOTATION_DIR={ann_dir}",
            "test.category=[apple]", "test.min_num_images=4",
            "test.img_size=32", "test.num_frames=4",
            "GGS.enable=False",
            "MODEL.IMAGE_FEATURE_EXTRACTOR.depth=1",
            "MODEL.IMAGE_FEATURE_EXTRACTOR.scale_factors=[1.0]",
            "MODEL.DENOISER.TRANSFORMER.num_encoder_layers=1",
            "MODEL.DIFFUSER.timesteps=5",
            f"results_file={results}",
        ]
        res = subprocess.run(
            cmd, cwd=REPO, env=TEST_ENV, capture_output=True, text=True, timeout=600
        )
        assert res.returncode == 0, res.stderr[-3000:]
        assert "Racc_15" in res.stdout and "mean" in res.stdout
        data = json.loads(results.read_text())
        assert "Auc_30" in data and "apple" in data["Auc_30"]
        assert 0.0 <= data["Auc_30"]["apple"] <= 100.0

    def test_eval_harness_with_live_matching_ggs(self, tmp_path, rng):
        """test.py's GGS branch with the LIVE matching stack (random
        MagicLeap-format checkpoints -> converters -> SuperPoint ->
        SuperGlue -> RANSAC -> pack_for_ggs), mirroring reference
        test.py:175-186.  Permissive thresholds so random weights still
        produce verified matches; K small to keep CPU matching cheap."""
        import shutil

        import torch

        from tests.test_data import make_co3d_fixture
        from tests.test_matching import random_superglue_sd

        img_dir, ann_dir = make_co3d_fixture(str(tmp_path), rng, n_seqs=1, n_frames=5)
        shutil.copy(
            os.path.join(ann_dir, "apple_train.jgz"),
            os.path.join(ann_dir, "apple_test.jgz"),
        )
        ckpt_dir = tmp_path / "matcher"
        ckpt_dir.mkdir()
        sp = {}
        dims = [
            ("conv1a", 1, 64, 3), ("conv1b", 64, 64, 3),
            ("conv2a", 64, 64, 3), ("conv2b", 64, 64, 3),
            ("conv3a", 64, 128, 3), ("conv3b", 128, 128, 3),
            ("conv4a", 128, 128, 3), ("conv4b", 128, 128, 3),
            ("convPa", 128, 256, 3), ("convPb", 256, 65, 1),
            ("convDa", 128, 256, 3), ("convDb", 256, 256, 1),
        ]
        for name, ci, co, k in dims:
            sp[f"{name}.weight"] = torch.tensor(
                rng.normal(size=(co, ci, k, k)).astype(np.float32)
                / np.sqrt(ci * k * k)
            )
            sp[f"{name}.bias"] = torch.zeros(co)
        torch.save(sp, ckpt_dir / "superpoint_v1.pth")
        sg = {k: torch.tensor(v) for k, v in random_superglue_sd(rng).items()}
        sg["bin_score"] = torch.tensor(0.5)
        torch.save(sg, ckpt_dir / "superglue_outdoor.pth")

        results = tmp_path / "results.json"
        cmd = [
            sys.executable, "test.py",
            f"test.CO3D_DIR={img_dir}", f"test.CO3D_ANNOTATION_DIR={ann_dir}",
            "test.category=[apple]", "test.min_num_images=4",
            "test.img_size=32", "test.num_frames=4",
            "GGS.enable=True", f"GGS.matcher_ckpt_dir={ckpt_dir}",
            "GGS.max_keypoints=64", "GGS.match_threshold=0.0",
            "GGS.ransac_threshold_px=50.0", "GGS.min_pair_matches=4",
            "GGS.min_matches=4", "GGS.iter_num=2", "GGS.start_step=2",
            "MODEL.IMAGE_FEATURE_EXTRACTOR.depth=1",
            "MODEL.IMAGE_FEATURE_EXTRACTOR.scale_factors=[1.0]",
            "MODEL.DENOISER.TRANSFORMER.num_encoder_layers=1",
            "MODEL.DIFFUSER.timesteps=5",
            f"results_file={results}",
        ]
        res = subprocess.run(
            cmd, cwd=REPO, env=TEST_ENV, capture_output=True, text=True,
            timeout=600,
        )
        assert res.returncode == 0, res.stderr[-3000:]
        data = json.loads(results.read_text())
        assert "Auc_30" in data and "apple" in data["Auc_30"]


@pytest.mark.slow
class TestTrainEndToEnd:
    def test_train_two_epochs_synthetic(self, tmp_path, rng):
        from tests.test_data import make_co3d_fixture

        img_dir, ann_dir = make_co3d_fixture(str(tmp_path), rng, n_seqs=3, n_frames=8)
        # also write a test split for eval
        import shutil

        shutil.copy(
            os.path.join(ann_dir, "apple_train.jgz"),
            os.path.join(ann_dir, "apple_test.jgz"),
        )
        exp_dir = tmp_path / "exp"
        cmd = [
            sys.executable, "train.py",
            f"train.CO3D_DIR={img_dir}", f"train.CO3D_ANNOTATION_DIR={ann_dir}",
            "train.category=apple", "train.min_num_images=4",
            "train.img_size=32", "train.epochs=2", "train.len_train=3",
            "train.len_eval=1", "train.max_images=8",
            "train.images_per_seq=[3,5]", "train.frame_buckets=[4,8]",
            "train.batch_repeat=2", "train.eval_interval=1",
            "train.ckpt_interval=1", "train.num_workers=0",
            "MODEL.IMAGE_FEATURE_EXTRACTOR.depth=1",
            "MODEL.IMAGE_FEATURE_EXTRACTOR.scale_factors=[1.0]",
            "MODEL.DENOISER.TRANSFORMER.num_encoder_layers=1",
            "MODEL.DIFFUSER.timesteps=5",
            f"exp_dir={exp_dir}",
        ]
        res = subprocess.run(
            cmd, cwd=REPO, env=TEST_ENV, capture_output=True, text=True, timeout=600
        )
        assert res.returncode == 0, res.stderr[-3000:]
        # checkpoints + stats written
        names = os.listdir(exp_dir)
        assert any(n.startswith("ckpt_") for n in names), names
        assert "stats.jsonl" in names
        rec = json.loads((exp_dir / "stats.jsonl").read_text().splitlines()[0])
        assert "train/loss" in rec
