"""Full eval-harness rehearsal on the real chip (VERDICT r4 #7).

Runs the COMPLETE ``test.py`` category loop — the reference's benchmark
evaluation semantics (pose_diffusion/test.py:110-128): per category x per
sequence frame sampling, jitted inference, pairwise relative pose errors,
Racc/Tacc@5/15/30 + AUC@30 per category and overall mean — at FULL model
scale (multiscale DINO ViT-S/16 @224px, 8-layer denoiser, T=100) on the
TPU, over a synthetic multi-category Co3D tree, with GGS off AND on (the
GGS pass drives the live matching stack: SuperPoint -> SuperGlue -> RANSAC
-> pack_for_ggs on random matcher weights).

This is the closest locally-possible rehearsal of the PARITY_RUNBOOK.md
sequence: real Co3D-v2 data and released checkpoints are unreachable from
this environment (zero egress), so the run proves the HARNESS end to end —
data loading, bucketing, jit shapes, metric accumulation, results JSON —
leaving only the data/checkpoint swap for when egress exists.  Accuracy
numbers are meaningless (random weights); exit codes, metric presence, and
the per-category table structure are the assertions.

Usage:  python experiments/eval_rehearsal.py   (writes EVAL_REHEARSAL.log)
"""

import gzip
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CATEGORIES = ("apple", "hydrant", "teddybear")
N_SEQS = 3
N_FRAMES = 14
NUM_EVAL_FRAMES = 10
IMG_HW = (240, 320)


def _random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def make_multicat_co3d(root, rng):
    """Synthetic Co3D-v2 tree: CATEGORIES x N_SEQS x N_FRAMES with
    plausible inward-facing cameras (same geometry recipe as
    tests/test_data.make_co3d_fixture, extended to multiple categories
    and a *_test.jgz split per category)."""
    from PIL import Image

    img_dir = os.path.join(root, "data")
    ann_dir = os.path.join(root, "ann")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    for cat in CATEGORIES:
        annotation = {}
        for s in range(N_SEQS):
            frames = []
            for f in range(N_FRAMES):
                rel = f"{cat}/seq{s}/frame{f:03d}.jpg"
                path = os.path.join(img_dir, rel)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                arr = rng.integers(
                    0, 255, size=(IMG_HW[0], IMG_HW[1], 3), dtype=np.uint8
                )
                Image.fromarray(arr).save(path)
                R = _random_rotation(rng)
                C = rng.normal(size=3) * 0.5 + np.array([0, 0, -4.0])
                T = -C @ R
                frames.append({
                    "filepath": rel,
                    "bbox": [20, 20, IMG_HW[1] - 40, IMG_HW[0] - 30],
                    "R": R.tolist(),
                    "T": T.tolist(),
                    "focal_length": [2.1, 2.0],
                    "principal_point": [0.02, -0.01],
                })
            annotation[f"seq{s}"] = frames
        with gzip.open(os.path.join(ann_dir, f"{cat}_test.jgz"), "wt") as f:
            f.write(json.dumps(annotation))
    return img_dir, ann_dir


def make_matcher_ckpts(root, rng):
    """Random-weight MagicLeap-layout checkpoints (the converters and the
    full matching stack run for real; match QUALITY is irrelevant here)."""
    import torch

    from tests.test_matching import random_superglue_sd

    ckpt_dir = os.path.join(root, "matcher")
    os.makedirs(ckpt_dir, exist_ok=True)
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
    torch.save(sp, os.path.join(ckpt_dir, "superpoint_v1.pth"))
    sg = {k: torch.tensor(v) for k, v in random_superglue_sd(rng).items()}
    sg["bin_score"] = torch.tensor(0.5)
    torch.save(sg, os.path.join(ckpt_dir, "superglue_outdoor.pth"))
    return ckpt_dir


def run_pass(label, img_dir, ann_dir, extra, log):
    results = os.path.join("/tmp", f"eval_rehearsal_{label}.json")
    cmd = [
        sys.executable, "test.py",
        f"test.CO3D_DIR={img_dir}", f"test.CO3D_ANNOTATION_DIR={ann_dir}",
        "test.category=[" + ",".join(CATEGORIES) + "]",
        "test.min_num_images=10", "test.img_size=224",
        f"test.num_frames={NUM_EVAL_FRAMES}",
        f"results_file={results}",
    ] + extra
    print(f"\n===== PASS {label}: {' '.join(cmd[2:])}", file=log, flush=True)
    t0 = time.time()
    res = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=3600
    )
    wall = time.time() - t0
    # keep the per-sequence table + summary, drop axon platform noise
    for line in res.stdout.splitlines():
        if "WARNING" not in line or "random weights" in line:
            print(line, file=log)
    print(f"===== PASS {label}: rc={res.returncode} wall={wall:.0f}s",
          file=log, flush=True)
    if res.returncode != 0:
        print(res.stderr[-4000:], file=log, flush=True)
        raise SystemExit(f"pass {label} failed (rc={res.returncode})")
    with open(results) as f:
        data = json.load(f)
    for metric in ("Racc_5", "Racc_15", "Racc_30", "Tacc_5", "Tacc_15",
                   "Tacc_30", "Auc_30"):
        assert metric in data, f"missing {metric} in results"
        for cat in CATEGORIES:
            assert cat in data[metric], f"missing {cat} in {metric}"
    print(f"pass {label}: all metrics present for all "
          f"{len(CATEGORIES)} categories", file=log, flush=True)
    return data


def main():
    rng = np.random.default_rng(7)
    root = "/tmp/eval_rehearsal_data"
    img_dir, ann_dir = make_multicat_co3d(root, rng)
    ckpt_dir = make_matcher_ckpts(root, rng)

    log_path = os.path.join(REPO, "EVAL_REHEARSAL.log")
    with open(log_path, "w") as log:
        import jax

        print(f"eval rehearsal on {jax.devices()[0].device_kind} "
              f"({jax.devices()[0].platform}); "
              f"git {subprocess.run(['git', 'rev-parse', '--short', 'HEAD'], cwd=REPO, capture_output=True, text=True).stdout.strip()}",
              file=log, flush=True)
        run_pass("no_ggs", img_dir, ann_dir, ["GGS.enable=False"], log)
        run_pass("ggs", img_dir, ann_dir, [
            "GGS.enable=True", f"GGS.matcher_ckpt_dir={ckpt_dir}",
            "GGS.max_keypoints=1024", "GGS.match_threshold=0.0",
            "GGS.ransac_threshold_px=50.0", "GGS.min_pair_matches=4",
            "GGS.min_matches=4",
        ], log)
        print("\nEVAL REHEARSAL COMPLETE: both passes green", file=log)
    print(f"wrote {log_path}")


if __name__ == "__main__":
    main()
