"""Benchmark: full match-extraction stage for a 20-frame sequence.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's ~20 s one-time match extraction inside its ~80 s
GGS inference (reference README.md:45; hloc SuperPoint+SuperGlue + COLMAP
RANSAC on a Quadro GP100).

Workload: the exact demo-path matching stage (matching/extract.py) — 20
frames at 224px: per-frame SuperPoint detection (4096-keypoint cap, hloc
superpoint_inloc parity, trimmed to detected density), SuperGlue matching
over all 190 exhaustive pairs (50 Sinkhorn iterations), and C++ RANSAC /
COLMAP-style two-view verification per surviving pair.  Weights are
randomly initialized — latency is weight-independent (keypoint/match
COUNTS downstream of thresholds can vary with weights, but every pair pays
the full fixed-shape detect+match cost either way).

``--dense`` runs 768px frames instead, where detection saturates the 4096
cap — the hloc-density worst case that routes through the batched XLA
matcher (K past the fused kernel's VMEM model).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

BASELINE_SECONDS = 20.0
N_FRAMES = 20
IMAGE_SIZE = 224
DENSE_IMAGE_SIZE = 768
WARMUP = 1
REPEATS = 3


def main(dense: bool = False):
    image_size = DENSE_IMAGE_SIZE if dense else IMAGE_SIZE
    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from posediffusion_tpu.matching import convert_superglue
    from posediffusion_tpu.matching.extract import extract_match
    from posediffusion_tpu.matching.superpoint import SuperPointNet

    rng = np.random.default_rng(0)

    # random matcher weights in the MagicLeap layout through the converter:
    # the same compute graph as converted released checkpoints
    sp_params = SuperPointNet().init(
        jax.random.PRNGKey(0),
        np.zeros((1, 1, 224, 224), np.float32),
    )
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from test_matching import random_superglue_sd

    sg_params = convert_superglue(random_superglue_sd(rng))

    # 20 structured frames on disk (smooth gradients + texture so SuperPoint
    # produces spatially spread detections rather than degenerate corners)
    tmpdir = tempfile.mkdtemp(prefix="bench_matching_")
    try:
        from PIL import Image

        paths = []
        yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32)
        for i in range(N_FRAMES):
            tex = (
                0.5
                + 0.25 * np.sin(xx / 7 + i) * np.cos(yy / 9 - i)
                + 0.25 * rng.uniform(size=(image_size, image_size))
            )
            img = (np.clip(tex, 0, 1) * 255).astype(np.uint8)
            p = os.path.join(tmpdir, f"frame_{i:03d}.jpg")
            Image.fromarray(img).convert("RGB").save(p)
            paths.append(p)

        def run():
            return extract_match(
                image_paths=paths, weights=(sp_params, sg_params)
            )

        for _ in range(WARMUP):
            run()
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
    finally:
        import shutil

        shutil.rmtree(tmpdir, ignore_errors=True)

    value = float(np.median(times))
    metric = "sec_per_20frame_match_extraction" + ("_4096kp" if dense else "")
    print(
        json.dumps(
            {
                "metric": metric,
                "value": value,
                "unit": "s",
                "vs_baseline": value / BASELINE_SECONDS,
            }
        )
    )


if __name__ == "__main__":
    main(dense="--dense" in sys.argv)
