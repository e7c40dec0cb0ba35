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


def parity():
    """On-device correctness assert for the fused SuperGlue kernel (VERDICT
    r3 #4): match the same C pairs at production keypoint density through
    BOTH the Mosaic-compiled fused kernel (ops/superglue_kernel.py) and the
    batched XLA matcher (matching.superglue.match_pairs_batched_xla) on the
    same chip, with released-layout weights through the converter.  The two
    paths order their reductions differently, so borderline matches near
    the mutual-check / threshold boundary may legitimately flip; asserts
    (a) >= 99% of match indices agree and (b) scores on agreeing matched
    entries are close.  Prints one JSON line; exits nonzero on failure."""
    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.matching import convert_superglue
    from posediffusion_tpu.matching.superglue import (
        encode_keypoints,
        match_pairs_batched_xla,
    )
    from posediffusion_tpu.ops.superglue_kernel import (
        fused_match_pairs,
        stack_superglue_params,
    )

    rng = np.random.default_rng(0)
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests")
    )
    from test_matching import random_superglue_sd

    params = convert_superglue(random_superglue_sd(rng))

    K, C, n_frames = 1024, 16, 8  # the demo-path density at 224px
    hw = np.tile((IMAGE_SIZE, IMAGE_SIZE), (n_frames, 1))
    # all frames observe the SAME underlying landmarks with small per-frame
    # keypoint/descriptor noise, so a real co-visibility structure exists and
    # the matchers produce actual matches (a fully-random input yields zero
    # matches past the 0.2 threshold, which would make this parity vacuous)
    base_kpts = rng.uniform(8, IMAGE_SIZE - 8, size=(K, 2)).astype(np.float32)
    base_desc = rng.normal(size=(K, 256)).astype(np.float32)
    kpts = (
        base_kpts[None]
        + rng.normal(scale=1.0, size=(n_frames, K, 2)).astype(np.float32)
    )
    scores = np.clip(
        rng.uniform(0.4, 0.9, size=(K,))[None]
        + rng.normal(scale=0.02, size=(n_frames, K)),
        0.0,
        1.0,
    ).astype(np.float32)
    desc = (
        base_desc[None]
        + rng.normal(scale=0.05, size=(n_frames, K, 256)).astype(np.float32)
    )
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    # ragged detection counts like real SuperPoint output
    counts = rng.integers(K // 2, K + 1, size=n_frames)
    mask = np.arange(K)[None] < counts[:, None]

    x = encode_keypoints(
        params, jnp.asarray(desc), jnp.asarray(kpts), jnp.asarray(scores), hw
    )
    pairs = [(a, b) for a in range(n_frames) for b in range(a + 1, n_frames)]
    pairs = pairs[:C]
    xp = jnp.stack([jnp.stack([x[a], x[b]]) for a, b in pairs])
    m0 = jnp.asarray(np.stack([mask[a] for a, _ in pairs]))
    m1 = jnp.asarray(np.stack([mask[b] for _, b in pairs]))
    stacks = stack_superglue_params(params)

    ok = True
    # thr=0.2 is the production threshold: with converter-layout random
    # weights its score mass stays below 0.2, so it checks that BOTH paths
    # agree nothing passes the threshold/mutual-check boundary.  thr=0.0
    # (pure mutual-NN) is the non-vacuous case: >10k real matches whose
    # indices and scores must agree.
    for thr in (0.2, 0.0):
        m_f, s_f = jax.jit(
            lambda *a: fused_match_pairs(
                *a, sinkhorn_iters=50, match_threshold=thr
            )
        )(xp, m0, m1, stacks)
        m_x, s_x = jax.jit(
            lambda *a: match_pairs_batched_xla(
                *a, sinkhorn_iterations=50, match_threshold=thr
            )
        )(xp, m0, m1, stacks)
        m_f, s_f, m_x, s_x = map(np.asarray, (m_f, s_f, m_x, s_x))

        valid = np.asarray(m0)
        agree = float(np.mean((m_f == m_x)[valid]))
        both = valid & (m_f == m_x) & (m_f >= 0)
        sdiff = float(np.max(np.abs(s_f - s_x)[both])) if both.any() else 0.0
        n_match = int((m_f[valid] >= 0).sum())
        out = {
            "metric": "superglue_fused_vs_xla_on_device",
            "match_threshold": thr,
            "pairs": len(pairs),
            "keypoints": K,
            "matched": n_match,
            "index_agreement": agree,
            "max_score_diff_on_agreeing": sdiff,
            "device": str(jax.devices()[0]),
        }
        print(json.dumps(out))
        # non-vacuity: the forced-match case must produce real matches so
        # index/score parity is exercised on actual assignments
        min_matched = len(pairs) * 32 if thr == 0.0 else 0
        if n_match < min_matched:
            print(
                f"FAIL: only {n_match} matches (< {min_matched}) at "
                f"thr={thr}; parity would be vacuous"
            )
            ok = False
        if agree < 0.99:
            print(f"FAIL: fused vs XLA match indices diverged: {agree}")
            ok = False
        if sdiff >= 1e-2:
            print(f"FAIL: fused vs XLA match scores diverged: {sdiff}")
            ok = False
    if not ok:
        sys.exit(1)
    print("MATCHING PARITY OK")


if __name__ == "__main__":
    if "--parity" in sys.argv:
        parity()
    else:
        main(dense="--dense" in sys.argv)
