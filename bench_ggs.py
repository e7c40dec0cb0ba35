"""Benchmark: 20-frame pose inference WITH geometry-guided sampling (GGS).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's ~80 s total for GGS inference on a Quadro GP100,
of which ~20 s is one-time match extraction (reference README.md:45;
BASELINE.md) — so the GGS-conditioned *sampling* baseline is ~60 s.  This
bench measures exactly that sampling workload; match-extraction time is a
separate host/device stage benchmarked by the matching tests.

Workload: full demo-path GGS inference — 20 frames at 224px through the
multiscale extractor, 100-step DDPM sampling, and 5-phase GGS conditioning
(700 SGD iterations per conditioned step, 10 conditioned steps) on a
synthetic-but-geometrically-consistent match set of ~100 verified matches
per frame pair (190 pairs), the scale SuperGlue+RANSAC produces.  Weights
are randomly initialized — latency is weight-independent.


``--dense`` benches the 4096-keypoint detection density instead (~1024
verified matches per pair -> ~195k grouped elements, above the resident
fused kernel's VMEM budget): the pair-chunked streaming GGS kernel runs,
and the target is staying far under the reference's budget at a match
density it never reaches (hloc superpoint_inloc detects 4096 keypoints/im).
"""

import json
import sys
import time

import numpy as np

BASELINE_SECONDS = 60.0  # reference: 80 s total - 20 s match extraction
N_FRAMES = 20
IMAGE_SIZE = 224
MATCHES_PER_PAIR = 100
DENSE_MATCHES_PER_PAIR = 1024
WARMUP = 1
REPEATS = 5


def synthetic_scene(rng, n=N_FRAMES, n_points=MATCHES_PER_PAIR, hw=(IMAGE_SIZE, IMAGE_SIZE)):
    """Cameras looking at the origin + projected world points as matches
    (same construction as tests/test_diffusion.py make_gt_scene)."""
    from posediffusion_tpu.geometry import first_camera_transform
    from posediffusion_tpu.geometry.cameras import PerspectiveCameras, cameras_to_opencv

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
    return map(np.concatenate, (kp1, kp2, i12))


def main(dense: bool = False):
    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.diffusion.ggs import GGSConfig, build_cond_fn
    from posediffusion_tpu.models import PoseDiffusionConfig, PoseDiffusionModel

    model = PoseDiffusionModel(PoseDiffusionConfig())
    params = model.init(jax.random.PRNGKey(0), image_hw=(IMAGE_SIZE, IMAGE_SIZE))

    n_points = DENSE_MATCHES_PER_PAIR if dense else MATCHES_PER_PAIR
    rng = np.random.default_rng(0)
    kp1, kp2, i12 = synthetic_scene(rng, n_points=n_points)
    ggs_cfg = GGSConfig()
    cond_fn = build_cond_fn(
        np.asarray(kp1, np.float32), np.asarray(kp2, np.float32),
        np.asarray(i12), N_FRAMES, (IMAGE_SIZE, IMAGE_SIZE), ggs_cfg,
    )

    images = jnp.asarray(
        rng.uniform(size=(1, N_FRAMES, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(np.float32)
    )

    @jax.jit
    def infer(params, images, key):
        enc, _ = model.sample(
            params, images, key,
            cond_fn=cond_fn, cond_start_step=ggs_cfg.start_step,
        )
        return enc

    for i in range(WARMUP):
        jax.device_get(infer(params, images, jax.random.PRNGKey(i)))

    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        out = jax.device_get(infer(params, images, jax.random.PRNGKey(100 + i)))
        times.append(time.perf_counter() - t0)
    assert np.isfinite(out).all()

    value = float(np.median(times))
    metric = "sec_per_20frame_pose_inference_ggs" + ("_dense" if dense else "")
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
