"""Benchmark: 20-frame pose inference (no GGS) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's ~0.8 s for the same workload on a Quadro GP100
(reference README.md:45; BASELINE.md).  vs_baseline = value / baseline, so
< 1.0 means faster than the reference.

The workload is the full demo-path inference: 20 frames at 224px through the
multiscale DINO ViT-S/16 extractor + 100-step DDPM sampling with the 8-layer
denoiser, all inside one jitted program.  Weights are randomly initialized —
latency is weight-independent.

Variants (first-class regeneration flags for every README perf row):
    python bench.py                      # default: 100-step DDPM @224px
    python bench.py --ddim 10            # DDIM with 10 steps
    python bench.py --image-size 336     # Re10K-checkpoint input scale
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SECONDS = 0.8
N_FRAMES = 20
WARMUP = 2
REPEATS = 5


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ddim", type=int, default=None, metavar="STEPS",
                    help="use DDIM with this many steps (default: 100-step DDPM)")
    ap.add_argument("--image-size", type=int, default=224,
                    help="input resolution (default 224; Re10K scale is 336)")
    args = ap.parse_args()
    ddim, image_size = args.ddim, args.image_size

    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from posediffusion_tpu.models import PoseDiffusionConfig, PoseDiffusionModel

    model = PoseDiffusionModel(PoseDiffusionConfig())
    params = model.init(jax.random.PRNGKey(0), image_hw=(image_size, image_size))

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(size=(1, N_FRAMES, 3, image_size, image_size)).astype(np.float32)
    )

    # R sequential end-to-end inferences inside ONE device program: host<->
    # device round-trip latency (which can dominate through remote tunnels;
    # ~30 ms per device_get on the axon relay) amortizes away, so value =
    # per-inference device time.  lax.map is sequential, so this measures
    # latency, not batching throughput.  The images are perturbed per
    # iteration so XLA cannot hoist the (key-independent) feature extractor
    # out of the loop — each iteration pays the FULL extractor + sampler
    # cost, like a real per-sequence inference.
    R = 40

    @jax.jit
    def infer_chain(params, images, key):
        keys = jax.random.split(key, R)
        idx = jnp.arange(R, dtype=jnp.float32)

        def one(ik):
            i, k = ik
            enc, _ = model.sample(params, images + i * 1e-12, k)
            return enc

        return jax.lax.map(one, (idx, keys))

    for i in range(WARMUP):
        jax.device_get(jnp.sum(infer_chain(params, images, jax.random.PRNGKey(i))))

    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        jax.device_get(jnp.sum(infer_chain(params, images, jax.random.PRNGKey(100 + i))))
        times.append((time.perf_counter() - t0) / R)

    value = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "sec_per_20frame_pose_inference_no_ggs",
                "value": value,
                "unit": "s",
                "vs_baseline": value / BASELINE_SECONDS,
            }
        )
    )


if __name__ == "__main__":
    main()
