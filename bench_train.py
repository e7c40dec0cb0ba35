"""Benchmark: reference-scale training step on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference logs ~1-3 s/it at this workload (reference
README.md:75, train.py:94 `sec/it`); we take the LOW end (1.0 s) as the
baseline so vs_baseline is conservative.

Workload: exactly the reference's training configuration
(cfgs/default_train.yaml:5-41) — 512 images per step (32 sequences x
16-frame bucket) at 224px, batch_repeat=90 diffusion-batch amortization,
full forward+backward through the multiscale DINO ViT-S/16 extractor and
the 8-layer denoiser, AdamW update with warmup-cosine-restarts and grad
clip 1.0.  Weights are randomly initialized — step time is
weight-independent.
"""

import json
import os
import time

import numpy as np

BASELINE_SECONDS = 1.0  # low end of the reference's 1-3 s/it
# f32 matches the reference's numerics (default); bfloat16 runs the ViT
# blocks on the MXU fast path (0.79 vs 1.04 s/it measured on one v5e)
COMPUTE_DTYPE = os.environ.get("POSEDIFFUSION_BENCH_DTYPE", "float32")
N_SEQS = 32
N_FRAMES = 16  # 32 x 16 = 512 images = reference max_images
IMAGE_SIZE = 224
BATCH_REPEAT = 90
WARMUP = 2
REPEATS = 5


def main():
    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.models import PoseDiffusionConfig, PoseDiffusionModel
    from posediffusion_tpu.training import (
        TrainState,
        jit_train_step,
        make_optimizer,
        make_train_step,
    )

    model = PoseDiffusionModel(PoseDiffusionConfig(compute_dtype=COMPUTE_DTYPE))
    params = model.init(jax.random.PRNGKey(0), image_hw=(IMAGE_SIZE, IMAGE_SIZE))
    optimizer, _ = make_optimizer(
        lr=1e-4, T_0=50, iters_per_epoch=16384, clip_grad=1.0
    )
    state = TrainState.create(params, optimizer)
    step_fn = jit_train_step(
        make_train_step(model, optimizer, batch_repeat=BATCH_REPEAT)
    )

    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(
            rng.uniform(size=(N_SEQS, N_FRAMES, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(
                np.float32
            )
        ),
        "pose_encodings": jnp.asarray(
            rng.normal(size=(N_SEQS, N_FRAMES, 9)).astype(np.float32) * 0.3
        ),
    }

    for i in range(WARMUP):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        jax.block_until_ready(metrics)

    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(100 + i))
        jax.block_until_ready(metrics)
        times.append(time.perf_counter() - t0)
    assert np.isfinite(float(metrics["loss"]))

    value = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "sec_per_reference_scale_train_step",
                "value": value,
                "unit": "s/it",
                "vs_baseline": value / BASELINE_SECONDS,
            }
        )
    )


if __name__ == "__main__":
    main()
