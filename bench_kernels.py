"""Per-phase timing of the no-GGS inference path (KERNELS.md reconciliation).

Times each phase of the 20-frame 224px inference IN SITU with the same
chained-R method as bench.py (R iterations inside one jitted program,
scalar fetch, divide by R), so the per-phase numbers and the end-to-end
bench measure the same thing and must sum:

    end_to_end ~= extract_fused + sampler_loop + glue

Writes KERNEL_TIMES.json.  Claims in KERNELS.md are regenerated from this
file — if they disagree with BENCH_r*.json again, rerun this.
"""

import json
import time

import numpy as np

N_FRAMES = 20
IMAGE_SIZE = 224
R = 40
WARMUP = 2
REPEATS = 5


def _timed(fn, *args):
    import jax

    for _ in range(WARMUP):
        jax.device_get(fn(*args))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        ts.append((time.perf_counter() - t0) / R)
    return float(np.median(ts))


def main():
    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.models import PoseDiffusionConfig, PoseDiffusionModel
    from posediffusion_tpu.ops.sampler_kernel import fused_sample_loop

    model = PoseDiffusionModel(PoseDiffusionConfig())
    params = model.init(jax.random.PRNGKey(0), image_hw=(IMAGE_SIZE, IMAGE_SIZE))

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(size=(1, N_FRAMES, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(
            np.float32
        )
    )
    out = {"n_frames": N_FRAMES, "image_size": IMAGE_SIZE, "R": R}

    # ---- full inference (the bench.py workload)
    @jax.jit
    def infer_chain(params, images, key):
        keys = jax.random.split(key, R)
        idx = jnp.arange(R, dtype=jnp.float32)

        def one(ik):
            i, k = ik
            enc, _ = model.sample(params, images + i * 1e-12, k)
            return enc

        encs = jax.lax.map(one, (idx, keys))
        return jnp.sum(encs)

    out["end_to_end_s"] = _timed(infer_chain, params, images, jax.random.PRNGKey(0))

    # ---- fused multiscale ViT extraction alone
    @jax.jit
    def extract_chain(params, images):
        idx = jnp.arange(R, dtype=jnp.float32)

        def one(i):
            z = model.extract_features(params, images + i * 1e-12, fused=True)
            return jnp.sum(z)

        return jnp.sum(jax.lax.map(one, idx))

    out["extract_fused_s"] = _timed(extract_chain, params, images)

    # ---- whole-loop sampler kernel alone (fixed features)
    z0 = jax.jit(
        lambda p, im: model.extract_features(p, im, fused=True)
    )(params, images)

    @jax.jit
    def sampler_chain(dparams, z, key):
        keys = jax.random.split(key, R)
        idx = jnp.arange(R, dtype=jnp.float32)

        def one(ik):
            i, k = ik
            x, _ = fused_sample_loop(
                dparams, model.schedule, z + i * 1e-12, k,
                nhead=model.config.nhead,
                num_encoder_layers=model.config.num_encoder_layers,
                pivot_cam_onehot=model.config.pivot_cam_onehot,
            )
            return jnp.sum(x)

        return jnp.sum(jax.lax.map(one, (idx, keys)))

    out["sampler_loop_s"] = _timed(
        sampler_chain, params["denoiser"], z0, jax.random.PRNGKey(1)
    )

    out["glue_s"] = out["end_to_end_s"] - out["extract_fused_s"] - out["sampler_loop_s"]

    # ---- sampler weight-streaming bound: per step the kernel re-reads the
    # 8 encoder layers' weights (bf16) from HBM
    p = params["denoiser"]["params"]
    layer_bytes = sum(
        int(np.prod(a.shape)) * 2
        for a in jax.tree.leaves(p["trunk"])
    )
    head_bytes = sum(
        int(np.prod(a.shape)) * 2
        for k in ("first", "last", "time_embed")
        for a in jax.tree.leaves(p[k])
    )
    T = model.schedule.num_timesteps
    out["sampler_streamed_gb"] = (layer_bytes + head_bytes) * T / 1e9
    out["sampler_bound_s_at_819GBps"] = out["sampler_streamed_gb"] / 819.0

    print(json.dumps(out, indent=2))
    with open("KERNEL_TIMES.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
