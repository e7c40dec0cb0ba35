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

``--breakdown`` instead times each phase separately (extractor fwd,
extractor fwd+bwd incl. remat, denoiser-loss fwd+bwd, optimizer update,
metrics, full step), chained R iterations inside one jitted fori_loop so
the ~30 ms relay round-trip amortizes away, and writes BREAKDOWN.json.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_SECONDS = 1.0  # low end of the reference's 1-3 s/it
# f32 matches the reference's numerics (default); bfloat16 selects bf16
# residuals, which also unlocks the saved-x1 backward + mc=8 tiling
# (0.279 vs 0.320 s/it measured on one v5e at round-5 HEAD; both dtypes
# run all matmuls as bf16 MXU passes with f32 accumulation, and
# experiments/synthetic_learnability.py shows equal pose accuracy)
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
        make_optimizer,
        make_train_step,
    )

    model = PoseDiffusionModel(PoseDiffusionConfig(
        compute_dtype=COMPUTE_DTYPE, denoiser_dtype=COMPUTE_DTYPE
    ))
    params = model.init(jax.random.PRNGKey(0), image_hw=(IMAGE_SIZE, IMAGE_SIZE))
    optimizer, _ = make_optimizer(
        lr=1e-4, T_0=50, iters_per_epoch=16384, clip_grad=1.0
    )
    state = TrainState.create(params, optimizer)

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

    # R steps chained inside ONE program (state carried through the loop),
    # like every other bench here: each host-synchronized dispatch pays a
    # ~20-30 ms relay round trip (KERNELS.md "Measuring on relay-attached
    # TPUs") that is harness artifact, not device step time.  The
    # --breakdown mode reports the single-dispatch step separately
    # (full_step_dispatched_s) for the per-dispatch view.
    raw_step = make_train_step(model, optimizer, batch_repeat=BATCH_REPEAT)
    R = 4

    @jax.jit
    def step_chain(state, batch, key):
        def body(i, carry):
            st, _ = carry
            st, m = raw_step(st, batch, jax.random.fold_in(key, i))
            return st, m["loss"]
        _, loss = jax.lax.fori_loop(0, R, body, (state, 0.0))
        return loss

    for i in range(WARMUP):
        loss = float(jax.device_get(
            step_chain(state, batch, jax.random.PRNGKey(i))
        ))
        assert np.isfinite(loss)

    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        loss = float(jax.device_get(
            step_chain(state, batch, jax.random.PRNGKey(100 + i))
        ))
        times.append((time.perf_counter() - t0) / R)
    assert np.isfinite(loss)

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


def _timed(fn, *args, warmup=1, repeats=3, r=1):
    """Median wall seconds of fn(*args) / r, fetching a scalar to sync."""
    import jax
    import jax.numpy as jnp

    for _ in range(warmup):
        jax.device_get(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        times.append((time.perf_counter() - t0) / r)
    return float(np.median(times))


def breakdown():
    """Per-phase timing of the reference-scale train step (VERDICT r3 #1).

    Each phase is a separate jitted program with R iterations chained in a
    fori_loop whose carry feeds forward a tiny perturbation, so XLA can
    neither hoist the phase out of the loop nor overlap iterations.
    """
    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.diffusion.gaussian import p_losses
    from posediffusion_tpu.models import PoseDiffusionConfig, PoseDiffusionModel
    from posediffusion_tpu.training import (
        TrainState,
        jit_train_step,
        make_optimizer,
        make_train_step,
    )
    from posediffusion_tpu.training.step import pose_metrics

    model = PoseDiffusionModel(PoseDiffusionConfig(
        compute_dtype=COMPUTE_DTYPE, denoiser_dtype=COMPUTE_DTYPE
    ))
    params = model.init(jax.random.PRNGKey(0), image_hw=(IMAGE_SIZE, IMAGE_SIZE))
    optimizer, _ = make_optimizer(
        lr=1e-4, T_0=50, iters_per_epoch=16384, clip_grad=1.0
    )
    state = TrainState.create(params, optimizer)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(size=(N_SEQS, N_FRAMES, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(
            np.float32
        )
    )
    enc = jnp.asarray(rng.normal(size=(N_SEQS, N_FRAMES, 9)).astype(np.float32) * 0.3)
    batch = {"images": images, "pose_encodings": enc}
    key = jax.random.PRNGKey(0)

    out = {"dtype": COMPUTE_DTYPE, "n_images": N_SEQS * N_FRAMES,
           "batch_repeat": BATCH_REPEAT, "image_size": IMAGE_SIZE}

    R_FAST, R_SLOW = 8, 3

    # route the extractor phases exactly like model.loss does (the fused
    # Pallas train trunk on TPU, Flax elsewhere) so phases sum to the step
    fused_train = (
        model.config.fused_train_extractor
        and model.config.modelname.startswith("dino_vit")
        and jax.devices()[0].platform not in ("cpu",)
        and jax.device_count() == 1  # mirror models/pose_diffusion.py:loss
    )
    out["fused_train_extractor"] = bool(fused_train)

    # ---- phase: extractor forward
    @jax.jit
    def extract_fwd(params, images):
        def body(_, s):
            z = model.extract_features(
                params, images + s * 1e-30, fused_train=fused_train
            )
            return jnp.sum(z) * 1e-30
        return jax.lax.fori_loop(0, R_FAST, body, 0.0)

    out["extract_fwd_s"] = _timed(extract_fwd, params, images, r=R_FAST)
    print("extract_fwd_s", out["extract_fwd_s"], flush=True)

    # ---- phase: extractor forward+backward (remat included)
    @jax.jit
    def extract_bwd(params, images):
        def body(_, s):
            g = jax.grad(
                lambda p: jnp.sum(
                    model.extract_features(
                        p, images + s * 1e-30, fused_train=fused_train
                    )
                )
            )(params)
            return sum(jnp.sum(l) for l in jax.tree.leaves(g)) * 1e-30
        return jax.lax.fori_loop(0, R_SLOW, body, 0.0)

    out["extract_fwd_bwd_s"] = _timed(extract_bwd, params, images, r=R_SLOW)
    print("extract_fwd_bwd_s", out["extract_fwd_bwd_s"], flush=True)

    # ---- phase: denoiser loss fwd+bwd at the full repeated batch
    z0 = jax.jit(lambda p, im: model.extract_features(p, im))(params, images)

    @jax.jit
    def denoiser_bwd(params, z0, enc, key):
        B = N_SEQS * BATCH_REPEAT
        enc_rep = jnp.tile(enc, (BATCH_REPEAT, 1, 1))
        kt, kn, kd = jax.random.split(key, 3)
        t = jax.random.randint(kt, (B,), 0, model.schedule.num_timesteps)
        noise = jax.random.normal(kn, enc_rep.shape)

        def body(_, s):
            z = jnp.tile(z0 + s * 1e-30, (BATCH_REPEAT, 1, 1))

            def loss_fn(p):
                if fused_train:
                    from posediffusion_tpu.models.denoiser import (
                        denoiser_train_apply,
                    )

                    c = model.config
                    seed = jax.random.randint(
                        kd, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
                    )

                    def model_fn(x, tt):
                        return denoiser_train_apply(
                            p["denoiser"], x, tt, z, seed=seed,
                            nhead=c.nhead,
                            num_encoder_layers=c.num_encoder_layers,
                            pivot_cam_onehot=c.pivot_cam_onehot,
                            dropout_rate=c.dropout,
                            act_bf16=(c.denoiser_dtype == "bfloat16"),
                            residual_dtype=jnp.dtype(c.denoiser_dtype),
                        )
                else:
                    def model_fn(x, tt):
                        return model.denoiser.apply(
                            p["denoiser"], x, tt, z, deterministic=False,
                            rngs={"dropout": kd},
                        )
                o = p_losses(model.schedule, model_fn, enc_rep, t, noise)
                return jnp.mean(o.loss)

            g = jax.grad(loss_fn)(params)
            return sum(jnp.sum(l) for l in jax.tree.leaves(g)) * 1e-30
        return jax.lax.fori_loop(0, R_FAST, body, 0.0)

    out["denoiser_loss_fwd_bwd_s"] = _timed(denoiser_bwd, params, z0, enc, key, r=R_FAST)
    print("denoiser_loss_fwd_bwd_s", out["denoiser_loss_fwd_bwd_s"], flush=True)

    # ---- phase: optimizer update (AdamW + clip on ~27M params)
    grads = jax.jit(
        lambda p, im: jax.grad(
            lambda q: jnp.sum(model.extract_features(q, im[:2]))
        )(p)
    )(params, images)

    @jax.jit
    def opt_chain(state, grads):
        def body(_, carry):
            st, s = carry
            g = jax.tree.map(lambda a: a + s * 1e-30, grads)
            updates, new_opt = optimizer.update(g, st.opt_state, st.params)
            import optax as _optax
            new_params = _optax.apply_updates(st.params, updates)
            st = st.replace(step=st.step + 1, params=new_params, opt_state=new_opt)
            return st, jnp.sum(jax.tree.leaves(updates)[0]) * 1e-30
        st, s = jax.lax.fori_loop(0, R_FAST, body, (state, 0.0))
        return s

    out["optimizer_s"] = _timed(opt_chain, state, grads, r=R_FAST)
    print("optimizer_s", out["optimizer_s"], flush=True)

    # ---- phase: metrics
    @jax.jit
    def metrics_chain(enc, key):
        pred = enc + jax.random.normal(key, enc.shape) * 0.1

        def body(_, s):
            m = pose_metrics(pred + s * 1e-30, enc)
            return m["Auc_30"] * 1e-30
        return jax.lax.fori_loop(0, R_FAST, body, 0.0)

    out["metrics_s"] = _timed(metrics_chain, enc, key, r=R_FAST)
    print("metrics_s", out["metrics_s"], flush=True)

    # ---- full step (chained via state carry; no donation inside fori_loop)
    step_fn = make_train_step(model, optimizer, batch_repeat=BATCH_REPEAT)

    @jax.jit
    def full_chain(state, batch, key):
        def body(i, carry):
            st, _ = carry
            st, m = step_fn(st, batch, jax.random.fold_in(key, i))
            return st, m["loss"]
        _, loss = jax.lax.fori_loop(0, R_SLOW, body, (state, 0.0))
        return loss

    out["full_step_s"] = _timed(full_chain, state, batch, key, r=R_SLOW)
    print("full_step_s", out["full_step_s"], flush=True)

    # single dispatched step for reference (includes per-dispatch overhead)
    jit_step = jit_train_step(make_train_step(model, optimizer, batch_repeat=BATCH_REPEAT))
    st2 = TrainState.create(params, optimizer)
    st2, m = jit_step(st2, batch, key)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    st2, m = jit_step(st2, batch, key)
    jax.block_until_ready(m)
    out["full_step_dispatched_s"] = time.perf_counter() - t0

    accounted = (
        out["extract_fwd_bwd_s"] + out["denoiser_loss_fwd_bwd_s"]
        + out["optimizer_s"] + out["metrics_s"]
    )
    out["sum_of_phases_s"] = accounted
    print(json.dumps(out, indent=2))
    with open("BREAKDOWN.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    if "--breakdown" in sys.argv:
        breakdown()
    else:
        main()
