"""End-to-end learnability check on a synthetic planar scene.

Unit tests pin each component; this experiment validates the whole system —
data -> multiscale ViT features -> diffusion loss -> AdamW -> sampler ->
relative-pose metrics — by training a small PoseDiffusion on images that
genuinely encode camera pose and showing pose accuracy far above chance.

Scene: a fixed random texture on the z=0 plane, viewed by cameras on a
hemisphere looking at the origin.  Each frame is the texture warped by the
camera's homography (K [r1 r2 t]), so relative viewpoint IS recoverable from
pixels.  Sequences are normalized exactly like the Co3D pipeline
(first-camera gauge), encoded with the absT_quaR_logFL codec, and trained
with the standard train step (batch_repeat amortization included).

Usage:  python experiments/synthetic_learnability.py [steps=1500] [out=...]
Prints eval Racc/Tacc before and after training; writes a JSON summary.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_texture(rng, size=512, octaves=4):
    """Smooth random RGB texture (sum of upsampled noise octaves)."""
    tex = np.zeros((size, size, 3), np.float32)
    for o in range(octaves):
        g = 2 ** (octaves - o + 2)
        noise = rng.uniform(0, 1, size=(g, g, 3)).astype(np.float32)
        reps = size // g
        up = np.kron(noise, np.ones((reps, reps, 1), np.float32))
        tex += up / (o + 1)
    tex /= tex.max()
    return tex


def look_at_camera(center, target, up=(0.0, 1.0, 0.0)):
    """Row-vector world-to-view extrinsics for a camera at `center` looking
    at `target` (the same construction as the test rigs)."""
    z = np.asarray(target, np.float64) - center
    z /= np.linalg.norm(z)
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=1)
    T = -center @ R
    return R, T


def render_plane(texture, R, T, fl_ndc, img_size):
    """Render the z=0 textured plane through an NDC camera via homography.

    For each output pixel, unproject the NDC ray and intersect the plane:
    x_world = (x_view - T) R^T with x_view = depth * (u/f, v/f, 1).
    """
    s = img_size / 2.0
    us, vs = np.meshgrid(np.arange(img_size), np.arange(img_size), indexing="xy")
    # pixel -> NDC (x left, y up)
    x_ndc = -(us + 0.5 - img_size / 2.0) / s
    y_ndc = -(vs + 0.5 - img_size / 2.0) / s
    d = np.stack([x_ndc / fl_ndc, y_ndc / fl_ndc, np.ones_like(x_ndc)], -1)
    # ray: world = (t * d - T) R^T ; solve z_world == 0
    Rt = R.T
    origin = -T @ Rt
    dir_w = d @ Rt
    tt = -origin[2] / np.where(np.abs(dir_w[..., 2]) < 1e-9, 1e-9, dir_w[..., 2])
    pw = origin[None, None] + tt[..., None] * dir_w
    # plane coords -> texture lookup (plane spans [-1.5, 1.5])
    th, tw = texture.shape[:2]
    uu = np.clip(((pw[..., 0] + 1.5) / 3.0) * (tw - 1), 0, tw - 1)
    vv = np.clip(((pw[..., 1] + 1.5) / 3.0) * (th - 1), 0, th - 1)
    img = texture[vv.astype(np.int32), uu.astype(np.int32)]
    behind = (tt < 0.1)[..., None]
    img = np.where(behind, 0.0, img)
    return img.transpose(2, 0, 1).astype(np.float32)  # CHW


def make_batch(rng, texture, B, N, img_size, fl=2.0):
    import jax.numpy as jnp

    from posediffusion_tpu.data.camera_np import matrix_to_quaternion, normalize_cameras
    from posediffusion_tpu.geometry.pose_codec import LOG_FL_BIAS

    images = np.zeros((B, N, 3, img_size, img_size), np.float32)
    encodings = np.zeros((B, N, 9), np.float32)
    for b in range(B):
        Rs, Ts = [], []
        for n in range(N):
            az = rng.uniform(0, 2 * np.pi)
            el = rng.uniform(0.6, 1.3)
            r = rng.uniform(2.5, 4.0)
            center = np.array(
                [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az),
                 -r * np.sin(el)]
            )
            target = rng.uniform(-0.2, 0.2, 3) * np.array([1, 1, 0])
            R, T = look_at_camera(center, target)
            images[b, n] = render_plane(texture, R, T, fl, img_size)
            Rs.append(R)
            Ts.append(T)
        R = np.stack(Rs)
        T = np.stack(Ts)
        fls = np.full((N, 2), fl)
        Rn, Tn = normalize_cameras(
            R, T, fls, np.zeros((N, 2)), compute_optical=True, first_camera=True
        )
        quat = matrix_to_quaternion(Rn)
        log_fl = np.log(np.full((N, 2), fl)) - LOG_FL_BIAS
        encodings[b] = np.concatenate([Tn, quat, log_fl], -1)
    return {
        "images": jnp.asarray(images),
        "pose_encodings": jnp.asarray(encodings),
    }


def project_points(Xw, R, T, fl, img_size):
    """World points -> pixel coords + NDC-visibility mask (one camera)."""
    xv = Xw @ R + T
    ndc = fl * xv[:, :2] / xv[:, 2:3]
    s = img_size / 2.0
    px = -ndc[:, 0] * s + img_size / 2.0
    py = -ndc[:, 1] * s + img_size / 2.0
    vis = (np.abs(ndc) < 0.95).all(axis=1) & (xv[:, 2] > 0.1)
    return np.stack([px, py], -1), vis


def make_eval_sequence_with_matches(rng, texture, N, img_size, fl=2.0):
    """One eval sequence + exact two-view correspondences from the renderer."""
    import jax.numpy as jnp

    from posediffusion_tpu.data.camera_np import matrix_to_quaternion, normalize_cameras
    from posediffusion_tpu.geometry.pose_codec import LOG_FL_BIAS

    Rs, Ts, imgs = [], [], []
    for n in range(N):
        az = rng.uniform(0, 2 * np.pi)
        el = rng.uniform(0.6, 1.3)
        r = rng.uniform(2.5, 4.0)
        center = np.array(
            [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az), -r * np.sin(el)]
        )
        target = rng.uniform(-0.2, 0.2, 3) * np.array([1, 1, 0])
        R, T = look_at_camera(center, target)
        imgs.append(render_plane(texture, R, T, fl, img_size))
        Rs.append(R)
        Ts.append(T)
    R = np.stack(Rs)
    T = np.stack(Ts)

    # exact matches: plane points projected into every ordered pair
    Xw = np.concatenate(
        [rng.uniform(-1.0, 1.0, size=(400, 2)), np.zeros((400, 1))], axis=1
    )
    kp1, kp2, i12 = [], [], []
    for a in range(N):
        pa, va = project_points(Xw, R[a], T[a], fl, img_size)
        for b in range(a + 1, N):
            pb, vb = project_points(Xw, R[b], T[b], fl, img_size)
            keep = va & vb
            if keep.sum() < 10:
                continue
            kp1.append(pa[keep])
            kp2.append(pb[keep])
            i12.append(np.repeat([[a, b]], keep.sum(), axis=0))
    kp1 = np.concatenate(kp1).astype(np.float32)
    kp2 = np.concatenate(kp2).astype(np.float32)
    i12 = np.concatenate(i12)

    fls = np.full((N, 2), fl)
    Rn, Tn = normalize_cameras(
        R, T, fls, np.zeros((N, 2)), compute_optical=True, first_camera=True
    )
    quat = matrix_to_quaternion(Rn)
    log_fl = np.log(np.full((N, 2), fl)) - LOG_FL_BIAS
    enc = np.concatenate([Tn, quat, log_fl], -1).astype(np.float32)
    return (
        jnp.asarray(np.stack(imgs)[None]),
        jnp.asarray(enc[None]),
        (kp1, kp2, i12),
    )


def evaluate_ggs(model, params, texture, img_size, n_seqs=6, N=6, seed0=20_000):
    """Racc/Tacc with and without GGS conditioning (exact matches)."""
    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.diffusion.ggs import GGSConfig, build_cond_fn
    from posediffusion_tpu.training import pose_metrics

    cfg = GGSConfig(start_step=10, iter_num=100)
    rows = {"plain": ([], []), "ggs": ([], [])}
    for i in range(n_seqs):
        erng = np.random.default_rng(seed0 + i)
        images, enc, (kp1, kp2, i12) = make_eval_sequence_with_matches(
            erng, texture, N, img_size
        )
        cond_fn = build_cond_fn(kp1, kp2, i12, N, (img_size, img_size), cfg)
        for mode, cf, css in (("plain", None, 0), ("ggs", cond_fn, cfg.start_step)):
            out, _ = jax.jit(
                lambda p, im, k, cf=cf, css=css: model.sample(
                    p, im, k, cond_fn=cf, cond_start_step=css
                )
            )(params, images, jax.random.PRNGKey(seed0 + i))
            m = pose_metrics(out, enc)
            rows[mode][0].append(float(m["Racc_15"]))
            rows[mode][1].append(float(m["Tacc_15"]))
    return {
        mode: (float(np.mean(r)), float(np.mean(t)))
        for mode, (r, t) in rows.items()
    }


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    steps = int(args.get("steps", 1500))
    out_path = args.get("out", "experiments/synthetic_learnability.json")
    img_size = int(args.get("img_size", 64))
    # dtype=bfloat16 validates the MXU fast-path training quality against
    # the f32 run (README train-bench rows)
    compute_dtype = args.get("dtype", "float32")

    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.models import PoseDiffusionConfig, PoseDiffusionModel
    from posediffusion_tpu.training import (
        TrainState, jit_train_step, make_eval_step, make_optimizer, make_train_step,
    )
    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = PoseDiffusionConfig(
        z_dim=192, vit_depth=4, vit_heads=3,
        d_model=256, nhead=4, num_encoder_layers=4, dim_feedforward=512,
        timesteps=100, scale_factors=(1.0,), dropout=0.0,
        compute_dtype=compute_dtype,
    )
    model = PoseDiffusionModel(cfg)
    params = model.init(jax.random.PRNGKey(0), image_hw=(img_size, img_size))
    print("params:", sum(x.size for x in jax.tree.leaves(params)) / 1e6, "M")

    opt, sched = make_optimizer(lr=3e-4, T_0=100, iters_per_epoch=max(steps, 1),
                                warmup_ratio=0.03)
    state = TrainState.create(params, opt)
    train_step = jit_train_step(make_train_step(model, opt, batch_repeat=8,
                                                compute_metrics=False))
    eval_step = jax.jit(make_eval_step(model))

    rng = np.random.default_rng(0)
    texture = make_texture(rng)
    B, N = 8, 6

    def evaluate(params, n_batches=4, seed0=10_000):
        r_all, t_all = [], []
        for i in range(n_batches):
            erng = np.random.default_rng(seed0 + i)
            batch = make_batch(erng, texture, B, N, img_size)
            _, metrics = eval_step(params, batch, jax.random.PRNGKey(seed0 + i))
            r_all.append(float(metrics["Racc_15"]))
            t_all.append(float(metrics["Tacc_15"]))
        return float(np.mean(r_all)), float(np.mean(t_all))

    r0, t0 = evaluate(state.params)
    print(f"before training: Racc@15 {r0:.3f}  Tacc@15 {t0:.3f}", flush=True)

    key = jax.random.PRNGKey(1)
    t_start = time.time()
    losses = []
    for step in range(steps):
        batch = make_batch(rng, texture, B, N, img_size)
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
        if step % 100 == 0:
            l = float(jax.device_get(metrics["loss"]))
            losses.append(l)
            print(f"step {step:5d}  loss {l:.4f}  ({time.time()-t_start:.0f}s)", flush=True)

    r1, t1 = evaluate(state.params)
    print(f"after  training: Racc@15 {r1:.3f}  Tacc@15 {t1:.3f}", flush=True)

    ggs_rows = {}
    if args.get("ggs", "1") != "0":
        print("evaluating GGS with exact rendered correspondences...", flush=True)
        ggs_rows = evaluate_ggs(model, state.params, texture, img_size)
        for mode, (r, t) in ggs_rows.items():
            print(f"  {mode:>5}: Racc@15 {r:.3f}  Tacc@15 {t:.3f}", flush=True)

    summary = {
        "steps": steps,
        "loss_first": losses[0] if losses else None,
        "loss_last": float(jax.device_get(metrics["loss"])),
        "Racc15_before": r0, "Tacc15_before": t0,
        "Racc15_after": r1, "Tacc15_after": t1,
        "ggs_eval": {k: {"Racc15": v[0], "Tacc15": v[1]} for k, v in ggs_rows.items()},
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
