"""Single-folder pose inference demo.

Mirrors the reference demo (pose_diffusion/demo.py:36-153) with the same CLI
semantics:

    python demo.py image_folder=samples/apple GGS.enable=False ckpt=model.pth

Pipeline: load + preprocess images -> (optional) 2D match extraction ->
jitted 100-step diffusion sampling with optional geometry-guided sampling ->
7-DoF alignment against gt_cameras.npz (if present) -> absolute rotation
error -> predictions .npz + camera-frustum plot.

Checkpoints: a torch .pth from the reference release (converted on load), an
orbax checkpoint directory, or ``ckpt=random`` for smoke runs.
"""

import os
import time

import numpy as np


def get_matches(cfg, image_info, images_shape):
    """Produce (kp1, kp2, i12) for GGS.

    Priority: precomputed npz (``GGS.matches_file``) -> on-the-fly
    SuperPoint/SuperGlue matching (``GGS.matcher_ckpt_dir`` with converted
    weights) -> None (GGS disabled with a warning).
    """
    matches_file = cfg.GGS.get("matches_file")
    if matches_file and os.path.isfile(matches_file):
        data = np.load(matches_file)
        return data["kp1"], data["kp2"], data["i12"]

    try:
        from posediffusion_tpu.matching import extract_match

        return extract_match(
            image_paths=image_info["paths"],
            image_info=image_info,
            weights_dir=cfg.GGS.get("matcher_ckpt_dir"),
            max_keypoints=cfg.GGS.get("max_keypoints", 4096),
            match_threshold=cfg.GGS.get("match_threshold", 0.2),
            ransac_threshold_px=cfg.GGS.get("ransac_threshold_px", 4.0),
            min_pair_matches=cfg.GGS.get("min_pair_matches", 8),
        )
    except Exception as e:  # pragma: no cover - depends on local weights
        print(f"[GGS] match extraction unavailable ({e}); sampling without GGS")
        return None, None, None


def main():
    import jax

    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from posediffusion_tpu.data import load_and_preprocess_images
    from posediffusion_tpu.geometry import (
        PerspectiveCameras,
        align_cameras,
        compute_are,
        pose_encoding_to_camera,
    )
    from posediffusion_tpu.utils.config import build_ggs_config, build_model, cli_config
    from posediffusion_tpu.utils.seeding import seed_all_random_engines
    from posediffusion_tpu.utils.visualize import plot_cameras

    cfg = cli_config("default")
    print("Model Config:")
    print(cfg.to_yaml())

    model = build_model(cfg.MODEL)

    folder_path = cfg.image_folder
    images, image_info = load_and_preprocess_images(folder_path, cfg.image_size)
    n_frames = images.shape[0]

    # --- parameters
    ckpt = cfg.get("ckpt", "random")
    if ckpt and os.path.isfile(str(ckpt)) and str(ckpt).endswith(".pth"):
        from posediffusion_tpu.training import load_reference_checkpoint

        params = load_reference_checkpoint(str(ckpt))
        print(f"Loaded reference checkpoint from: {ckpt}")
    elif ckpt and os.path.isdir(str(ckpt)):
        from posediffusion_tpu.training import restore

        params = restore(str(ckpt), model.init(jax.random.PRNGKey(0)))
        print(f"Loaded orbax checkpoint from: {ckpt}")
    else:
        params = model.init(jax.random.PRNGKey(0))
        print("WARNING: no checkpoint found — using random weights")

    seed_all_random_engines(cfg.seed)

    # --- GGS conditioning
    cond_fn = None
    cond_start_step = 0
    if cfg.GGS.enable:
        kp1, kp2, i12 = get_matches(cfg, image_info, images.shape)
        if kp1 is not None:
            from posediffusion_tpu.diffusion.ggs import build_cond_fn

            ggs_cfg = build_ggs_config(cfg.GGS)
            hw = (cfg.image_size, cfg.image_size)
            # packs exactly one layout (fused Pallas when it fits VMEM)
            cond_fn = build_cond_fn(kp1, kp2, i12, n_frames, hw, ggs_cfg)
            cond_start_step = ggs_cfg.start_step
            print("=====> Sampling with GGS <=====")
        else:
            print("=====> Sampling without GGS <=====")
    else:
        print("=====> Sampling without GGS <=====")

    images_b = jnp.asarray(images)[None]  # 1 x N x 3 x H x W

    @jax.jit
    def infer(params, images, key):
        enc, _ = model.sample(
            params, images, key, cond_fn=cond_fn, cond_start_step=cond_start_step
        )
        return enc

    key = jax.random.PRNGKey(cfg.seed)
    start = time.time()
    enc = jax.device_get(infer(params, images_b, key))
    print("Time taken: {:.4f} seconds (incl. compile)".format(time.time() - start))
    start = time.time()
    enc = jax.device_get(infer(params, images_b, jax.random.PRNGKey(cfg.seed)))
    print("Time taken: {:.4f} seconds (steady state)".format(time.time() - start))

    pred_cameras = pose_encoding_to_camera(jnp.asarray(enc))
    out = {
        "R": np.asarray(pred_cameras.R),
        "T": np.asarray(pred_cameras.T),
        "focal_length": np.asarray(pred_cameras.focal_length),
    }

    camera_sets = {"ours_pred": pred_cameras}

    gt_path = os.path.join(folder_path, "gt_cameras.npz")
    if os.path.exists(gt_path):
        gt = np.load(gt_path)
        gt_cameras = PerspectiveCameras.create(
            R=gt["gtR"], T=gt["gtT"], focal_length=gt["gtFL"]
        )
        aligned = align_cameras(pred_cameras, gt_cameras, estimate_scale=True)
        are = compute_are(np.asarray(aligned.R), np.asarray(gt_cameras.R)).mean()
        print(f"For {folder_path}: the absolute rotation error is {are:.6f} degrees.")
        camera_sets["ours_pred_aligned"] = aligned
        camera_sets["gt_cameras"] = gt_cameras
        out["ARE_deg"] = are
    else:
        print("No GT provided. No evaluation conducted.")

    out_dir = cfg.get("out_dir", "outputs")
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, "predictions.npz"), **out)
    fig_path = plot_cameras(camera_sets, os.path.join(out_dir, "cameras.png"))
    from posediffusion_tpu.utils.visualize import export_scene_html

    html_path = export_scene_html(
        camera_sets, os.path.join(out_dir, "cameras.html")
    )
    print(f"Saved predictions + {fig_path} + {html_path} (interactive)")
    return out


if __name__ == "__main__":
    main()
