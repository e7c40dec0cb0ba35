"""Co3D-v2 benchmark evaluation.

Mirrors the reference evaluation script (pose_diffusion/test.py:38-237):
per category x per sequence, sample ``num_frames`` random frames, predict
poses, accumulate pairwise relative rotation/translation errors, report
Racc/Tacc @5/15/30 and AUC@30 per category and overall mean.

    python test.py test.CO3D_DIR=... test.CO3D_ANNOTATION_DIR=... \
        test.resume_ckpt=co3d_model.pth test.category=[apple] GGS.enable=False

TPU notes: sequences are padded to the frame count's bucket so the jitted
sampler compiles once per (bucket) shape; GGS runs with padded match arrays.
"""

import os

import numpy as np


def _test_one_category(model, params, category, cfg, ggs_cfg, num_frames, infer, pack_for_ggs):
    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.data import Co3dDataset, load_and_preprocess_images
    from posediffusion_tpu.geometry import (
        PerspectiveCameras,
        camera_to_rel_deg,
        pose_encoding_to_camera,
    )

    test_dataset = Co3dDataset(
        category=(category,),
        split="test",
        eval_time=True,
        CO3D_DIR=cfg.test.CO3D_DIR,
        CO3D_ANNOTATION_DIR=cfg.test.CO3D_ANNOTATION_DIR,
        min_num_images=cfg.test.min_num_images,
        img_size=cfg.test.img_size,
        normalize_cameras=cfg.test.normalize_cameras,
        first_camera_transform=cfg.test.first_camera_transform,
        compute_optical=cfg.test.compute_optical,
        sort_by_filename=True,  # align images with extracted matches
    )

    errors = {"rError": [], "tError": []}
    for seq_name in test_dataset.sequence_list:
        metadata = test_dataset.rotations[seq_name]
        if len(metadata) < num_frames:
            print(f"Skip sequence {seq_name}")
            continue

        if cfg.test.random_order:
            ids = np.random.choice(len(metadata), num_frames, replace=False)
        else:
            raise ValueError("Please specify your own sampling strategy")

        batch, image_paths = test_dataset.get_data(
            sequence_name=seq_name, ids=ids, return_path=True
        )
        images, image_info = load_and_preprocess_images(
            image_paths=image_paths, image_size=cfg.test.img_size
        )

        matches, cond_start_step = None, 0
        if cfg.GGS.enable:
            from demo import get_matches

            kp1, kp2, i12 = get_matches(cfg, image_info, images.shape)
            if kp1 is not None:
                matches = pack_for_ggs(kp1, kp2, i12, num_frames)
                cond_start_step = ggs_cfg.start_step

        enc = infer(params, jnp.asarray(images)[None], matches, cond_start_step)
        pred_cameras = pose_encoding_to_camera(enc)
        gt_cameras = PerspectiveCameras.create(
            R=batch["R"], T=batch["T"], focal_length=batch["fl"]
        )
        r_deg, t_deg = camera_to_rel_deg(pred_cameras, gt_cameras, batch_size=1)
        print(
            f"{seq_name.ljust(20)}  Rot err {float(jnp.mean(r_deg)):8.2f} deg | "
            f"Trans err {float(jnp.mean(t_deg)):8.2f} deg"
        )
        errors["rError"].extend(np.asarray(r_deg).tolist())
        errors["tError"].extend(np.asarray(t_deg).tolist())
    return errors


def main():
    import jax

    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from posediffusion_tpu.data.co3d import expand_categories
    from posediffusion_tpu.geometry import calculate_auc_np
    from posediffusion_tpu.utils.config import (
        build_ggs_config,
        build_model,
        cli_config,
    )
    from posediffusion_tpu.utils.seeding import seed_all_random_engines

    cfg = cli_config("default_test")
    print("Config:")
    print(cfg.to_yaml())
    seed_all_random_engines(cfg.seed)

    model = build_model(cfg.MODEL)

    ckpt = cfg.test.get("resume_ckpt")
    if ckpt and os.path.isfile(str(ckpt)) and str(ckpt).endswith(".pth"):
        from posediffusion_tpu.training import load_reference_checkpoint

        params = load_reference_checkpoint(str(ckpt))
        print(f"Successfully resumed from {ckpt}")
    elif ckpt and os.path.isdir(str(ckpt)):
        from posediffusion_tpu.training import restore

        params = restore(str(ckpt), model.init(jax.random.PRNGKey(0)))
        print(f"Successfully resumed from {ckpt}")
    else:
        params = model.init(jax.random.PRNGKey(0))
        print("WARNING: no checkpoint — evaluating random weights")

    ggs_cfg = build_ggs_config(cfg.GGS)
    img_hw = (cfg.test.img_size, cfg.test.img_size)

    # Jitted samplers: matches enter the GGS sampler as a traced pytree, so
    # one compilation covers every sequence sharing a match-count pad bucket
    # (compiles are keyed by shape, not by sequence).
    import functools

    from posediffusion_tpu.diffusion.ggs import (
        geometry_guided_sampling,
        geometry_guided_sampling_fused,
    )
    from posediffusion_tpu.ops.ggs_grad import GroupedMatches

    @jax.jit
    def _plain_sampler(params, images, key):
        enc, _ = model.sample(params, images, key)
        return enc

    @functools.partial(jax.jit, static_argnames=("cond_start_step",))
    def _ggs_sampler(params, images, key, matches, cond_start_step):
        # the layout encodes the path: GroupedMatches -> fused Pallas kernel,
        # flat MatchesData -> autodiff (the packer applies the VMEM guard)
        if isinstance(matches, GroupedMatches):
            cond_fn = lambda mean, t: geometry_guided_sampling_fused(
                mean, t, matches, img_hw, ggs_cfg
            )
        else:
            cond_fn = lambda mean, t: geometry_guided_sampling(
                mean, t, matches, img_hw, ggs_cfg
            )
        enc, _ = model.sample(
            params, images, key, cond_fn=cond_fn, cond_start_step=cond_start_step
        )
        return enc

    def _pack_for_ggs(kp1, kp2, i12, num_frames):
        """Pick + pack one match layout, honoring the fused VMEM guard."""
        from posediffusion_tpu.diffusion import pack_matches
        from posediffusion_tpu.diffusion.ggs import fused_fits
        from posediffusion_tpu.ops.ggs_grad import pack_matches_grouped

        if jax.devices()[0].platform != "cpu":
            grouped = pack_matches_grouped(kp1, kp2, i12, num_frames)
            if fused_fits(grouped):
                return grouped
        pad_to = 1 << int(np.ceil(np.log2(max(len(kp1), 1))))
        return pack_matches(kp1, kp2, i12, num_frames, pad_to=pad_to)

    key_holder = {"key": jax.random.PRNGKey(cfg.seed)}

    def infer(params, images, matches, cond_start_step):
        key_holder["key"], sub = jax.random.split(key_holder["key"])
        if matches is None:
            return _plain_sampler(params, images, sub)
        return _ggs_sampler(params, images, sub, matches, cond_start_step)

    categories = expand_categories(
        cfg.test.category if isinstance(cfg.test.category, list) else [cfg.test.category]
    )
    print("-" * 100)
    print(f"Testing on {categories}")
    print("-" * 100)

    metric_names = ["Auc_30", "Racc_5", "Racc_15", "Racc_30", "Tacc_5", "Tacc_15", "Tacc_30"]
    category_dict = {m: {} for m in metric_names}

    for category in categories:
        print(f"----- category {category} start")
        err = _test_one_category(
            model, params, category, cfg, ggs_cfg, cfg.test.num_frames, infer,
            _pack_for_ggs,
        )
        rError = np.array(err["rError"])
        tError = np.array(err["tError"])
        if len(rError) == 0:
            continue
        for th in (5, 15, 30):
            category_dict[f"Racc_{th}"][category] = np.mean(rError < th) * 100
            category_dict[f"Tacc_{th}"][category] = np.mean(tError < th) * 100
        category_dict["Auc_30"][category] = calculate_auc_np(rError, tError, 30) * 100
        print(f"----- category {category} done")

    for m in metric_names:
        vals = list(category_dict[m].values())
        category_dict[m]["mean"] = float(np.mean(vals)) if vals else float("nan")

    for c_name in categories + ["mean"]:
        row = f"{c_name.ljust(20)}: " + " | ".join(
            f"{m} {category_dict[m].get(c_name, float('nan')):.3f}" for m in metric_names
        )
        if c_name == "mean":
            print("-" * 100)
        print(row)

    out_path = cfg.get("results_file", "eval_results.json")
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(category_dict, f, indent=2, default=float)
        print(f"wrote {out_path}")

    return category_dict


if __name__ == "__main__":
    main()
