"""Co3D-v2 training.

Mirrors the reference training entry (pose_diffusion/train.py:33-286):
epoch loop with interleaved eval every ``eval_interval`` epochs, dynamic
batch sampler (random frames-per-seq, ~constant image budget), AdamW with
warmup-cosine-restarts, grad clip 1.0, ``batch_repeat`` diffusion-batch
amortization, periodic checkpoints, epoch stats.

TPU-native structure: one jitted train step per frame-bucket shape, batch
sharded over the mesh's dp axis (GSPMD all-reduces the grads over ICI),
optional FSDP param sharding, orbax full-state checkpoints, background
thread prefetching the host-side data pipeline.

    python train.py train.CO3D_DIR=... train.CO3D_ANNOTATION_DIR=... \
        train.epochs=100 exp_dir=exp/run1
"""

import os
import queue
import threading


def data_producer(dataset, sampler, out_q, n_epoch_batches, stop_event, num_workers=8):
    """Host-side loader: a worker pool decodes/augments items (PIL releases
    the GIL), the producer thread collates padded batches off the device
    path.  Replaces the torch DataLoader worker processes
    (reference: train.py:256-274).

    The bounded queue is fed with a stop-aware put so neither side can hang:
    exceptions are forwarded to the consumer (followed by the None sentinel)
    instead of silently killing the epoch.
    """
    import queue as queue_mod
    from concurrent.futures import ThreadPoolExecutor

    from posediffusion_tpu.data import collate_batch

    def put(item) -> bool:
        while not stop_event.is_set():
            try:
                out_q.put(item, timeout=1.0)
                return True
            except queue_mod.Full:
                continue
        return False

    it = iter(sampler)
    pool = ThreadPoolExecutor(max_workers=max(num_workers, 1))
    try:
        for _ in range(n_epoch_batches):
            if stop_event.is_set():
                return
            batch_spec = next(it)
            n = batch_spec[0][1]
            bucket = sampler.bucket_for(n)
            items = list(pool.map(dataset.__getitem__, batch_spec))
            if not put(collate_batch(items, pad_frames_to=bucket)):
                return
        put(None)
    except Exception as e:  # surface loader failures in the training thread
        put(e)
        put(None)
    finally:
        pool.shutdown(wait=False, cancel_futures=True)


def main():
    import jax

    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from posediffusion_tpu.data import DynamicBatchSampler
    from posediffusion_tpu.parallel import (
        batch_sharding,
        make_mesh,
        maybe_initialize_distributed,
        param_shardings,
        shard_host_batch,
    )
    from posediffusion_tpu.training import (
        StatsLogger,
        TrainState,
        jit_train_step,
        make_optimizer,
        make_train_step,
        save,
    )
    from posediffusion_tpu.utils.config import build_model, cli_config
    from posediffusion_tpu.utils.seeding import seed_all_random_engines

    cfg = cli_config("default_train")

    # Multi-host TPU slices: initialize the distributed runtime when the
    # launcher provides coordination env vars (replaces 'accelerate launch
    # --multi_gpu', reference README.md:70); each process then loads a
    # distinct data shard via its process-unique seed.
    if maybe_initialize_distributed():
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local of {jax.device_count()} devices"
        )

    print("Model Config:")
    print(cfg.to_yaml())
    seed_all_random_engines(cfg.seed, process_unique=True)

    t = cfg.train

    # --- data
    from posediffusion_tpu.data.factory import get_co3d_dataset

    dataset, eval_dataset = get_co3d_dataset(cfg)
    print(f"train sequences: {len(dataset)}  eval sequences: {len(eval_dataset)}")

    buckets = tuple(t.get("frame_buckets") or (4, 8, 16, 24, 32, 51))
    # --- mesh
    n_dev = len(jax.devices())
    dp = t.get("dp") or (n_dev // (t.get("fsdp") or 1))
    mesh = make_mesh(dp * (t.get("fsdp") or 1), fsdp=t.get("fsdp") or 1)
    print(f"mesh: {dict(mesh.shape)}")

    # Per-host loaders: each process samples ITS OWN sequences (process-
    # unique item seed, like accelerate's per-rank dataloaders) but all
    # processes share one shape_seed — multi-controller SPMD needs every
    # host to assemble the same global batch shape each step.  max_images is
    # per host (matching the reference's per-rank semantics); the local
    # batch axis is padded to the local device share of dp.
    n_proc = max(jax.process_count(), 1)
    if dp % n_proc != 0:
        raise ValueError(f"dp={dp} must be divisible by process_count={n_proc}")
    local_dp = dp // n_proc
    sampler = DynamicBatchSampler(
        len(dataset), dataset_len=t.len_train, max_images=t.max_images,
        images_per_seq=tuple(t.images_per_seq), frame_buckets=buckets,
        batch_multiple=local_dp, seed=cfg.seed + 1000 * jax.process_index(),
        shape_seed=cfg.seed + 31,
    )
    # Eval: process-unique seed + disjoint per-host sequence shards, so
    # multi-host runs evaluate different data instead of averaging duplicated
    # stats (reference gets this from accelerate's dataloader sharding,
    # train.py:81).
    import numpy as np

    eval_indices = np.arange(len(eval_dataset))[jax.process_index()::n_proc]
    eval_sampler = DynamicBatchSampler(
        len(eval_dataset), dataset_len=t.len_eval, max_images=t.max_images // 2,
        images_per_seq=tuple(t.images_per_seq), frame_buckets=buckets,
        batch_multiple=local_dp, seed=cfg.seed + 1 + 1000 * jax.process_index(),
        sequence_indices=eval_indices, shape_seed=cfg.seed + 37,
    )

    model = build_model(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(cfg.seed), image_hw=(t.img_size, t.img_size))
    params = jax.device_put(params, param_shardings(mesh, params))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M")

    frozen_labels = None
    if cfg.MODEL.get_path("IMAGE_FEATURE_EXTRACTOR.freeze", False):
        from posediffusion_tpu.training import freeze_labels_for

        frozen_labels = freeze_labels_for(params)
        print("extractor frozen: no updates (incl. weight decay) to backbone")
    optimizer, schedule = make_optimizer(
        lr=t.lr, T_0=t.restart_num, iters_per_epoch=t.len_train,
        clip_grad=t.clip_grad, frozen_labels=frozen_labels,
    )
    state = TrainState.create(params, optimizer)

    if t.resume_ckpt:
        from posediffusion_tpu.training import latest_checkpoint, restore

        path = t.resume_ckpt if os.path.isdir(str(t.resume_ckpt)) else None
        if path is None and str(t.resume_ckpt).endswith(".pth"):
            from posediffusion_tpu.training import load_reference_checkpoint

            state = state.replace(params=load_reference_checkpoint(str(t.resume_ckpt)))
            print(f"Resumed weights from reference ckpt {t.resume_ckpt}")
        else:
            path = path or latest_checkpoint(cfg.exp_dir)
            if path:
                state = restore(path, state)
                print(f"Resumed full state from {path}")

    # Pure-DP meshes use the explicit shard_map step so Pallas kernels (the
    # fused ViT train trunk) run per-shard — GSPMD cannot partition a
    # pallas_call.  FSDP keeps the GSPMD step (sharded params need GSPMD's
    # automatic all-gathers).
    if mesh.shape.get("fsdp", 1) == 1 and dict(mesh.shape).get("dp", 1) > 1:
        from posediffusion_tpu.training import make_sharded_train_step

        train_step = jax.jit(
            make_sharded_train_step(
                model, optimizer, mesh, batch_repeat=t.batch_repeat
            ),
            donate_argnums=(0,),
        )
        print("train step: shard_map DP (fused kernels per shard)")
    else:
        train_step = jit_train_step(
            make_train_step(model, optimizer, batch_repeat=t.batch_repeat)
        )

    from posediffusion_tpu.training import make_eval_step

    sample_eval = jax.jit(make_eval_step(model))

    # Only process 0 writes stats files — every rank writing the same
    # stats.jsonl / stats.png races (reference gates on rank 0,
    # pose_diffusion/train.py:128-134).  All ranks still accumulate stats
    # locally for their own status prints.
    is_main = jax.process_index() == 0
    stats = StatsLogger(
        ["loss", "lr", "sec/it", "Auc_30", "Racc_5", "Racc_15", "Racc_30",
         "Tacc_5", "Tacc_15", "Tacc_30"],
        jsonl_path=os.path.join(cfg.exp_dir, "stats.jsonl") if is_main else None,
    )

    key = jax.random.PRNGKey(cfg.seed)
    start_epoch = int(jax.device_get(state.step)) // max(t.len_train, 1)

    for epoch in range(start_epoch, t.epochs):
        stats.new_epoch()
        seed_all_random_engines(cfg.seed + epoch, process_unique=True)

        # ---- eval (sampling-based) every eval_interval epochs
        if epoch != 0 and epoch % t.eval_interval == 0:
            print(f"---------- eval at epoch {epoch} ----------")
            for bi, batch_spec in enumerate(eval_sampler):
                n = batch_spec[0][1]
                bucket = eval_sampler.bucket_for(n)
                from posediffusion_tpu.data import collate_batch

                items = [eval_dataset[spec] for spec in batch_spec]
                batch = collate_batch(items, pad_frames_to=bucket)
                batch = shard_host_batch(mesh, batch, batch_sharding(mesh))
                key, sub = jax.random.split(key)
                _, metrics = sample_eval(state.params, batch, sub)
                stats.update(jax.device_get(metrics), stat_set="eval")
                if bi % t.print_interval == 0:
                    print(stats.status_string("eval", max_it=t.len_eval))

        # ---- train
        print(f"---------- train epoch {epoch} ----------")
        q = queue.Queue(maxsize=4)
        stop = threading.Event()
        producer = threading.Thread(
            target=data_producer,
            args=(dataset, sampler, q, t.len_train, stop, t.num_workers),
            daemon=True,
        )
        producer.start()
        try:
            # Metrics stay on device between print intervals: no per-step
            # device_get (a ~30 ms host-sync floor through remote tunnels) —
            # the step stream keeps flowing and stats drain in bulk.
            step_i = 0
            step_base = int(jax.device_get(state.step))
            pending = []

            def drain():
                if not pending:
                    return
                host = jax.device_get([m for _, m in pending])
                for (s, _), m in zip(pending, host):
                    m = dict(m)
                    m["lr"] = float(schedule(s))
                    stats.update(m, stat_set="train")
                pending.clear()

            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, Exception):
                    raise RuntimeError("data producer failed") from batch
                batch = shard_host_batch(mesh, batch, batch_sharding(mesh))
                key, sub = jax.random.split(key)
                state, metrics = train_step(state, batch, sub)
                pending.append((step_base + step_i, metrics))
                if step_i % t.print_interval == 0:
                    drain()
                    print(stats.status_string("train", max_it=t.len_train))
                step_i += 1
            drain()
        finally:
            stop.set()

        if is_main:
            stats.plot(os.path.join(cfg.exp_dir, "stats.png"))

        if epoch % t.ckpt_interval == 0 or epoch == t.epochs - 1:
            path = save(cfg.exp_dir, state)
            print(f"saved checkpoint {path}")

    stats.flush()
    if is_main:
        stats.plot(os.path.join(cfg.exp_dir, "stats.png"))
    save(cfg.exp_dir, state)
    return True


if __name__ == "__main__":
    main()
