"""PoseDiffusion composition root.

Replaces the reference ``PoseDiffusionModel``
(pose_diffusion/models/pose_diffusion_model.py:35-142).  Unlike the torch
version — a stateful nn.Module whose sampler loops in Python — this is a
thin orchestrator over pure functions: the Flax module definitions
(extractor + denoiser) and the diffusion schedule are static, parameters are
an explicit pytree, and both the training loss and the full 100-step sampler
are single jittable programs.

Train path (reference :109-130):
    z = extractor(images)                      # (B, N, 384)
    enc = camera_to_pose_encoding(gt_cameras)  # done by the caller/dataset
    [batch_repeat: tile enc and z 'repeat' times to amortize the ViT]
    t ~ U[0, T); loss = L1(eps_hat, eps) unreduced

Sample path (reference :131-140):
    z = extractor(images); p_sample_loop (lax.scan) -> pose encodings
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from posediffusion_tpu.diffusion.gaussian import DiffusionLoss, p_losses, p_sample_loop
from posediffusion_tpu.diffusion.schedule import DiffusionSchedule, make_schedule
from posediffusion_tpu.models.denoiser import Denoiser
from posediffusion_tpu.models.feature_extractor import MultiScaleImageFeatureExtractor


@dataclasses.dataclass(frozen=True)
class PoseDiffusionConfig:
    pose_encoding_type: str = "absT_quaR_logFL"
    target_dim: int = 9
    modelname: str = "dino_vits16"
    freeze_extractor: bool = False  # reference IMAGE_FEATURE_EXTRACTOR.freeze
    z_dim: int = 384
    # denoiser / transformer (reference: cfgs/default.yaml:26-34)
    d_model: int = 512
    nhead: int = 4
    num_encoder_layers: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    mlp_hidden_dim: int = 128
    pivot_cam_onehot: bool = True
    # backbone
    vit_depth: int = 12
    vit_heads: int = 6
    patch_size: int = 16
    scale_factors: Tuple[float, ...] = (1.0, 1.0 / 2, 1.0 / 3)
    # diffusion (reference: cfgs/default.yaml:37-40)
    compute_dtype: str = "float32"  # "bfloat16" runs ViT blocks on the MXU fast path
    # "bfloat16" streams bf16 denoiser weights + runs the trunk matmuls in
    # bf16 during sampling (params stay f32 in the train state).  Measured
    # neutral for latency on v5e (the sampler is not weight-bound at these
    # sizes); provided for memory-constrained or other-generation setups.
    denoiser_dtype: str = "float32"
    # Run the sampler's denoiser trunk as one fused Pallas kernel per step
    # (B == 1, eval mode).  Falls back to the Flax path on CPU / batched use.
    fused_sampler: bool = True
    # TRAIN path: run the ViT trunk as one Pallas launch forward + one
    # backward (ops/vit_train_kernel.py) instead of the remat-Flax blocks.
    # Engages for plain dino ViT backbones on a SINGLE TPU device; on
    # multi-device meshes the Flax trunk is used instead because GSPMD
    # cannot partition a pallas_call across the dp axis — unless the step
    # itself is a shard_map (training.make_sharded_train_step), which
    # passes fused_train=True so the kernel runs per shard.
    fused_train_extractor: bool = True
    # Same for the denoiser trunk in the training loss (the 8-layer encoder
    # over the batch_repeat-inflated diffusion batch): one Pallas launch
    # forward + one backward, with in-kernel PRNG dropout at the torch
    # sites.  Falls back to the Flax trunk off-TPU / multi-device GSPMD.
    fused_train_denoiser: bool = True
    # Train-kernel tile knobs (see experiments/tune_train_kernels.py): the
    # batch chunk resident in VMEM across layers and the micro-chunk per
    # hand-derived block backward.  Larger mc = bigger MXU tiles but more
    # backward working-set VMEM (scales with token_count^2 for attention
    # probs — lower mc for 336px inputs).
    vit_train_bchunk: int = 16
    # 0 = auto: 8 at bf16 residuals (v5e sweep: 0.2186 s/trunk-step vs
    # 0.2223 at mc=4, with the save-x1 backward), 4 at f32 (mc=8 overflows
    # the scoped-VMEM cap there — larger f32 micro-chunk temporaries)
    vit_train_mc: int = 0
    denoiser_train_bchunk: int = 256
    denoiser_train_mc: int = 32
    # bf16 activations inside the fused ViT trunk on the inference path (the
    # MXU's native dtype; ~2x the f32 matmul rate).  Weights already stream
    # as bf16.  Set False for f32-exact feature extraction; feature deviation
    # is pinned by tests/test_vit_kernel.py tolerances.
    extractor_act_bf16: bool = True
    timesteps: int = 100
    beta_1: float = 1e-4
    beta_T: float = 0.1
    beta_schedule: str = "custom"
    objective: str = "pred_noise"
    loss_type: str = "l1"



def _effective_vit_mc(c: "PoseDiffusionConfig") -> int:
    """Resolve vit_train_mc=0 (auto) by residual dtype — see the config
    field comment for the measured rationale."""
    if c.vit_train_mc:
        return c.vit_train_mc
    return 8 if c.compute_dtype == "bfloat16" else 4


def _probe_vit_mc(c: "PoseDiffusionConfig", H: int, W: int, B: int):
    """Compile-probe the fused ViT train trunk AT THE REAL GRID, cascading
    the micro-chunk downward before giving up: the auto mc=8 is tuned for
    224px packed tokens; at larger inputs its attention temporaries
    overflow the scoped-VMEM cap where a smaller mc still fits.  The probe
    grid matters: Mosaic's scoped allocation grows with grid size near the
    cap (round 5: a 2x2-grid probe approved 336px/mc=2 that failed by
    3.7M at the production 32x12 grid), so the real depth and
    ceil(B/bchunk) are passed through.  Returns the first probe-passing
    mc, or None when no candidate compiles (callers fall back to the Flax
    trunk)."""
    from posediffusion_tpu.ops.train_probe import (
        packed_token_count,
        vit_train_kernel_ok,
    )

    is_v2 = "dinov2" in c.modelname
    ps = 14 if is_v2 else c.patch_size
    n_tok = packed_token_count(H, W, c.scale_factors, ps)
    n_bc = max(2, -(-B // c.vit_train_bchunk))
    vit_mc = _effective_vit_mc(c)
    for mc_try in [vit_mc] + [m for m in (4, 2) if m < vit_mc]:
        if vit_train_kernel_ok(
            n_tok, c.z_dim, 4 * c.z_dim, c.vit_heads,
            c.vit_train_bchunk, mc_try,
            c.compute_dtype == "bfloat16", is_v2, c.compute_dtype,
            depth=c.vit_depth, batch_chunks=n_bc,
        ):
            return mc_try
    return None


def _batched_step_ok(c: "PoseDiffusionConfig", N: int) -> bool:
    """Probe gate for the batched (B > 1) eval sampler's per-step fused
    encoder trunk (256/32 are denoiser_train_apply's default bchunk/mc,
    which that call path uses)."""
    from posediffusion_tpu.ops.train_probe import encoder_train_kernel_ok

    return encoder_train_kernel_ok(
        int(N), c.d_model, c.dim_feedforward, c.nhead, 256, 32,
        c.denoiser_dtype == "bfloat16", 0.0, c.denoiser_dtype,
    )


class PoseDiffusionModel:
    """Module definitions + schedule; parameters are explicit pytrees."""

    def __init__(self, config: PoseDiffusionConfig = PoseDiffusionConfig()):
        self.config = config
        import jax.numpy as _jnp

        self.extractor = MultiScaleImageFeatureExtractor(
            scale_factors=config.scale_factors,
            modelname=config.modelname,
            patch_size=config.patch_size,
            embed_dim=config.z_dim if "resnet" not in config.modelname else 384,
            depth=config.vit_depth,
            num_heads=config.vit_heads,
            dtype=_jnp.dtype(config.compute_dtype),
        )
        z_dim = self.extractor.output_dim
        self.denoiser = Denoiser(
            target_dim=config.target_dim,
            pivot_cam_onehot=config.pivot_cam_onehot,
            z_dim=z_dim,
            mlp_hidden_dim=config.mlp_hidden_dim,
            d_model=config.d_model,
            nhead=config.nhead,
            num_encoder_layers=config.num_encoder_layers,
            dim_feedforward=config.dim_feedforward,
            dropout=config.dropout,
            dtype=_jnp.dtype(config.denoiser_dtype),
        )
        self.schedule: DiffusionSchedule = make_schedule(
            timesteps=config.timesteps,
            beta_1=config.beta_1,
            beta_T=config.beta_T,
            beta_schedule=config.beta_schedule,
        )

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array, image_hw: Tuple[int, int] = (224, 224)):
        """Initialize parameters with tiny dummy shapes."""
        k1, k2 = jax.random.split(key)
        c = self.config
        ext_params = self.extractor.init(k1, jnp.zeros((1, 3, *image_hw)))
        den_params = self.denoiser.init(
            k2,
            jnp.zeros((1, 2, c.target_dim)),
            jnp.zeros((1,), jnp.int32),
            # the denoiser consumes the extractor's actual feature width
            # (2048 for resnet backbones, embed_dim for ViTs)
            jnp.zeros((1, 2, self.denoiser.z_dim)),
        )
        return {"extractor": ext_params, "denoiser": den_params}

    # -------------------------------------------------------------- features
    def extract_features(
        self, params, images: jnp.ndarray, fused: bool = False,
        fused_train: bool = False, interpret: bool = False,
        vit_mc: Optional[int] = None,
    ) -> jnp.ndarray:
        """(B, N, 3, H, W) -> (B, N, z_dim) via the shared ViT.

        ``fused`` routes the trunk through the single-kernel Pallas path
        (inference; plain dino ViT backbones only); ``fused_train`` through
        the differentiable train-path kernel pair (fwd + custom-VJP bwd).
        ``vit_mc`` overrides the auto micro-chunk (the loss path passes the
        probe-validated value so routing and execution cannot diverge).
        """
        B, N = images.shape[:2]
        flat = images.reshape(B * N, *images.shape[2:])
        if fused_train:
            from posediffusion_tpu.models.feature_extractor import (
                extract_features_train,
            )

            c = self.config
            is_v2 = "dinov2" in c.modelname
            z = extract_features_train(
                params["extractor"], flat,
                scale_factors=c.scale_factors,
                patch_size=14 if is_v2 else c.patch_size,
                embed_dim=c.z_dim, depth=c.vit_depth, num_heads=c.vit_heads,
                pos_grid=37 if is_v2 else 14,
                act_bf16=(c.compute_dtype == "bfloat16"),
                residual_dtype=jnp.dtype(c.compute_dtype),
                bchunk=c.vit_train_bchunk, mc=vit_mc or _effective_vit_mc(c),
                interpret=interpret,
                layer_scale=is_v2,
            )
        elif fused:
            from posediffusion_tpu.models.feature_extractor import (
                extract_features_fused,
            )

            c = self.config
            z = extract_features_fused(
                params["extractor"], flat,
                scale_factors=c.scale_factors, patch_size=c.patch_size,
                embed_dim=c.z_dim, depth=c.vit_depth, num_heads=c.vit_heads,
                act_bf16=c.extractor_act_bf16,
            )
        else:
            z = self.extractor.apply(params["extractor"], flat)
        return z.reshape(B, N, -1)

    # ------------------------------------------------------------------ loss
    def loss(
        self,
        params,
        images: jnp.ndarray,  # (B, N, 3, H, W)
        pose_encodings: jnp.ndarray,  # (B, N, target_dim) GT encodings
        key: jax.Array,
        batch_repeat: int = 0,
        mask: Optional[jnp.ndarray] = None,  # (B, N) frame validity
        train: bool = True,
        fused_train: Optional[bool] = None,
    ) -> DiffusionLoss:
        """Diffusion training loss (unreduced over (B', N, 9)).

        ``fused_train``: None auto-gates the Pallas train-trunk (TPU, plain
        dino ViT, single device — GSPMD can't shard a pallas_call).  An
        explicit True/False overrides the device-count part of the gate:
        the shard_map DP step passes True because inside shard_map each
        shard runs the kernel on its own chip.
        """
        if fused_train is None:
            fused_train = jax.device_count() == 1
        # Test hook: run the fused train branches with interpret-mode Pallas
        # on CPU, so CI exercises the full loss wiring (custom VJPs, stack
        # plumbing, seeds) that otherwise only executes on TPU.
        import os

        interpret = (
            os.environ.get("POSEDIFFUSION_FUSED_TRAIN_INTERPRET") == "1"
        )
        fused_ok = interpret or (
            fused_train and jax.devices()[0].platform not in ("cpu",)
        )
        c = self.config
        fused_extract = (
            fused_ok
            and c.fused_train_extractor
            and c.modelname.startswith(("dino_vit", "dinov2"))
        )
        fused_denoiser = fused_ok and c.fused_train_denoiser
        # Compile-probe each kernel once per shape/knob configuration and
        # fall back to the Flax trunks on failure (warning, not crash):
        # a Mosaic VMEM overflow must never take down train.py.  See
        # ops/train_probe.py; POSEDIFFUSION_FUSED_TRAIN_PROBE=on skips.
        vit_mc = _effective_vit_mc(c)
        if fused_extract and not interpret:
            vit_mc = _probe_vit_mc(
                c, int(images.shape[-2]), int(images.shape[-1]),
                int(images.shape[0] * images.shape[1]),
            )
            fused_extract = vit_mc is not None
        if fused_denoiser and not interpret:
            from posediffusion_tpu.ops.train_probe import (
                encoder_train_kernel_ok,
            )

            fused_denoiser = encoder_train_kernel_ok(
                int(pose_encodings.shape[1]), c.d_model, c.dim_feedforward,
                c.nhead, c.denoiser_train_bchunk, c.denoiser_train_mc,
                c.denoiser_dtype == "bfloat16",
                c.dropout if train else 0.0, c.denoiser_dtype,
            )
        z = self.extract_features(
            params, images, fused_train=fused_extract, interpret=interpret,
            vit_mc=vit_mc,
        )
        if self.config.freeze_extractor:
            # reference freeze option (image_feature_extractor.py:50-52):
            # no gradients flow into the backbone
            z = jax.lax.stop_gradient(z)

        if batch_repeat > 0:
            pose_encodings = jnp.tile(pose_encodings, (batch_repeat, 1, 1))
            z = jnp.tile(z, (batch_repeat, 1, 1))
            if mask is not None:
                mask = jnp.tile(mask, (batch_repeat, 1))

        B = pose_encodings.shape[0]
        key_t, key_noise, key_drop = jax.random.split(key, 3)
        t = jax.random.randint(key_t, (B,), 0, self.schedule.num_timesteps)
        noise = jax.random.normal(key_noise, pose_encodings.shape)

        if fused_denoiser:
            from posediffusion_tpu.models.denoiser import denoiser_train_apply

            c = self.config
            drop_seed = jax.random.randint(
                key_drop, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )

            def model_fn(x, tt):
                return denoiser_train_apply(
                    params["denoiser"], x, tt, z, mask=mask, seed=drop_seed,
                    nhead=c.nhead,
                    num_encoder_layers=c.num_encoder_layers,
                    pivot_cam_onehot=c.pivot_cam_onehot,
                    dropout_rate=c.dropout if train else 0.0,
                    act_bf16=(c.denoiser_dtype == "bfloat16"),
                    residual_dtype=jnp.dtype(c.denoiser_dtype),
                    bchunk=c.denoiser_train_bchunk,
                    mc=c.denoiser_train_mc,
                    interpret=interpret,
                )

        else:

            def model_fn(x, tt):
                variables = params["denoiser"]
                if train:
                    return self.denoiser.apply(
                        variables, x, tt, z, mask=mask, deterministic=False,
                        rngs={"dropout": key_drop},
                    )
                return self.denoiser.apply(variables, x, tt, z, mask=mask)

        out = p_losses(
            self.schedule,
            model_fn,
            pose_encodings,
            t,
            noise,
            objective=self.config.objective,
            loss_type=self.config.loss_type,
        )
        if mask is not None:
            out = out._replace(loss=out.loss * mask[..., None])
        return out

    # ---------------------------------------------------------------- sample
    def sample(
        self,
        params,
        images: jnp.ndarray,  # (B, N, 3, H, W)
        key: jax.Array,
        cond_fn=None,
        cond_start_step: int = 0,
        mask: Optional[jnp.ndarray] = None,
        return_trajectory: bool = False,
        sampling_timesteps: Optional[int] = None,
        ddim_eta: float = 0.0,
    ):
        """Run the reverse process; returns (pose_encodings (B, N, 9), traj).

        ``sampling_timesteps`` < num_timesteps switches to DDIM with that
        many steps (deterministic for eta=0).
        """
        import os

        c = self.config
        on_tpu = jax.devices()[0].platform not in ("cpu",)
        fused_extract = (
            c.fused_sampler
            and c.modelname.startswith("dino_vit")
            and c.compute_dtype == "float32"
            and on_tpu
        )
        # Compile-probe each inference kernel once per shape/knob
        # configuration and fall back to the Flax/scan path on failure
        # (warning, not crash): a Mosaic VMEM overflow must never take down
        # demo.py / test.py / bench.py.  Mirrors the train path's
        # ops/train_probe.py guard; see ops/sample_probe.py.
        if fused_extract:
            from posediffusion_tpu.ops.sample_probe import vit_infer_kernel_ok
            from posediffusion_tpu.ops.train_probe import packed_token_count

            n_tok = packed_token_count(
                int(images.shape[-2]), int(images.shape[-1]),
                c.scale_factors, c.patch_size,
            )
            fused_extract = vit_infer_kernel_ok(
                int(images.shape[0] * images.shape[1]), n_tok, c.z_dim,
                4 * c.z_dim, c.vit_heads, 4, False,
            )
        z = self.extract_features(params, images, fused=fused_extract)
        B, N = z.shape[:2]

        denoiser_params = params["denoiser"]
        if self.config.denoiser_dtype == "bfloat16":
            # cast the streamed weights themselves: the sequential sampler is
            # bound by per-step HBM weight traffic, which this halves
            denoiser_params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a,
                denoiser_params,
            )

        use_fused = (
            self.config.fused_sampler
            and B == 1
            and self.config.denoiser_dtype == "float32"
            and on_tpu
        )
        if use_fused:
            from posediffusion_tpu.ops.sample_probe import (
                denoiser_step_kernel_ok,
            )

            use_fused = denoiser_step_kernel_ok(
                int(N), c.d_model, c.dim_feedforward, c.mlp_hidden_dim,
                c.nhead, c.num_encoder_layers, c.target_dim, 10, c.z_dim,
                c.pivot_cam_onehot,
            )
        if use_fused:
            from posediffusion_tpu.models.denoiser import denoiser_apply_fused

            def model_fn(x, tt):
                return denoiser_apply_fused(
                    denoiser_params, x, tt, z, mask=mask,
                    nhead=self.config.nhead,
                    num_encoder_layers=self.config.num_encoder_layers,
                    pivot_cam_onehot=self.config.pivot_cam_onehot,
                )
        elif self.config.fused_sampler and on_tpu and _batched_step_ok(c, N):
            # Batched sampling (B > 1, e.g. the in-training eval loop):
            # the whole-loop kernel is single-sequence, but the per-step
            # denoiser trunk can still run as ONE Pallas launch per step
            # via the train-path encoder kernel (dropout 0, forward only)
            # instead of the ~50 XLA fusions the Flax trunk dispatches
            # inside the 100-step scan.  (256/32 are denoiser_train_apply's
            # default bchunk/mc, which this call path uses.)
            from posediffusion_tpu.models.denoiser import denoiser_train_apply

            def model_fn(x, tt):
                return denoiser_train_apply(
                    denoiser_params, x, tt, z, mask=mask,
                    nhead=c.nhead,
                    num_encoder_layers=c.num_encoder_layers,
                    pivot_cam_onehot=c.pivot_cam_onehot,
                    dropout_rate=0.0,
                    act_bf16=(c.denoiser_dtype == "bfloat16"),
                    residual_dtype=jnp.dtype(c.denoiser_dtype),
                )
        else:
            def model_fn(x, tt):
                return self.denoiser.apply(denoiser_params, x, tt, z, mask=mask)

        shape = (B, N, self.config.target_dim)

        # Whole-loop fused sampler: ALL unconditioned reverse steps in one
        # Pallas kernel (ops/sampler_kernel.py) — removes the ~15 XLA
        # dispatches/step that dominate at this model size.  PRNG stream is
        # split-for-split identical to p_sample_loop, so a conditioned (GGS)
        # tail continues seamlessly.
        use_fused_loop = (
            self.config.fused_sampler
            and B == 1
            and not return_trajectory
            and (
                sampling_timesteps is None
                or sampling_timesteps >= self.schedule.num_timesteps
            )
            and self.config.mlp_hidden_dim == 128
            and on_tpu
        )
        if use_fused_loop:
            from posediffusion_tpu.ops.sample_probe import sampler_loop_ok

            use_fused_loop = sampler_loop_ok(
                int(N), c.d_model, c.dim_feedforward, c.mlp_hidden_dim,
                c.nhead, c.num_encoder_layers, c.target_dim, 10, c.z_dim,
                c.pivot_cam_onehot, self.schedule.num_timesteps,
                os.environ.get("POSEDIFFUSION_SAMPLER_WEIGHTS", "auto"),
            )
        if use_fused_loop:
            from posediffusion_tpu.ops.sampler_kernel import fused_sample_loop

            T = self.schedule.num_timesteps
            n_cond = (
                min(max(cond_start_step, 0), T) if cond_fn is not None else 0
            )
            x, key = fused_sample_loop(
                params["denoiser"],
                self.schedule,
                z,
                key,
                mask=mask,
                n_cond=n_cond,
                nhead=self.config.nhead,
                num_encoder_layers=self.config.num_encoder_layers,
                pivot_cam_onehot=self.config.pivot_cam_onehot,
                target_dim=self.config.target_dim,
            )
            if n_cond == 0:
                return x, None
            return p_sample_loop(
                self.schedule,
                model_fn,
                shape,
                key,
                cond_fn=cond_fn,
                cond_start_step=cond_start_step,
                objective=self.config.objective,
                x_init=x,
                from_t=n_cond,
            )

        if (
            sampling_timesteps is not None
            and sampling_timesteps < self.schedule.num_timesteps
        ):
            from posediffusion_tpu.diffusion.gaussian import ddim_sample_loop

            return ddim_sample_loop(
                self.schedule,
                model_fn,
                shape,
                key,
                sampling_timesteps=sampling_timesteps,
                eta=ddim_eta,
                cond_fn=cond_fn,
                cond_start_step=cond_start_step,
                objective=self.config.objective,
            )
        return p_sample_loop(
            self.schedule,
            model_fn,
            shape,
            key,
            cond_fn=cond_fn,
            cond_start_step=cond_start_step,
            objective=self.config.objective,
            return_trajectory=return_trajectory,
        )
