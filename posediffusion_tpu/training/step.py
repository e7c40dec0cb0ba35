"""Sharded training / evaluation steps.

Replaces the reference's DDP loop body (reference: pose_diffusion/train.py:
151-253): one jitted function computes the diffusion loss, per-pair pose
metrics, gradients, clip, and the optimizer update.  Data parallelism comes
from sharding the batch over the mesh's "dp" axis and letting GSPMD insert
the grad all-reduce over ICI — there is no wrapper module and no explicit
collective in user code.  Parameters (and optimizer state, which follows
their sharding) can be FSDP-sharded via parallel.mesh.param_shardings.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from posediffusion_tpu.geometry.metrics import (
    batched_all_pairs,
    calculate_auc,
    camera_to_rel_deg,
)
from posediffusion_tpu.geometry.pose_codec import pose_encoding_to_camera
from posediffusion_tpu.models.pose_diffusion import PoseDiffusionModel


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, optimizer):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
        )


def pose_metrics(pred_encodings, gt_encodings, mask=None):
    """Racc/Tacc @5/15/30 and AUC@30 from pose encodings (B, N, 9).

    Matches the reference's per-step metric block (train.py:197-215).  With a
    frame mask (B, N) from bucketed padding, only pairs whose BOTH frames are
    valid enter the stats — the pair set shrinks per sequence, matching the
    reference's semantics on the valid subset (util/metric.py:14-48, which
    never sees padded frames because torch batches are ragged-free).
    """
    B, N = pred_encodings.shape[:2]
    pred_cam = pose_encoding_to_camera(pred_encodings)
    gt_cam = pose_encoding_to_camera(gt_encodings)
    r_deg, t_deg = camera_to_rel_deg(pred_cam, gt_cam, batch_size=B)
    if mask is not None:
        i1, i2 = batched_all_pairs(B, N)
        flat = mask.reshape(-1).astype(jnp.float32)
        w = flat[i1] * flat[i2]
        denom = jnp.maximum(jnp.sum(w), 1.0)

        def mean(x):
            return jnp.sum(x * w) / denom

    else:
        w = None
        mean = jnp.mean
    out = {}
    for th in (5, 15, 30):
        out[f"Racc_{th}"] = mean((r_deg < th).astype(jnp.float32))
        out[f"Tacc_{th}"] = mean((t_deg < th).astype(jnp.float32))
    out["Auc_30"] = calculate_auc(r_deg, t_deg, max_threshold=30, weights=w)
    return out


def make_train_step(
    model: PoseDiffusionModel,
    optimizer: optax.GradientTransformation,
    batch_repeat: int = 0,
    compute_metrics: bool = True,
):
    """Build the jittable train step.

    batch = {"images": (B, N, 3, H, W), "pose_encodings": (B, N, 9),
             "mask": optional (B, N)}.
    """

    def train_step(state: TrainState, batch, key):
        images = batch["images"]
        gt_enc = batch["pose_encodings"]
        mask = batch.get("mask")

        def loss_fn(params):
            out = model.loss(
                params, images, gt_enc, key,
                batch_repeat=batch_repeat, mask=mask, train=True,
            )
            if mask is not None:
                rep_mask = (
                    jnp.tile(mask, (batch_repeat, 1)) if batch_repeat > 0 else mask
                )
                denom = jnp.maximum(jnp.sum(rep_mask), 1) * gt_enc.shape[-1]
                loss = jnp.sum(out.loss) / denom
            else:
                loss = jnp.mean(out.loss)
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )

        metrics = {"loss": loss}
        if compute_metrics:
            n = gt_enc.shape[0]
            metrics.update(pose_metrics(out.x_0_pred[:n], gt_enc, mask=mask))
        return new_state, metrics

    return train_step


def make_sharded_train_step(
    model: PoseDiffusionModel,
    optimizer: optax.GradientTransformation,
    mesh,
    batch_repeat: int = 0,
    compute_metrics: bool = True,
    fused_train: Optional[bool] = None,
):
    """Pure-DP train step as an explicit ``shard_map`` SPMD program.

    Same semantics as make_train_step under GSPMD batch sharding (reference
    DDP: pose_diffusion/train.py:81,247 — per-rank forward/backward + NCCL
    grad all-reduce), but written as per-shard code: each device computes
    loss and grads on its batch shard, grads ``psum`` over the mesh's "dp"
    axis (ICI), and the optimizer update runs replicated.  The point of the
    explicit form: Pallas kernels (the fused ViT train trunk) execute
    per-shard inside shard_map, whereas GSPMD cannot partition a
    pallas_call — so this is the path that scales the fused kernels across
    chips.  ``fused_train=None`` enables the kernel on TPU (each shard is a
    single chip from the kernel's perspective).

    Parameters and optimizer state must be replicated (pure DP — use the
    GSPMD step for FSDP).  Loss normalization matches make_train_step
    exactly: global masked denominator via psum.  Metrics are computed
    outside the shard_map on the (sharded) x_0 predictions, identically to
    the GSPMD step.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if mesh.shape.get("fsdp", 1) != 1:
        raise ValueError(
            "make_sharded_train_step is pure-DP; use the GSPMD step for FSDP"
        )
    if fused_train is None:
        fused_train = jax.devices()[0].platform not in ("cpu",)

    def shard_body(state: TrainState, batch, key):
        images = batch["images"]
        gt_enc = batch["pose_encodings"]
        mask = batch.get("mask")
        # distinct t/noise/dropout draws per shard (the GSPMD step draws
        # them for the global batch)
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))

        def loss_fn(params):
            out = model.loss(
                params, images, gt_enc, key,
                batch_repeat=batch_repeat, mask=mask, train=True,
                fused_train=fused_train,
            )
            num = jax.lax.psum(jnp.sum(out.loss), "dp")
            if mask is not None:
                rep_mask = (
                    jnp.tile(mask, (batch_repeat, 1)) if batch_repeat > 0 else mask
                )
                den = jnp.maximum(
                    jax.lax.psum(jnp.sum(rep_mask), "dp"), 1
                ) * gt_enc.shape[-1]
            else:
                den = jax.lax.psum(
                    jnp.asarray(out.loss.size, jnp.float32), "dp"
                )
            return num / den, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # the per-shard grad is already d(global loss)/d(params) restricted
        # to this shard's terms; summing over shards gives the full gradient
        grads = jax.lax.psum(grads, "dp")
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        return new_state, loss, out.x_0_pred[: gt_enc.shape[0]]

    def train_step(state: TrainState, batch, key):
        batch_specs = jax.tree.map(lambda _: P("dp"), batch)
        new_state, loss, x0 = shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P(), batch_specs, P()),
            out_specs=(P(), P(), P("dp")),
            check_rep=False,
        )(state, batch, key)
        metrics = {"loss": loss}
        if compute_metrics:
            metrics.update(
                pose_metrics(
                    x0, batch["pose_encodings"], mask=batch.get("mask")
                )
            )
        return new_state, metrics

    return train_step


def make_eval_step(model: PoseDiffusionModel):
    """Sampling-based eval step (reference eval branch, train.py:216-222)."""

    def eval_step(params, batch, key):
        enc, _ = model.sample(params, batch["images"], key, mask=batch.get("mask"))
        metrics = pose_metrics(enc, batch["pose_encodings"], mask=batch.get("mask"))
        return enc, metrics

    return eval_step


def jit_train_step(train_step):
    """jit with state donation; shardings propagate from the placed inputs
    (put the state with parallel.mesh.param_shardings and batches with
    batch_sharding before calling)."""
    return jax.jit(train_step, donate_argnums=(0,))
