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

from typing import Any

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
