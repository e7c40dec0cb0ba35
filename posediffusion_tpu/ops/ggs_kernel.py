"""Fused Pallas kernel for a full GGS optimization phase.

One kernel invocation runs an entire SGD-with-momentum phase (100/200
iterations: Sampson loss + hand-derived gradient + adaptive clip + sticky
early-stop + parameter update) with all state resident in VMEM.  Under
autodiff + XLA the same loop costs ~2.4 ms/iteration in kernel-launch
overhead alone; fused, an iteration is one trip through the VPU/MXU.

The loss/gradient body is shared with the jnp reference
(ops/ggs_grad.loss_and_grad_core) — tested against autodiff — so the kernel
adds only the loop/update mechanics.  Semantics match
diffusion.ggs._ggs_phase: clip max_norm = alpha * ||x * (|g| > 0)|| / lr,
torch-SGD momentum (buf = m*buf + g; x -= lr*buf), stop when valid matches
per frame drop below min_matches.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posediffusion_tpu.ops.ggs_grad import GroupedMatches, loss_and_grad_core


def _phase_kernel(
    x_ref, kp1x_ref, kp1y_ref, kp2x_ref, kp2y_ref, valid_ref, B1_ref, B2_ref,
    out_ref,
    *,
    image_hw: Tuple[int, int],
    update_R: bool,
    update_T: bool,
    update_FL: bool,
    sampson_max: float,
    iters: int,
    lr: float,
    momentum: float,
    alpha: float,
    min_matches: float,
    n_frames: int,
):
    kp1x = kp1x_ref[:]
    kp1y = kp1y_ref[:]
    kp2x = kp2x_ref[:]
    kp2y = kp2y_ref[:]
    valid = valid_ref[:]
    B1 = B1_ref[:]
    B2 = B2_ref[:]

    def body(_, carry):
        x, buf, stopped = carry
        loss, count, g = loss_and_grad_core(
            x, kp1x, kp1y, kp2x, kp2y, valid, B1, B2,
            image_hw, update_R, update_T, update_FL, sampson_max,
        )

        if min_matches > 0:
            stop_now = (count / n_frames) < min_matches
        else:
            stop_now = jnp.asarray(False)
        stopped = jnp.logical_or(stopped, stop_now)

        grad_mask = (jnp.abs(g) > 0).astype(x.dtype)
        max_norm = alpha * jnp.sqrt(jnp.sum((x * grad_mask) ** 2)) / lr
        total_norm = jnp.sqrt(jnp.sum(g * g))
        clip_coef = jnp.minimum(1.0, max_norm / (total_norm + 1e-6))
        g = g * clip_coef

        buf_new = momentum * buf + g
        x_new = x - lr * buf_new
        x = jnp.where(stopped, x, x_new)
        buf = jnp.where(stopped, buf, buf_new)
        return x, buf, stopped

    x0 = x_ref[:]
    x, _, _ = jax.lax.fori_loop(
        0, iters, body, (x0, jnp.zeros_like(x0), jnp.asarray(False))
    )
    out_ref[:] = x


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_hw", "update_R", "update_T", "update_FL", "sampson_max",
        "iters", "lr", "momentum", "alpha", "min_matches", "interpret",
    ),
)
def ggs_phase_fused(
    x: jnp.ndarray,  # (N, 9)
    gm: GroupedMatches,
    image_hw: Tuple[int, int],
    update_R: bool,
    update_T: bool,
    update_FL: bool,
    sampson_max: float,
    iters: int,
    lr: float,
    momentum: float,
    alpha: float,
    min_matches: float,
    interpret: bool = False,
) -> jnp.ndarray:
    n_frames = x.shape[0]
    kernel = functools.partial(
        _phase_kernel,
        image_hw=image_hw,
        update_R=update_R,
        update_T=update_T,
        update_FL=update_FL,
        sampson_max=sampson_max,
        iters=iters,
        lr=lr,
        momentum=momentum,
        alpha=alpha,
        min_matches=min_matches,
        n_frames=n_frames,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[vmem] * 8,
        out_specs=vmem,
        interpret=interpret,
    )(
        x,
        gm.kp1[..., 0], gm.kp1[..., 1], gm.kp2[..., 0], gm.kp2[..., 1],
        gm.valid, gm.B1, gm.B2,
    )
