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

from posediffusion_tpu.ops.ggs_grad import (
    GroupedMatches,
    loss_and_grad_core,
    pad_grouped_pairs,
)


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


def _phase_kernel_chunked(
    x_ref, kp1x_ref, kp1y_ref, kp2x_ref, kp2y_ref, valid_ref, B1_ref, B2_ref,
    out_ref,
    buf_s, gacc_s, cnt_s, stop_s,
    *,
    image_hw: Tuple[int, int],
    update_R: bool,
    update_T: bool,
    update_FL: bool,
    sampson_max: float,
    lr: float,
    momentum: float,
    alpha: float,
    min_matches: float,
    n_frames: int,
):
    """Grid = (iters, n_chunks).  Each grid step computes the UN-normalized
    Sampson gradient of one (C, Q) pair-chunk (backward is linear in the
    upstream adjoint, so chunk gradients sum exactly); the last chunk of each
    iteration divides by the global contributing-match count and applies the
    clip + momentum update.  x/momentum/accumulators persist in VMEM/SMEM
    scratch across the sequential TPU grid; only the match chunks stream from
    HBM (double-buffered by the Pallas pipeline)."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(jnp.logical_and(i == 0, c == 0))
    def _init():
        out_ref[:] = x_ref[:]
        buf_s[:] = jnp.zeros_like(buf_s)
        stop_s[0] = 0.0

    @pl.when(c == 0)
    def _reset_accumulators():
        gacc_s[:] = jnp.zeros_like(gacc_s)
        cnt_s[0] = 0.0

    _, count_c, g_c = loss_and_grad_core(
        out_ref[:],
        kp1x_ref[:], kp1y_ref[:], kp2x_ref[:], kp2y_ref[:],
        valid_ref[:], B1_ref[:], B2_ref[:],
        image_hw, update_R, update_T, update_FL, sampson_max,
        normalize=False,
    )
    gacc_s[:] = gacc_s[:] + g_c
    cnt_s[0] = cnt_s[0] + count_c

    @pl.when(c == n_chunks - 1)
    def _apply_update():
        x = out_ref[:]
        buf = buf_s[:]
        count = cnt_s[0]
        g = gacc_s[:] / jnp.maximum(count, 1.0)

        if min_matches > 0:
            stop_now = (count / n_frames) < min_matches
            stop_s[0] = jnp.maximum(
                stop_s[0], stop_now.astype(jnp.float32)
            )
        stopped = stop_s[0] > 0.5

        grad_mask = (jnp.abs(g) > 0).astype(x.dtype)
        max_norm = alpha * jnp.sqrt(jnp.sum((x * grad_mask) ** 2)) / lr
        total_norm = jnp.sqrt(jnp.sum(g * g))
        clip_coef = jnp.minimum(1.0, max_norm / (total_norm + 1e-6))
        g = g * clip_coef

        buf_new = momentum * buf + g
        x_new = x - lr * buf_new
        out_ref[:] = jnp.where(stopped, x, x_new)
        buf_s[:] = jnp.where(stopped, buf, buf_new)


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_hw", "update_R", "update_T", "update_FL", "sampson_max",
        "iters", "lr", "momentum", "alpha", "min_matches", "chunk_pairs",
        "interpret",
    ),
)
def ggs_phase_fused_chunked(
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
    chunk_pairs: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """GGS phase for match tables too big to hold resident in VMEM.

    Same semantics as :func:`ggs_phase_fused`, but the (P, Q) match table is
    streamed chunk-by-chunk from HBM every iteration: grid (iters, P/C) with
    (C, Q) blocks.  At 4096-keypoint match densities (P ~ 190 pairs x
    Q ~ 1-4k matches) one iteration streams a few MB — tens of microseconds
    at v5e HBM bandwidth — so the whole ~700-iteration 5-phase conditioning
    stays well under the GGS latency budget where the XLA autodiff fallback
    (~2.4 ms/iter dispatch-bound) would blow it."""
    n_frames = x.shape[0]
    gm = pad_grouped_pairs(gm, chunk_pairs)
    P, Q = gm.valid.shape
    n_chunks = P // chunk_pairs

    kernel = functools.partial(
        _phase_kernel_chunked,
        image_hw=image_hw,
        update_R=update_R,
        update_T=update_T,
        update_FL=update_FL,
        sampson_max=sampson_max,
        lr=lr,
        momentum=momentum,
        alpha=alpha,
        min_matches=min_matches,
        n_frames=n_frames,
    )
    whole = pl.BlockSpec(x.shape, lambda i, c: (0, 0), memory_space=pltpu.VMEM)
    chunk_pq = pl.BlockSpec((chunk_pairs, Q), lambda i, c: (c, 0))
    chunk_pn = pl.BlockSpec((chunk_pairs, n_frames), lambda i, c: (c, 0))
    return pl.pallas_call(
        kernel,
        grid=(iters, n_chunks),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[whole] + [chunk_pq] * 5 + [chunk_pn] * 2,
        out_specs=whole,
        scratch_shapes=[
            pltpu.VMEM(x.shape, jnp.float32),  # momentum buffer
            pltpu.VMEM(x.shape, jnp.float32),  # gradient accumulator
            pltpu.SMEM((1,), jnp.float32),     # match-count accumulator
            pltpu.SMEM((1,), jnp.float32),     # sticky early-stop flag
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x,
        gm.kp1[..., 0], gm.kp1[..., 1], gm.kp2[..., 0], gm.kp2[..., 1],
        gm.valid, gm.B1, gm.B2,
    )
