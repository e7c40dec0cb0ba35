"""Optimizer and LR schedule.

Replaces the reference's AdamW + WarmupCosineRestarts
(reference: pose_diffusion/train.py:72-77, util/train_util.py:62-92):
per-cycle linear warmup from ``warmup_lr_init`` over ``warmup_ratio`` of the
cycle, then cosine decay to ``eta_min``; cycles restart every
``T_0 * iters_per_epoch`` steps.  Gradient clipping by global norm (1.0) is
chained in front of AdamW, matching ``accelerator.clip_grad_norm_``
(train.py:248-249).  Torch AdamW defaults carried over: betas (0.9, 0.999),
eps 1e-8, weight decay 0.01 applied to every parameter.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import optax


def warmup_cosine_restarts(
    base_lr: float,
    T_0: int,
    iters_per_epoch: int,
    warmup_ratio: float = 0.1,
    warmup_lr_init: float = 1e-7,
    eta_min: float = 0.0,
    T_mult: int = 1,
) -> optax.Schedule:
    cycle_steps = T_0 * iters_per_epoch
    warmup_steps = int(T_0 * warmup_ratio * iters_per_epoch)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if T_mult == 1:
            t_cur = jnp.mod(step, cycle_steps)
        else:
            # geometric restarts (reference train_util.py:80-82): cycle i has
            # length T_0 * T_mult^i; invert the geometric series for t_cur
            n = jnp.floor(
                jnp.log(step / cycle_steps * (T_mult - 1) + 1) / math.log(T_mult)
            )
            start = cycle_steps * (T_mult**n - 1) / (T_mult - 1)
            t_cur = step - start
        warm = warmup_lr_init + (base_lr - warmup_lr_init) * t_cur / max(warmup_steps, 1)
        t_adj = t_cur - warmup_steps
        T_i = max(cycle_steps - warmup_steps, 1)
        cos = eta_min + (base_lr - eta_min) * (1 + jnp.cos(math.pi * t_adj / T_i)) / 2
        return jnp.where(t_cur < warmup_steps, warm, cos)

    return schedule


def make_optimizer(
    lr: float = 1e-4,
    T_0: int = 50,
    iters_per_epoch: int = 16384,
    clip_grad: float = 1.0,
    weight_decay: float = 0.01,
    warmup_ratio: float = 0.1,
    frozen_labels=None,
):
    """AdamW with clip + schedule.

    ``frozen_labels``: optional pytree (matching the params) of
    "train"/"frozen" strings; frozen leaves get no update at all.  This
    matters beyond zero gradients — AdamW's decoupled weight decay would
    otherwise still shrink frozen parameters every step.
    """
    schedule = warmup_cosine_restarts(lr, T_0, iters_per_epoch, warmup_ratio)
    chain = []
    if clip_grad and clip_grad > 0:
        chain.append(optax.clip_by_global_norm(clip_grad))
    chain.append(
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    )
    tx = optax.chain(*chain)
    if frozen_labels is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, param_labels=frozen_labels
        )
    return tx, schedule


def freeze_labels_for(params, frozen_top_keys=("extractor",)):
    """Label pytree marking whole top-level subtrees as frozen."""
    import jax

    return {
        k: jax.tree.map(lambda _: "frozen" if k in frozen_top_keys else "train", v)
        for k, v in params.items()
    }
