"""DDPM beta schedules and derived coefficient buffers.

Replaces the reference's registered buffers
(reference: pose_diffusion/models/gaussian_diffuser.py:55-72, 132-187).
Buffers are computed in float64 (as the reference does) and stored float32 in
an immutable pytree, so they ride along into jitted programs as constants.

Default configuration is the reference's: ``custom`` schedule
= linspace(1e-4, 0.1, 100) (cfgs/default.yaml:40, gaussian_diffuser.py:137).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class DiffusionSchedule:
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    p2_loss_weight: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    scale = 1000.0 / timesteps
    return np.linspace(scale * 1e-4, scale * 0.02, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def custom_beta_schedule(
    timesteps: int, beta_1: float = 1e-4, beta_T: float = 0.1
) -> np.ndarray:
    return np.linspace(beta_1, beta_T, timesteps, dtype=np.float64)


def make_schedule(
    timesteps: int = 100,
    beta_1: float = 1e-4,
    beta_T: float = 0.1,
    beta_schedule: str = "custom",
    p2_loss_weight_gamma: float = 0.0,
    p2_loss_weight_k: float = 1.0,
) -> DiffusionSchedule:
    if beta_schedule == "linear":
        betas = linear_beta_schedule(timesteps)
    elif beta_schedule == "cosine":
        betas = cosine_beta_schedule(timesteps)
    elif beta_schedule == "custom":
        betas = custom_beta_schedule(timesteps, beta_1, beta_T)
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule}")

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    f32 = lambda a: jnp.asarray(np.asarray(a, np.float64), jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.clip(posterior_variance, 1e-20, None))
        ),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        p2_loss_weight=f32(
            (p2_loss_weight_k + alphas_cumprod / (1 - alphas_cumprod))
            ** -p2_loss_weight_gamma
        ),
    )


def extract(a: jnp.ndarray, t: jnp.ndarray, broadcast_ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients a[t] (t: (B,)) and reshape to
    (B, 1, ..., 1) with ``broadcast_ndim`` total dims."""
    out = a[t]
    return out.reshape(out.shape[0], *([1] * (broadcast_ndim - 1)))
