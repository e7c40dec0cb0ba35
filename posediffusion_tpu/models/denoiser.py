"""Pose denoiser: per-frame tokens through a pre-norm transformer.

Replaces the reference Denoiser (pose_diffusion/models/denoiser.py:22-98).
Token layout per frame (702 dims, order matters for checkpoint parity):

    [pose harmonic emb (189) || time emb (128) || image feat z (384) ||
     pivot one-hot (1)]

-> Linear to d_model 512 -> 8-layer pre-norm encoder (4 heads, FF 1024,
dropout 0.1) -> MLP head 512 -> 128(LN, ReLU) -> 9.

Accepts an optional (B, N) frame validity mask for shape-bucketed batches:
padded frames are excluded from attention keys; their outputs are garbage and
must be masked by the caller (loss / decode).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from posediffusion_tpu.models.layers import (
    MLP,
    PoseEmbedding,
    TimeStepEmbedding,
    TransformerEncoder,
    default_kernel_init,
)


class Denoiser(nn.Module):
    target_dim: int = 9
    pivot_cam_onehot: bool = True
    z_dim: int = 384
    mlp_hidden_dim: int = 128
    d_model: int = 512
    nhead: int = 4
    num_encoder_layers: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: "jnp.dtype" = None  # trunk matmul dtype (None -> float32)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, N, target_dim) noisy pose encodings
        t: jnp.ndarray,  # (B,) timesteps
        z: jnp.ndarray,  # (B, N, z_dim) image features
        mask: Optional[jnp.ndarray] = None,  # (B, N) frame validity
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, N, _ = x.shape

        t_emb = TimeStepEmbedding(name="time_embed")(t)
        t_emb = jnp.broadcast_to(t_emb[:, None, :], (B, N, t_emb.shape[-1]))

        x_emb = PoseEmbedding(target_dim=self.target_dim, name="pose_embed")(x)

        if self.pivot_cam_onehot:
            pivot = jnp.zeros((B, N, 1), z.dtype).at[:, 0, :].set(1.0)
            z = jnp.concatenate([z, pivot], axis=-1)

        feed = jnp.concatenate([x_emb, t_emb, z], axis=-1)
        h = nn.Dense(self.d_model, kernel_init=default_kernel_init, name="first")(feed)

        h = TransformerEncoder(
            d_model=self.d_model,
            nhead=self.nhead,
            num_encoder_layers=self.num_encoder_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            dtype=self.dtype or jnp.float32,
            name="trunk",
        )(h, mask=mask, deterministic=deterministic)

        return MLP(hidden_channels=(self.mlp_hidden_dim, self.target_dim), name="last")(h)


def denoiser_apply_fused(
    variables,
    x: jnp.ndarray,  # (1, N, target_dim)
    t: jnp.ndarray,  # (1,)
    z: jnp.ndarray,  # (1, N, z_dim)
    mask: Optional[jnp.ndarray] = None,
    nhead: int = 4,
    num_encoder_layers: int = 8,
    pivot_cam_onehot: bool = True,
) -> jnp.ndarray:
    """Inference-path denoiser forward with the trunk as ONE Pallas kernel.

    Numerically equivalent to ``Denoiser.apply`` in eval mode (pinned in
    tests); used by the sampler where the trunk's ~100 small XLA kernels per
    step would otherwise dominate latency.  Single-sequence (B == 1).
    """
    import jax

    from posediffusion_tpu.ops.denoiser_kernel import fused_trunk, stack_trunk_params
    from posediffusion_tpu.ops.embeddings import (
        harmonic_embedding,
        sinusoidal_time_embedding,
    )

    p = variables["params"]
    B, N, _ = x.shape
    if B != 1:
        raise ValueError("fused denoiser path expects B == 1")

    # --- embeddings (cheap, XLA)
    te = p["time_embed"]
    emb = sinusoidal_time_embedding(t, 256)
    h_t = jax.nn.silu(emb @ te["linear_0"]["kernel"] + te["linear_0"]["bias"])
    t_emb = h_t @ te["linear_2"]["kernel"] + te["linear_2"]["bias"]
    t_emb = jnp.broadcast_to(t_emb[:, None, :], (B, N, t_emb.shape[-1]))

    x_emb = harmonic_embedding(x)
    if pivot_cam_onehot:
        pivot = jnp.zeros((B, N, 1), z.dtype).at[:, 0, :].set(1.0)
        z = jnp.concatenate([z, pivot], axis=-1)
    feed = jnp.concatenate([x_emb, t_emb, z], axis=-1)
    h = feed @ p["first"]["kernel"] + p["first"]["bias"]

    # --- trunk (fused Pallas kernel)
    stacks = stack_trunk_params(p["trunk"], num_encoder_layers)
    if mask is not None:
        bias = jnp.where(mask[0].astype(bool), 0.0, -1e30).astype(jnp.float32)
    else:
        bias = jnp.zeros((N,), jnp.float32)
    h = fused_trunk(h[0], bias, stacks, nhead=nhead)[None]

    # --- head MLP (cheap, XLA)
    last = p["last"]
    h = h @ last["dense_0"]["kernel"] + last["dense_0"]["bias"]
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mean) ** 2, axis=-1, keepdims=True)
    h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
    h = h * last["norm_0"]["scale"] + last["norm_0"]["bias"]
    h = jax.nn.relu(h)
    return h @ last["dense_1"]["kernel"] + last["dense_1"]["bias"]
