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
