"""Flax building blocks shared by the denoiser and the ViT backbone.

The transformer encoder layer reproduces ``torch.nn.TransformerEncoderLayer``
semantics with ``norm_first=True`` (reference: models/denoiser.py:79-98):

    x = x + out_proj(attn(norm1(x)))          # packed QKV, per-head softmax
    x = x + linear2(dropout(relu(linear1(norm2(x)))))

with dropout on attention weights, after the attention projection, inside and
after the feed-forward — all inactive in eval mode.  Parameter layout keeps
torch's packing (one fused QKV projection) so checkpoint conversion is a
transpose, not a re-plumb.

Attention itself runs through the fused Pallas kernel
(posediffusion_tpu.ops.attention) on TPU; training-time attention-weight
dropout uses the XLA path (the kernel is used on the no-grad sampling and
eval paths, which dominate inference latency).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from posediffusion_tpu.ops.attention import mha_attention
from posediffusion_tpu.ops.embeddings import (
    harmonic_embedding,
    harmonic_embedding_dim,
    sinusoidal_time_embedding,
)

# torch trunc_normal_(std=0.02) is effectively an untruncated N(0, 0.02) at
# these bounds; flax's truncated_normal at 2 sigma is the closest initializer
# (reference init: models/pose_diffusion_model.py:67-74).
default_kernel_init = nn.initializers.truncated_normal(stddev=0.02)


class TimeStepEmbedding(nn.Module):
    """Sinusoidal(256) -> Linear -> SiLU -> Linear -> 128
    (reference: util/embedding.py:13-37)."""

    dim: int = 256
    max_period: float = 10000.0

    @property
    def out_dim(self) -> int:
        return self.dim // 2

    @nn.compact
    def __call__(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        emb = sinusoidal_time_embedding(timesteps, self.dim, self.max_period)
        h = nn.Dense(self.dim // 2, kernel_init=default_kernel_init, name="linear_0")(emb)
        h = nn.silu(h)
        return nn.Dense(self.dim // 2, kernel_init=default_kernel_init, name="linear_2")(h)


class PoseEmbedding(nn.Module):
    """Harmonic embedding of pose encodings; parameter-free
    (reference: util/embedding.py:40-50)."""

    target_dim: int = 9
    n_harmonic_functions: int = 10
    append_input: bool = True

    @property
    def out_dim(self) -> int:
        return harmonic_embedding_dim(
            self.target_dim, self.n_harmonic_functions, self.append_input
        )

    def __call__(self, pose_encoding: jnp.ndarray) -> jnp.ndarray:
        return harmonic_embedding(
            pose_encoding, self.n_harmonic_functions, append_input=self.append_input
        )


class MLP(nn.Module):
    """Dense -> LayerNorm -> ReLU stack with a final Dense, matching the
    reference's torchvision-style MLP with norm_layer=LayerNorm
    (reference: models/denoiser.py:101-163)."""

    hidden_channels: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, dim in enumerate(self.hidden_channels[:-1]):
            x = nn.Dense(dim, kernel_init=default_kernel_init, name=f"dense_{i}")(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(
            self.hidden_channels[-1],
            kernel_init=default_kernel_init,
            name=f"dense_{len(self.hidden_channels) - 1}",
        )(x)


class SelfAttention(nn.Module):
    """Packed-QKV multi-head self-attention (torch MultiheadAttention layout)."""

    d_model: int
    nhead: int
    dropout: float = 0.0
    kernel_init: nn.initializers.Initializer = default_kernel_init
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, N, _ = x.shape
        Dh = self.d_model // self.nhead
        qkv = nn.Dense(3 * self.d_model, kernel_init=self.kernel_init,
                       dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(a):
            return a.reshape(B, N, self.nhead, Dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)

        if not deterministic and self.dropout > 0.0:
            # Attention-weight dropout path (training): explicit XLA attention.
            scale = 1.0 / (Dh**0.5)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
            if mask is not None:
                bias = jnp.where(mask.astype(bool), 0.0, -1e30)
                scores = scores + bias[:, None, None, :]
            probs = nn.softmax(scores, axis=-1)
            probs = nn.Dropout(self.dropout, name="attn_drop")(
                probs, deterministic=deterministic
            )
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        else:
            out = mha_attention(q, k, v, mask=mask)

        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.d_model).astype(self.dtype)
        return nn.Dense(self.d_model, kernel_init=self.kernel_init,
                        dtype=self.dtype, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Pre-norm torch-style encoder layer (see module docstring)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32  # matmul compute dtype; LN/residual f32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        # LayerNorm statistics pinned f32; the residual stream runs at the
        # caller's dtype (TransformerEncoder casts once at trunk entry, so
        # bf16 mode halves LN/residual/dropout HBM traffic)
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=jnp.float32,
                         name="norm1")(x)
        h = SelfAttention(self.d_model, self.nhead, self.dropout,
                          dtype=self.dtype, name="self_attn")(
            h, mask=mask, deterministic=deterministic
        ).astype(x.dtype)
        h = nn.Dropout(self.dropout, name="dropout1")(h, deterministic=deterministic)
        x = x + h

        h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=jnp.float32,
                         name="norm2")(x)
        h = nn.Dense(self.dim_feedforward, kernel_init=default_kernel_init,
                     dtype=self.dtype, name="linear1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, name="dropout_ff")(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, kernel_init=default_kernel_init,
                     dtype=self.dtype, name="linear2")(h).astype(x.dtype)
        h = nn.Dropout(self.dropout, name="dropout2")(h, deterministic=deterministic)
        return x + h


class TransformerEncoder(nn.Module):
    """Stack of pre-norm encoder layers (no final norm, torch semantics with
    ``TransformerEncoder(norm=None)``; reference: models/denoiser.py:88-97)."""

    d_model: int = 512
    nhead: int = 4
    num_encoder_layers: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        # one cast into the compute dtype for the whole trunk (bf16 residual
        # stream in bfloat16 mode); outputs return at the caller's dtype
        in_dtype = x.dtype
        x = x.astype(self.dtype)
        for i in range(self.num_encoder_layers):
            x = TransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, mask=mask, deterministic=deterministic)
        return x.astype(in_dtype)
