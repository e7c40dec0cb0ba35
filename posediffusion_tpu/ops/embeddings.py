"""Harmonic and sinusoidal-timestep embeddings (pure functions).

Replaces PyTorch3D ``HarmonicEmbedding`` and the guided-diffusion sinusoidal
embedding (reference: pose_diffusion/util/embedding.py:13-50).  Layout parity
matters because checkpoint weights consume these features positionally.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def harmonic_embedding(
    x: jnp.ndarray,
    n_harmonic_functions: int = 10,
    omega_0: float = 1.0,
    logspace: bool = True,
    append_input: bool = True,
) -> jnp.ndarray:
    """Harmonic (NeRF-style) embedding with PyTorch3D's feature layout.

    For input (..., D) returns (..., D * n * 2 [+ D]) laid out as
    [sin(x_0 f_0), ..., sin(x_0 f_{n-1}), sin(x_1 f_0), ...,
     cos(...same order...), x] — i.e. dim-major over input dims, frequency
    minor, sin block then cos block then the raw input.
    """
    if logspace:
        freqs = omega_0 * (2.0 ** jnp.arange(n_harmonic_functions, dtype=x.dtype))
    else:
        freqs = omega_0 * jnp.linspace(
            1.0, 2.0 ** (n_harmonic_functions - 1), n_harmonic_functions, dtype=x.dtype
        )
    embed = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    parts = [jnp.sin(embed), jnp.cos(embed)]
    if append_input:
        parts.append(x)
    return jnp.concatenate(parts, axis=-1)


def harmonic_embedding_dim(
    input_dim: int, n_harmonic_functions: int = 10, append_input: bool = True
) -> int:
    return input_dim * n_harmonic_functions * 2 + (input_dim if append_input else 0)


def sinusoidal_time_embedding(
    timesteps: jnp.ndarray, dim: int = 256, max_period: float = 10000.0
) -> jnp.ndarray:
    """Sinusoidal timestep embedding: (B,) -> (B, dim), cos block then sin
    block (guided-diffusion layout, reference: util/embedding.py:22-34)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding
