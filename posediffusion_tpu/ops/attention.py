"""Fused multi-head attention with a Pallas TPU kernel.

The denoiser trunk attends over frame tokens (N <= ~64) and the ViT backbone
over patch tokens (N <= ~260), so a full-score-matrix kernel is the right
shape: one grid cell per (batch, head), scores kept entirely in VMEM, a
single softmax pass, both matmuls on the MXU.  No HBM round-trip for the
(N, N) score matrix, which is what the XLA fallback would materialize.

Replaces the cuDNN attention inside torch.nn.TransformerEncoder /
the DINO ViT blocks (reference: pose_diffusion/models/denoiser.py:88-97,
SURVEY.md N5/N6).

The public entry ``mha_attention`` takes (B, H, N, Dh) tensors and an
optional (B, N) key validity mask, and dispatches to the kernel on TPU or a
jnp reference path elsewhere (CPU tests, autodiff).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float):
    """One (batch, head) cell: out = softmax(q k^T * scale + mask) v.

    Mixed precision: the two matmuls take the inputs AT THEIR STORED DTYPE
    with f32 accumulation — bf16 inputs ride the MXU's full bf16 rate
    (casting to f32 first would quarter it) — while the softmax itself is
    always f32."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale + mask_ref[0, 0][None, :]

    scores_max = jnp.max(scores, axis=-1, keepdims=True)
    unnorm = jnp.exp(scores - scores_max)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / denom

    out = jnp.dot(
        probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_attention(q, k, v, mask_bias, interpret=False):
    B, H, N, Dh = q.shape
    grid = (B, H)
    kernel = functools.partial(_attention_kernel, scale=1.0 / (Dh**0.5))
    # Mask is (B, 1, N): the trailing (1, N) block equals the full array dims,
    # satisfying the Mosaic tiling rule for non-128-aligned N.
    mask_bias = mask_bias[:, None, :]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, N, Dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, N, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q, k, v, mask_bias)


def _reference_attention(q, k, v, mask_bias):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    scores = scores + mask_bias[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v).astype(q.dtype)


# ---------------------------------------------------------------------------
# Full (N, N) additive-bias variant — used by the scale-packed ViT trunk
# (one row holds several independent attention segments under a
# block-diagonal bias).  Bias is shared across batch and heads and gets no
# gradient (it encodes masking/structure, not parameters).
# ---------------------------------------------------------------------------


def _attention_bias_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale):
    # mixed precision as in _attention_kernel: matmuls at the stored dtype
    # (bf16 -> full MXU rate) with f32 accumulation, softmax in f32
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias_ref[...]
    scores_max = jnp.max(scores, axis=-1, keepdims=True)
    unnorm = jnp.exp(scores - scores_max)
    probs = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)
    out_ref[0, 0] = jnp.dot(
        probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_attention_bias(q, k, v, bias, interpret=False):
    B, H, N, Dh = q.shape
    kernel = functools.partial(_attention_bias_kernel, scale=1.0 / (Dh**0.5))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, N, Dh), q.dtype),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, N, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention_dispatch_bias(q, k, v, bias, impl):
    if impl == "xla":
        scale = 1.0 / (q.shape[-1] ** 0.5)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        scores = scores + bias[None, None]
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v).astype(q.dtype)

    N = q.shape[2]
    N_pad = _round_up(max(N, 8), 8)
    if N_pad != N:
        pad = [(0, 0), (0, 0), (0, N_pad - N), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        bias = jnp.pad(
            bias, [(0, N_pad - N), (0, N_pad - N)], constant_values=_NEG_INF
        )
    out = _pallas_attention_bias(
        q, k, v, bias, interpret=(impl == "interpret")
    )
    return out[:, :, :N, :]


def _attention_bias_fwd(q, k, v, bias, impl):
    return _attention_dispatch_bias(q, k, v, bias, impl), (q, k, v, bias)


def _attention_bias_bwd(impl, residuals, g):
    q, k, v, bias = residuals
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale + bias[None, None]
    probs = jax.nn.softmax(scores, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", probs, g)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q) * scale
    return dq, dk, dv, jnp.zeros_like(bias)


_attention_dispatch_bias.defvjp(_attention_bias_fwd, _attention_bias_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention_dispatch(q, k, v, mask_bias, impl):
    if impl == "xla":
        return _reference_attention(q, k, v, mask_bias)

    # Pad N to the f32 sublane multiple so the kernel tiles cleanly; padded
    # keys are masked out, padded queries are sliced off.
    N = q.shape[2]
    N_pad = _round_up(max(N, 8), 8)
    if N_pad != N:
        pad = [(0, 0), (0, 0), (0, N_pad - N), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        mask_bias = jnp.pad(
            mask_bias, [(0, 0), (0, N_pad - N)], constant_values=_NEG_INF
        )
    out = _pallas_attention(q, k, v, mask_bias, interpret=(impl == "interpret"))
    return out[:, :, :N, :]


def _attention_fwd(q, k, v, mask_bias, impl):
    return _attention_dispatch(q, k, v, mask_bias, impl), (q, k, v, mask_bias)


def _attention_bwd(impl, residuals, g):
    """Exact attention backward via XLA (recompute probs).  The Pallas kernel
    serves the forward; for the small N in this model the recompute-based
    backward is matmul-bound and fuses well, so a hand-written backward
    kernel would not move the needle."""
    q, k, v, mask_bias = residuals
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    scores = scores + mask_bias[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)

    dv = jnp.einsum("bhqk,bhqd->bhkd", probs, g)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q) * scale
    return dq, dk, dv, jnp.zeros_like(mask_bias)


_attention_dispatch.defvjp(_attention_fwd, _attention_bwd)


def mha_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    attn_bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-head attention over (B, H, N, Dh) tensors.

    Args:
        mask: optional (B, N) bool/0-1 key validity mask (True = attend).
        impl: "auto" (Pallas on TPU, jnp elsewhere), "pallas", "xla", or
            "interpret" (Pallas interpreter, for CPU tests of the kernel).
        attn_bias: optional (N, N) additive pre-softmax bias shared across
            batch and heads (e.g. block-diagonal for scale-packed rows);
            mutually exclusive with ``mask``; receives no gradient.
    """
    B, H, N, Dh = q.shape
    if impl == "auto":
        import os

        env = os.environ.get("POSEDIFFUSION_ATTN_IMPL")
        if env:
            impl = env
        else:
            platform = jax.devices()[0].platform
            impl = "xla" if platform == "cpu" else "pallas"

    if attn_bias is not None:
        assert mask is None, "mask and attn_bias are mutually exclusive"
        return _attention_dispatch_bias(
            q, k, v, attn_bias.astype(jnp.float32), impl
        )

    if mask is None:
        mask_bias = jnp.zeros((B, N), jnp.float32)
    else:
        mask_bias = jnp.where(mask.astype(bool), 0.0, _NEG_INF).astype(jnp.float32)

    return _attention_dispatch(q, k, v, mask_bias, impl)
