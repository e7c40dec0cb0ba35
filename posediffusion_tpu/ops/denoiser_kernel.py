"""Fused Pallas kernel for the denoiser transformer trunk (inference).

The sampler evaluates the 8-layer trunk sequentially 100 times per
inference; under XLA each evaluation is ~100 small kernels whose dispatch
dominates (~0.1 ms/step for ~0.2 MFLOP of useful work).  This kernel runs
the ENTIRE trunk in one ``pallas_call``:

* grid = (num_layers,): TPU grids execute sequentially, so the activation
  tensor lives in a VMEM scratch that persists across grid steps — layer l
  reads/writes it in place;
* per-layer weights are blocked along the leading (layer) axis and
  DMA-pipelined into VMEM by the usual Pallas double-buffering (one layer's
  weights are ~8.4 MB f32, well within the ~16 MB budget);
* each step computes pre-norm attention + FF exactly like
  models.layers.TransformerEncoderLayer in eval mode (no dropout), with an
  optional key-validity mask.

Used by the Denoiser on the no-grad sampling path; equivalence with the
Flax trunk is pinned in tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _layer_norm(x, g, b, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g + b


def encoder_layer_math(
    x, mask_bias_row,
    g1, b1, wqkv, bqkv, wout, bout, g2, b2, wl1, bl1, wl2, bl2,
    *, nhead: int, d_model: int,
):
    """One pre-norm transformer encoder layer on VMEM-resident values.

    Pure math shared by the trunk kernel and the fused sampler kernel
    (ops/sampler_kernel.py); exactly models.layers.TransformerEncoderLayer
    in eval mode."""
    Dh = d_model // nhead

    # ---- attention block
    h = _layer_norm(x, g1, b1)
    qkv = (
        jnp.dot(h, wqkv, preferred_element_type=jnp.float32) + bqkv
    )  # (N, 3*d_model)
    bias = mask_bias_row[None, :]  # (1, N)

    heads_out = []
    for head in range(nhead):
        q = qkv[:, head * Dh : (head + 1) * Dh]
        k = qkv[:, d_model + head * Dh : d_model + (head + 1) * Dh]
        v = qkv[:, 2 * d_model + head * Dh : 2 * d_model + (head + 1) * Dh]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (1.0 / (Dh**0.5))
        scores = scores + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        heads_out.append(jnp.dot(p, v, preferred_element_type=jnp.float32))
    attn_out = jnp.concatenate(heads_out, axis=1)

    h = jnp.dot(attn_out, wout, preferred_element_type=jnp.float32) + bout
    x = x + h

    # ---- feed-forward block
    h = _layer_norm(x, g2, b2)
    h = jnp.dot(h, wl1, preferred_element_type=jnp.float32) + bl1
    h = jnp.maximum(h, 0.0)
    h = jnp.dot(h, wl2, preferred_element_type=jnp.float32) + bl2
    return x + h


def _trunk_kernel(
    x_ref, mask_ref,
    g1_ref, b1_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
    g2_ref, b2_ref, wl1_ref, bl1_ref, wl2_ref, bl2_ref,
    out_ref, acc_ref,
    *, nhead: int, d_model: int,
):
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        acc_ref[:] = x_ref[:]

    x = encoder_layer_math(
        acc_ref[:], mask_ref[0],
        g1_ref[0, 0], b1_ref[0, 0], wqkv_ref[0], bqkv_ref[0, 0],
        wout_ref[0], bout_ref[0, 0], g2_ref[0, 0], b2_ref[0, 0],
        wl1_ref[0], bl1_ref[0, 0], wl2_ref[0], bl2_ref[0, 0],
        nhead=nhead, d_model=d_model,
    )
    acc_ref[:] = x

    @pl.when(l == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = x


def stack_trunk_params(trunk_params, num_layers: int, weight_dtype=jnp.bfloat16):
    """Flax trunk params -> per-array stacks with a leading layer axis.

    Matrix weights are materialized in ``weight_dtype`` (default bf16): the
    sequential sampler is bound by per-step weight DMA, which this halves,
    and the MXU accumulates bf16 inputs in f32.  LayerNorm vectors/biases
    stay f32."""
    stacks = {
        "g1": [], "b1": [], "wqkv": [], "bqkv": [], "wout": [], "bout": [],
        "g2": [], "b2": [], "wl1": [], "bl1": [], "wl2": [], "bl2": [],
    }
    for i in range(num_layers):
        lp = trunk_params[f"layers_{i}"]
        stacks["g1"].append(lp["norm1"]["scale"])
        stacks["b1"].append(lp["norm1"]["bias"])
        stacks["wqkv"].append(lp["self_attn"]["in_proj"]["kernel"])
        stacks["bqkv"].append(lp["self_attn"]["in_proj"]["bias"])
        stacks["wout"].append(lp["self_attn"]["out_proj"]["kernel"])
        stacks["bout"].append(lp["self_attn"]["out_proj"]["bias"])
        stacks["g2"].append(lp["norm2"]["scale"])
        stacks["b2"].append(lp["norm2"]["bias"])
        stacks["wl1"].append(lp["linear1"]["kernel"])
        stacks["bl1"].append(lp["linear1"]["bias"])
        stacks["wl2"].append(lp["linear2"]["kernel"])
        stacks["bl2"].append(lp["linear2"]["bias"])
    out = {}
    for k, v in stacks.items():
        arr = jnp.stack(v)
        if arr.ndim == 2:  # (L, d) vectors -> (L, 1, d): Mosaic block rule
            arr = arr[:, None, :].astype(jnp.float32)
        else:  # matrix weights: DMA-bound, store in weight_dtype
            arr = arr.astype(weight_dtype)
        out[k] = arr
    return out


@functools.partial(jax.jit, static_argnames=("nhead", "interpret"))
def fused_trunk(
    x: jnp.ndarray,  # (N, d_model) tokens (single sequence)
    mask_bias: jnp.ndarray,  # (N,) 0 / -inf additive key bias
    stacks: dict,
    nhead: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    N, d_model = x.shape
    L = stacks["g1"].shape[0]

    # pad tokens to the f32 sublane multiple
    N_pad = max(((N + 7) // 8) * 8, 8)
    if N_pad != N:
        x = jnp.pad(x, [(0, N_pad - N), (0, 0)])
        mask_bias = jnp.pad(mask_bias, (0, N_pad - N), constant_values=_NEG)

    def layer_block(shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1,) + shape, lambda l: (l,) + (0,) * nd, memory_space=pltpu.VMEM
        )

    dff = stacks["wl1"].shape[-1]
    kernel = functools.partial(_trunk_kernel, nhead=nhead, d_model=d_model)
    vec = lambda d: layer_block((1, d))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N_pad, d_model), jnp.float32),
        grid=(L,),
        in_specs=[
            pl.BlockSpec((N_pad, d_model), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad), lambda l: (0, 0), memory_space=pltpu.VMEM),
            vec(d_model),
            vec(d_model),
            layer_block((d_model, 3 * d_model)),
            vec(3 * d_model),
            layer_block((d_model, d_model)),
            vec(d_model),
            vec(d_model),
            vec(d_model),
            layer_block((d_model, dff)),
            vec(dff),
            layer_block((dff, d_model)),
            vec(d_model),
        ],
        out_specs=pl.BlockSpec(
            (N_pad, d_model), lambda l: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((N_pad, d_model), jnp.float32)],
        interpret=interpret,
    )(
        x.astype(jnp.float32), mask_bias[None].astype(jnp.float32),
        stacks["g1"], stacks["b1"], stacks["wqkv"], stacks["bqkv"],
        stacks["wout"], stacks["bout"], stacks["g2"], stacks["b2"],
        stacks["wl1"], stacks["bl1"], stacks["wl2"], stacks["bl2"],
    )
    return out[:N]
