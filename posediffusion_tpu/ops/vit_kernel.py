"""Fused Pallas kernel for the ViT backbone trunk (inference).

Same architecture-level trick as ops/denoiser_kernel.py, applied to the
DINO ViT: the 12-block trunk runs as ONE ``pallas_call`` with a sequential
grid over blocks, the (B, N, D) token activations persistent in VMEM
scratch, and per-block weights DMA-pipelined in bf16 (f32 MXU accumulation).

The batch dimension (frames x scales) is processed in image chunks inside
the kernel so the large intermediates (qkv: B x N x 3D, MLP hidden:
B x N x 4D) never exceed the VMEM budget; attention uses Mosaic's batched
``dot_general`` over the chunk.

Pre/post work (patch embed conv, position embeddings, final LN, CLS
extraction) stays in XLA — it is a handful of large ops.  Equivalence with
the Flax trunk is pinned in tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layer_norm(x, g, b, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g + b


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf approximation (max abs error
    1.5e-7 — below f32 noise for GELU).  Mosaic has no native erf."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _vit_block_kernel(
    x_ref, mask_ref,
    g1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    g2_ref, b2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    out_ref, acc_ref, dma_sem,
    *, nhead: int, d_model: int, chunk: int, act_bf16: bool,
):
    # x/out stay in HBM (a VMEM block for each would not fit next to the
    # double-buffered weights); activations live in the persistent scratch
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        pltpu.make_async_copy(x_ref, acc_ref, dma_sem).start()
        pltpu.make_async_copy(x_ref, acc_ref, dma_sem).wait()

    B = acc_ref.shape[0]
    Dh = d_model // nhead
    n_chunks = B // chunk
    scale = 1.0 / (Dh**0.5)

    wqkv = wqkv_ref[0]
    bqkv = bqkv_ref[0, 0]
    wproj = wproj_ref[0]
    bproj = bproj_ref[0, 0]
    g1, b1 = g1_ref[0, 0], b1_ref[0, 0]
    g2, b2 = g2_ref[0, 0], b2_ref[0, 0]
    wfc1, bfc1 = wfc1_ref[0], bfc1_ref[0, 0]
    wfc2, bfc2 = wfc2_ref[0], bfc2_ref[0, 0]
    # additive (N, N) attention bias: excludes padded tokens from every
    # softmax and, for scale-packed rows, restricts attention to the
    # block-diagonal per-scale segments
    key_bias = mask_ref[...][None]  # (1, N, N)

    # bf16 matmul operands run the MXU at its native rate (~4x f32);
    # accumulation and the residual stream stay f32
    cast = (lambda a: a.astype(jnp.bfloat16)) if act_bf16 else (lambda a: a)

    def attn_chunk(c, _):
        x = acc_ref[pl.ds(c * chunk, chunk)]
        h = cast(_layer_norm(x, g1, b1))
        qkv = (
            jax.lax.dot_general(
                h, wqkv, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bqkv
        )  # (chunk, N, 3*d_model)
        heads_out = []
        for head in range(nhead):
            q = cast(qkv[:, :, head * Dh : (head + 1) * Dh])
            k = cast(qkv[:, :, d_model + head * Dh : d_model + (head + 1) * Dh])
            v = cast(
                qkv[:, :, 2 * d_model + head * Dh : 2 * d_model + (head + 1) * Dh]
            )
            scores = (
                jax.lax.dot_general(
                    q, k, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + key_bias
            )  # (chunk, N, N)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            heads_out.append(
                jax.lax.dot_general(
                    cast(p), v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
            )
        attn = jnp.concatenate(heads_out, axis=2)
        attn = (
            jax.lax.dot_general(
                cast(attn), wproj, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bproj
        )
        acc_ref[pl.ds(c * chunk, chunk)] = x + attn
        return _

    jax.lax.fori_loop(0, n_chunks, attn_chunk, None)

    def mlp_chunk(c, _):
        x = acc_ref[pl.ds(c * chunk, chunk)]
        h = cast(_layer_norm(x, g2, b2))
        h = (
            jax.lax.dot_general(
                h, wfc1, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bfc1
        )
        # exact GELU (torch nn.GELU): 0.5 x (1 + erf(x / sqrt(2)))
        h = cast(0.5 * h * (1.0 + _erf(h * (2.0**-0.5))))
        h = (
            jax.lax.dot_general(
                h, wfc2, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bfc2
        )
        acc_ref[pl.ds(c * chunk, chunk)] = x + h
        return _

    jax.lax.fori_loop(0, n_chunks, mlp_chunk, None)

    @pl.when(l == pl.num_programs(0) - 1)
    def _():
        pltpu.make_async_copy(acc_ref, out_ref, dma_sem).start()
        pltpu.make_async_copy(acc_ref, out_ref, dma_sem).wait()


def stack_vit_params(vit_params, depth: int, weight_dtype=jnp.bfloat16):
    """Flax VisionTransformer block params -> per-array layer stacks."""
    stacks = {
        "g1": [], "b1": [], "wqkv": [], "bqkv": [], "wproj": [], "bproj": [],
        "g2": [], "b2": [], "wfc1": [], "bfc1": [], "wfc2": [], "bfc2": [],
    }
    for i in range(depth):
        bp = vit_params[f"blocks_{i}"]
        stacks["g1"].append(bp["norm1"]["scale"])
        stacks["b1"].append(bp["norm1"]["bias"])
        stacks["wqkv"].append(bp["attn"]["qkv"]["kernel"])
        stacks["bqkv"].append(bp["attn"]["qkv"]["bias"])
        stacks["wproj"].append(bp["attn"]["proj"]["kernel"])
        stacks["bproj"].append(bp["attn"]["proj"]["bias"])
        stacks["g2"].append(bp["norm2"]["scale"])
        stacks["b2"].append(bp["norm2"]["bias"])
        stacks["wfc1"].append(bp["mlp"]["fc1"]["kernel"])
        stacks["bfc1"].append(bp["mlp"]["fc1"]["bias"])
        stacks["wfc2"].append(bp["mlp"]["fc2"]["kernel"])
        stacks["bfc2"].append(bp["mlp"]["fc2"]["bias"])
    out = {}
    for k, v in stacks.items():
        arr = jnp.stack(v)
        if arr.ndim == 2:
            arr = arr[:, None, :].astype(jnp.float32)
        else:
            arr = arr.astype(weight_dtype)
        out[k] = arr
    return out


@functools.partial(
    jax.jit, static_argnames=("nhead", "chunk", "act_bf16", "interpret")
)
def fused_vit_trunk(
    x: jnp.ndarray,  # (B, N, d_model) tokens
    stacks: dict,
    nhead: int = 6,
    chunk: int = 4,
    act_bf16: bool = False,
    interpret: bool = False,
    attn_bias: Optional[jnp.ndarray] = None,  # (N, N) additive, pre-softmax
) -> jnp.ndarray:
    B, N, d_model = x.shape
    L = stacks["g1"].shape[0]

    # pad tokens to the sublane multiple and batch to the chunk multiple;
    # padded tokens are excluded from attention via the additive bias
    N_pad = max(((N + 7) // 8) * 8, 8)
    B_pad = ((B + chunk - 1) // chunk) * chunk
    if (N_pad, B_pad) != (N, B):
        x = jnp.pad(x, [(0, B_pad - B), (0, N_pad - N), (0, 0)])
    if attn_bias is None:
        mask_bias = jnp.broadcast_to(
            jnp.where(jnp.arange(N_pad) < N, 0.0, -1e30).astype(jnp.float32),
            (N_pad, N_pad),
        )
    else:
        mask_bias = jnp.pad(
            attn_bias.astype(jnp.float32),
            [(0, N_pad - N), (0, N_pad - N)],
            constant_values=-1e30,
        )

    def layer_block(shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1,) + shape, lambda l: (l,) + (0,) * nd, memory_space=pltpu.VMEM
        )

    vec = lambda d: layer_block((1, d))
    dff = stacks["wfc1"].shape[-1]
    kernel = functools.partial(
        _vit_block_kernel, nhead=nhead, d_model=d_model, chunk=chunk,
        act_bf16=act_bf16,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B_pad, N_pad, d_model), jnp.float32),
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (N_pad, N_pad), lambda l: (0, 0), memory_space=pltpu.VMEM
            ),
            vec(d_model), vec(d_model),
            layer_block((d_model, 3 * d_model)), vec(3 * d_model),
            layer_block((d_model, d_model)), vec(d_model),
            vec(d_model), vec(d_model),
            layer_block((d_model, dff)), vec(dff),
            layer_block((dff, d_model)), vec(d_model),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((B_pad, N_pad, d_model), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        # the grid is a sequential scan over layers (scratch carries state);
        # scoped VMEM needs ~21 MB (scratch + double-buffered weights +
        # chunk temporaries) — raise Mosaic's default 16 MB cap (v5e has
        # 128 MB physical VMEM)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32), mask_bias,
        stacks["g1"], stacks["b1"], stacks["wqkv"], stacks["bqkv"],
        stacks["wproj"], stacks["bproj"], stacks["g2"], stacks["b2"],
        stacks["wfc1"], stacks["bfc1"], stacks["wfc2"], stacks["bfc2"],
    )
    return out[:B, :N]
