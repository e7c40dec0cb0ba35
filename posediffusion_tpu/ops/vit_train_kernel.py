"""Fused Pallas kernels for pre-norm transformer trunks on the TRAINING path.

The inference trunks (ops/vit_kernel.py, ops/denoiser_kernel.py) run all
layers as one kernel but keep the whole batch resident in VMEM — fine for
20-frame inference, not for the reference's 512-image train batches, and
they have no backward.  On the axon relay every executed XLA fusion costs
~0.2-0.3 ms, so the remat-Flax train path (hundreds of fusions forward +
backward) pays an overhead floor far above its FLOP roofline (measured
0.55 s extractor + 0.13 s denoiser of the 0.75 s train step; reference
scale: pose_diffusion/train.py:151-253).

This module replaces it with TWO kernel launches per trunk per step:

* forward: grid (batch_chunks, layers).  A batch chunk's activations stay
  in VMEM scratch across all layers; per-layer weights stream from HBM.
  Each block's INPUT is saved to HBM (the only residual — everything else
  is rematerialized), so activation memory is L x B x N x D at the residual
  dtype instead of the O(L x B x N x 4D) a no-remat backward would need.
* backward: grid (batch_chunks, layers-reversed).  For each (chunk, layer)
  the block is rematerialized from its saved input and differentiated with
  an in-kernel ``jax.vjp`` over micro-chunks; the cotangent dy rides VMEM
  scratch across layers exactly like the forward activations.  Per-weight
  gradients are accumulated in f32 into per-batch-chunk partial outputs
  (Mosaic output blocks must be visited contiguously, which rules out
  cross-chunk accumulation in this grid order); one small XLA reduction
  sums them.

Two trunk flavors share the implementation (both are pre-norm torch-style
blocks with packed QKV — models/vit.py ViTBlock and models/layers.py
TransformerEncoderLayer):

* ``fused_vit_trunk_train``: GELU, LN eps 1e-6, shared (N, N) attention
  bias (scale packing), no dropout — the DINO backbone.
* ``fused_encoder_trunk_train``: ReLU, LN eps 1e-5, per-row (B, N) key
  bias, torch-style dropout at four sites per layer — the denoiser trunk.
  Dropout masks are generated IN-KERNEL from the TPU PRNG seeded by
  (seed, layer, chunk, micro-chunk), so the backward remat reproduces the
  exact forward masks without storing them.  (No interpret-mode support:
  Pallas has no CPU lowering for prng_seed — CPU tests pin dropout=0.)

Weights are passed at their stored f32 and cast to bf16 *inside* the
differentiated block function when ``act_bf16`` — matmuls ride the MXU's
bf16 rate while weight gradients come out f32 (the cast's VJP upcasts),
so optimizer updates lose no precision.  Numerics are pinned against the
Flax blocks in tests (exact at f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posediffusion_tpu.ops.vit_kernel import _erf, _layer_norm

_WEIGHT_KEYS = (
    "g1", "b1", "wqkv", "bqkv", "wproj", "bproj",
    "g2", "b2", "wfc1", "bfc1", "wfc2", "bfc2",
)
_LS_KEYS = ("ls1", "ls2")  # DINOv2 LayerScale gains (optional)
_NEG_INF = -1e30


def _keys(layer_scale: bool):
    return _WEIGHT_KEYS + (_LS_KEYS if layer_scale else ())


def _gen_drop_masks(seed_ref, l, c, i, mc, N, D, F, nhead, rate,
                    only_attn: bool = False):
    """Inverted-dropout multiplier masks for one micro-chunk, deterministic
    in (seed, layer, batch-chunk, micro-chunk) so forward and backward
    generate bit-identical masks.  Pre-scaled by 1/keep.  ``only_attn``
    draws just the first two masks (attention probs + post-proj) — they
    lead the stream, so the draws match the full sequence bit-for-bit."""
    pltpu.prng_seed(seed_ref[0], l, c, i)
    inv_keep = 1.0 / (1.0 - rate)

    def draw(shape):
        bits = pltpu.prng_random_bits(shape)
        # low 23 bits -> uniform [0, 1) (sign-safe regardless of bit dtype)
        u = (bits & 0x7FFFFF).astype(jnp.float32) * (1.0 / (1 << 23))
        return (u >= rate).astype(jnp.float32) * inv_keep

    attn = draw((nhead, mc, N, N))
    m1 = draw((mc, N, D))
    if only_attn:
        return attn, m1
    mff = draw((mc, N, F))
    m2 = draw((mc, N, D))
    return attn, m1, mff, m2


def _cast_fn(act_bf16: bool):
    return (
        (lambda a: a.astype(jnp.bfloat16))
        if act_bf16
        else (lambda a: a.astype(jnp.float32))
    )


def _linear(h2d, w2d, b1d, cast):
    # Linear layers run on a flattened (mc*N, D) view: their VJP transposes
    # are then plain single-contracting-dim matmuls, which is all Mosaic's
    # tpu.matmul supports (a 3D x^T dy weight-grad contraction over (mc, N)
    # fails to lower).  Attention stays batched over mc (batch dims are
    # fine; only multi-dim contractions are not).
    return (
        jax.lax.dot_general(
            cast(h2d), cast(w2d), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1d
    )


def _attn_residual(
    x, w, key_bias, *, nhead: int, act_bf16: bool, eps: float,
    drop_masks=None,
):
    """x + [LayerScale] drop(proj(MHSA(LN1 x))) on a (mc, N, D) chunk.

    ``w`` = (g1, b1, wqkv, bqkv, wproj, bproj[, ls1]); ``drop_masks`` =
    (attn_probs_mask, post_proj_mask) or None.  ``key_bias`` broadcasts
    against (mc, N, N) scores — (1, N, N) shared, (mc, 1, N) per-row.
    """
    g1, b1, wqkv, bqkv, wproj, bproj = w[:6]
    ls = w[6:]
    mcN = x.shape[0] * x.shape[1]
    D = x.shape[-1]
    Dh = D // nhead
    scale = 1.0 / (Dh**0.5)
    cast = _cast_fn(act_bf16)

    h = _layer_norm(x.astype(jnp.float32), g1, b1, eps=eps)
    qkv = _linear(h.reshape(mcN, D), wqkv, bqkv, cast).reshape(
        *x.shape[:2], 3 * D
    )
    heads_out = []
    for head in range(nhead):
        q = cast(qkv[:, :, head * Dh : (head + 1) * Dh])
        k = cast(qkv[:, :, D + head * Dh : D + (head + 1) * Dh])
        v = cast(qkv[:, :, 2 * D + head * Dh : 2 * D + (head + 1) * Dh])
        scores = (
            jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
            + key_bias
        )
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if drop_masks is not None:
            p = p * drop_masks[0][head]
        heads_out.append(
            jax.lax.dot_general(
                cast(p), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    attn = jnp.concatenate(heads_out, axis=2)
    attn = _linear(attn.reshape(mcN, D), wproj, bproj, cast).reshape(x.shape)
    if ls:
        attn = attn * ls[0]
    if drop_masks is not None:
        attn = attn * drop_masks[1]
    return x + attn.astype(x.dtype)


def _mlp_residual(
    x, w, *, act_bf16: bool, eps: float, activation: str, drop_masks=None,
):
    """x + [LayerScale] drop(fc2(drop(act(fc1(LN2 x))))) on a (mc, N, D)
    chunk.  ``w`` = (g2, b2, wfc1, bfc1, wfc2, bfc2[, ls2]); ``drop_masks``
    = (ff_mask, post_fc2_mask) or None."""
    g2, b2, wfc1, bfc1, wfc2, bfc2 = w[:6]
    ls = w[6:]
    mcN = x.shape[0] * x.shape[1]
    D = x.shape[-1]
    cast = _cast_fn(act_bf16)

    h = _layer_norm(x.astype(jnp.float32), g2, b2, eps=eps)
    h = _linear(h.reshape(mcN, D), wfc1, bfc1, cast)
    if activation == "gelu":
        h = 0.5 * h * (1.0 + _erf(h * (2.0**-0.5)))
    else:  # relu (torch TransformerEncoderLayer default)
        h = jnp.maximum(h, 0.0)
    if drop_masks is not None:
        h = h * drop_masks[0].reshape(mcN, -1)
    h = _linear(h, wfc2, bfc2, cast).reshape(x.shape)
    if ls:
        h = h * ls[0]
    if drop_masks is not None:
        h = h * drop_masks[1]
    return x + h.astype(x.dtype)


def _split_weights(w):
    """Full weight tuple -> (attn weights, mlp weights), each with its
    LayerScale gain appended when present."""
    w_attn = w[0:6] + ((w[12],) if len(w) > 12 else ())
    w_mlp = w[6:12] + ((w[13],) if len(w) > 12 else ())
    return w_attn, w_mlp


def _block_chunk(
    x, w, key_bias, *, nhead: int, act_bf16: bool, eps: float,
    activation: str, drop_masks=None,
):
    """One pre-norm transformer block on a (mc, N, D) token chunk.

    Math identical to models.vit.ViTBlock (gelu, no dropout) or
    models.layers.TransformerEncoderLayer (relu, 4 dropout sites): f32
    LayerNorm statistics, matmul operands cast to bf16 when ``act_bf16``
    with f32 MXU accumulation, residual adds at x.dtype.  Used by the
    forward kernel; the backward kernel differentiates the two residual
    halves separately (see ``_trunk_bwd_kernel``) to bound register
    pressure.
    """
    w_attn, w_mlp = _split_weights(w)
    x = _attn_residual(
        x, w_attn, key_bias, nhead=nhead, act_bf16=act_bf16, eps=eps,
        drop_masks=None if drop_masks is None else drop_masks[:2],
    )
    return _mlp_residual(
        x, w_mlp, act_bf16=act_bf16, eps=eps, activation=activation,
        drop_masks=None if drop_masks is None else drop_masks[2:],
    )


def _read_weights(refs, keys):
    """Layer-blocked weight refs -> value tuple (matrices (Din, Dout),
    vectors (D,))."""
    out = []
    for key, ref in zip(keys, refs):
        if key.startswith("w"):
            out.append(ref[0])
        else:
            out.append(ref[0, 0])
    return tuple(out)


def _trunk_fwd_kernel(
    x_ref, bias_ref, seed_ref, *rest,
    nhead: int, mc: int, act_bf16: bool, eps: float, activation: str,
    dropout_rate: float, bias_rows: bool, layer_scale: bool = False,
):
    keys = _keys(layer_scale)
    n_w = len(keys)
    wrefs, (saved_ref, y_ref, acc_ref) = rest[:n_w], rest[n_w:]
    c = pl.program_id(0)
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        acc_ref[...] = x_ref[...].astype(acc_ref.dtype)

    # the residual: this block's INPUT (everything else remats in backward)
    saved_ref[0] = acc_ref[...]

    weights = _read_weights(wrefs, keys)
    if not bias_rows:
        shared_bias = bias_ref[...][None]
    n_mc = acc_ref.shape[0] // mc
    N = acc_ref.shape[1]
    D = acc_ref.shape[2]
    F = wrefs[8].shape[2]  # wfc1 block is (1, D, F)

    def step(i, carry):
        xs = acc_ref[pl.ds(i * mc, mc)]
        kb = (
            bias_ref[pl.ds(i * mc, mc)][:, None, :] if bias_rows
            else shared_bias
        )
        masks = (
            _gen_drop_masks(seed_ref, l, c, i, mc, N, D, F, nhead, dropout_rate)
            if dropout_rate > 0.0 else None
        )
        acc_ref[pl.ds(i * mc, mc)] = _block_chunk(
            xs, weights, kb, nhead=nhead, act_bf16=act_bf16, eps=eps,
            activation=activation, drop_masks=masks,
        )
        return carry

    jax.lax.fori_loop(0, n_mc, step, None)

    @pl.when(l == pl.num_programs(1) - 1)
    def _():
        y_ref[...] = acc_ref[...]


def _trunk_bwd_kernel(
    saved_ref, dy_ref, bias_ref, seed_ref, *rest,
    nhead: int, mc: int, act_bf16: bool, eps: float, activation: str,
    dropout_rate: float, bias_rows: bool, L: int, layer_scale: bool = False,
):
    keys = _keys(layer_scale)
    n_w = len(keys)
    wrefs = rest[:n_w]
    dx_ref = rest[n_w]
    grefs = rest[n_w + 1 : 2 * n_w + 1]
    dyacc_ref = rest[2 * n_w + 1]
    c = pl.program_id(0)
    l_rev = pl.program_id(1)
    l = L - 1 - l_rev  # actual layer index (for the dropout PRNG seed)

    @pl.when(l_rev == 0)
    def _():
        dyacc_ref[...] = dy_ref[...].astype(dyacc_ref.dtype)

    weights = _read_weights(wrefs, keys)
    if not bias_rows:
        shared_bias = bias_ref[...][None]
    n_mc = dyacc_ref.shape[0] // mc
    N = dyacc_ref.shape[1]
    D = dyacc_ref.shape[2]
    F = wrefs[8].shape[2]  # wfc1 block is (1, D, F)

    w_attn, w_mlp = _split_weights(weights)
    n_keys = len(weights)

    def _kb(i):
        return (
            bias_ref[pl.ds(i * mc, mc)][:, None, :] if bias_rows
            else shared_bias
        )

    def _accum(gref, g, i):
        # accumulate this batch chunk's weight grads in f32; out blocks are
        # per-(chunk, layer), initialized at the first micro-chunk (the
        # unselected uninitialized read at i == 0 is discarded by the select)
        gf = g.astype(jnp.float32).reshape(gref.shape[2:])
        gref[0, 0] = jnp.where(i == 0, gf, gref[0, 0] + gf)

    # The block backward runs as TWO passes over the micro-chunks — MLP
    # half first (storing the intermediate cotangent dx1 in the dyacc
    # scratch), then the attention half, which REMATERIALIZES its forward
    # from the saved block input.  A single jax.vjp over the whole block
    # keeps every intermediate (qkv, all heads' probs, the FF hidden, and
    # their transposes) live at once — 152 MB of Mosaic register spills at
    # mc=4, which cannot compile on a 128 MB-VMEM chip.  Two loop bodies
    # bound the peak at max(attn-VJP, MLP-VJP) liveness instead of their
    # sum, and CSE cannot merge the attention recompute across loop
    # boundaries (an in-body recompute gets CSE'd back into one program —
    # measured: identical spill totals).  Cost: one extra attention
    # forward per block (~+12% trunk FLOPs), well inside the MXU headroom.
    def mlp_step(i, carry):
        xs = saved_ref[0, pl.ds(i * mc, mc)]
        dys = dyacc_ref[pl.ds(i * mc, mc)]
        masks = (
            _gen_drop_masks(seed_ref, l, c, i, mc, N, D, F, nhead, dropout_rate)
            if dropout_rate > 0.0 else None
        )

        x1 = _attn_residual(
            xs, w_attn, _kb(i), nhead=nhead, act_bf16=act_bf16, eps=eps,
            drop_masks=None if masks is None else masks[:2],
        )

        def f_mlp(xx, *ws):
            return _mlp_residual(
                xx, ws, act_bf16=act_bf16, eps=eps, activation=activation,
                drop_masks=None if masks is None else masks[2:],
            )

        _, vjp_mlp = jax.vjp(f_mlp, x1, *w_mlp)
        g_mlp = vjp_mlp(dys)
        dyacc_ref[pl.ds(i * mc, mc)] = g_mlp[0]
        for k, g in zip(range(6, 12), g_mlp[1:7]):
            _accum(grefs[k], g, i)
        if n_keys > 12:
            _accum(grefs[13], g_mlp[7], i)
        return carry

    def attn_step(i, carry):
        xs = saved_ref[0, pl.ds(i * mc, mc)]
        dx1 = dyacc_ref[pl.ds(i * mc, mc)]
        # regenerate the forward's dropout masks bit-identically: the
        # attention masks are the FIRST draws in the (seed, l, c, i)
        # stream, so drawing only them matches the forward's sequence
        masks = (
            _gen_drop_masks(
                seed_ref, l, c, i, mc, N, D, F, nhead, dropout_rate,
                only_attn=True,
            )
            if dropout_rate > 0.0 else None
        )

        def f_attn(xx, *ws):
            return _attn_residual(
                xx, ws, _kb(i), nhead=nhead, act_bf16=act_bf16, eps=eps,
                drop_masks=masks,
            )

        _, vjp_attn = jax.vjp(f_attn, xs, *w_attn)
        g_attn = vjp_attn(dx1)
        dyacc_ref[pl.ds(i * mc, mc)] = g_attn[0]
        for k, g in zip(range(0, 6), g_attn[1:7]):
            _accum(grefs[k], g, i)
        if n_keys > 12:
            _accum(grefs[12], g_attn[7], i)
        return carry

    jax.lax.fori_loop(0, n_mc, mlp_step, None)
    jax.lax.fori_loop(0, n_mc, attn_step, None)

    @pl.when(l_rev == pl.num_programs(1) - 1)
    def _():
        dx_ref[...] = dyacc_ref[...]


def _layer_block(shape):
    nd = len(shape)
    return pl.BlockSpec(
        (1,) + shape, lambda c, l: (l,) + (0,) * nd, memory_space=pltpu.VMEM
    )


def _layer_block_rev(shape, L):
    nd = len(shape)
    return pl.BlockSpec(
        (1,) + shape,
        lambda c, l: (L - 1 - l,) + (0,) * nd,
        memory_space=pltpu.VMEM,
    )


def _weight_specs(stacks, block_fn, keys):
    specs = []
    for key in keys:
        specs.append(block_fn(tuple(stacks[key].shape[1:])))
    return specs


def _pad_sizes(B, N, bchunk):
    N_pad = max(((N + 7) // 8) * 8, 8)
    B_pad = ((B + bchunk - 1) // bchunk) * bchunk
    return B_pad, N_pad


def _pad_bias(mask_bias, N, N_pad, B=None, B_pad=None):
    """Pad the additive bias: shared (N, N) or per-row (B, N)."""
    if mask_bias is None:
        return jnp.broadcast_to(
            jnp.where(jnp.arange(N_pad) < N, 0.0, _NEG_INF).astype(jnp.float32),
            (N_pad, N_pad),
        )
    if mask_bias.ndim == 2 and B is not None:  # per-row (B, N)
        return jnp.pad(
            mask_bias.astype(jnp.float32),
            [(0, B_pad - B), (0, N_pad - N)],
            constant_values=_NEG_INF,
        )
    return jnp.pad(
        mask_bias.astype(jnp.float32),
        [(0, N_pad - N), (0, N_pad - N)],
        constant_values=_NEG_INF,
    )


_STATIC_NAMES = (
    "nhead", "bchunk", "mc", "act_bf16", "interpret", "eps", "activation",
    "dropout_rate", "bias_rows", "layer_scale",
)


@functools.partial(jax.jit, static_argnames=_STATIC_NAMES)
def _fwd_call(
    x, stacks, bias, seed, nhead, bchunk, mc, act_bf16, interpret,
    eps, activation, dropout_rate, bias_rows, layer_scale=False,
):
    keys = _keys(layer_scale)
    if bchunk % mc != 0:
        raise ValueError(f"bchunk={bchunk} must be a multiple of mc={mc}")
    B, N, D = x.shape
    L = stacks["g1"].shape[0]
    B_pad, N_pad = _pad_sizes(B, N, bchunk)
    rdtype = x.dtype
    if (B_pad, N_pad) != (B, N):
        x = jnp.pad(x, [(0, B_pad - B), (0, N_pad - N), (0, 0)])
    bias = _pad_bias(bias, N, N_pad, B=B if bias_rows else None, B_pad=B_pad)

    kernel = functools.partial(
        _trunk_fwd_kernel, nhead=nhead, mc=mc, act_bf16=act_bf16, eps=eps,
        activation=activation, dropout_rate=dropout_rate, bias_rows=bias_rows,
        layer_scale=layer_scale,
    )
    bias_spec = (
        pl.BlockSpec((bchunk, N_pad), lambda c, l: (c, 0), memory_space=pltpu.VMEM)
        if bias_rows
        else pl.BlockSpec((N_pad, N_pad), lambda c, l: (0, 0), memory_space=pltpu.VMEM)
    )
    saved, y = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, B_pad, N_pad, D), rdtype),
            jax.ShapeDtypeStruct((B_pad, N_pad, D), rdtype),
        ),
        grid=(B_pad // bchunk, L),
        in_specs=[
            pl.BlockSpec(
                (bchunk, N_pad, D), lambda c, l: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            bias_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        + _weight_specs(stacks, _layer_block, keys),
        out_specs=(
            pl.BlockSpec(
                (1, bchunk, N_pad, D), lambda c, l: (l, c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bchunk, N_pad, D), lambda c, l: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[pltpu.VMEM((bchunk, N_pad, D), rdtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, bias, seed, *[stacks[k] for k in keys])
    return saved, y


@functools.partial(jax.jit, static_argnames=_STATIC_NAMES)
def _bwd_call(
    saved, dy_pad, bias, seed, stacks, nhead, bchunk, mc, act_bf16,
    interpret, eps, activation, dropout_rate, bias_rows, layer_scale=False,
):
    keys = _keys(layer_scale)
    L, B_pad, N_pad, D = saved.shape
    rdtype = saved.dtype
    n_bc = B_pad // bchunk

    kernel = functools.partial(
        _trunk_bwd_kernel, nhead=nhead, mc=mc, act_bf16=act_bf16, eps=eps,
        activation=activation, dropout_rate=dropout_rate, bias_rows=bias_rows,
        L=L, layer_scale=layer_scale,
    )
    rev = functools.partial(_layer_block_rev, L=L)
    bias_spec = (
        pl.BlockSpec((bchunk, N_pad), lambda c, l: (c, 0), memory_space=pltpu.VMEM)
        if bias_rows
        else pl.BlockSpec((N_pad, N_pad), lambda c, l: (0, 0), memory_space=pltpu.VMEM)
    )

    def partial_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1, 1) + shape,
            lambda c, l: (c, L - 1 - l) + (0,) * nd,
            memory_space=pltpu.VMEM,
        )

    grad_shapes = tuple(
        jax.ShapeDtypeStruct((n_bc, L) + tuple(stacks[k].shape[1:]), jnp.float32)
        for k in keys
    )
    dx, *gpartials = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, N_pad, D), rdtype),
        ) + grad_shapes,
        grid=(n_bc, L),
        in_specs=[
            pl.BlockSpec(
                (1, bchunk, N_pad, D), lambda c, l: (L - 1 - l, c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bchunk, N_pad, D), lambda c, l: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            bias_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        + _weight_specs(stacks, rev, keys),
        out_specs=(
            pl.BlockSpec(
                (bchunk, N_pad, D), lambda c, l: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        + tuple(
            partial_spec(tuple(stacks[k].shape[1:])) for k in keys
        ),
        scratch_shapes=[pltpu.VMEM((bchunk, N_pad, D), rdtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(saved, dy_pad, bias, seed, *[stacks[k] for k in keys])
    grads = {
        k: jnp.sum(g, axis=0).astype(stacks[k].dtype)
        for k, g in zip(keys, gpartials)
    }
    return dx, grads


_ZERO_SEED = np.zeros((1,), np.int32)


# --------------------------------------------------------------------- ViT
def stack_vit_params_train(vit_params, depth: int, layer_scale: bool = False):
    """f32 weight stacks for the train kernels, including the DINOv2
    LayerScale gains when ``layer_scale``."""
    from posediffusion_tpu.ops.vit_kernel import stack_vit_params

    stacks = stack_vit_params(vit_params, depth, weight_dtype=jnp.float32)
    if layer_scale:
        for key, pname in (("ls1", "ls1_gamma"), ("ls2", "ls2_gamma")):
            arr = jnp.stack(
                [vit_params[f"blocks_{i}"][pname] for i in range(depth)]
            ).astype(jnp.float32)
            stacks[key] = arr[:, None, :]
    return stacks


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def fused_vit_trunk_train(
    x: jnp.ndarray,  # (B, N, D) tokens at the residual dtype
    stacks: dict,  # stack_vit_params(..., weight_dtype=float32)
    mask_bias: jnp.ndarray,  # (N, N) additive pre-softmax, no gradient
    nhead: int = 6,
    bchunk: int = 16,
    mc: int = 4,
    act_bf16: bool = False,
    interpret: bool = False,
    layer_scale: bool = False,
) -> jnp.ndarray:
    """Differentiable fused ViT trunk: ONE Pallas launch forward, ONE back.

    Weight stacks must be f32 (``stack_vit_params(weight_dtype=float32)``,
    or ``stack_vit_params_train(..., layer_scale=True)`` for DINOv2);
    bf16 matmul casts happen inside the kernel so weight grads stay f32.
    ``mask_bias`` is structural (padding / scale packing) and receives a
    zero gradient.
    """
    B, N, _ = x.shape
    _, y = _fwd_call(
        x, stacks, mask_bias, jnp.asarray(_ZERO_SEED), nhead, bchunk, mc,
        act_bf16, interpret, 1e-6, "gelu", 0.0, False, layer_scale,
    )
    return y[:B, :N]


def _vit_fwd(x, stacks, mask_bias, nhead, bchunk, mc, act_bf16, interpret,
             layer_scale):
    B, N, _ = x.shape
    saved, y = _fwd_call(
        x, stacks, mask_bias, jnp.asarray(_ZERO_SEED), nhead, bchunk, mc,
        act_bf16, interpret, 1e-6, "gelu", 0.0, False, layer_scale,
    )
    return y[:B, :N], (saved, stacks, mask_bias)


def _vit_bwd(nhead, bchunk, mc, act_bf16, interpret, layer_scale, res, dy):
    saved, stacks, mask_bias = res
    # saved.dtype == the primal x's dtype (the forward casts to x.dtype)
    B, N = dy.shape[:2]
    L, B_pad, N_pad, D = saved.shape
    dy_pad = jnp.pad(
        dy.astype(saved.dtype), [(0, B_pad - B), (0, N_pad - N), (0, 0)]
    )
    bias = _pad_bias(mask_bias, N, N_pad)
    dx, grads = _bwd_call(
        saved, dy_pad, bias, jnp.asarray(_ZERO_SEED), stacks, nhead, bchunk,
        mc, act_bf16, interpret, 1e-6, "gelu", 0.0, False, layer_scale,
    )
    return dx[:B, :N], grads, jnp.zeros_like(mask_bias)


fused_vit_trunk_train.defvjp(_vit_fwd, _vit_bwd)


# ----------------------------------------------------- denoiser (encoder)
def stack_encoder_trunk_params(trunk_params, num_layers: int):
    """Flax TransformerEncoder params (models/layers.py layers_i) -> f32
    per-array layer stacks under the shared _WEIGHT_KEYS naming."""
    name_map = {
        "g1": ("norm1", "scale"), "b1": ("norm1", "bias"),
        "wqkv": ("self_attn", "in_proj", "kernel"),
        "bqkv": ("self_attn", "in_proj", "bias"),
        "wproj": ("self_attn", "out_proj", "kernel"),
        "bproj": ("self_attn", "out_proj", "bias"),
        "g2": ("norm2", "scale"), "b2": ("norm2", "bias"),
        "wfc1": ("linear1", "kernel"), "bfc1": ("linear1", "bias"),
        "wfc2": ("linear2", "kernel"), "bfc2": ("linear2", "bias"),
    }
    out = {}
    for key, path in name_map.items():
        leaves = []
        for i in range(num_layers):
            node = trunk_params[f"layers_{i}"]
            for p in path:
                node = node[p]
            leaves.append(node)
        arr = jnp.stack(leaves).astype(jnp.float32)
        if arr.ndim == 2:  # (L, d) vectors -> (L, 1, d): Mosaic block rule
            arr = arr[:, None, :]
        out[key] = arr
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_encoder_trunk_train(
    x: jnp.ndarray,  # (B, N, D) tokens at the residual dtype
    stacks: dict,  # stack_encoder_trunk_params (f32)
    row_bias: jnp.ndarray,  # (B, N) additive key bias (0 / -1e30), no grad
    seed: jnp.ndarray,  # (1,) int32 dropout seed (ignored if rate == 0)
    nhead: int = 4,
    bchunk: int = 256,
    mc: int = 32,
    act_bf16: bool = False,
    dropout_rate: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused denoiser trunk (torch TransformerEncoder
    semantics: pre-norm, ReLU FF, LN eps 1e-5, dropout at the four torch
    sites when ``dropout_rate`` > 0).  Dropout requires the TPU PRNG —
    not available in interpret mode."""
    B, N, _ = x.shape
    _, y = _fwd_call(
        x, stacks, row_bias, seed, nhead, bchunk, mc, act_bf16, interpret,
        1e-5, "relu", dropout_rate, True,
    )
    return y[:B, :N]


def _enc_fwd(x, stacks, row_bias, seed, nhead, bchunk, mc, act_bf16,
             dropout_rate, interpret):
    B, N, _ = x.shape
    saved, y = _fwd_call(
        x, stacks, row_bias, seed, nhead, bchunk, mc, act_bf16, interpret,
        1e-5, "relu", dropout_rate, True,
    )
    return y[:B, :N], (saved, stacks, row_bias, seed)


def _enc_bwd(nhead, bchunk, mc, act_bf16, dropout_rate, interpret, res, dy):
    saved, stacks, row_bias, seed = res
    B, N = dy.shape[:2]
    L, B_pad, N_pad, D = saved.shape
    dy_pad = jnp.pad(
        dy.astype(saved.dtype), [(0, B_pad - B), (0, N_pad - N), (0, 0)]
    )
    bias = _pad_bias(row_bias, N, N_pad, B=B, B_pad=B_pad)
    dx, grads = _bwd_call(
        saved, dy_pad, bias, seed, stacks, nhead, bchunk, mc, act_bf16,
        interpret, 1e-5, "relu", dropout_rate, True,
    )
    ct_seed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return dx[:B, :N], grads, jnp.zeros_like(row_bias), ct_seed


fused_encoder_trunk_train.defvjp(_enc_fwd, _enc_bwd)
