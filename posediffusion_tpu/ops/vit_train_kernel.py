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
  Each block saves its INPUT x to HBM and, at bf16 residuals, also the
  post-attention intermediate x1 (everything else is rematerialized), so
  activation memory is (1 or 2) x L x B x N x D at the residual dtype
  instead of the O(L x B x N x 4D) a no-remat backward would need.
  Saving x1 spares the backward's MLP half a full attention re-forward
  per block (~48 ms/step at ViT reference scale + ~6 ms on the denoiser)
  for ~3 ms of extra HBM traffic; f32 residuals opt out
  (``save_x1=False``) — their twice-as-large saved1 VMEM windows ride
  over the scoped 118 MB cap at the full production grids
  (see _save_x1_for).
* backward: grid (batch_chunks, layers-reversed).  For each (chunk, layer)
  the two residual halves are differentiated with HAND-DERIVED VJPs over
  micro-chunks (closed-form LayerNorm/softmax backward, per-head streaming
  attention backward): the MLP half from the saved x1, the attention half
  rematerialized from the saved x; the cotangent dy rides VMEM scratch
  across layers exactly like the forward activations.
  Per-weight gradients are accumulated in f32 into per-batch-chunk partial
  outputs (Mosaic output blocks must be visited contiguously, which rules
  out cross-chunk accumulation in this grid order); one small XLA
  reduction sums them.

  Why hand-derived and not in-kernel ``jax.vjp``: AD keeps every forward
  residual of the whole block alive at once — all six heads' softmax
  probabilities, the packed qkv, the FF hidden and their transposes — and
  on a 128 MB-VMEM v5e the resulting liveness cannot compile (measured:
  "Ran out of memory in memory space vmem. Used 137.68M of 128.00M" at
  even sub-production shapes).  The hand-derived form streams the
  attention backward one head at a time (one softmax matrix live instead
  of six) and frees each intermediate as soon as its two gradient matmuls
  are done, bounding the body working set well under the budget.

Two trunk flavors share the implementation (both are pre-norm torch-style
blocks with packed QKV — models/vit.py ViTBlock and models/layers.py
TransformerEncoderLayer):

* ``fused_vit_trunk_train``: GELU, LN eps 1e-6, shared (N, N) attention
  bias (scale packing), no dropout — the DINO backbone.
* ``fused_encoder_trunk_train``: ReLU, LN eps 1e-5, per-row (B, N) key
  bias, torch-style dropout at four sites per layer — the denoiser trunk.
  Dropout masks are generated IN-KERNEL from the TPU PRNG seeded by
  (seed, stream) where stream mixes (layer, chunk, micro-chunk) into one
  int32 (Mosaic's prng_seed takes at most two scalars), so the backward
  remat reproduces the exact forward masks without storing them.  (No
  interpret-mode support: Pallas has no CPU lowering for prng_seed — CPU
  tests pin dropout=0; executed coverage lives in the TPU smoke.)

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


# Dropout mask draw ORDER CONTRACT: the backward's attention half
# regenerates its masks by drawing only the LEADING sites of the stream
# (``only_attn``), so the attention sites ("attn", "m1") must stay first
# and nothing may draw before them.  Any reorder or added draw site
# desynchronizes forward and backward masks silently on CPU (dropout has
# no interpret lowering) — the executed guard is the TPU smoke's
# finite-difference check (experiments/tpu_smoke_train_kernels.py), which
# fails unless backward masks are bit-identical to the forward's.
_DROP_SITES = ("attn", "m1", "mff", "m2")
_ATTN_SITES = 2  # leading sites regenerated by the attention backward


def _drop_stream(l, c, i, n_c, n_mc):
    """Unique per-(layer, batch-chunk, micro-chunk) PRNG stream index.
    Mosaic's prng_seed takes at most TWO scalars, so the coordinates are
    mixed into one int32 (collision-free: i < n_mc, c < n_c).  Forward and
    backward MUST compute this identically — both call sites derive it
    from the same (l, program_id(0), i) with the same static n_c/n_mc."""
    return (l * n_c + c) * n_mc + i


def _gen_drop_masks(seed_ref, stream, mc, N, D, F, nhead, rate,
                    only_attn: bool = False):
    """Inverted-dropout multiplier masks for one micro-chunk, deterministic
    in (seed, stream) — ``stream`` from :func:`_drop_stream` — so forward
    and backward generate bit-identical masks.  Pre-scaled by 1/keep.
    ``only_attn`` draws just the first ``_ATTN_SITES`` masks — they lead
    the stream per ``_DROP_SITES``, so the draws match bit-for-bit."""
    pltpu.prng_seed(seed_ref[0], stream)
    inv_keep = 1.0 / (1.0 - rate)

    def draw(shape):
        bits = pltpu.prng_random_bits(shape)
        # low 23 bits -> uniform [0, 1) (sign-safe regardless of bit dtype)
        u = (bits & 0x7FFFFF).astype(jnp.float32) * (1.0 / (1 << 23))
        return (u >= rate).astype(jnp.float32) * inv_keep

    shapes = {
        "attn": (nhead, mc, N, N),
        "m1": (mc, N, D),
        "mff": (mc, N, F),
        "m2": (mc, N, D),
    }
    sites = _DROP_SITES[:_ATTN_SITES] if only_attn else _DROP_SITES
    return tuple(draw(shapes[s]) for s in sites)


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


def _ln_fwd(x, g, b, eps):
    """LayerNorm forward keeping the backward residuals: returns
    (h = xhat*g + b, xhat, rstd)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    return xhat * g + b, xhat, rstd


def _ln_bwd(dh, xhat, rstd, g):
    """Closed-form LayerNorm backward: returns (dx_f32, dg, db)."""
    dg = jnp.sum(dh * xhat, axis=tuple(range(dh.ndim - 1)))
    db = jnp.sum(dh, axis=tuple(range(dh.ndim - 1)))
    dxhat = dh * g
    dx = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    return dx, dg, db


def _mlp_residual_bwd(
    x1, dy, w, *, act_bf16: bool, eps: float, activation: str,
    drop_masks=None,
):
    """Hand-derived VJP of ``_mlp_residual`` w.r.t. (x1, weights).

    Rematerializes the forward from x1, then backpropagates with the
    closed-form LayerNorm backward.  Matmul operands take the same casts
    as the forward (bf16 when ``act_bf16``, f32 MXU accumulation), so
    weight grads come out f32.  Returns (dx1 at x1.dtype, grads dict keyed
    by the _WEIGHT_KEYS / _LS_KEYS names) — the dict keys, not positional
    indices, route the accumulation, so the weight layout cannot drift.
    """
    g2, b2, wfc1, bfc1, wfc2, bfc2 = w[:6]
    ls = w[6:]
    mc, N, D = x1.shape
    mcN = mc * N
    F = wfc1.shape[-1]
    cast = _cast_fn(act_bf16)

    # ---- remat forward
    h3, xhat, rstd = _ln_fwd(x1, g2, b2, eps)
    hf = h3.reshape(mcN, D)
    a1 = _linear(hf, wfc1, bfc1, cast)  # pre-activation (mcN, F)
    if activation == "gelu":
        act_out = 0.5 * a1 * (1.0 + _erf(a1 * (2.0**-0.5)))
    else:  # relu
        act_out = jnp.maximum(a1, 0.0)
    hmid = (
        act_out * drop_masks[0].reshape(mcN, F)
        if drop_masks is not None
        else act_out
    )

    # ---- backward
    dyf = dy.astype(jnp.float32)
    do = dyf * drop_masks[1] if drop_masks is not None else dyf
    grads = {}
    if ls:
        o_pre = _linear(hmid, wfc2, bfc2, cast).reshape(mc, N, D)
        grads["ls2"] = jnp.sum(do * o_pre, axis=(0, 1))
        do = do * ls[0]
    do2 = do.reshape(mcN, D)
    grads["bfc2"] = jnp.sum(do2, axis=0)
    grads["wfc2"] = jax.lax.dot_general(
        cast(hmid), cast(do2), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dhmid = jax.lax.dot_general(
        cast(do2), cast(wfc2), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dact = (
        dhmid * drop_masks[0].reshape(mcN, F)
        if drop_masks is not None
        else dhmid
    )
    if activation == "gelu":
        # d/da [a*Phi(a)] = Phi(a) + a*phi(a), Phi via the kernel's _erf
        pdf = jnp.exp(-0.5 * a1 * a1) * np.float32(1.0 / np.sqrt(2.0 * np.pi))
        da1 = dact * (0.5 * (1.0 + _erf(a1 * (2.0**-0.5))) + a1 * pdf)
    else:
        da1 = dact * (a1 > 0.0).astype(jnp.float32)
    grads["bfc1"] = jnp.sum(da1, axis=0)
    grads["wfc1"] = jax.lax.dot_general(
        cast(hf), cast(da1), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dhf = jax.lax.dot_general(
        cast(da1), cast(wfc1), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dxf, grads["g2"], grads["b2"] = _ln_bwd(
        dhf.reshape(mc, N, D), xhat, rstd, g2
    )
    return (dyf + dxf).astype(x1.dtype), grads


def _attn_residual_bwd(
    x, dy, w, key_bias, *, nhead: int, act_bf16: bool, eps: float,
    drop_masks=None,
):
    """Hand-derived VJP of ``_attn_residual`` w.r.t. (x, weights).

    The attention backward streams ONE HEAD AT A TIME: each iteration
    rematerializes that head's softmax from qkv, emits its dq/dk/dv and
    its wproj row-block gradient, and lets the (N, N) score matrices die —
    peak liveness is one head's matrices instead of all ``nhead`` (the
    in-kernel jax.vjp kept every head's residuals and overflowed VMEM).
    Returns (dx at x.dtype, grads dict keyed by weight names).
    """
    g1, b1, wqkv, bqkv, wproj, bproj = w[:6]
    ls = w[6:]
    mc, N, D = x.shape
    mcN = mc * N
    Dh = D // nhead
    scale = 1.0 / (Dh**0.5)
    cast = _cast_fn(act_bf16)

    # ---- remat LN1 + qkv (shared by all heads)
    h3, xhat, rstd = _ln_fwd(x, g1, b1, eps)
    hf = h3.reshape(mcN, D)
    qkv = _linear(hf, wqkv, bqkv, cast).reshape(mc, N, 3 * D)

    def head_slices(head):
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
        p_d = p * drop_masks[0][head] if drop_masks is not None else p
        return q, k, v, p, p_d

    def head_bwd(head, q, k, v, p, p_d, oh, do2):
        """One head's backward given the post-ls cotangent do2 (mcN, D).
        Returns (dwproj row-block, dq, dk, dv) — everything else dies."""
        dwproj_h = jax.lax.dot_general(
            cast(oh.reshape(mcN, Dh)), cast(do2), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dattn_h = jax.lax.dot_general(
            cast(do2), cast(wproj[head * Dh : (head + 1) * Dh, :]),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(mc, N, Dh)
        dv = jax.lax.dot_general(
            cast(p_d), cast(dattn_h), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            cast(dattn_h), v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if drop_masks is not None:
            dp = dp * drop_masks[0][head]
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))) * scale
        dq = jax.lax.dot_general(
            cast(ds), k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            cast(ds), q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return dwproj_h, dq, dk, dv

    dyf = dy.astype(jnp.float32)
    do = dyf * drop_masks[1] if drop_masks is not None else dyf
    grads = {}
    if ls:
        # the ls1 gradient needs the proj output BEFORE LayerScale, which
        # needs every head's output — accumulate it head by head (oh dies;
        # only the (mcN, D) accumulator stays live), then fold ls into do
        ls_pre = None
        for head in range(nhead):
            q, k, v, p, p_d = head_slices(head)
            oh = jax.lax.dot_general(
                cast(p_d), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            part = jax.lax.dot_general(
                cast(oh.reshape(mcN, Dh)),
                cast(wproj[head * Dh : (head + 1) * Dh, :]),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ls_pre = part if ls_pre is None else ls_pre + part
        o_pre = (ls_pre + bproj).reshape(mc, N, D)
        grads["ls1"] = jnp.sum(do * o_pre, axis=(0, 1))
        do = do * ls[0]
    do2 = do.reshape(mcN, D)

    dq_parts, dk_parts, dv_parts, dwproj_parts = [], [], [], []
    for head in range(nhead):
        q, k, v, p, p_d = head_slices(head)
        oh = jax.lax.dot_general(
            cast(p_d), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dwproj_h, dq, dk, dv = head_bwd(head, q, k, v, p, p_d, oh, do2)
        dwproj_parts.append(dwproj_h)
        dq_parts.append(dq)
        dk_parts.append(dk)
        dv_parts.append(dv)

    grads["bproj"] = jnp.sum(do2, axis=0)
    grads["wproj"] = jnp.concatenate(dwproj_parts, axis=0)
    dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)
    dqkv2 = dqkv.reshape(mcN, 3 * D)
    grads["bqkv"] = jnp.sum(dqkv2, axis=0)
    grads["wqkv"] = jax.lax.dot_general(
        cast(hf), cast(dqkv2), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dhf = jax.lax.dot_general(
        cast(dqkv2), cast(wqkv), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dxf, grads["g1"], grads["b1"] = _ln_bwd(
        dhf.reshape(mc, N, D), xhat, rstd, g1
    )
    return (dyf + dxf).astype(x.dtype), grads


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
    save_x1: bool = True,
):
    keys = _keys(layer_scale)
    n_w = len(keys)
    if save_x1:
        wrefs, (saved_ref, saved1_ref, y_ref, acc_ref) = rest[:n_w], rest[n_w:]
    else:
        wrefs, (saved_ref, y_ref, acc_ref) = rest[:n_w], rest[n_w:]
        saved1_ref = None
    c = pl.program_id(0)
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        acc_ref[...] = x_ref[...].astype(acc_ref.dtype)

    # residuals per block: its INPUT x (for the attention-half backward)
    # and — when ``save_x1`` — the post-attention intermediate x1 (so the
    # MLP-half backward does not re-run a full attention forward; see
    # _trunk_bwd_kernel)
    saved_ref[0] = acc_ref[...]

    weights = _read_weights(wrefs, keys)
    w_attn, w_mlp = _split_weights(weights)
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
            _gen_drop_masks(
                seed_ref, _drop_stream(l, c, i, pl.num_programs(0), n_mc),
                mc, N, D, F, nhead, dropout_rate,
            )
            if dropout_rate > 0.0 else None
        )
        x1 = _attn_residual(
            xs, w_attn, kb, nhead=nhead, act_bf16=act_bf16, eps=eps,
            drop_masks=None if masks is None else masks[:2],
        )
        if save_x1:
            saved1_ref[0, pl.ds(i * mc, mc)] = x1
        acc_ref[pl.ds(i * mc, mc)] = _mlp_residual(
            x1, w_mlp, act_bf16=act_bf16, eps=eps, activation=activation,
            drop_masks=None if masks is None else masks[2:],
        )
        return carry

    jax.lax.fori_loop(0, n_mc, step, None)

    @pl.when(l == pl.num_programs(1) - 1)
    def _():
        y_ref[...] = acc_ref[...]


def _trunk_bwd_kernel(
    *refs,
    nhead: int, mc: int, act_bf16: bool, eps: float, activation: str,
    dropout_rate: float, bias_rows: bool, L: int, layer_scale: bool = False,
    save_x1: bool = True,
):
    if save_x1:
        saved_ref, saved1_ref, dy_ref, bias_ref, seed_ref, *rest = refs
    else:
        saved_ref, dy_ref, bias_ref, seed_ref, *rest = refs
        saved1_ref = None
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
    key_index = {k: j for j, k in enumerate(keys)}

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
    # scratch), then the attention half.  When ``save_x1`` the MLP half
    # reads the forward's SAVED post-attention intermediate x1 (saved1_ref)
    # — re-running the full attention forward here measured ~35 ms/step at
    # ViT reference scale, far above the ~3 ms of extra HBM traffic saving
    # x1 costs; without it (the denoiser flavor: its saved1 VMEM windows at
    # bchunk=256 pushed the scoped stack to 119.9M > 118M at the full
    # production grid while the attention it would spare is tiny at N=16)
    # the MLP half rematerializes x1 from the saved block input as before.
    # The attention half always rematerializes from the saved block input.
    # Both halves use the HAND-DERIVED VJPs (_mlp_residual_bwd /
    # _attn_residual_bwd): in-kernel jax.vjp kept all heads' softmax
    # residuals + the FF hidden and their transposes live at once and could
    # not compile on a 128 MB-VMEM chip (measured 137.68M even at
    # sub-production shapes).  Gradients come back as dicts keyed by weight
    # name — key_index routes them to the partial outputs, so the
    # _WEIGHT_KEYS layout cannot silently drift.  Dropout masks: the MLP
    # half draws the full site sequence and uses the trailing MLP sites,
    # keeping the draw-order contract (_DROP_SITES) unchanged even when
    # the attention masks themselves go unused.
    def mlp_step(i, carry):
        dys = dyacc_ref[pl.ds(i * mc, mc)]
        masks = (
            _gen_drop_masks(
                seed_ref, _drop_stream(l, c, i, pl.num_programs(0), n_mc),
                mc, N, D, F, nhead, dropout_rate,
            )
            if dropout_rate > 0.0 else None
        )
        if save_x1:
            x1 = saved1_ref[0, pl.ds(i * mc, mc)]
        else:
            x1 = _attn_residual(
                saved_ref[0, pl.ds(i * mc, mc)], w_attn, _kb(i),
                nhead=nhead, act_bf16=act_bf16, eps=eps,
                drop_masks=None if masks is None else masks[:2],
            )
        dx1, gd = _mlp_residual_bwd(
            x1, dys, w_mlp, act_bf16=act_bf16, eps=eps,
            activation=activation,
            drop_masks=None if masks is None else masks[2:],
        )
        dyacc_ref[pl.ds(i * mc, mc)] = dx1
        for k, g in gd.items():
            _accum(grefs[key_index[k]], g, i)
        return carry

    def attn_step(i, carry):
        xs = saved_ref[0, pl.ds(i * mc, mc)]
        dx1 = dyacc_ref[pl.ds(i * mc, mc)]
        # regenerate the forward's dropout masks bit-identically: the
        # attention masks are the FIRST draws in the (seed, l, c, i)
        # stream, so drawing only them matches the forward's sequence
        masks = (
            _gen_drop_masks(
                seed_ref, _drop_stream(l, c, i, pl.num_programs(0), n_mc),
                mc, N, D, F, nhead, dropout_rate,
                only_attn=True,
            )
            if dropout_rate > 0.0 else None
        )
        dx, gd = _attn_residual_bwd(
            xs, dx1, w_attn, _kb(i), nhead=nhead, act_bf16=act_bf16,
            eps=eps, drop_masks=masks,
        )
        dyacc_ref[pl.ds(i * mc, mc)] = dx
        for k, g in gd.items():
            _accum(grefs[key_index[k]], g, i)
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
    "dropout_rate", "bias_rows", "layer_scale", "save_x1",
)

# Scoped-VMEM budget handed to Mosaic.  The v5e has 128 MiB of VMEM; leave
# ~10 MiB for the compiler's own reserves (semaphores, grid bookkeeping).
# An earlier arbitrary 100 MiB cap compile-failed the denoiser backward at
# production shape (scoped vmem 101.98M > 100M, bchunk=256 mc=32) even
# though the program fits the chip comfortably.
_VMEM_LIMIT = 118 * 1024 * 1024

# Scoped allocation is not perfectly grid-size independent: the round-5
# save-x1 denoiser experiment compiled at the probes' 2x2 grid but failed
# at the production 12x8 grid by 1.91M (119.91M vs the 118M cap).  The
# probes therefore compile with THIS margin subtracted (via the env var,
# set around the probe compile only — ops/train_probe.py), so a
# probe-passing config has at least the observed grid-effect headroom.
_PROBE_MARGIN_ENV = "POSEDIFFUSION_TRAIN_VMEM_MARGIN"


def _vmem_limit():
    import os

    return _VMEM_LIMIT - int(os.environ.get(_PROBE_MARGIN_ENV, "0") or 0)


@functools.partial(jax.jit, static_argnames=_STATIC_NAMES)
def _fwd_call(
    x, stacks, bias, seed, nhead, bchunk, mc, act_bf16, interpret,
    eps, activation, dropout_rate, bias_rows, layer_scale=False,
    save_x1=True,
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
        layer_scale=layer_scale, save_x1=save_x1,
    )
    bias_spec = (
        pl.BlockSpec((bchunk, N_pad), lambda c, l: (c, 0), memory_space=pltpu.VMEM)
        if bias_rows
        else pl.BlockSpec((N_pad, N_pad), lambda c, l: (0, 0), memory_space=pltpu.VMEM)
    )
    saved_spec = pl.BlockSpec(
        (1, bchunk, N_pad, D), lambda c, l: (l, c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    saved_shape = jax.ShapeDtypeStruct((L, B_pad, N_pad, D), rdtype)
    n_saved = 2 if save_x1 else 1
    *saved_outs, y = pl.pallas_call(
        kernel,
        out_shape=(saved_shape,) * n_saved + (
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
        out_specs=(saved_spec,) * n_saved + (
            pl.BlockSpec(
                (bchunk, N_pad, D), lambda c, l: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[pltpu.VMEM((bchunk, N_pad, D), rdtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit(),
        ),
        interpret=interpret,
    )(x, bias, seed, *[stacks[k] for k in keys])
    saved = saved_outs[0]
    saved1 = saved_outs[1] if save_x1 else None
    return saved, saved1, y


@functools.partial(jax.jit, static_argnames=_STATIC_NAMES)
def _bwd_call(
    saved, saved1, dy_pad, bias, seed, stacks, nhead, bchunk, mc, act_bf16,
    interpret, eps, activation, dropout_rate, bias_rows, layer_scale=False,
    save_x1=True,
):
    keys = _keys(layer_scale)
    L, B_pad, N_pad, D = saved.shape
    rdtype = saved.dtype
    n_bc = B_pad // bchunk

    kernel = functools.partial(
        _trunk_bwd_kernel, nhead=nhead, mc=mc, act_bf16=act_bf16, eps=eps,
        activation=activation, dropout_rate=dropout_rate, bias_rows=bias_rows,
        L=L, layer_scale=layer_scale, save_x1=save_x1,
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
    saved_in_spec = pl.BlockSpec(
        (1, bchunk, N_pad, D), lambda c, l: (L - 1 - l, c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    saved_ins = (saved, saved1) if save_x1 else (saved,)
    dx, *gpartials = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, N_pad, D), rdtype),
        ) + grad_shapes,
        grid=(n_bc, L),
        in_specs=[saved_in_spec] * len(saved_ins)
        + [
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
            vmem_limit_bytes=_vmem_limit(),
        ),
        interpret=interpret,
    )(*saved_ins, dy_pad, bias, seed, *[stacks[k] for k in keys])
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
    _, _, y = _fwd_call(
        x, stacks, mask_bias, jnp.asarray(_ZERO_SEED), nhead, bchunk, mc,
        act_bf16, interpret, 1e-6, "gelu", 0.0, False, layer_scale,
        save_x1=_save_x1_for(x),
    )
    return y[:B, :N]


def _save_x1_for(x):
    """Save the post-attention intermediate only at bf16 residuals.

    The extra saved1 VMEM windows fit comfortably there (measured on the
    v5e at the full production grids: ViT bf16 trunk 0.219 s vs 0.267 s
    without; denoiser bf16 0.044 s vs 0.050 s), but at f32 they push the
    backward's scoped stack over the 118 MB cap at the full production
    grid (ViT: 118.57M at 32 chunks x 12 layers; denoiser: 119.91M at
    12 x 8 — round 5) — f32 keeps the attention re-forward remat instead.
    """
    return x.dtype == jnp.bfloat16


def _vit_fwd(x, stacks, mask_bias, nhead, bchunk, mc, act_bf16, interpret,
             layer_scale):
    B, N, _ = x.shape
    save_x1 = _save_x1_for(x)
    saved, saved1, y = _fwd_call(
        x, stacks, mask_bias, jnp.asarray(_ZERO_SEED), nhead, bchunk, mc,
        act_bf16, interpret, 1e-6, "gelu", 0.0, False, layer_scale,
        save_x1=save_x1,
    )
    return y[:B, :N], (saved, saved1, stacks, mask_bias)


def _vit_bwd(nhead, bchunk, mc, act_bf16, interpret, layer_scale, res, dy):
    saved, saved1, stacks, mask_bias = res
    # saved.dtype == the primal x's dtype (the forward casts to x.dtype)
    B, N = dy.shape[:2]
    L, B_pad, N_pad, D = saved.shape
    dy_pad = jnp.pad(
        dy.astype(saved.dtype), [(0, B_pad - B), (0, N_pad - N), (0, 0)]
    )
    bias = _pad_bias(mask_bias, N, N_pad)
    dx, grads = _bwd_call(
        saved, saved1, dy_pad, bias, jnp.asarray(_ZERO_SEED), stacks, nhead,
        bchunk, mc, act_bf16, interpret, 1e-6, "gelu", 0.0, False,
        layer_scale, save_x1=saved1 is not None,
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
    _, _, y = _fwd_call(
        x, stacks, row_bias, seed, nhead, bchunk, mc, act_bf16, interpret,
        1e-5, "relu", dropout_rate, True, save_x1=_save_x1_for(x),
    )
    return y[:B, :N]


def _enc_fwd(x, stacks, row_bias, seed, nhead, bchunk, mc, act_bf16,
             dropout_rate, interpret):
    B, N, _ = x.shape
    saved, saved1, y = _fwd_call(
        x, stacks, row_bias, seed, nhead, bchunk, mc, act_bf16, interpret,
        1e-5, "relu", dropout_rate, True, save_x1=_save_x1_for(x),
    )
    return y[:B, :N], (saved, saved1, stacks, row_bias, seed)


def _enc_bwd(nhead, bchunk, mc, act_bf16, dropout_rate, interpret, res, dy):
    saved, saved1, stacks, row_bias, seed = res
    B, N = dy.shape[:2]
    L, B_pad, N_pad, D = saved.shape
    dy_pad = jnp.pad(
        dy.astype(saved.dtype), [(0, B_pad - B), (0, N_pad - N), (0, 0)]
    )
    bias = _pad_bias(row_bias, N, N_pad, B=B, B_pad=B_pad)
    dx, grads = _bwd_call(
        saved, saved1, dy_pad, bias, seed, stacks, nhead, bchunk, mc,
        act_bf16, interpret, 1e-5, "relu", dropout_rate, True,
        save_x1=saved1 is not None,
    )
    ct_seed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return dx[:B, :N], grads, jnp.zeros_like(row_bias), ct_seed


fused_encoder_trunk_train.defvjp(_enc_fwd, _enc_bwd)
