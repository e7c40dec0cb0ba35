"""One-time compile probes for the fused train-trunk kernels.

The fused train path (ops/vit_train_kernel.py) is auto-gated on for
single-chip TPU training, but a Pallas kernel can fail Mosaic compilation
on a given chip generation for configuration reasons — most importantly a
VMEM budget violation, which depends on (bchunk, mc, token count, model
width) and not on the batch size or depth.  Without a guard, one broken
kernel takes down the whole ``train.py`` entry point (the failure class
that shipped in round 3: the backward kernel's VMEM overflow).

These probes compile-and-run each kernel flavor ONCE per shape/knob
configuration at depth 2 and TWO batch chunks — the smallest program
with the production kernel's true per-step VMEM liveness.  Depth/chunk
count matter: Mosaic only double-buffers a window when the grid actually
revisits it, so a depth-1 single-chunk probe under-reports VMEM by the
second buffer of every streamed window (~30 MB for the denoiser trunk —
exactly how the round-4 f32 bench compile-failed past a passing probe).
Block shapes otherwise depend only on bchunk/mc/N/D/F, so a 2x2 grid has
the same scoped-vmem stack as the production n_bc x L grid.  The verdict
is cached per configuration.  ``PoseDiffusionModel.loss`` consults them before
routing into the fused path and silently falls back to the Flax trunks on
failure, with a one-time warning.

Probe cost: one small kernel compile per configuration on first use
(persisted by the XLA compilation cache across processes).  Set
``POSEDIFFUSION_FUSED_TRAIN_PROBE=on`` to skip probing (trust the
kernels), ``off`` to force the Flax fallback, or ``fail`` to simulate a
kernel compile failure (exercises the fallback in tests without a TPU).

Reference behavior this protects: the reference's train entry point
always trains (pose_diffusion/train.py:151-253 — plain torch modules,
nothing to compile-fail); ours must be no less robust while defaulting to
the fused kernels.
"""

from __future__ import annotations

import concurrent.futures
import functools
import os
import warnings

import numpy as np

_ENV = "POSEDIFFUSION_FUSED_TRAIN_PROBE"


def _probe_x(bchunk: int, N: int, D: int, rdtype):
    import jax.numpy as jnp

    vals = (np.arange(bchunk * N * D, dtype=np.float32) % 13.0 - 6.0) * 0.05
    return jnp.asarray(vals.reshape(bchunk, N, D)).astype(rdtype)


_PROBE_DEPTH = 2  # >=2 layers AND >=2 batch chunks: see module docstring


def _probe_stacks(D: int, F: int, layer_scale: bool, depth: int = _PROBE_DEPTH):
    import jax.numpy as jnp

    def vec(width, val):
        return jnp.full((depth, 1, width), val, jnp.float32)

    def mat(din, dout):
        # deterministic non-constant weights so the probe exercises real
        # softmax/GELU paths (constant weights collapse LN outputs to zero)
        vals = (np.arange(din * dout, dtype=np.float32) % 7.0 - 3.0) * 0.01
        return jnp.tile(jnp.asarray(vals.reshape(1, din, dout)),
                        (depth, 1, 1))

    st = {
        "g1": vec(D, 1.0), "b1": vec(D, 0.0),
        "wqkv": mat(D, 3 * D), "bqkv": vec(3 * D, 0.0),
        "wproj": mat(D, D), "bproj": vec(D, 0.0),
        "g2": vec(D, 1.0), "b2": vec(D, 0.0),
        "wfc1": mat(D, F), "bfc1": vec(F, 0.0),
        "wfc2": mat(F, D), "bfc2": vec(D, 0.0),
    }
    if layer_scale:
        st["ls1"] = vec(D, 1.0)
        st["ls2"] = vec(D, 1.0)
    return st


def _run_probe(build_loss, label: str, margin_bytes: int = 6 * 1024 * 1024) -> bool:
    import jax
    import jax.numpy as jnp

    if os.environ.get(_ENV) == "fail":
        exc: Exception = RuntimeError(
            "simulated fused-train kernel compile failure "
            f"({_ENV}=fail test hook)"
        )
    else:
        exc = None
    def run_now():
        x, loss_fn = build_loss()
        v, g = jax.jit(jax.value_and_grad(loss_fn))(x)
        return bool(np.isfinite(float(v))) and bool(
            np.isfinite(np.asarray(g, np.float32)).all()
        )

    try:
        if exc is not None:
            raise exc
        # The probe is consulted at trace time of the (jitted) train step.
        # Escape the ambient trace by probing on a FRESH THREAD — JAX trace
        # state is thread-local, so there the kernel compiles and RUNS right
        # now.  (Inline, the nested jit would be traced into the outer
        # program and float(v) would see a tracer; ensure_compile_time_eval
        # can't help either — pallas primitives have no eval rule.)
        #
        # The probe compiles with a REDUCED scoped-VMEM limit: Mosaic's
        # scoped allocation is not perfectly grid-size independent (round 5
        # measured deltas of 1.9M at 12x8 and ~10M at 32x12 between a 2x2
        # probe grid and the production grid), so a config must clear the
        # cap with headroom to count as probe-OK.  Probes that compile at
        # the TRUE production grid (vit_train_kernel_ok with real
        # depth/batch_chunks) pass a small residual margin instead.
        # Env-based so the production compile itself is unaffected; set
        # only for the blocking probe call below.
        os.environ["POSEDIFFUSION_TRAIN_VMEM_MARGIN"] = str(margin_bytes)
        try:
            with concurrent.futures.ThreadPoolExecutor(1) as pool:
                ok = pool.submit(run_now).result()
        finally:
            os.environ.pop("POSEDIFFUSION_TRAIN_VMEM_MARGIN", None)
        if not ok:
            warnings.warn(
                f"fused train kernel probe ({label}): non-finite output; "
                "falling back to the Flax trunk"
            )
        return ok
    except Exception as e:  # Mosaic compile failure, VMEM OOM, ...
        warnings.warn(
            f"fused train kernel probe ({label}) failed — falling back to "
            f"the Flax trunk: {type(e).__name__}: {str(e)[:200]}"
        )
        return False


@functools.lru_cache(maxsize=None)
def vit_train_kernel_ok(
    N: int, D: int, F: int, nhead: int, bchunk: int, mc: int,
    act_bf16: bool, layer_scale: bool, rdtype_name: str,
    depth: int = _PROBE_DEPTH, batch_chunks: int = 2,
) -> bool:
    """Compile-probe the fused ViT train trunk.

    ``N`` is the packed token count (all scales), ``F`` the MLP hidden
    width.  ``depth``/``batch_chunks`` size the probe GRID — callers that
    know the production grid (models/pose_diffusion._probe_vit_mc passes
    the real depth and ceil(B/bchunk)) must pass it: Mosaic's scoped-VMEM
    allocation GROWS with grid size near the cap (round 5 measured
    112M-passing at a 2x2 grid vs 121.7M failing at the production 32x12
    for the same 593-token block shapes), so a small-grid probe
    over-approves.  Cached per configuration; note the cache also latches
    the ``POSEDIFFUSION_FUSED_TRAIN_PROBE`` mode seen first (tests
    flipping the env should call ``vit_train_kernel_ok.cache_clear()``).
    """
    mode = os.environ.get(_ENV, "")
    if mode == "on":
        return True
    if mode == "off":
        return False

    import jax.numpy as jnp

    from posediffusion_tpu.ops.vit_train_kernel import fused_vit_trunk_train

    def build():
        st = _probe_stacks(D, F, layer_scale, depth=depth)
        x = _probe_x(batch_chunks * bchunk, N, D, jnp.dtype(rdtype_name))
        bias = jnp.zeros((N, N), jnp.float32)

        def loss_fn(xx):
            y = fused_vit_trunk_train(
                xx, st, bias, nhead, bchunk, mc, act_bf16, False, layer_scale
            )
            return jnp.sum(y.astype(jnp.float32))

        return x, loss_fn

    # grid-accurate probes (real depth/chunks) need only a small residual
    # margin; the default 2x2 grid keeps the full grid-effect headroom
    grid_accurate = (depth, batch_chunks) != (_PROBE_DEPTH, 2)
    return _run_probe(
        build,
        f"vit N={N} D={D} bchunk={bchunk} mc={mc} "
        f"grid={batch_chunks}x{depth}",
        margin_bytes=(2 if grid_accurate else 6) * 1024 * 1024,
    )


@functools.lru_cache(maxsize=None)
def encoder_train_kernel_ok(
    N: int, D: int, F: int, nhead: int, bchunk: int, mc: int,
    act_bf16: bool, dropout_rate: float, rdtype_name: str,
) -> bool:
    """Compile-probe the fused denoiser (encoder) train trunk — see
    ``vit_train_kernel_ok`` for caching semantics."""
    mode = os.environ.get(_ENV, "")
    if mode == "on":
        return True
    if mode == "off":
        return False

    import jax.numpy as jnp

    from posediffusion_tpu.ops.vit_train_kernel import (
        fused_encoder_trunk_train,
    )

    def build():
        st = _probe_stacks(D, F, layer_scale=False)
        x = _probe_x(2 * bchunk, N, D, jnp.dtype(rdtype_name))
        row_bias = jnp.zeros((2 * bchunk, N), jnp.float32)
        seed = jnp.ones((1,), jnp.int32)

        def loss_fn(xx):
            y = fused_encoder_trunk_train(
                xx, st, row_bias, seed, nhead, bchunk, mc, act_bf16,
                dropout_rate, False,
            )
            return jnp.sum(y.astype(jnp.float32))

        return x, loss_fn

    return _run_probe(
        build,
        f"denoiser N={N} D={D} bchunk={bchunk} mc={mc} drop={dropout_rate}",
    )


def packed_token_count(H: int, W: int, scale_factors, patch_size: int) -> int:
    """Token count of the scale-packed ViT input for (H, W) images —
    mirrors models/feature_extractor._embed_pack_scales exactly
    (torch floor semantics for scaled sizes, +1 CLS per scale)."""
    from posediffusion_tpu.ops.image import scale_size

    total = 0
    for s in scale_factors:
        h = H if s == 1 else scale_size(H, s)
        w = W if s == 1 else scale_size(W, s)
        total += 1 + (h // patch_size) * (w // patch_size)
    return total
