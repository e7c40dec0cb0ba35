"""Sweep (bchunk, mc) for the fused train-trunk kernels on the real chip.

The forward/backward train kernels (ops/vit_train_kernel.py) trade VMEM
residency against MXU tile sizes through two knobs: the batch chunk
(bchunk rows resident across layers) and the micro-chunk (mc rows per
in-kernel vjp).  This sweeps both at the reference training shapes and
prints per-config fwd+bwd seconds (chained-R in-situ method, see
KERNELS.md "Measuring on relay-attached TPUs"), so the defaults baked
into models/feature_extractor.py and models/denoiser.py can be pinned to
measured numbers.

Usage:  python experiments/tune_train_kernels.py [vit|denoiser|both]
"""

import json
import os
import sys
import time

import numpy as np

# runnable as a plain script from any cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R_VIT = 3
R_DEN = 8
WARMUP = 1
REPEATS = 3

# keep the grid small: each config is a fresh Mosaic compile, and compiles
# go through the remote tunnel (minutes each on a cache miss)
VIT_GRID = ((8, 2), (8, 4), (16, 4), (16, 8))
DEN_GRID = ((128, 16), (128, 32), (256, 32), (512, 32))


def _timed(fn, *args, r=1):
    import jax

    for _ in range(WARMUP):
        jax.device_get(fn(*args))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        ts.append((time.perf_counter() - t0) / r)
    return float(np.median(ts))


def tune_vit(act_bf16=True):
    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.models.vit import VisionTransformer
    from posediffusion_tpu.ops.vit_kernel import stack_vit_params
    from posediffusion_tpu.ops.vit_train_kernel import fused_vit_trunk_train

    B, N, D, L, nhead = 512, 264, 384, 12, 6  # 512 images x packed 3 scales
    vit = VisionTransformer(patch_size=16, embed_dim=D, depth=L, num_heads=nhead)
    params = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
    stacks = stack_vit_params(params["params"], L, weight_dtype=jnp.float32)
    rdtype = jnp.bfloat16 if act_bf16 else jnp.float32
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, N, D)).astype(np.float32)
    ).astype(rdtype)
    bias = jnp.zeros((N, N), jnp.float32)

    results = {}
    for bchunk, mc in VIT_GRID:
            tag = f"vit_b{bchunk}_mc{mc}"
            try:
                @jax.jit
                def fwd_bwd(x, stacks):
                    def body(_, s):
                        g = jax.grad(
                            lambda xx: jnp.sum(
                                fused_vit_trunk_train(
                                    xx + s * 1e-30, stacks, bias,
                                    nhead, bchunk, mc, act_bf16, False,
                                ).astype(jnp.float32)
                            )
                        )(x)
                        return jnp.sum(g).astype(jnp.float32) * 1e-30
                    return jax.lax.fori_loop(0, R_VIT, body, 0.0)

                results[tag] = _timed(fwd_bwd, x, stacks, r=R_VIT)
            except Exception as e:  # VMEM overflow etc.
                results[tag] = f"FAILED: {type(e).__name__}: {str(e)[:120]}"
            print(tag, results[tag], flush=True)
    return results


def tune_denoiser(act_bf16=True, dropout=0.1):
    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.models.layers import TransformerEncoder
    from posediffusion_tpu.ops.vit_train_kernel import (
        fused_encoder_trunk_train,
        stack_encoder_trunk_params,
    )

    B, N, D, L, nhead = 2880, 16, 512, 8, 4  # 32 seqs x 90 repeat, 16 frames
    enc = TransformerEncoder(d_model=D, nhead=nhead, num_encoder_layers=L,
                             dim_feedforward=1024)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((2, 3, D)))
    stacks = stack_encoder_trunk_params(variables["params"], L)
    rdtype = jnp.bfloat16 if act_bf16 else jnp.float32
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, N, D)).astype(np.float32)
    ).astype(rdtype)
    row_bias = jnp.zeros((B, N), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)

    results = {}
    for bchunk, mc in DEN_GRID:
            tag = f"den_b{bchunk}_mc{mc}"
            try:
                @jax.jit
                def fwd_bwd(x, stacks):
                    def body(_, s):
                        g = jax.grad(
                            lambda xx: jnp.sum(
                                fused_encoder_trunk_train(
                                    xx + s * 1e-30, stacks, row_bias, seed,
                                    nhead, bchunk, mc, act_bf16, dropout, False,
                                ).astype(jnp.float32)
                            )
                        )(x)
                        return jnp.sum(g).astype(jnp.float32) * 1e-30
                    return jax.lax.fori_loop(0, R_DEN, body, 0.0)

                results[tag] = _timed(fwd_bwd, x, stacks, r=R_DEN)
            except Exception as e:
                results[tag] = f"FAILED: {type(e).__name__}: {str(e)[:120]}"
            print(tag, results[tag], flush=True)
    return results


if __name__ == "__main__":
    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    out = {}
    if which in ("vit", "both"):
        out.update(tune_vit())
    if which in ("denoiser", "both"):
        out.update(tune_denoiser())
    print(json.dumps(out, indent=1))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tune_train_kernels.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing.update(out)
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)
    print("wrote", path)
