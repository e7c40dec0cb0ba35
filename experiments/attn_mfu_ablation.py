"""Decompose the ViT train trunk's MXU-utilization gap (KERNELS.md).

The fused trunk measures ~62% MXU at reference scale.  Two structural
costs are suspected, and both can be measured with the PRODUCTION kernel
by varying its parameters (same FLOPs in every variant):

* head packing: Dh = 384/6 = 64 occupies half the MXU's 128-lane
  contraction on Q@K^T and half the output lanes on P@V.  ``nhead=1``
  (Dh=384) removes that waste without changing FLOPs — the timing delta
  IS the multi-head penalty.
* token-count lane padding: N=264 packed tokens round up to 384 lanes in
  the (N, N) score tiles (+45%).  ``N=256`` (two exact tiles) removes it.

Variants (bf16 residuals, production bchunk=16 / mc=8, L=12, B=512):
    base      nhead=6, N=264   — production
    heads1    nhead=1, N=264   — no Dh-padding, no per-head loop
    n256      nhead=6, N=256   — no score-tile padding
    both      nhead=1, N=256

Prints fwd and fwd+bwd seconds per variant (chained-R in-situ method) and
writes attn_mfu_ablation.json next to this file.  Informational only —
results feed the KERNELS.md roofline discussion; no production behavior
depends on this script.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, D, L = 512, 384, 12
BCHUNK, MC = 16, 8
R_FWD, R_BWD = 6, 3
WARMUP, REPEATS = 1, 3


def _timed(fn, *args, r):
    import jax

    for _ in range(WARMUP):
        jax.device_get(fn(*args))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        ts.append((time.perf_counter() - t0) / r)
    return float(np.median(ts))


def main():
    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.models.vit import VisionTransformer
    from posediffusion_tpu.ops.vit_kernel import stack_vit_params
    from posediffusion_tpu.ops.vit_train_kernel import fused_vit_trunk_train

    vit = VisionTransformer(patch_size=16, embed_dim=D, depth=L, num_heads=6)
    params = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
    stacks = stack_vit_params(params["params"], L, weight_dtype=jnp.float32)
    rng = np.random.default_rng(0)

    out = {}
    for tag, nhead, N in (
        ("base_h6_n264", 6, 264),
        ("heads1_n264", 1, 264),
        ("h6_n256", 6, 256),
        ("heads1_n256", 1, 256),
    ):
        x = jnp.asarray(
            rng.normal(size=(B, N, D)).astype(np.float32)
        ).astype(jnp.bfloat16)
        bias = jnp.zeros((N, N), jnp.float32)

        @jax.jit
        def fwd(x, stacks):
            def body(_, s):
                y = fused_vit_trunk_train(
                    x + s * jnp.bfloat16(0), stacks, bias,
                    nhead, BCHUNK, MC, True, False,
                )
                return jnp.sum(y.astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, R_FWD, body, 0.0)

        @jax.jit
        def fwd_bwd(x, stacks):
            def body(_, s):
                g = jax.grad(
                    lambda xx: jnp.sum(
                        fused_vit_trunk_train(
                            xx + s * jnp.bfloat16(0), stacks, bias,
                            nhead, BCHUNK, MC, True, False,
                        ).astype(jnp.float32)
                    )
                )(x)
                return jnp.sum(g).astype(jnp.float32) * 1e-30
            return jax.lax.fori_loop(0, R_BWD, body, 0.0)

        try:
            out[tag] = {
                "fwd_s": _timed(fwd, x, stacks, r=R_FWD),
                "fwd_bwd_s": _timed(fwd_bwd, x, stacks, r=R_BWD),
            }
        except Exception as e:
            out[tag] = f"FAILED: {type(e).__name__}: {str(e)[:150]}"
        print(tag, out[tag], flush=True)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "attn_mfu_ablation.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
