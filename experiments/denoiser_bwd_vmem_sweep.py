"""One-off: find denoiser train-kernel knobs that fit scoped VMEM at the
reference-scale training shape (B=2880 rows after batch_repeat, N=16,
D=512, F=1024, L=8) on a real v5e.

The round-4 f32 bench_train run compile-failed in the denoiser backward:
scoped vmem 101.98M > 100M at bchunk=256, mc=32.  The depth-1/single-chunk
probe passed because Mosaic only double-buffers windows when the grid
actually revisits them — liveness IS grid-dependent, contrary to the
probe's original assumption.  This sweep compiles value_and_grad of the
fused encoder trunk at the REAL grid (n_bc x L) for candidate
(bchunk, mc) and reports fit (and, with --time, step time — each timing
chain is an extra multi-minute tunnel compile, so fit-only is the
default).

Resolution: the 101.98M was 2% over an ARBITRARY 100 MiB scoped-vmem cap
on a 128 MiB chip; ops/vit_train_kernel._VMEM_LIMIT now budgets 118 MiB
and the production knobs (bchunk=256, mc=32) fit.  Kept for the next
budget regression.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.models.layers import TransformerEncoder
    from posediffusion_tpu.ops.vit_train_kernel import (
        fused_encoder_trunk_train,
        stack_encoder_trunk_params,
    )

    B, N, D, F, L, nhead = 2880, 16, 512, 1024, 8, 4
    rng = np.random.default_rng(0)
    enc = TransformerEncoder(
        d_model=D, nhead=nhead, num_encoder_layers=L, dim_feedforward=F
    )
    p = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, N, D)))
    st = stack_encoder_trunk_params(p["params"], L)
    x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    row_bias = jnp.zeros((B, N), jnp.float32)
    seed = jnp.ones((1,), jnp.int32)

    do_time = "--time" in sys.argv
    results = []
    for bchunk, mc in [(256, 32), (128, 32), (128, 64), (192, 32), (96, 32),
                       (64, 32)]:
        if B % bchunk and (-B % bchunk) > bchunk:
            continue

        def loss(xx):
            y = fused_encoder_trunk_train(
                xx, st, row_bias, seed, nhead, bchunk, mc, False, 0.1, False
            )
            return jnp.sum(y.astype(jnp.float32))

        tag = f"bchunk={bchunk} mc={mc}"
        try:
            f = jax.jit(jax.value_and_grad(loss))
            v, g = f(x)
            ok = bool(np.isfinite(float(v)))
            if not do_time:
                print(f"{tag}: FITS finite={ok}", flush=True)
                continue
            # time: R chained iterations in one program
            R = 20

            def chain(xx):
                def body(i, acc):
                    vv, gg = jax.value_and_grad(loss)(xx + acc * 0.0)
                    return acc + vv

                return jax.lax.fori_loop(0, R, body, 0.0)

            cf = jax.jit(chain)
            float(cf(x))  # compile+warm
            t0 = time.perf_counter()
            float(cf(x))
            dt = (time.perf_counter() - t0) / R
            print(f"{tag}: OK finite={ok}  {dt*1e3:.2f} ms/fwd+bwd", flush=True)
            results.append((tag, dt))
        except Exception as e:
            print(f"{tag}: FAIL {type(e).__name__}: {str(e)[-200:]}", flush=True)
    if results:
        best = min(results, key=lambda r: r[1])
        print(f"best: {best[0]}  {best[1]*1e3:.2f} ms")


if __name__ == "__main__":
    main()
