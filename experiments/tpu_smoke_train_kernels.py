"""Real-TPU smoke for the fused train-trunk kernels (small shapes).

Runs BOTH fused train trunks (ViT flavor and denoiser flavor) on the chip
with Mosaic (interpret=False), pins value + grads against the Flax paths
computed on the same device, and exercises the in-kernel PRNG dropout:
determinism per seed, seed sensitivity, and a finite-difference check of
the dropout backward (which only passes if the backward kernel regenerates
the forward's masks bit-identically — the invariant no CPU test can see).

Matmul precision: XLA's DEFAULT f32 matmul on TPU runs bf16-quality MXU
passes, and Mosaic kernels do the same — so two correct programs differ by
~2^-8 relative at default precision.  The smoke therefore checks two
things separately:

* EXACT parity at SMALL widths under ``jax.default_matmul_precision
  ("float32")`` on both sides (Mosaic honors the dot precision attribute;
  small widths keep the 6-pass-emulated kernel's compile time sane) — the
  hand-derived backward must match Flax autodiff to f32 noise ON THE CHIP;
* production-shape parity at DEFAULT precision with a bf16-rounding-scale
  tolerance — two correct programs, different accumulation orders.

This is the first thing to run after touching ops/vit_train_kernel.py:
it catches Mosaic compile regressions and VMEM budget violations at the
production block shapes before the full-scale benches.  Output is
committed as TPU_SMOKE.log.
"""

import os
import sys

import numpy as np

# runnable as a plain script from any cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from posediffusion_tpu.models.layers import TransformerEncoder
    from posediffusion_tpu.models.vit import ViTBlock, VisionTransformer
    from posediffusion_tpu.ops.vit_kernel import stack_vit_params
    from posediffusion_tpu.ops.vit_train_kernel import (
        fused_encoder_trunk_train,
        fused_vit_trunk_train,
        stack_encoder_trunk_params,
    )

    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    def vit_pair(d, nhead, L, B, N, bchunk, mc):
        vit = VisionTransformer(
            patch_size=16, embed_dim=d, depth=L, num_heads=nhead
        )
        params = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
        stacks = stack_vit_params(params["params"], L, weight_dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
        r = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
        bias = jnp.zeros((N, N), jnp.float32)

        def flax_loss(xx):
            h = xx
            for i in range(L):
                h = ViTBlock(d, nhead).apply(
                    {"params": params["params"][f"blocks_{i}"]}, h
                )
            return jnp.sum(h * r)

        def fused_loss(xx):
            y = fused_vit_trunk_train(
                xx, stacks, bias, nhead, bchunk, mc, False, False
            )
            return jnp.sum(y * r)

        return x, flax_loss, fused_loss, stacks, bias

    def rel_diffs(tag, x, ref_fn, got_fn, tol_v, tol_g):
        rv, rg = jax.jit(jax.value_and_grad(ref_fn))(x)
        fv, fg = jax.jit(jax.value_and_grad(got_fn))(x)
        dv = abs(float(fv) - float(rv)) / max(1.0, abs(float(rv)))
        dg = float(jnp.max(jnp.abs(fg - rg))) / max(
            1.0, float(jnp.max(jnp.abs(rg)))
        )
        print(
            f"{tag}: value rel-diff {dv:.2e}  max grad rel-diff {dg:.2e}",
            flush=True,
        )
        assert dv < tol_v and dg < tol_g, f"{tag} parity FAILED on TPU"

    # ---- ViT flavor, EXACT: small widths, both sides at f32 precision
    # (Mosaic emulates full-f32 matmuls; small body keeps compile quick)
    xs, flax_s, fused_s, _, _ = vit_pair(
        d=128, nhead=2, L=2, B=4, N=24, bchunk=2, mc=1
    )
    with jax.default_matmul_precision("float32"):
        rel_diffs("vit f32-exact small (precision=float32)",
                  xs, flax_s, fused_s, 1e-5, 1e-4)

    # ---- ViT flavor, production block shapes at DEFAULT precision: both
    # sides run bf16-quality MXU passes; tolerance = accumulated rounding
    xp, flax_p, fused_p, stacks_p, bias_p = vit_pair(
        d=384, nhead=6, L=3, B=16, N=264, bchunk=8, mc=4
    )
    rel_diffs("vit f32 production-shape (default precision)",
              xp, flax_p, fused_p, 2e-2, 2e-2)

    # bf16 flavor compiles + runs finite at the production block shapes
    yb = jax.jit(
        lambda xx: fused_vit_trunk_train(
            xx.astype(jnp.bfloat16), stacks_p, bias_p, 6, 8, 4, True, False
        )
    )(xp)
    assert np.isfinite(np.asarray(yb, np.float32)).all()
    print("vit bf16 production-shape: compiled + finite", flush=True)

    # ---- bf16 residuals: the saved-x1 backward (production fast path)
    # must agree with the forced-remat backward ON CHIP.  The stored x1 is
    # the remat value rounded once more to bf16, so agreement is
    # statistical (isolated GELU/ReLU-kink elements may jump); a wrong
    # saved1 layer/chunk would put every element off at O(scale).
    from posediffusion_tpu.ops import vit_train_kernel as _vtk

    assert _vtk._save_x1_for(xp.astype(jnp.bfloat16))

    def vit_grad_bf16():
        def loss(xx):
            y = fused_vit_trunk_train(
                xx, stacks_p, bias_p, 6, 8, 4, True, False
            )
            return jnp.sum(y.astype(jnp.float32))

        return jax.jit(jax.grad(loss))(xp.astype(jnp.bfloat16))

    g_saved = np.asarray(vit_grad_bf16(), np.float32)
    orig_gate = _vtk._save_x1_for
    _vtk._save_x1_for = lambda _: False
    try:
        g_remat = np.asarray(vit_grad_bf16(), np.float32)
    finally:
        _vtk._save_x1_for = orig_gate
    sc = max(1.0, float(np.abs(g_remat).max()))
    rel = np.abs(g_saved - g_remat) / sc
    print(
        f"vit bf16 saved-x1 vs remat backward: mean rel {rel.mean():.2e} "
        f"frac>5% {float((rel > 0.05).mean()):.3f}",
        flush=True,
    )
    assert rel.mean() <= 2e-3 and (rel > 0.05).mean() <= 0.02, \
        "saved-x1 route disagrees with remat route on chip"

    # ---- denoiser flavor vs Flax encoder (production widths, default
    # precision — the f32-exact math is pinned by the small-width ViT check
    # above plus the CPU interpret suite; widths here are what train runs)
    d2, nh2, L2, B2, N2 = 512, 4, 3, 64, 16
    enc = TransformerEncoder(
        d_model=d2, nhead=nh2, num_encoder_layers=L2, dim_feedforward=1024
    )
    variables = enc.init(jax.random.PRNGKey(1), jnp.zeros((2, 3, d2)))
    st2 = stack_encoder_trunk_params(variables["params"], L2)
    x2 = jnp.asarray(rng.normal(size=(B2, N2, d2)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(B2, N2)) > 0.2).astype(np.float32))
    row_bias = jnp.where(mask.astype(bool), 0.0, -1e30).astype(jnp.float32)
    seed0 = jnp.zeros((1,), jnp.int32)

    ref = jax.jit(
        lambda: enc.apply(variables, x2, mask=mask, deterministic=True)
    )()
    out = jax.jit(
        lambda: fused_encoder_trunk_train(
            x2, st2, row_bias, seed0, nh2, 32, 16, False, 0.0, False
        )
    )()
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs((out - ref) * mask[..., None]))) / scale
    print(
        f"denoiser f32 (default precision): max rel diff (valid) {err:.2e}",
        flush=True,
    )
    assert err < 2e-2, "denoiser trunk parity FAILED on TPU"

    # dropout: deterministic per seed, differs across seeds
    run = jax.jit(
        lambda s: fused_encoder_trunk_train(
            x2, st2, row_bias, s, nh2, 32, 16, False, 0.1, False
        )
    )
    a1 = np.asarray(run(jnp.array([7], jnp.int32)))
    a2 = np.asarray(run(jnp.array([7], jnp.int32)))
    b = np.asarray(run(jnp.array([8], jnp.int32)))
    assert (a1 == a2).all(), "dropout not deterministic per seed"
    assert not (a1 == b).all(), "dropout ignored the seed"
    print("denoiser dropout: deterministic per seed, seed-sensitive",
          flush=True)

    # dropout BACKWARD: central finite differences along a random direction
    # must match the analytic directional derivative.  With a fixed seed the
    # masks are constants, so this only passes if the backward kernel
    # regenerates the forward's masks bit-identically (the only_attn PRNG
    # stream contract) — executed coverage the CPU suite cannot provide.
    # Small widths + f32 precision: FD needs f32-quality loss values.
    d3, nh3, L3, B3, N3 = 128, 2, 2, 8, 8
    enc3 = TransformerEncoder(
        d_model=d3, nhead=nh3, num_encoder_layers=L3, dim_feedforward=256
    )
    var3 = enc3.init(jax.random.PRNGKey(2), jnp.zeros((2, 3, d3)))
    st3 = stack_encoder_trunk_params(var3["params"], L3)
    x3 = jnp.asarray(rng.normal(size=(B3, N3, d3)).astype(np.float32))
    rb3 = jnp.zeros((B3, N3), jnp.float32)
    v = jnp.asarray(rng.normal(size=x3.shape).astype(np.float32))
    v = v / jnp.linalg.norm(v)
    seed_d = jnp.array([7], jnp.int32)

    with jax.default_matmul_precision("float32"):
        def drop_loss(xx):
            # bchunk == B so the per-row bias block equals the full array
            # (Mosaic's (8, 128) tile rule for small test shapes)
            y = fused_encoder_trunk_train(
                xx, st3, rb3, seed_d, nh3, 8, 4, False, 0.1, False
            )
            return jnp.sum(jnp.tanh(y))

        lv, g = jax.jit(jax.value_and_grad(drop_loss))(x3)
        jl = jax.jit(drop_loss)
        eps = 3e-2
        fd = (float(jl(x3 + eps * v)) - float(jl(x3 - eps * v))) / (2 * eps)
    analytic = float(jnp.vdot(g, v))
    rel = abs(fd - analytic) / max(1e-6, abs(analytic))
    print(
        f"denoiser dropout backward (f32-precision FD): fd {fd:.6f} vs "
        f"analytic {analytic:.6f}  rel {rel:.2e}",
        flush=True,
    )
    assert rel < 1e-2, "dropout backward mask regeneration FAILED"
    assert np.isfinite(np.asarray(g)).all()

    # ---- encoder flavor at bf16 residuals WITH dropout: the saved-x1
    # backward (production denoiser_dtype=bfloat16) vs the forced-remat
    # backward, same seed — diverges unless the MLP half's full-sequence
    # mask draws stay aligned with the attention half's only_attn draws
    # while the saved x1 replaces the attention recompute.
    x3b = x3.astype(jnp.bfloat16)
    assert _vtk._save_x1_for(x3b)

    def enc_grad_bf16():
        def loss(xx):
            y = fused_encoder_trunk_train(
                xx, st3, rb3, seed_d, nh3, 8, 4, True, 0.1, False
            )
            return jnp.sum(jnp.tanh(y.astype(jnp.float32)))

        return jax.jit(jax.grad(loss))(x3b)

    eg_saved = np.asarray(enc_grad_bf16(), np.float32)
    _vtk._save_x1_for = lambda _: False
    try:
        eg_remat = np.asarray(enc_grad_bf16(), np.float32)
    finally:
        _vtk._save_x1_for = orig_gate
    esc = max(1.0, float(np.abs(eg_remat).max()))
    erel = np.abs(eg_saved - eg_remat) / esc
    print(
        f"denoiser bf16+dropout saved-x1 vs remat backward: mean rel "
        f"{erel.mean():.2e} frac>5% {float((erel > 0.05).mean()):.3f}",
        flush=True,
    )
    assert erel.mean() <= 2e-3 and (erel > 0.05).mean() <= 0.02, \
        "encoder saved-x1 route disagrees with remat route on chip"
    print("TPU SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
