"""Real-TPU smoke for the fused train-trunk kernels (small shapes).

Runs BOTH fused train trunks (ViT flavor and denoiser flavor) on the chip
with Mosaic (interpret=False), pins value + grads against the Flax paths
computed on the same device, and sanity-checks in-kernel dropout
determinism (same seed -> same output, different seed -> different).

This is the first thing to run after a relay outage: it catches Mosaic
compile regressions and VMEM budget violations in seconds at small
shapes, before the full-scale benches.
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.models.layers import TransformerEncoder
    from posediffusion_tpu.models.vit import ViTBlock, VisionTransformer
    from posediffusion_tpu.ops.vit_kernel import stack_vit_params
    from posediffusion_tpu.ops.vit_train_kernel import (
        fused_encoder_trunk_train,
        fused_vit_trunk_train,
        stack_encoder_trunk_params,
    )

    rng = np.random.default_rng(0)
    print("devices:", jax.devices())

    # ---- ViT flavor: f32 exact vs Flax blocks
    d, nhead, L, B, N = 384, 6, 3, 16, 264
    vit = VisionTransformer(patch_size=16, embed_dim=d, depth=L, num_heads=nhead)
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
        y = fused_vit_trunk_train(xx, stacks, bias, nhead, 8, 4, False, False)
        return jnp.sum(y * r)

    rv, rg = jax.jit(jax.value_and_grad(flax_loss))(x)
    fv, fg = jax.jit(jax.value_and_grad(fused_loss))(x)
    dv = abs(float(fv) - float(rv)) / max(1.0, abs(float(rv)))
    dg = float(jnp.max(jnp.abs(fg - rg))) / max(
        1.0, float(jnp.max(jnp.abs(rg)))
    )
    print(f"vit f32: value rel-diff {dv:.2e}  max grad rel-diff {dg:.2e}")
    assert dv < 1e-4 and dg < 1e-3, "ViT trunk parity FAILED on TPU"

    # bf16 flavor compiles + runs
    yb = jax.jit(
        lambda xx: fused_vit_trunk_train(
            xx.astype(jnp.bfloat16), stacks, bias, nhead, 8, 4, True, False
        )
    )(x)
    assert np.isfinite(np.asarray(yb, np.float32)).all()
    print("vit bf16: compiled + finite")

    # ---- denoiser flavor: f32 exact vs Flax encoder, dropout determinism
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
    err = float(jnp.max(jnp.abs((out - ref) * mask[..., None])))
    print(f"denoiser f32: max abs diff (valid frames) {err:.2e}")
    assert err < 1e-3, "denoiser trunk parity FAILED on TPU"

    # dropout: deterministic per seed, differs across seeds, keeps ~90%
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
    # gradient path with dropout compiles
    g = jax.jit(
        jax.grad(
            lambda xx: jnp.sum(
                fused_encoder_trunk_train(
                    xx, st2, row_bias, seed0, nh2, 32, 16, False, 0.1, False
                )
            )
        )
    )(x2)
    assert np.isfinite(np.asarray(g)).all()
    print("denoiser dropout: deterministic per seed, grad path finite")
    print("TPU SMOKE OK")


if __name__ == "__main__":
    main()
