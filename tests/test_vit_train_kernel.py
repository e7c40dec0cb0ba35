"""Train-path fused ViT trunk: primal + gradient parity vs the Flax blocks.

Runs the Pallas kernels in interpret mode so the full custom-VJP path
(forward kernel with saved block inputs, backward kernel with remat +
HAND-DERIVED block VJPs, partial weight-grad reduction) is exercised on
CPU — every gradient here is pinned against jax.grad through the Flax
blocks, so an algebra error in the hand-derived backward cannot pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posediffusion_tpu.models.feature_extractor import (
    MultiScaleImageFeatureExtractor,
    extract_features_train,
)
from posediffusion_tpu.models.vit import ViTBlock, VisionTransformer
from posediffusion_tpu.ops.vit_kernel import stack_vit_params
from posediffusion_tpu.ops.vit_train_kernel import fused_vit_trunk_train


def _zero_bias(N):
    return jnp.zeros((N, N), jnp.float32)


class TestFusedVitTrunkTrain:
    def _make(self, rng, depth=2, d=64, nhead=2, B=3, N=11):
        vit = VisionTransformer(
            patch_size=16, embed_dim=d, depth=depth, num_heads=nhead
        )
        img = jnp.asarray(rng.uniform(size=(B, 3, 32, 32)).astype(np.float32))
        params = vit.init(jax.random.PRNGKey(0), img)
        x = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
        r = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
        return vit, params, x, r

    def _flax_loss(self, vit, x, r):
        """Scalar loss through the plain Flax trunk blocks, as fn(params)."""

        def loss(params):
            h = x
            for i in range(vit.depth):
                block = ViTBlock(vit.embed_dim, vit.num_heads)
                h = block.apply({"params": params["params"][f"blocks_{i}"]}, h)
            return jnp.sum(h * r)

        return loss

    def _fused_loss(self, vit, x, r, bchunk=2, mc=1, act_bf16=False):
        """Same scalar loss through the fused train trunk, as fn(params)."""
        N = x.shape[1]

        def loss(params):
            stacks = stack_vit_params(
                params["params"], vit.depth, weight_dtype=jnp.float32
            )
            y = fused_vit_trunk_train(
                x, stacks, _zero_bias(N),
                vit.num_heads, bchunk, mc, act_bf16, True,
            )
            return jnp.sum(y * r)

        return loss

    def test_f32_primal_matches_flax(self, rng):
        vit, params, x, r = self._make(rng)
        ref = self._flax_loss(vit, x, r)(params)
        out = self._fused_loss(vit, x, r)(params)
        np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)

    def test_f32_grads_match_flax(self, rng):
        # the load-bearing check: custom-VJP weight + input grads == autodiff
        # through the Flax blocks (same params pytree on both sides)
        vit, params, x, r = self._make(rng)
        ref_g = jax.grad(self._flax_loss(vit, x, r))(params)
        fused_g = jax.grad(self._fused_loss(vit, x, r))(params)
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_g)
        flat_fused = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(fused_g)
        )
        assert flat_ref, "empty grad tree"
        for k, v in flat_ref:
            key = jax.tree_util.keystr(k)
            scale = max(1.0, float(jnp.max(jnp.abs(v))))
            np.testing.assert_allclose(
                np.asarray(flat_fused[key]), np.asarray(v),
                atol=2e-5 * scale, err_msg=key,
            )

    def test_f32_input_grad_matches_flax(self, rng):
        vit, params, x, r = self._make(rng)

        def ref_loss(xx):
            h = xx
            for i in range(vit.depth):
                block = ViTBlock(vit.embed_dim, vit.num_heads)
                h = block.apply({"params": params["params"][f"blocks_{i}"]}, h)
            return jnp.sum(h * r)

        stacks = stack_vit_params(
            params["params"], vit.depth, weight_dtype=jnp.float32
        )

        def fused_loss(xx):
            y = fused_vit_trunk_train(
                xx, stacks, _zero_bias(x.shape[1]),
                vit.num_heads, 2, 1, False, True,
            )
            return jnp.sum(y * r)

        ref_dx = jax.grad(ref_loss)(x)
        fused_dx = jax.grad(fused_loss)(x)
        np.testing.assert_allclose(
            np.asarray(fused_dx), np.asarray(ref_dx), atol=2e-5
        )

    def test_batch_padding_grads_inert(self, rng):
        # B=3 with bchunk=2 pads to 4: padded rows must contribute NOTHING
        # to weight grads (their dy is zero), so grads match a bchunk=1 run
        vit, params, x, r = self._make(rng, B=3)
        g_pad = jax.grad(self._fused_loss(vit, x, r, bchunk=2, mc=1))(params)
        g_exact = jax.grad(self._fused_loss(vit, x, r, bchunk=1, mc=1))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            g_pad, g_exact,
        )

    def test_bf16_grads_close(self, rng):
        # bf16 matmul casts inside the kernel: grads stay f32 and must agree
        # with bf16-cast Flax autodiff to bf16-rounding tolerance
        vit, params, x, r = self._make(rng)
        ref_g = jax.grad(self._flax_loss(vit, x, r))(params)
        fused_g = jax.grad(self._fused_loss(vit, x, r, act_bf16=True))(params)
        for (k, v), (_, w) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves_with_path(fused_g),
        ):
            assert w.dtype == v.dtype, jax.tree_util.keystr(k)
            scale = max(1.0, float(jnp.max(jnp.abs(v))))
            np.testing.assert_allclose(
                np.asarray(w), np.asarray(v), atol=0.05 * scale,
                err_msg=jax.tree_util.keystr(k),
            )

    def test_bf16_residuals_save_x1_grads_close(self, rng):
        """bf16 RESIDUALS (the production extractor dtype) engage the
        saved-x1 backward (_save_x1_for) — the MLP half reads the saved
        post-attention intermediate instead of rematerializing it.  Grads
        must still match Flax autodiff at bf16-rounding tolerance, and the
        saved-x1 route must agree with the f32 remat route's math."""
        from posediffusion_tpu.ops.vit_train_kernel import _save_x1_for

        vit, params, x, r = self._make(rng)
        xb = x.astype(jnp.bfloat16)
        assert _save_x1_for(xb) and not _save_x1_for(x)
        ref_g = jax.grad(self._flax_loss(vit, x, r))(params)

        def loss(params):
            stacks = stack_vit_params(
                params["params"], vit.depth, weight_dtype=jnp.float32
            )
            y = fused_vit_trunk_train(
                xb, stacks, _zero_bias(x.shape[1]),
                vit.num_heads, 2, 1, True, True,
            )
            return jnp.sum(y.astype(jnp.float32) * r)

        fused_g = jax.grad(loss)(params)
        for (k, v), (_, w) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves_with_path(fused_g),
        ):
            scale = max(1.0, float(jnp.max(jnp.abs(v))))
            np.testing.assert_allclose(
                np.asarray(w), np.asarray(v), atol=0.07 * scale,
                err_msg=jax.tree_util.keystr(k),
            )

    def test_extractor_train_path_matches_flax_extractor(self, rng):
        # end-to-end: patch embed + pos + packed trunk + CLS head, value AND
        # grads w.r.t. the full extractor variables
        ext = MultiScaleImageFeatureExtractor(
            scale_factors=(1.0, 0.5), patch_size=16, embed_dim=64,
            depth=2, num_heads=2,
        )
        img = jnp.asarray(rng.uniform(size=(3, 3, 64, 64)).astype(np.float32))
        variables = ext.init(jax.random.PRNGKey(1), img)
        r = jnp.asarray(rng.normal(size=(3, 64)).astype(np.float32))

        def ref_loss(v):
            return jnp.sum(ext.apply(v, img) * r)

        def fused_loss(v):
            z = extract_features_train(
                v, img, scale_factors=(1.0, 0.5), patch_size=16,
                embed_dim=64, depth=2, num_heads=2,
                bchunk=2, mc=1, interpret=True,
            )
            return jnp.sum(z * r)

        ref_val, ref_g = jax.value_and_grad(ref_loss)(variables)
        fused_val, fused_g = jax.value_and_grad(fused_loss)(variables)
        np.testing.assert_allclose(float(fused_val), float(ref_val), rtol=1e-4)
        for (k, v), (_, w) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves_with_path(fused_g),
        ):
            scale = max(1.0, float(jnp.max(jnp.abs(v))))
            np.testing.assert_allclose(
                np.asarray(w), np.asarray(v), atol=5e-5 * scale,
                err_msg=jax.tree_util.keystr(k),
            )

    def test_layer_scale_grads_match_flax(self, rng):
        """DINOv2 LayerScale flavor: value + grads (incl. ls gammas) vs the
        Flax blocks with layer_scale=True."""
        from posediffusion_tpu.ops.vit_train_kernel import (
            fused_vit_trunk_train,
            stack_vit_params_train,
        )

        d, nhead, L, B, N = 64, 2, 2, 3, 9
        vit = VisionTransformer(
            patch_size=16, embed_dim=d, depth=L, num_heads=nhead,
            layer_scale=True,
        )
        img = jnp.asarray(rng.uniform(size=(B, 3, 32, 32)).astype(np.float32))
        params = vit.init(jax.random.PRNGKey(0), img)
        # non-trivial gammas so the test actually exercises the scaling
        params = jax.tree.map(
            lambda a: a * 0.7 if a.ndim == 1 else a, params
        )
        x = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
        r = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))

        def ref_loss(p):
            h = x
            for i in range(L):
                h = ViTBlock(d, nhead, layer_scale=True).apply(
                    {"params": p["params"][f"blocks_{i}"]}, h
                )
            return jnp.sum(h * r)

        def fused_loss(p):
            stacks = stack_vit_params_train(
                p["params"], L, layer_scale=True
            )
            y = fused_vit_trunk_train(
                x, stacks, _zero_bias(N), nhead, 2, 1, False, True, True
            )
            return jnp.sum(y * r)

        ref_val, ref_g = jax.value_and_grad(ref_loss)(params)
        fused_val, fused_g = jax.value_and_grad(fused_loss)(params)
        np.testing.assert_allclose(float(fused_val), float(ref_val), rtol=1e-5)
        flat_fused = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(fused_g)
        )
        saw_gamma = 0
        for k, v in jax.tree_util.tree_leaves_with_path(ref_g):
            key = jax.tree_util.keystr(k)
            saw_gamma += int("gamma" in key)
            scale = max(1.0, float(jnp.max(jnp.abs(v))))
            np.testing.assert_allclose(
                np.asarray(flat_fused[key]), np.asarray(v),
                atol=2e-5 * scale, err_msg=key,
            )
        assert saw_gamma == 2 * L  # ls1+ls2 per block actually checked

    def test_encoder_trunk_matches_flax_encoder(self, rng):
        """fused_encoder_trunk_train (relu, eps 1e-5, per-row bias) vs the
        Flax TransformerEncoder in eval mode — value and grads."""
        from posediffusion_tpu.models.layers import TransformerEncoder
        from posediffusion_tpu.ops.vit_train_kernel import (
            fused_encoder_trunk_train,
            stack_encoder_trunk_params,
        )

        d, nhead, L, B, N = 64, 2, 2, 5, 6
        enc = TransformerEncoder(
            d_model=d, nhead=nhead, num_encoder_layers=L,
            dim_feedforward=2 * d, dropout=0.1,
        )
        x = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
        r = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
        mask = jnp.asarray((rng.uniform(size=(B, N)) > 0.3).astype(np.float32))
        variables = enc.init(jax.random.PRNGKey(0), x, mask=mask)
        row_bias = jnp.where(mask.astype(bool), 0.0, -1e30).astype(jnp.float32)
        seed = jnp.zeros((1,), jnp.int32)

        def ref_loss(v):
            # padded frames produce garbage rows: weight by the mask like
            # the diffusion loss does
            y = enc.apply(v, x, mask=mask, deterministic=True)
            return jnp.sum(y * r * mask[..., None])

        def fused_loss(v):
            stacks = stack_encoder_trunk_params(v["params"], L)
            y = fused_encoder_trunk_train(
                x, stacks, row_bias, seed, nhead, 4, 2, False, 0.0, True
            )
            return jnp.sum(y * r * mask[..., None])

        ref_val, ref_g = jax.value_and_grad(ref_loss)(variables)
        fused_val, fused_g = jax.value_and_grad(fused_loss)(variables)
        np.testing.assert_allclose(float(fused_val), float(ref_val), rtol=1e-5)
        for (k, v), (_, w) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves_with_path(fused_g),
        ):
            scale = max(1.0, float(jnp.max(jnp.abs(v))))
            np.testing.assert_allclose(
                np.asarray(w), np.asarray(v), atol=5e-5 * scale,
                err_msg=jax.tree_util.keystr(k),
            )

    def test_encoder_trunk_bf16_residuals_save_x1(self, rng, monkeypatch):
        """bf16 residuals engage save-x1 in the ENCODER flavor too
        (production denoiser_dtype=bfloat16).  The saved-x1 backward must
        match the remat backward to bf16-ULP scale: the stored x1 is the
        remat value rounded once more to bf16 (XLA's excess-precision pass
        keeps the in-kernel x1 wider than the materialized store), so the
        routes agree to ~2^-8 relative except where that ULP flips a ReLU
        active-set member (isolated elements with O(contribution) jumps) —
        so the guard is statistical: a wrong saved1 layer/chunk would put
        EVERY element off at O(scale), kink flips only a few."""
        from posediffusion_tpu.models.layers import TransformerEncoder
        from posediffusion_tpu.ops import vit_train_kernel as vtk

        d, nhead, L, B, N = 64, 2, 2, 5, 6
        enc = TransformerEncoder(
            d_model=d, nhead=nhead, num_encoder_layers=L,
            dim_feedforward=2 * d,
        )
        x = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
        xb = x.astype(jnp.bfloat16)
        assert vtk._save_x1_for(xb) and not vtk._save_x1_for(x)
        r = jnp.asarray(rng.normal(size=(B, N, d)).astype(np.float32))
        variables = enc.init(jax.random.PRNGKey(0), x)
        row_bias = jnp.zeros((B, N), jnp.float32)
        seed = jnp.zeros((1,), jnp.int32)

        def fused_loss(v):
            stacks = vtk.stack_encoder_trunk_params(v["params"], L)
            y = vtk.fused_encoder_trunk_train(
                xb, stacks, row_bias, seed, nhead, 4, 2, True, 0.0, True
            )
            return jnp.sum(y.astype(jnp.float32) * r)

        g_saved = jax.grad(fused_loss)(variables)
        monkeypatch.setattr(vtk, "_save_x1_for", lambda _: False)
        g_remat = jax.grad(fused_loss)(variables)

        rel = []
        for a, b in zip(jax.tree.leaves(g_saved), jax.tree.leaves(g_remat)):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            scale = max(1.0, float(np.abs(b).max()))
            rel.append((np.abs(a - b) / scale).ravel())
        rel = np.concatenate(rel)
        assert rel.mean() <= 2e-3
        assert (rel > 0.05).mean() <= 0.02

    def test_denoiser_train_apply_matches_flax_denoiser(self, rng):
        """Full denoiser train path (embeddings + trunk kernel + head) vs
        Denoiser.apply in deterministic mode — value and grads."""
        from posediffusion_tpu.models.denoiser import (
            Denoiser,
            denoiser_train_apply,
        )

        B, N, zd = 5, 4, 16
        den = Denoiser(
            z_dim=zd, d_model=32, nhead=2, num_encoder_layers=2,
            dim_feedforward=64, mlp_hidden_dim=16,
        )
        x = jnp.asarray(rng.normal(size=(B, N, 9)).astype(np.float32) * 0.3)
        t = jnp.asarray(rng.integers(0, 100, size=(B,)).astype(np.int32))
        z = jnp.asarray(rng.normal(size=(B, N, zd)).astype(np.float32))
        mask = jnp.asarray((rng.uniform(size=(B, N)) > 0.25).astype(np.float32))
        variables = den.init(jax.random.PRNGKey(0), x, t, z)
        r = jnp.asarray(rng.normal(size=(B, N, 9)).astype(np.float32))

        def ref_loss(v):
            y = den.apply(v, x, t, z, mask=mask)
            return jnp.sum(y * r * mask[..., None])

        def fused_loss(v):
            y = denoiser_train_apply(
                v, x, t, z, mask=mask, nhead=2, num_encoder_layers=2,
                dropout_rate=0.0, bchunk=4, mc=2, interpret=True,
            )
            return jnp.sum(y * r * mask[..., None])

        ref_val, ref_g = jax.value_and_grad(ref_loss)(variables)
        fused_val, fused_g = jax.value_and_grad(fused_loss)(variables)
        np.testing.assert_allclose(float(fused_val), float(ref_val), rtol=1e-5)
        for (k, v), (_, w) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves_with_path(fused_g),
        ):
            scale = max(1.0, float(jnp.max(jnp.abs(v))))
            np.testing.assert_allclose(
                np.asarray(w), np.asarray(v), atol=5e-5 * scale,
                err_msg=jax.tree_util.keystr(k),
            )

    def test_block_diag_bias_segments_independent(self, rng):
        # scale-packing contract: grads under a block-diagonal bias equal
        # grads of per-segment runs
        vit, params, x, r = self._make(rng, N=8)
        n1 = 5
        seg = np.concatenate([np.zeros(n1), np.ones(x.shape[1] - n1)])
        bias = jnp.asarray(
            np.where(seg[:, None] == seg[None, :], 0.0, -1e30).astype(np.float32)
        )
        stacks = stack_vit_params(
            params["params"], vit.depth, weight_dtype=jnp.float32
        )

        def packed(xx):
            y = fused_vit_trunk_train(
                xx, stacks, bias, vit.num_heads, 2, 1, False, True
            )
            return jnp.sum(y * r)

        def split(xx):
            ya = fused_vit_trunk_train(
                xx[:, :n1], stacks, _zero_bias(n1),
                vit.num_heads, 2, 1, False, True,
            )
            yb = fused_vit_trunk_train(
                xx[:, n1:], stacks, _zero_bias(x.shape[1] - n1),
                vit.num_heads, 2, 1, False, True,
            )
            return jnp.sum(ya * r[:, :n1]) + jnp.sum(yb * r[:, n1:])

        np.testing.assert_allclose(
            float(packed(x)), float(split(x)), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(jax.grad(packed)(x)), np.asarray(jax.grad(split)(x)),
            atol=2e-5,
        )


class TestDropMaskStreamContract:
    """CPU guard for the dropout draw-order contract.

    The encoder-trunk backward regenerates the forward's dropout masks by
    re-seeding the in-kernel PRNG and drawing only the LEADING sites of
    the stream (``only_attn=True``), so the attention sites must stay
    first in ``_DROP_SITES`` and nothing may draw before them.  The
    executed on-chip guard is the TPU smoke's finite-difference check
    (experiments/tpu_smoke_train_kernels.py); this pins the same contract
    on CPU — where prng_seed has no lowering — by substituting the Mosaic
    PRNG primitives with a deterministic *sequential* stub.  Like the real
    hardware PRNG, the stub's output is a pure function of the seeded
    state and the draw order, so any reordering of ``_DROP_SITES`` or a
    new draw site inserted ahead of the attention masks breaks the
    bit-identity assertion here without needing a chip.
    """

    def _stub_prng(self, monkeypatch):
        from posediffusion_tpu.ops import vit_train_kernel as k

        state = {}

        def prng_seed(*scalars):
            state["gen"] = np.random.Generator(
                np.random.Philox(key=[int(s) & 0xFFFFFFFF for s in scalars])
            )

        def prng_random_bits(shape):
            return jnp.asarray(
                state["gen"].integers(0, 1 << 32, size=shape, dtype=np.uint32)
            )

        monkeypatch.setattr(k.pltpu, "prng_seed", prng_seed)
        monkeypatch.setattr(k.pltpu, "prng_random_bits", prng_random_bits)
        return k

    def test_only_attn_draws_match_leading_full_draws(self, monkeypatch):
        k = self._stub_prng(monkeypatch)
        seed_ref = np.array([7], np.int32)
        shape_args = dict(mc=2, N=4, D=8, F=16, nhead=2, rate=0.1)
        full = k._gen_drop_masks(seed_ref, 3, **shape_args)
        attn = k._gen_drop_masks(seed_ref, 3, **shape_args, only_attn=True)
        assert len(full) == len(k._DROP_SITES)
        assert len(attn) == k._ATTN_SITES
        for a, f in zip(attn, full):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(f))
        # the backward's mask routing slices at position 2
        # (vit_train_kernel.py `masks[:2]` / `masks[2:]`): pin the split
        assert k._ATTN_SITES == 2
        assert k._DROP_SITES[:2] == ("attn", "m1")

    def test_masks_are_inverted_dropout_and_stream_sensitive(
        self, monkeypatch
    ):
        k = self._stub_prng(monkeypatch)
        seed_ref = np.array([7], np.int32)
        rate = 0.25
        m = k._gen_drop_masks(seed_ref, 0, 2, 4, 8, 16, 2, rate)
        for mask in m:
            vals = np.unique(np.asarray(mask))
            assert set(vals).issubset({0.0, np.float32(1.0 / (1.0 - rate))})
        m2 = k._gen_drop_masks(seed_ref, 1, 2, 4, 8, 16, 2, rate)
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(m, m2)
        )
        # same (seed, stream) -> bit-identical (determinism)
        m3 = k._gen_drop_masks(seed_ref, 0, 2, 4, 8, 16, 2, rate)
        for a, b in zip(m, m3):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_drop_stream_injective_over_grid(self):
        from posediffusion_tpu.ops.vit_train_kernel import _drop_stream

        L, n_c, n_mc = 8, 23, 16
        seen = {
            _drop_stream(l, c, i, n_c, n_mc)
            for l in range(L)
            for c in range(n_c)
            for i in range(n_mc)
        }
        assert len(seen) == L * n_c * n_mc
