"""Hand-derived GGS Sampson gradient vs autodiff golden."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posediffusion_tpu.diffusion.ggs import compute_sampson_loss, pack_matches
from posediffusion_tpu.ops.ggs_grad import (
    GroupedMatches,
    pack_matches_grouped,
    sampson_loss_and_grad,
)
from tests.test_diffusion import make_gt_scene


def setup_case(rng, n=6, n_points=40, perturb=0.05):
    cam, kp1, kp2, i12 = make_gt_scene(rng, n=n, n_points=n_points)
    from posediffusion_tpu.geometry import camera_to_pose_encoding

    enc = np.asarray(camera_to_pose_encoding(cam)).reshape(n, 9)
    x = enc + rng.normal(size=enc.shape).astype(np.float32) * perturb
    gm = pack_matches_grouped(kp1, kp2, i12, n)
    flat = pack_matches(kp1, kp2, i12, n, pad_to=2048)
    return jnp.asarray(x), gm, flat


FLAG_SETS = [
    (True, True, True),
    (False, False, True),
    (True, False, False),
    (False, True, False),
]


class TestManualGradient:
    @pytest.mark.parametrize("flags", FLAG_SETS)
    def test_matches_autodiff(self, rng, flags):
        uR, uT, uF = flags
        x, gm, flat = setup_case(rng)
        hw = (224, 224)

        # autodiff golden via the reference (flat-match) formulation
        def ref_loss(xb):
            loss, cnt = compute_sampson_loss(
                xb[None], flat, hw, uR, uT, uF, 10.0
            )
            return loss, cnt

        (loss_ref, cnt_ref), g_ref = jax.value_and_grad(ref_loss, has_aux=True)(x)

        loss, cnt, g = sampson_loss_and_grad(x, gm, hw, uR, uT, uF, 10.0)

        assert int(cnt) == int(cnt_ref)
        np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=2e-3, atol=2e-5
        )

    def test_matches_autodiff_of_grouped_forward(self, rng):
        """Gradient also matches autodiff of the grouped forward itself
        (removes the flat-vs-grouped layout from the comparison)."""
        x, gm, _ = setup_case(rng)
        hw = (224, 224)

        def fwd(xb):
            loss, _, _ = sampson_loss_and_grad(xb, gm, hw, True, True, True, 10.0)
            return loss

        g_auto = jax.grad(fwd)(x)
        _, _, g_manual = sampson_loss_and_grad(x, gm, hw, True, True, True, 10.0)
        np.testing.assert_allclose(
            np.asarray(g_manual), np.asarray(g_auto), rtol=1e-4, atol=1e-6
        )

    def test_loss_zero_on_gt(self, rng):
        cam, kp1, kp2, i12 = make_gt_scene(rng, n=5)
        from posediffusion_tpu.geometry import camera_to_pose_encoding

        enc = jnp.asarray(np.asarray(camera_to_pose_encoding(cam)).reshape(5, 9))
        gm = pack_matches_grouped(kp1, kp2, i12, 5)
        loss, cnt, g = sampson_loss_and_grad(enc, gm, (224, 224), True, True, True, 10.0)
        assert float(loss) < 1e-3
        assert np.isfinite(np.asarray(g)).all()

    def test_fused_phase_matches_autodiff_phase(self, rng):
        """Full SGD phase through the Pallas kernel (interpret mode) equals
        the jnp/autodiff phase."""
        from posediffusion_tpu.diffusion.ggs import GGSConfig, _ggs_phase
        from posediffusion_tpu.ops.ggs_kernel import ggs_phase_fused

        x, gm, flat = setup_case(rng)
        cfg = GGSConfig(iter_num=15)
        ref = _ggs_phase(x[None], flat, (224, 224), cfg)
        out = ggs_phase_fused(
            x, gm, (224, 224), True, True, True, 10.0,
            iters=30, lr=cfg.learning_rate, momentum=cfg.momentum,
            alpha=cfg.alpha, min_matches=float(cfg.min_matches),
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref[0]), atol=5e-5
        )

    def test_fused_early_stop(self, rng):
        """Below min_matches the fused phase must leave x untouched."""
        from posediffusion_tpu.ops.ggs_kernel import ggs_phase_fused

        x, gm, _ = setup_case(rng)
        # mark all but 5 matches invalid -> count/N < min_matches
        gm = gm._replace(valid=gm.valid.at[:, 5:].set(0.0).at[1:].set(0.0))
        out = ggs_phase_fused(
            x, gm, (224, 224), True, True, True, 10.0,
            iters=10, lr=0.01, momentum=0.9, alpha=1e-4, min_matches=10.0,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_chunked_phase_matches_resident(self, rng):
        """Pair-chunked streaming kernel == VMEM-resident kernel: the
        backward is linear in the upstream adjoint, so per-chunk
        unnormalized gradients summed then divided by the global count must
        reproduce the single-block result exactly (including P-padding)."""
        from posediffusion_tpu.diffusion.ggs import GGSConfig
        from posediffusion_tpu.ops.ggs_kernel import (
            ggs_phase_fused,
            ggs_phase_fused_chunked,
        )

        x, gm, _ = setup_case(rng, n=6)  # P = 15 pairs -> pads to 16
        cfg = GGSConfig(iter_num=15)
        kw = dict(
            iters=30, lr=cfg.learning_rate, momentum=cfg.momentum,
            alpha=cfg.alpha, min_matches=float(cfg.min_matches),
            interpret=True,
        )
        ref = ggs_phase_fused(x, gm, (224, 224), True, True, True, 10.0, **kw)
        out = ggs_phase_fused_chunked(
            x, gm, (224, 224), True, True, True, 10.0, chunk_pairs=4, **kw
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_chunked_early_stop(self, rng):
        """Sticky early-stop must aggregate the count across chunks."""
        from posediffusion_tpu.ops.ggs_kernel import ggs_phase_fused_chunked

        x, gm, _ = setup_case(rng)
        gm = gm._replace(valid=gm.valid.at[:, 5:].set(0.0).at[1:].set(0.0))
        out = ggs_phase_fused_chunked(
            x, gm, (224, 224), True, True, True, 10.0,
            iters=10, lr=0.01, momentum=0.9, alpha=1e-4, min_matches=10.0,
            chunk_pairs=4, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_pad_grouped_pairs_inert(self, rng):
        """P-padding rows change neither loss, count, nor gradient."""
        from posediffusion_tpu.ops.ggs_grad import pad_grouped_pairs

        x, gm, _ = setup_case(rng)
        padded = pad_grouped_pairs(gm, 8)
        assert padded.kp1.shape[0] % 8 == 0
        l0, c0, g0 = sampson_loss_and_grad(x, gm, (224, 224), True, True, True, 10.0)
        l1, c1, g1 = sampson_loss_and_grad(x, padded, (224, 224), True, True, True, 10.0)
        assert int(c0) == int(c1)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        # pad rows contribute exact zeros; the only delta is f32 matmul
        # reassociation from the changed contraction size (P 15 -> 16)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-4, atol=1e-5)

    def test_grouped_packing_structure(self, rng):
        cam, kp1, kp2, i12 = make_gt_scene(rng, n=4, n_points=10)
        gm = pack_matches_grouped(kp1, kp2, i12, 4)
        P = 4 * 3 // 2
        assert gm.kp1.shape[0] == P
        assert gm.valid.shape == gm.kp1.shape[:2]
        assert int(gm.valid.sum()) == len(kp1)
        # B selects ordered pairs
        np.testing.assert_allclose(np.asarray(gm.B1.sum(1)), 1.0)
        np.testing.assert_allclose(np.asarray(gm.B2.sum(1)), 1.0)
