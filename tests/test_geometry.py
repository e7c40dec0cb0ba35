"""Geometry-core unit tests: conventions, round trips, epipolar invariants.

Where a torch twin is cheap to state (quaternion formulas, SE3 inverse), we
cross-check against an independent formulation; epipolar identities are
checked on synthetic camera rigs where the constraint must vanish.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posediffusion_tpu.geometry import (
    PerspectiveCameras,
    align_cameras,
    batched_all_pairs,
    calculate_auc_np,
    camera_center,
    camera_to_pose_encoding,
    camera_to_rel_deg,
    cameras_to_opencv,
    compute_are,
    get_fundamental_matrices,
    hat,
    matrix_to_quaternion,
    normalize_cameras,
    pose_encoding_to_camera,
    quaternion_to_matrix,
    rotation_angle_deg,
    sampson_distance,
    se3_inverse,
    se3_matrix,
    translation_angle_deg,
    world_to_view_matrix,
)
from posediffusion_tpu.geometry.normalize import (
    compute_optical_axis_intersection,
    first_camera_transform,
)


def random_rotations(rng, n):
    """Uniform-ish random rotations via QR of Gaussians, det fixed to +1."""
    A = rng.normal(size=(n, 3, 3))
    Q, _ = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q[:, :, 0] *= det[:, None]
    return Q


def random_cameras(rng, n, fl_lo=1.0, fl_hi=3.0):
    R = random_rotations(rng, n)
    T = rng.normal(size=(n, 3)) * 0.5 + np.array([0, 0, 3.0])
    fl = rng.uniform(fl_lo, fl_hi, size=(n, 2))
    pp = rng.uniform(-0.1, 0.1, size=(n, 2))
    return PerspectiveCameras.create(R=R, T=T, focal_length=fl, principal_point=pp)


class TestQuaternions:
    def test_round_trip_matrix_quat_matrix(self, rng):
        R = random_rotations(rng, 64)
        q = matrix_to_quaternion(jnp.asarray(R))
        R2 = quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_round_trip_quat_matrix_quat_up_to_sign(self, rng):
        q = rng.normal(size=(64, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q2 = np.asarray(matrix_to_quaternion(quaternion_to_matrix(jnp.asarray(q))))
        sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-5)

    def test_non_unit_quaternion_gives_rotation(self, rng):
        q = jnp.asarray(rng.normal(size=(16, 4)) * 3.0)
        R = quaternion_to_matrix(q)
        eye = jnp.matmul(R, jnp.swapaxes(R, -1, -2))
        np.testing.assert_allclose(np.asarray(eye), np.eye(3)[None].repeat(16, 0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)

    def test_matches_torch_formulas(self, rng):
        torch = pytest.importorskip("torch")
        q = rng.normal(size=(32, 4)).astype(np.float32)
        # torch twin of the normalized quaternion -> matrix map
        tq = torch.tensor(q)
        tq_n = tq / tq.norm(dim=-1, keepdim=True)
        w, x, y, z = tq_n.unbind(-1)
        R_t = torch.stack(
            [
                1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
                2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
                2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
            ],
            dim=-1,
        ).reshape(-1, 3, 3)
        R_j = quaternion_to_matrix(jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(R_j), R_t.numpy(), atol=1e-5)


class TestSE3:
    def test_matrix_layout_row_vector(self, rng):
        R = jnp.asarray(random_rotations(rng, 4))
        T = jnp.asarray(rng.normal(size=(4, 3)))
        M = se3_matrix(R, T)
        assert M.shape == (4, 4, 4)
        np.testing.assert_allclose(np.asarray(M[:, 3, :3]), np.asarray(T))
        np.testing.assert_allclose(np.asarray(M[:, :3, 3]), 0.0)
        np.testing.assert_allclose(np.asarray(M[:, 3, 3]), 1.0)

    def test_closed_form_inverse_vs_linalg(self, rng):
        R = jnp.asarray(random_rotations(rng, 8))
        T = jnp.asarray(rng.normal(size=(8, 3)))
        M = se3_matrix(R, T)
        np.testing.assert_allclose(
            np.asarray(se3_inverse(M)), np.linalg.inv(np.asarray(M)), atol=1e-5
        )


class TestCameras:
    def test_camera_center(self, rng):
        cam = random_cameras(rng, 8)
        C = camera_center(cam)
        # x_view = C @ R + T must be 0
        view = jnp.einsum("nk,nkj->nj", C, cam.R) + cam.T
        np.testing.assert_allclose(np.asarray(view), 0.0, atol=1e-5)

    def test_opencv_conversion_projection_consistency(self, rng):
        """A world point projected through NDC cameras and through the OpenCV
        decomposition must land on the same pixel."""
        cam = random_cameras(rng, 6)
        h, w = 240, 320
        X = rng.normal(size=(6, 3)) * 0.2  # world points near origin

        # NDC projection: x_view = X R + T; ndc = f * xy / z + pp
        Xj = jnp.asarray(X)
        xv = jnp.einsum("nk,nkj->nj", Xj, cam.R) + cam.T
        ndc = cam.focal_length * xv[:, :2] / xv[:, 2:3] + cam.principal_point
        # NDC -> pixel: +X left, +Y up, shorter side spans [-1, 1]
        s = min(h, w) / 2.0
        px_ndc_x = -ndc[:, 0] * s + w / 2.0
        px_ndc_y = -ndc[:, 1] * s + h / 2.0

        R_cv, t_cv, K = cameras_to_opencv(cam, (h, w))
        xc = jnp.einsum("nij,nj->ni", R_cv, Xj) + t_cv
        pix = jnp.einsum("nij,nj->ni", K, xc)
        pix = pix[:, :2] / pix[:, 2:3]

        np.testing.assert_allclose(np.asarray(pix[:, 0]), np.asarray(px_ndc_x), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(pix[:, 1]), np.asarray(px_ndc_y), rtol=1e-4, atol=1e-3)


class TestPoseCodec:
    def test_round_trip(self, rng):
        cam = random_cameras(rng, 10)
        enc = camera_to_pose_encoding(cam)
        assert enc.shape == (10, 9)
        cam2 = pose_encoding_to_camera(enc)
        np.testing.assert_allclose(np.asarray(cam2.R), np.asarray(cam.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(cam2.T), np.asarray(cam.T), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(cam2.focal_length), np.asarray(cam.focal_length), rtol=1e-5
        )

    def test_focal_clamping(self):
        enc = jnp.zeros((2, 9)).at[:, 7:9].set(jnp.asarray([[10.0], [-10.0]]))
        cam = pose_encoding_to_camera(enc)
        np.testing.assert_allclose(np.asarray(cam.focal_length[0]), 20.0)
        np.testing.assert_allclose(np.asarray(cam.focal_length[1]), 0.1)

    def test_batched_input_flattens(self, rng):
        enc = jnp.asarray(rng.normal(size=(2, 5, 9)))
        cam = pose_encoding_to_camera(enc)
        assert cam.R.shape == (10, 3, 3)

    def test_differentiable(self, rng):
        enc = jnp.asarray(rng.normal(size=(1, 3, 9)).astype(np.float32))

        def loss(e):
            cam = pose_encoding_to_camera(e)
            return jnp.sum(cam.R**2) + jnp.sum(cam.T**2)

        g = jax.grad(loss)(enc)
        assert np.all(np.isfinite(np.asarray(g)))


class TestEpipolar:
    def test_hat(self):
        v = jnp.asarray([[1.0, 2.0, 3.0]])
        w = jnp.asarray([[4.0, 5.0, 6.0]])
        cross = jnp.cross(v, w)
        np.testing.assert_allclose(
            np.asarray(jnp.einsum("nij,nj->ni", hat(v), w)), np.asarray(cross), atol=1e-6
        )

    def test_epipolar_constraint_zero_for_true_geometry(self, rng):
        """Project common world points into two cameras; p2^T F p1 == 0."""
        n = 2
        cam = random_cameras(rng, n)
        h, w = 224, 224
        R_cv, t_cv, K = cameras_to_opencv(cam, (h, w))
        X = rng.normal(size=(50, 3)) * 0.3

        def project(i):
            xc = np.einsum("ij,nj->ni", np.asarray(R_cv[i]), X) + np.asarray(t_cv[i])
            pix = np.einsum("ij,nj->ni", np.asarray(K[i]), xc)
            return pix[:, :2] / pix[:, 2:3]

        p1 = project(0)
        p2 = project(1)
        F = get_fundamental_matrices(
            cam, h, w, jnp.asarray([0]), jnp.asarray([1])
        )  # p2^T F p1 = 0
        p1h = np.concatenate([p1, np.ones((50, 1))], axis=1)
        p2h = np.concatenate([p2, np.ones((50, 1))], axis=1)
        resid = np.einsum("ni,ij,nj->n", p2h, np.asarray(F[0]), p1h)
        # normalize by F scale to make the tolerance meaningful
        resid /= np.linalg.norm(np.asarray(F[0]))
        np.testing.assert_allclose(resid, 0.0, atol=1e-2)

    def test_sampson_zero_on_perfect_matches(self, rng):
        n = 3
        cam = random_cameras(rng, n)
        h, w = 224, 224
        R_cv, t_cv, K = cameras_to_opencv(cam, (h, w))
        X = rng.normal(size=(30, 3)) * 0.3

        def project(i):
            xc = np.einsum("ij,nj->ni", np.asarray(R_cv[i]), X) + np.asarray(t_cv[i])
            pix = np.einsum("ij,nj->ni", np.asarray(K[i]), xc)
            return pix[:, :2] / pix[:, 2:3]

        kp1 = project(0)
        kp2 = project(1)
        F12 = get_fundamental_matrices(cam, h, w, jnp.asarray([0]), jnp.asarray([1]))
        # sampson_distance expects kp1^T F kp2 = 0 => transpose pairwise F
        F = jnp.swapaxes(F12, -1, -2)
        kp1h = jnp.asarray(np.concatenate([kp1, np.ones((30, 1))], 1), jnp.float32)
        kp2h = jnp.asarray(np.concatenate([kp2, np.ones((30, 1))], 1), jnp.float32)
        d = sampson_distance(jnp.broadcast_to(F[0], (30, 3, 3)), kp1h, kp2h)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-3)

    def test_sampson_positive_on_noisy_matches(self, rng):
        cam = random_cameras(rng, 2)
        F = get_fundamental_matrices(cam, 224, 224, jnp.asarray([0]), jnp.asarray([1]))
        kp = jnp.asarray(rng.uniform(0, 224, size=(20, 3)).astype(np.float32))
        kp = kp.at[:, 2].set(1.0)
        d = sampson_distance(jnp.broadcast_to(F[0].T, (20, 3, 3)), kp, kp)
        assert float(jnp.mean(d)) > 0


class TestNormalize:
    def test_optical_axes_intersect_at_lookat_point(self, rng):
        """Cameras constructed to look at a common point must have their
        optical-axis intersection there."""
        target = np.array([0.3, -0.2, 0.1])
        centers = rng.normal(size=(6, 3)) * 2 + np.array([0, 0, -5.0])
        Rs = []
        Ts = []
        for c in centers:
            z = target - c
            z = z / np.linalg.norm(z)
            x = np.cross([0.0, 1.0, 0.0], z)
            x /= np.linalg.norm(x)
            y = np.cross(z, x)
            # row-vector world-to-view: columns of R are view axes expressed in
            # world coords transposed; x_view = (x_world - C) @ R with R = [x y z]
            R = np.stack([x, y, z], axis=1)
            Rs.append(R)
            Ts.append(-c @ R)
        cam = PerspectiveCameras.create(
            R=np.stack(Rs), T=np.stack(Ts), focal_length=np.full((6, 2), 2.0)
        )
        p, dist = compute_optical_axis_intersection(cam)
        np.testing.assert_allclose(np.asarray(p), target, atol=1e-4)

    def test_first_camera_transform_gauge(self, rng):
        cam = random_cameras(rng, 5)
        out = first_camera_transform(cam)
        np.testing.assert_allclose(np.asarray(out.R[0]), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.T[0]), 0.0, atol=1e-5)
        # relative poses are gauge invariant
        rel_before = np.asarray(
            jnp.matmul(se3_inverse(world_to_view_matrix(cam))[:1], world_to_view_matrix(cam))
        )
        rel_after = np.asarray(
            jnp.matmul(se3_inverse(world_to_view_matrix(out))[:1], world_to_view_matrix(out))
        )
        np.testing.assert_allclose(rel_after, rel_before, atol=1e-4)

    def test_normalize_cameras_first_distance_one(self, rng):
        cam = random_cameras(rng, 5)
        out = normalize_cameras(cam, compute_optical=True, first_camera=False)
        p, dist = compute_optical_axis_intersection(out)
        # after normalization the intersection sits at the origin and the
        # first camera is at distance 1 from it
        c0 = np.asarray(camera_center(out))[0]
        np.testing.assert_allclose(np.linalg.norm(c0 - np.asarray(p)), 1.0, atol=1e-3)


class TestAlign:
    def test_recovers_known_similarity(self, rng):
        cam = random_cameras(rng, 8)
        # apply a known world similarity y = s x Q + t to get "target" cameras
        Qw = random_rotations(rng, 1)[0]
        s = 1.7
        t = np.array([0.4, -0.3, 0.2])
        R_tgt = np.einsum("ij,njk->nik", Qw.T, np.asarray(cam.R))
        T_tgt = s * np.asarray(cam.T) - np.einsum("j,njk->nk", t, R_tgt)
        tgt = PerspectiveCameras.create(
            R=R_tgt, T=T_tgt, focal_length=np.asarray(cam.focal_length)
        )
        aligned = align_cameras(cam, tgt, estimate_scale=True)
        np.testing.assert_allclose(np.asarray(aligned.R), R_tgt, atol=1e-4)
        np.testing.assert_allclose(np.asarray(aligned.T), T_tgt, atol=1e-4)

    def test_identity_when_already_aligned(self, rng):
        cam = random_cameras(rng, 6)
        aligned = align_cameras(cam, cam)
        np.testing.assert_allclose(np.asarray(aligned.R), np.asarray(cam.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(aligned.T), np.asarray(cam.T), atol=1e-4)


class TestMetrics:
    def test_batched_all_pairs(self):
        i1, i2 = batched_all_pairs(2, 3)
        assert len(i1) == 2 * 3
        np.testing.assert_array_equal(i1, [0, 0, 1, 3, 3, 4])
        np.testing.assert_array_equal(i2, [1, 2, 2, 4, 5, 5])

    def test_rotation_angle_known(self, rng):
        theta = 0.3
        Rz = np.array(
            [
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1.0],
            ]
        )
        deg = rotation_angle_deg(jnp.asarray(Rz[None]), jnp.eye(3)[None])
        np.testing.assert_allclose(np.asarray(deg), np.degrees(theta), rtol=1e-4)

    def test_translation_angle_known(self):
        t1 = jnp.asarray([[1.0, 0.0, 0.0]])
        t2 = jnp.asarray([[0.0, 1.0, 0.0]])
        deg = translation_angle_deg(t1, t2)
        np.testing.assert_allclose(np.asarray(deg), 90.0, atol=1e-3)

    def test_perfect_prediction_zero_errors(self, rng):
        cam = random_cameras(rng, 6)
        r_deg, t_deg = camera_to_rel_deg(cam, cam, batch_size=1)
        assert r_deg.shape == (15,)
        np.testing.assert_allclose(np.asarray(r_deg), 0.0, atol=0.5)
        # translation angle of identical vectors: eps floor gives ~0
        np.testing.assert_allclose(np.asarray(t_deg), 0.0, atol=0.5)

    def test_auc_bounds(self, rng):
        r = np.zeros(100)
        t = np.zeros(100)
        assert calculate_auc_np(r, t) == pytest.approx(1.0)
        r = np.full(100, 1e3)
        assert calculate_auc_np(r, t) == pytest.approx(0.0)

    def test_auc_jnp_matches_np(self, rng):
        from posediffusion_tpu.geometry import calculate_auc

        r = rng.uniform(0, 40, size=200)
        t = rng.uniform(0, 40, size=200)
        np.testing.assert_allclose(
            float(calculate_auc(jnp.asarray(r), jnp.asarray(t))),
            calculate_auc_np(r, t),
            atol=1e-6,
        )

    def test_compute_are_identity(self, rng):
        R = random_rotations(rng, 10)
        np.testing.assert_allclose(compute_are(R, R), 0.0, atol=1e-3)
