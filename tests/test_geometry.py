"""Geometry engine tests: round-trip and synthetic ground-truth properties
(the reference's `testRotations.cpp` / `testLenseDistortion.cpp` /
`testAlignement.cpp` pattern)."""

import numpy as np
import jax.numpy as jnp
import pytest

from libstevi_tpu.geometry import (
    skew, unskew, AffineTransform, rodrigues_formula,
    inverse_rodrigues_formula, angle_axis_rotate, axis_angle_to_quaternion,
    quaternion_to_axis_angle, RigidBodyTransform, ShapePreservingTransform,
    euler_radxyz_to_rotation,
    radial_distortion, tangential_distortion,
    invert_radial_distortion, invert_radial_tangential_distortion,
    full_lens_distortion_homogeneous, invert_full_lens_distortion_homogeneous,
    ImageRectifier,
    project_points, reproject_points, reproject_points_lstsqr,
    estimate_essential_matrix, essential_matrix_to_transforms,
    find_transform, p3p, pnp,
)
from libstevi_tpu.geometry.imagecoordinates import (
    image_to_homogeneous, homogeneous_to_image)


class TestRotations:
    def test_skew_cross(self, rng):
        a = rng.normal(size=3).astype(np.float32)
        b = rng.normal(size=3).astype(np.float32)
        got = np.asarray(skew(jnp.asarray(a)) @ b)
        np.testing.assert_allclose(got, np.cross(a, b), atol=1e-6)
        np.testing.assert_allclose(np.asarray(unskew(skew(jnp.asarray(a)))),
                                   a, atol=1e-7)

    def test_rodrigues_round_trip(self, rng):
        for _ in range(10):
            r = rng.normal(size=3).astype(np.float32)
            r = r / np.linalg.norm(r) * rng.uniform(0.01, 3.0)
            R = rodrigues_formula(jnp.asarray(r))
            # orthonormal
            np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3),
                                       atol=1e-5)
            back = np.asarray(inverse_rodrigues_formula(R))
            np.testing.assert_allclose(back, r, atol=1e-4)

    def test_rodrigues_small_angle(self):
        r = jnp.asarray([1e-8, 0.0, 0.0])
        R = np.asarray(rodrigues_formula(r))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_angle_axis_rotate_matches_matrix(self, rng):
        r = rng.normal(size=3).astype(np.float32)
        v = rng.normal(size=(5, 3)).astype(np.float32)
        R = np.asarray(rodrigues_formula(jnp.asarray(r)))
        got = np.asarray(angle_axis_rotate(jnp.asarray(r), jnp.asarray(v)))
        np.testing.assert_allclose(got, v @ R.T, atol=1e-5)

    def test_quaternion_round_trip(self, rng):
        r = rng.normal(size=3).astype(np.float32) * 0.8
        q = axis_angle_to_quaternion(jnp.asarray(r))
        back = np.asarray(quaternion_to_axis_angle(q))
        np.testing.assert_allclose(back, r, atol=1e-5)

    def test_rigid_body_compose_inverse(self, rng):
        t1 = RigidBodyTransform(jnp.asarray(rng.normal(size=3) * 0.5),
                                jnp.asarray(rng.normal(size=3)))
        t2 = RigidBodyTransform(jnp.asarray(rng.normal(size=3) * 0.5),
                                jnp.asarray(rng.normal(size=3)))
        pts = jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32))
        got = np.asarray((t1 * t2).apply(pts))
        want = np.asarray(t1.apply(t2.apply(pts)))
        np.testing.assert_allclose(got, want, atol=1e-4)
        ident = np.asarray((t1 * t1.inverse()).apply(pts))
        np.testing.assert_allclose(ident, np.asarray(pts), atol=1e-4)

    def test_shape_preserving(self, rng):
        s = ShapePreservingTransform(jnp.asarray(rng.normal(size=3) * 0.3),
                                     jnp.asarray(rng.normal(size=3)),
                                     jnp.asarray(2.5))
        pts = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        back = np.asarray(s.inverse().apply(s.apply(pts)))
        np.testing.assert_allclose(back, np.asarray(pts), atol=1e-4)

    def test_euler(self):
        R = np.asarray(euler_radxyz_to_rotation(0.0, 0.0, np.pi / 2))
        np.testing.assert_allclose(R @ np.array([1.0, 0, 0]),
                                   [0, 1, 0], atol=1e-6)


class TestLensDistortion:
    k = np.array([0.1, -0.05, 0.01], np.float32)
    t = np.array([0.01, -0.02], np.float32)
    B = np.array([2.0, 1.0], np.float32)

    def test_radial_invert(self, rng):
        pos = jnp.asarray(rng.uniform(-0.5, 0.5, (20, 2)).astype(np.float32))
        dist = pos + radial_distortion(pos, self.k)
        back = invert_radial_distortion(dist, self.k, iters=10)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pos),
                                   atol=1e-5)

    def test_radial_tangential_invert(self, rng):
        pos = jnp.asarray(rng.uniform(-0.5, 0.5, (20, 2)).astype(np.float32))
        dist = pos + radial_distortion(pos, self.k) \
            + tangential_distortion(pos, self.t)
        back = invert_radial_tangential_distortion(dist, self.k, self.t,
                                                   iters=10)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pos),
                                   atol=1e-5)

    def test_full_model_round_trip(self, rng):
        f = np.array([800.0, 820.0], np.float32)
        pp = np.array([320.0, 240.0], np.float32)
        pos = jnp.asarray(rng.uniform(-0.3, 0.3, (15, 2)).astype(np.float32))
        px = full_lens_distortion_homogeneous(pos, f, pp, self.k, self.t,
                                              self.B)
        back = invert_full_lens_distortion_homogeneous(px, f, pp, self.k,
                                                       self.t, self.B,
                                                       iters=10)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pos),
                                   atol=1e-4)

    def test_image_coords_round_trip(self, rng):
        f = 500.0
        pp = np.array([100.0, 120.0], np.float32)
        pts = jnp.asarray(rng.uniform(0, 200, (9, 2)).astype(np.float32))
        hom = image_to_homogeneous(pts, f, pp)
        back = homogeneous_to_image(hom, f, pp)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                                   atol=1e-4)

    def test_rectifier_identity_without_distortion(self):
        rect = ImageRectifier(500.0, np.array([32.0, 24.0]), (48, 64))
        assert rect.compute("same")
        bm = np.asarray(rect.backward_map)
        assert bm.shape == (48, 64, 2)
        # without distortion the backward map is the identity grid
        np.testing.assert_allclose(bm[:, :, 0],
                                   np.arange(48)[:, None] * np.ones(64),
                                   atol=1e-3)
        np.testing.assert_allclose(bm[:, :, 1],
                                   np.ones(48)[:, None] * np.arange(64),
                                   atol=1e-3)

    def test_rectifier_with_distortion(self):
        rect = ImageRectifier(500.0, np.array([32.0, 24.0]), (48, 64),
                              k123=self.k)
        assert rect.compute("maximal")
        bm = np.asarray(rect.backward_map)
        assert bm.shape[-1] == 2 and np.isfinite(bm).all()


class TestAlignment:
    def _scene(self, rng, n=30):
        pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        pts[:, 2] += 4.0
        r = np.array([0.1, -0.2, 0.05], np.float32)
        t = np.array([0.5, 0.1, 0.2], np.float32)
        R = np.asarray(rodrigues_formula(jnp.asarray(r)))
        cam2 = pts @ R.T + t
        p1 = pts[:, :2] / pts[:, 2:3]
        p2 = cam2[:, :2] / cam2[:, 2:3]
        return pts, R, t, p1, p2

    def test_project_reproject(self, rng):
        pts, R, t, p1, p2 = self._scene(rng)
        T = AffineTransform(jnp.asarray(R), jnp.asarray(t))
        tri = np.asarray(reproject_points(T, jnp.asarray(p1), jnp.asarray(p2)))
        np.testing.assert_allclose(tri, pts, atol=1e-2)
        tri2 = np.asarray(reproject_points_lstsqr(T, jnp.asarray(p1),
                                                  jnp.asarray(p2)))
        np.testing.assert_allclose(tri2, pts, atol=1e-2)

    def test_essential_matrix_epipolar_constraint(self, rng):
        _, R, t, p1, p2 = self._scene(rng)
        E = np.asarray(estimate_essential_matrix(jnp.asarray(p1),
                                                 jnp.asarray(p2)))
        h1 = np.concatenate([p1, np.ones((len(p1), 1))], -1)
        h2 = np.concatenate([p2, np.ones((len(p2), 1))], -1)
        resid = np.abs(np.einsum("ni,ij,nj->n", h2, E, h1))
        assert resid.max() < 1e-4

    def test_find_transform_recovers_pose(self, rng):
        pts, R, t, p1, p2 = self._scene(rng)
        T = find_transform(jnp.asarray(p1), jnp.asarray(p2))
        Rg = np.asarray(T.R)
        tg = np.asarray(T.t)
        np.testing.assert_allclose(Rg, R, atol=1e-3)
        # translation up to scale
        tg_n = tg / np.linalg.norm(tg)
        t_n = t / np.linalg.norm(t)
        assert min(np.abs(tg_n - t_n).max(), np.abs(tg_n + t_n).max()) < 1e-3

    def test_p3p_contains_true_pose(self, rng):
        pts, R, t, p1, p2 = self._scene(rng, n=3)
        rays = np.concatenate([p2, np.ones((3, 1))], -1).astype(np.float32)
        Rs, ts, valid = p3p(jnp.asarray(rays), jnp.asarray(pts))
        Rs, ts, valid = np.asarray(Rs), np.asarray(ts), np.asarray(valid)
        errs = [np.abs(Rs[i] - R).max() + np.abs(ts[i] - t).max()
                for i in range(4) if valid[i]]
        assert errs and min(errs) < 1e-3

    def test_pnp_recovers_pose(self, rng):
        pts, R, t, p1, p2 = self._scene(rng, n=12)
        T = pnp(jnp.asarray(p2.astype(np.float32)), jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(T.R), R, atol=1e-3)
        np.testing.assert_allclose(np.asarray(T.t), t, atol=1e-3)
