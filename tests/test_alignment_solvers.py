"""Point-cloud / ray alignment + distributed Schur tests (BASELINE config-5
chain)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libstevi_tpu.geometry.pointcloudalignment import (
    Axis, estimate_affine_map, estimate_translation_map, estimate_scale_map,
    estimate_shape_preserving_map)
from libstevi_tpu.geometry.raysalignment import (
    RayInfos, align_rays_sets, relaxed_align_rays_sets,
    robust_align_rays_sets)
from libstevi_tpu.geometry.rotations import (rodrigues_formula,
                                             ShapePreservingTransform)
from libstevi_tpu.geometry.core import IterativeTermination


def _obs_from_transform(rng, T_apply, n_pts=40, n_obs=90):
    pts = rng.uniform(-1, 1, (3, n_pts)).astype(np.float32)
    tp = np.asarray(T_apply(jnp.asarray(pts.T))).T
    idxs = rng.integers(0, n_pts, n_obs)
    coord = [Axis(int(a)) for a in rng.integers(0, 3, n_obs)]
    obs = np.array([tp[c.value, i] for i, c in zip(idxs, coord)], np.float32)
    return jnp.asarray(obs), jnp.asarray(pts), idxs, coord


class TestPointCloudAlignment:
    def test_affine_map_recovery(self, rng):
        R = np.asarray(rodrigues_formula(jnp.asarray([0.2, -0.1, 0.3])))
        A_true = R * 1.3
        t_true = np.array([0.5, -0.2, 0.8], np.float32)
        obs, pts, idxs, coord = _obs_from_transform(
            rng, lambda p: p @ A_true.T + t_true)
        T = estimate_affine_map(obs, pts, idxs, coord)
        np.testing.assert_allclose(np.asarray(T.R), A_true, atol=1e-3)
        np.testing.assert_allclose(np.asarray(T.t), t_true, atol=1e-3)

    def test_translation_map(self, rng):
        t_true = np.array([1.0, -2.0, 0.5], np.float32)
        obs, pts, idxs, coord = _obs_from_transform(
            rng, lambda p: p + t_true)
        t = np.asarray(estimate_translation_map(obs, pts, idxs, coord))
        np.testing.assert_allclose(t, t_true, atol=1e-5)

    def test_scale_map(self, rng):
        obs, pts, idxs, coord = _obs_from_transform(rng, lambda p: 2.7 * p)
        s = float(estimate_scale_map(obs, pts, idxs, coord))
        assert s == pytest.approx(2.7, abs=1e-4)

    def test_shape_preserving_gn(self, rng):
        true = ShapePreservingTransform(jnp.asarray([0.15, -0.2, 0.1]),
                                        jnp.asarray([0.4, 0.1, -0.3]),
                                        jnp.asarray(1.4))
        obs, pts, idxs, coord = _obs_from_transform(rng, true.apply)
        res = estimate_shape_preserving_map(obs, pts, idxs, coord,
                                            n_steps=100)
        got = res.transform
        np.testing.assert_allclose(np.asarray(got.r), np.asarray(true.r),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(got.t), np.asarray(true.t),
                                   atol=1e-3)
        assert float(got.s) == pytest.approx(1.4, abs=1e-3)


class TestRaysAlignment:
    def _ray_sets(self, rng, r, t, n=30, noise=0.0):
        # world points seen from two frames; rays in each frame point at the
        # points from distinct origins
        pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32) + [0, 0, 5]
        R = np.asarray(rodrigues_formula(jnp.asarray(r)))
        o1 = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        v1 = pts - o1
        v1 /= np.linalg.norm(v1, axis=1, keepdims=True)
        # frame 2 = R * frame1 + t; origins/directions expressed in frame 2
        o2_f2 = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        pts_f2 = pts @ R.T + t
        v2 = pts_f2 - o2_f2
        v2 /= np.linalg.norm(v2, axis=1, keepdims=True)
        if noise:
            v2 += rng.normal(0, noise, v2.shape).astype(np.float32)
            v2 /= np.linalg.norm(v2, axis=1, keepdims=True)
        return (RayInfos(jnp.asarray(o1), jnp.asarray(v1)),
                RayInfos(jnp.asarray(o2_f2), jnp.asarray(v2)), R)

    def test_gn_alignment(self, rng):
        r = np.array([0.1, -0.05, 0.2], np.float32)
        t = np.array([0.3, 0.1, -0.2], np.float32)
        r1, r2, R = self._ray_sets(rng, r, t)
        T = align_rays_sets(r1, r2)
        np.testing.assert_allclose(np.asarray(T.R), R, atol=1e-3)
        np.testing.assert_allclose(np.asarray(T.t), t, atol=1e-2)

    def test_relaxed_alignment_direction(self, rng):
        r = np.array([0.05, 0.1, -0.08], np.float32)
        t = np.array([0.4, -0.1, 0.2], np.float32)
        r1, r2, R = self._ray_sets(rng, r, t, n=60)
        T = relaxed_align_rays_sets(r1, r2)
        np.testing.assert_allclose(np.asarray(T.R), R, atol=5e-2)
        tg = np.asarray(T.t)
        cos = tg @ t / np.linalg.norm(tg) / np.linalg.norm(t)
        assert abs(cos) > 0.95  # translation up to scale

    def test_robust_alignment_with_outliers(self, rng):
        r = np.array([0.1, -0.05, 0.2], np.float32)
        t = np.array([0.3, 0.1, -0.2], np.float32)
        r1, r2, R = self._ray_sets(rng, r, t, n=40)
        v2 = np.asarray(r2.directions).copy()
        v2[:6] = rng.normal(size=(6, 3))
        v2 /= np.linalg.norm(v2, axis=1, keepdims=True)
        r2o = RayInfos(r2.origins, jnp.asarray(v2))
        T = robust_align_rays_sets(r1, r2o, n_iterations=48,
                                   threshold=5e-3,
                                   key=jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(T.R), R, atol=5e-3)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
class TestDistributedSchur:
    def test_distributed_gn_matches_single(self, rng):
        from libstevi_tpu.parallel import make_stereo_mesh, MeshSpec
        from libstevi_tpu.parallel.schur import (
            distributed_multiview_alignment)
        from libstevi_tpu.optim import GaussNewton

        t_data = np.linspace(0, 1, 64).astype(np.float32)
        y = (2.0 * np.exp(-1.3 * t_data)).astype(np.float32)

        def resid(p, d):
            tt, yy = d
            return p[0] * jnp.exp(p[1] * tt) - yy

        mesh = make_stereo_mesh(MeshSpec(batch=4), jax.devices()[:4])
        got = distributed_multiview_alignment(
            resid, jnp.asarray([1.0, 0.0]),
            (jnp.asarray(t_data), jnp.asarray(y)), mesh, "batch", iters=30)
        np.testing.assert_allclose(np.asarray(got), [2.0, -1.3], atol=1e-4)

    def test_schur_solve_matches_dense(self, rng):
        from libstevi_tpu.parallel.schur import schur_complement_solve
        P, k, s = 4, 5, 3
        J = rng.normal(size=(40, P + k * s)).astype(np.float32)
        r = rng.normal(size=40).astype(np.float32)
        JtJ = J.T @ J + 0.1 * np.eye(P + k * s, dtype=np.float32)
        b = J.T @ r
        # build the block views
        JtJ_pp = JtJ[:P, :P]
        JtJ_ps = JtJ[:P, P:].reshape(P, k, s)
        blocks = np.stack([JtJ[P + i * s:P + (i + 1) * s,
                               P + i * s:P + (i + 1) * s] for i in range(k)])
        # zero the cross-structure couplings to make the system truly
        # block-diagonal in the structure part
        JtJ_full = JtJ.copy()
        JtJ_full[P:, P:] = 0
        for i in range(k):
            JtJ_full[P + i * s:P + (i + 1) * s,
                     P + i * s:P + (i + 1) * s] = blocks[i]
        want = np.linalg.solve(JtJ_full + 1e-8 * np.eye(P + k * s), b)
        dp, ds = schur_complement_solve(
            jnp.asarray(JtJ_pp), jnp.asarray(JtJ_ps), jnp.asarray(blocks),
            jnp.asarray(b[:P]), jnp.asarray(b[P:].reshape(k, s)),
            damping=1e-8)
        np.testing.assert_allclose(np.asarray(dp), want[:P], atol=1e-3)
        np.testing.assert_allclose(np.asarray(ds).ravel(), want[P:],
                                   atol=1e-3)
