"""Optimization-layer tests (norm solvers, GN, RANSAC, BFGS, assignment)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libstevi_tpu.optim import (
    least_squares, affine_best_l2_approximation,
    spherical_affine_best_approximation, weighted_median,
    least_absolute_differences, affine_best_l1_approximation,
    least_absolute_median, GaussNewton, ransac, bfgs_minimize,
    optimal_assignment, principal_components,
)


class TestNormSolvers:
    def test_least_squares(self, rng):
        A = rng.normal(size=(20, 4)).astype(np.float32)
        x = rng.normal(size=4).astype(np.float32)
        got = np.asarray(least_squares(jnp.asarray(A), jnp.asarray(A @ x)))
        np.testing.assert_allclose(got, x, atol=1e-4)

    def test_affine_l2_constraint(self, rng):
        A = rng.normal(size=(20, 5)).astype(np.float32)
        got = np.asarray(affine_best_l2_approximation(
            jnp.asarray(A), jnp.asarray(rng.normal(size=20).astype(np.float32))))
        assert got.sum() == pytest.approx(1.0, abs=1e-4)
        # exact recovery when b is a feasible combination
        xs = np.array([0.2, 0.3, 0.1, 0.25, 0.15], np.float32)
        got = np.asarray(affine_best_l2_approximation(jnp.asarray(A),
                                                      jnp.asarray(A @ xs)))
        np.testing.assert_allclose(got, xs, atol=1e-4)

    def test_spherical_recovers_direction(self, rng):
        A = rng.normal(size=(12, 3)).astype(np.float32)
        xs = np.array([0.5, 0.3, 0.2], np.float32)
        b = 3.7 * (A @ xs)  # scaled: only the direction should matter
        got = np.asarray(spherical_affine_best_approximation(
            jnp.asarray(A), jnp.asarray(b)))
        assert got.sum() == pytest.approx(1.0, abs=1e-4)
        d_got = A @ got
        d_want = A @ xs
        cos = d_got @ d_want / np.linalg.norm(d_got) / np.linalg.norm(d_want)
        assert cos == pytest.approx(1.0, abs=1e-5)

    def test_weighted_median(self):
        e = jnp.asarray([1.0, 2.0, 3.0, 10.0])
        w = jnp.asarray([1.0, 1.0, 5.0, 1.0])
        assert float(weighted_median(e, w)) == 3.0

    def test_l1_robust_to_outliers(self, rng):
        A = rng.normal(size=(40, 3)).astype(np.float32)
        x = np.array([1.0, -2.0, 0.5], np.float32)
        b = A @ x
        b[:4] += 50.0  # gross outliers
        got = np.asarray(least_absolute_differences(jnp.asarray(A),
                                                    jnp.asarray(b)))
        np.testing.assert_allclose(got, x, atol=2e-2)

    def test_affine_l1_sums_to_one(self, rng):
        A = rng.normal(size=(15, 4)).astype(np.float32)
        b = rng.normal(size=15).astype(np.float32)
        got = np.asarray(affine_best_l1_approximation(jnp.asarray(A),
                                                      jnp.asarray(b)))
        assert got.sum() == pytest.approx(1.0, abs=1e-3)

    def test_lmeds_ignores_half_minus_one_outliers(self, rng):
        A = rng.normal(size=(21, 2)).astype(np.float32)
        x = np.array([2.0, -1.0], np.float32)
        b = A @ x
        b[:9] = rng.normal(size=9) * 100  # 9 of 21 corrupted
        got = np.asarray(least_absolute_median(jnp.asarray(A),
                                               jnp.asarray(b)))
        np.testing.assert_allclose(got, x, atol=1e-3)


class TestGaussNewton:
    def test_exponential_fit(self, rng):
        t = np.linspace(0, 1, 30).astype(np.float32)
        true = np.array([2.0, -1.3], np.float32)
        y = true[0] * np.exp(true[1] * t)

        def resid(p, t, y):
            return p[0] * jnp.exp(p[1] * t) - y

        gn = GaussNewton(resid, iters=30)
        res = gn.solve(jnp.asarray([1.0, 0.0]), jnp.asarray(t),
                       jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(res.x), true, atol=1e-4)
        assert float(res.residual_norm) < 1e-5
        assert res.history.shape == (31, 2)

    def test_huber_downweights_outliers(self, rng):
        t = np.linspace(0, 1, 50).astype(np.float32)
        y = (3.0 * t + 1.0).astype(np.float32)
        y[:5] += 30.0

        def resid(p, t, y):
            return p[0] * t + p[1] - y

        res = GaussNewton(resid, iters=40, huber_delta=0.5).solve(
            jnp.zeros(2), jnp.asarray(t), jnp.asarray(y))
        res_plain = GaussNewton(resid, iters=40).solve(
            jnp.zeros(2), jnp.asarray(t), jnp.asarray(y))
        err_huber = np.abs(np.asarray(res.x) - [3.0, 1.0]).max()
        err_plain = np.abs(np.asarray(res_plain.x) - [3.0, 1.0]).max()
        # Huber keeps a small bias with one-sided gross outliers, but must be
        # far more accurate than the non-robust fit
        assert err_huber < 0.5
        assert err_huber < err_plain / 4


class TestRansac:
    def test_line_fit_with_outliers(self, rng):
        N = 100
        x = rng.uniform(-1, 1, N).astype(np.float32)
        y = 2.5 * x + 0.7
        out = rng.random(N) < 0.35
        y = np.where(out, rng.uniform(-10, 10, N), y).astype(np.float32)
        data = (jnp.asarray(x), jnp.asarray(y))

        def fit(sub):
            xs, ys = sub
            A = jnp.stack([xs, jnp.ones_like(xs)], -1)
            return jnp.linalg.lstsq(A, ys)[0]

        def residual(model, d):
            xs, ys = d
            return model[0] * xs + model[1] - ys

        res = ransac(fit, residual, data, n_samples=2, n_iterations=64,
                     threshold=0.05, key=jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(res.model), [2.5, 0.7],
                                   atol=0.05)
        assert int(res.n_inliers) >= (~out).sum() * 0.9


class TestBfgs:
    def test_rosenbrock(self):
        def f(x):
            return (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2

        res = bfgs_minimize(f, jnp.asarray([-1.2, 1.0]), iters=200)
        np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-3)


class TestAssignment:
    def test_small_known(self):
        c = np.array([[4, 1, 3], [2, 0, 5], [3, 2, 2]], float)
        ri, ci = optimal_assignment(c)
        assert c[ri, ci].sum() == 5.0


class TestPca:
    def test_recovers_dominant_axis(self, rng):
        d = rng.normal(size=(200, 1)).astype(np.float32) \
            * np.array([[3.0, 1.0, 0.0]], np.float32)
        d += rng.normal(size=(200, 3)).astype(np.float32) * 0.01
        comps, s, mean = principal_components(jnp.asarray(d), 1)
        v = np.asarray(comps)[0]
        v = v / np.linalg.norm(v)
        target = np.array([3.0, 1.0, 0.0]) / np.sqrt(10)
        assert min(np.abs(v - target).max(), np.abs(v + target).max()) < 1e-2
