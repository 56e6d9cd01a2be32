"""Subpixel refinement tests: analytic peaks must be recovered exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from libstevi_tpu.ops import (InterpolationKernel,
                              refine_disp_cost_interpolation,
                              refine_disp_2d_cost_interpolation,
                              refine_disp_2d_cost_patch_interpolation)
from libstevi_tpu.ops.refinement import (refine_cost_triplet,
                                         IsotropyHypothesis)


def _parabola_tcv(delta, radius=2):
    """(1, 1, 2r+1) truncated CV of a parabola with minimum at `delta`."""
    d = np.arange(-radius, radius + 1)
    return ((d - delta) ** 2 + 0.5)[None, None, :].astype(np.float32)


class TestTriplet:
    @pytest.mark.parametrize("delta", [-0.4, -0.1, 0.0, 0.25, 0.49])
    def test_parabola_exact(self, delta):
        c = ((np.arange(-1, 2) - delta) ** 2).astype(np.float32)
        got = float(refine_cost_triplet(InterpolationKernel.PARABOLA,
                                        c[0], c[1], c[2]))
        assert got == pytest.approx(delta, abs=1e-6)

    @pytest.mark.parametrize("delta", [-0.4, 0.0, 0.3])
    def test_gaussian_exact_on_gaussian(self, delta):
        d = np.arange(-1, 2)
        c = np.exp(-((d - delta) ** 2)).astype(np.float32)
        got = float(refine_cost_triplet(InterpolationKernel.GAUSSIAN,
                                        c[0], c[1], c[2]))
        # Gaussian kernel on a cost volume: log turns it into a parabola with
        # a MAXIMUM; the formula still recovers the offset
        assert got == pytest.approx(delta, abs=1e-5)

    def test_equiangular_linear_vee(self):
        # V-shaped cost |d - delta| -> equiangular recovers delta exactly
        for delta in [-0.3, 0.2]:
            d = np.arange(-1, 2)
            c = np.abs(d - delta).astype(np.float32)
            got = float(refine_cost_triplet(InterpolationKernel.EQUIANGULAR,
                                            c[0], c[1], c[2]))
            assert got == pytest.approx(delta, abs=1e-6)


class TestRefine1d:
    def test_adds_offset_to_raw(self):
        tcv = jnp.asarray(_parabola_tcv(0.3))
        raw = jnp.full((1, 1), 7, jnp.int32)
        got = np.asarray(refine_disp_cost_interpolation(
            InterpolationKernel.PARABOLA, tcv, raw))
        assert got[0, 0] == pytest.approx(7.3, abs=1e-5)


class TestRefine2d:
    def _tcv2d(self, d0, d1, r=2):
        a0 = np.arange(-r, r + 1)
        a1 = np.arange(-r, r + 1)
        patch = ((a0[:, None] - d0) ** 2 + (a1[None, :] - d1) ** 2 + 0.1)
        return patch[None, None].astype(np.float32)

    @pytest.mark.parametrize("iso", [IsotropyHypothesis.ISOTROPIC,
                                     IsotropyHypothesis.ANISOTROPIC])
    def test_separable_quadratic(self, iso):
        tcv = jnp.asarray(self._tcv2d(0.2, -0.3))
        raw = jnp.zeros((1, 1, 2), jnp.int32)
        got = np.asarray(refine_disp_2d_cost_interpolation(
            InterpolationKernel.PARABOLA, tcv, raw, iso))
        assert got[0, 0, 0] == pytest.approx(0.2, abs=1e-4)
        assert got[0, 0, 1] == pytest.approx(-0.3, abs=1e-4)

    def test_patch_fit_recovers_coupled_quadratic(self):
        # quadratic with a cross term: only the 6-param patch fit is exact
        r = 1
        a0 = np.arange(-r, r + 1)[:, None]
        a1 = np.arange(-r, r + 1)[None, :]
        d0, d1 = 0.15, -0.2
        q = 2 * (a0 - d0) ** 2 + (a1 - d1) ** 2 + 0.8 * (a0 - d0) * (a1 - d1)
        tcv = jnp.asarray((q + 1.0)[None, None].astype(np.float32))
        raw = jnp.zeros((1, 1, 2), jnp.int32)
        got = np.asarray(refine_disp_2d_cost_patch_interpolation(
            InterpolationKernel.PARABOLA, tcv, raw))
        assert got[0, 0, 0] == pytest.approx(d0, abs=1e-4)
        assert got[0, 0, 1] == pytest.approx(d1, abs=1e-4)

    def test_large_delta_guard_zeroes_both(self):
        # a patch whose fitted optimum is far outside (-1, 1) -> deltas = 0
        patch = np.zeros((1, 1, 3, 3), np.float32)
        patch[..., :, :] = np.linspace(0, 1, 9).reshape(3, 3)  # planar: no peak
        raw = jnp.asarray(np.full((1, 1, 2), 4, np.int32))
        got = np.asarray(refine_disp_2d_cost_patch_interpolation(
            InterpolationKernel.PARABOLA, jnp.asarray(patch), raw))
        np.testing.assert_allclose(got, 4.0)
