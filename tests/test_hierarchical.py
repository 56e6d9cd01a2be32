"""Hierarchical matcher + interpolation/downsampling tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from libstevi_tpu.core import MatchingFunction, DispDirection
from libstevi_tpu.interpolation import (average_pooling_downsample,
                                        bilinear_sample, resample_image)
from libstevi_tpu.ops.hierarchical import (hierarchical_truncated_cost_volume,
                                           compute_guided_cv, _bilinear_guide)
from libstevi_tpu.ops.cost_volume import normalize_feature_volume
from libstevi_tpu.ops import unfold


class TestDownsampling:
    def test_exact_grid(self, rng):
        img = rng.uniform(0, 1, (8, 12)).astype(np.float32)
        got = np.asarray(average_pooling_downsample(jnp.asarray(img), 2))
        want = img.reshape(4, 2, 6, 2).mean((1, 3))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_ragged_grid_count_normalized(self, rng):
        img = rng.uniform(0, 1, (5, 7)).astype(np.float32)
        got = np.asarray(average_pooling_downsample(jnp.asarray(img), 2))
        assert got.shape == (3, 4)
        # naive oracle following the reference's offset conventions
        H, W = img.shape
        new_h, new_w = 3, 4
        h_rem = new_h * 2 - H
        v_rem = new_w * 2 - W
        off_j = h_rem // 2
        off_i = v_rem // 2
        for i in range(new_h):
            for j in range(new_w):
                vals = []
                for dv in range(2):
                    for dh in range(2):
                        pi = i * 2 - off_i + dv
                        pj = j * 2 - off_j + dh
                        if 0 <= pi < H and 0 <= pj < W:
                            vals.append(img[pi, pj])
                assert got[i, j] == pytest.approx(np.mean(vals), rel=1e-5)


class TestInterpolation:
    def test_bilinear_on_grid_is_identity(self, rng):
        img = rng.uniform(0, 1, (6, 8)).astype(np.float32)
        ii, jj = np.meshgrid(np.arange(6.0), np.arange(8.0), indexing="ij")
        coords = jnp.asarray(np.stack([ii, jj], -1).astype(np.float32))
        got = np.asarray(bilinear_sample(jnp.asarray(img), coords))
        np.testing.assert_allclose(got, img, atol=1e-6)

    def test_bilinear_midpoint(self):
        img = jnp.asarray([[0.0, 1.0], [2.0, 3.0]])
        c = jnp.asarray([[0.5, 0.5]])
        got = float(bilinear_sample(img, c)[0])
        assert got == pytest.approx(1.5)

    def test_resample_shift(self, rng):
        img = rng.uniform(0, 1, (10, 10)).astype(np.float32)
        ii, jj = np.meshgrid(np.arange(10.0), np.arange(10.0), indexing="ij")
        bm = jnp.asarray(np.stack([ii, jj - 1], -1).astype(np.float32))
        got = np.asarray(resample_image(jnp.asarray(img), bm))
        np.testing.assert_allclose(got[:, 1:], img[:, :-1], atol=1e-6)


class TestGuidedCv:
    def test_bilinear_guide_against_reference_scheme(self):
        guide = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
        up = np.asarray(_bilinear_guide(guide, 6, 8))
        assert up.shape == (6, 8)
        # corners match guide corners x2
        assert up[0, 0] == pytest.approx(0.0)
        assert up[-1, -1] == pytest.approx(22.0)

    def test_guided_cv_recovers_constant_disp(self, rng):
        base = rng.uniform(0.1, 1, (24, 40)).astype(np.float32)
        true_d = 3
        img_r = base
        img_l = np.roll(base, true_d, axis=1)
        fv_l = normalize_feature_volume(MatchingFunction.ZNCC,
                                        unfold(2, 2, jnp.asarray(img_l)))
        fv_r = normalize_feature_volume(MatchingFunction.ZNCC,
                                        unfold(2, 2, jnp.asarray(img_r)))
        # guide at half resolution with a wrong-by-one estimate
        guide = jnp.full((12, 20), (true_d // 2), jnp.int32)
        out = compute_guided_cv(MatchingFunction.ZNCC, fv_l, fv_r, guide, 2)
        disp = np.asarray(out.disp_estimate)
        inner = disp[4:-4, 4:-4 - true_d]
        assert (inner == true_d).mean() > 0.95
        assert out.truncated_cost_volume.shape == (24, 40, 5)

    def test_hierarchical_depth2(self, rng):
        base = rng.uniform(0.1, 1, (48, 64)).astype(np.float32)
        true_d = 6
        img_r = base
        img_l = np.roll(base, true_d, axis=1)
        out = hierarchical_truncated_cost_volume(
            MatchingFunction.ZNCC, jnp.asarray(img_l), jnp.asarray(img_r),
            2, 2, disp_width=16, depth=2)
        disp = np.asarray(out.disp_estimate)
        inner = disp[8:-8, 8:-8 - true_d]
        assert (inner == true_d).mean() > 0.9


def test_hierarchical_census_exact_words(rng):
    """The guided-CV window costs must not round census uint32 words
    through float one-hot matmuls; CENSUS hierarchical matching must
    recover a constant disparity."""
    base = rng.uniform(0.1, 1, (48, 64)).astype(np.float32)
    true_d = 6
    img_l = np.roll(base, true_d, axis=1)
    out = hierarchical_truncated_cost_volume(
        MatchingFunction.CENSUS, jnp.asarray(img_l), jnp.asarray(base),
        3, 3, disp_width=16, depth=2)
    disp = np.asarray(out.disp_estimate)
    inner = disp[8:-8, 8:-8 - true_d]
    assert (inner == true_d).mean() > 0.9, (inner == true_d).mean()
