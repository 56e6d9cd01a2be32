"""Tests for the remaining matchers: DP stereo, fastmatch, guided filtering,
template matching, image-based refinement, background segmentation."""

import numpy as np
import jax.numpy as jnp
import pytest

from libstevi_tpu.core import MatchingFunction, ExtractionStrategy, DispDirection
from libstevi_tpu.core.search import SearchOffset1
from libstevi_tpu.ops import unfold_based_cost_volume, extract_selected_index, unfold
from libstevi_tpu.ops.cost_volume import normalize_feature_volume
from libstevi_tpu.ops.dp_stereo import dp_stereo
from libstevi_tpu.ops.fastmatch import fastmatch
from libstevi_tpu.ops.guided_filtering import guided_cost_volume_aggregation
from libstevi_tpu.ops.template_matching import match_pattern
from libstevi_tpu.ops.image_refinement import (refine_barycentric_disp,
                                               refine_barycentric_symmetric_disp,
                                               refine_cost_symmetric_disp)
from libstevi_tpu.ops.bg_segmentation import DisparityEstimatorWithBackgroundRemoval


def _pair(rng, H=32, W=48, d=4):
    base = rng.uniform(0.1, 1, (H, W)).astype(np.float32)
    return np.roll(base, d, axis=1), base


class TestDpStereo:
    def test_recovers_constant_disp(self, rng):
        img_l, img_r = _pair(rng, d=3)
        cv = unfold_based_cost_volume(MatchingFunction.ZSSD,
                                      jnp.asarray(img_l), jnp.asarray(img_r),
                                      1, 1, 8)
        res = dp_stereo(cv, 0.05, 0.2)
        inner = np.asarray(res.disparity)[4:-4, 6:-8]
        assert (inner == 3).mean() > 0.9

    def test_smooths_noisy_pixel(self, rng):
        cv = rng.uniform(0.4, 0.6, (8, 16, 5)).astype(np.float32)
        cv[:, :, 2] = 0.1
        cv[4, 8, 4] = 0.0
        res = dp_stereo(jnp.asarray(cv), 0.2, 1.0)
        assert int(res.disparity[4, 8]) == 2


class TestFastmatch:
    def test_matches_wta_on_smooth_scene(self, rng):
        """The on-demand fastmatch (no dense CV built) agrees with the
        dense WTA on a smooth scene."""
        from libstevi_tpu.ops.unfold import unfold
        from libstevi_tpu.ops.cost_volume import normalize_feature_volume
        from libstevi_tpu.core.search import SearchOffset1
        img_l, img_r = _pair(rng, d=5)
        func = MatchingFunction.ZSSD
        # RIGHT_TO_LEFT geometry: source = right, target = left
        fs = normalize_feature_volume(func, unfold(2, 2, jnp.asarray(img_r)))
        ft = normalize_feature_volume(func, unfold(2, 2, jnp.asarray(img_l)))
        fm = np.asarray(fastmatch(func, fs, ft, SearchOffset1(0, 9)))
        cv = unfold_based_cost_volume(func, jnp.asarray(img_l),
                                      jnp.asarray(img_r), 2, 2, 10)
        wta = np.asarray(extract_selected_index(cv, ExtractionStrategy.COST))
        inner = slice(4, -4), slice(8, -10)
        agree = (fm[inner] == wta[inner]).mean()
        assert agree > 0.9

    def test_matches_reference_scan_oracle(self, rng):
        """Bit-exact vs a python replica of the reference's hot loop
        (`fast_approximate_matching.h:146-237`): full search at row
        start, 3 candidates with strictly-better order (0, -1, +1),
        re-search on two consecutive jumps, previous_jumped seeded
        True."""
        from libstevi_tpu.ops.unfold import unfold
        from libstevi_tpu.ops.cost_volume import normalize_feature_volume
        from libstevi_tpu.core.search import SearchOffset1
        img_l, img_r = _pair(rng, d=3)
        func = MatchingFunction.ZSSD
        fs = normalize_feature_volume(func, unfold(1, 1, jnp.asarray(img_r)))
        ft = normalize_feature_volume(func, unfold(1, 1, jnp.asarray(img_l)))
        lo, hi = 0, 6
        got = np.asarray(fastmatch(func, fs, ft, SearchOffset1(lo, hi)))

        s = np.asarray(fs)
        t = np.asarray(ft)
        H, W, F = s.shape

        def cost(i, j, d):
            tj = j + d
            if not (lo <= d <= hi) or not (0 <= tj < W):
                return np.inf
            return float(((s[i, j] - t[i, tj]) ** 2).sum())

        def full(i, j):
            cs = [cost(i, j, d) for d in range(lo, hi + 1)]
            return lo + int(np.argmin(cs))

        want = np.zeros((H, W), np.int64)
        for i in range(H):
            want[i, 0] = full(i, 0)
            prev_jumped = True
            for j in range(1, W):
                dp = want[i, j - 1]
                cur, cc = dp, cost(i, j, dp)
                for delta in (-1, 1):
                    c = cost(i, j, dp + delta)
                    if c < cc:
                        cur, cc = dp + delta, c
                jumped = cur != dp
                if jumped and prev_jumped:
                    want[i, j] = full(i, j)
                else:
                    want[i, j] = cur
                prev_jumped = jumped
        np.testing.assert_array_equal(got, want)


class TestGuidedFiltering:
    def test_edge_preserving(self, rng):
        H, W, D = 16, 16, 4
        cv = rng.uniform(0, 1, (H, W, D)).astype(np.float32)
        guide = np.zeros((H, W), np.float32)
        guide[:, 8:] = 1.0   # hard edge
        out = np.asarray(guided_cost_volume_aggregation(
            jnp.asarray(cv), jnp.asarray(guide), 2, sigma_value=0.05))
        # smoothing reduces variance within each side
        assert out[:, :7].std() < cv[:, :7].std()
        # the left side mean is barely influenced by the right side
        assert abs(out[:, 6].mean() - cv[:, :8].mean()) < 0.1


class TestTemplateMatching:
    def test_finds_template(self, rng):
        img = rng.uniform(0, 1, (24, 24)).astype(np.float32)
        fv = unfold(2, 2, jnp.asarray(img))
        template = fv[10, 13]
        score = np.asarray(match_pattern(MatchingFunction.ZNCC, template, fv))
        assert np.unravel_index(np.argmax(score), score.shape) == (10, 13)


class TestImageRefinement:
    @pytest.mark.parametrize("func", [MatchingFunction.NCC,
                                      MatchingFunction.SSD,
                                      MatchingFunction.SAD])
    def test_barycentric_improves_subpixel(self, rng, func):
        H, W = 24, 64
        base = rng.uniform(0.1, 1, (H, W)).astype(np.float32)
        td = 3.4
        xs = np.arange(W)
        img_l = np.stack([np.interp(xs - td, xs, base[i])
                          for i in range(H)]).astype(np.float32)
        img_r = base
        fv_l = unfold(1, 1, jnp.asarray(img_l))
        fv_r = unfold(1, 1, jnp.asarray(img_r))
        cv = unfold_based_cost_volume(func, jnp.asarray(img_l),
                                      jnp.asarray(img_r), 1, 1, 8,
                                      backend="unfold")
        from libstevi_tpu.core import MATCH_TRAITS
        idx = extract_selected_index(cv, MATCH_TRAITS[func].strategy)
        refined = np.asarray(refine_barycentric_disp(func, fv_l, fv_r, idx))
        inner = refined[4:-4, 8:-12]
        raw = np.asarray(idx)[4:-4, 8:-12].astype(np.float32)
        err_ref = np.abs(inner - td).mean()
        err_raw = np.abs(raw - td).mean()
        assert err_ref < err_raw
        assert err_ref < 0.35

    def test_symmetric_refinement(self, rng):
        H, W = 24, 64
        base = rng.uniform(0.1, 1, (H, W)).astype(np.float32)
        td = 3.3
        xs = np.arange(W)
        img_l = np.stack([np.interp(xs - td, xs, base[i])
                          for i in range(H)]).astype(np.float32)
        fv_l = unfold(1, 1, jnp.asarray(img_l))
        fv_r = unfold(1, 1, jnp.asarray(base))
        cv = unfold_based_cost_volume(MatchingFunction.NCC,
                                      jnp.asarray(img_l), jnp.asarray(base),
                                      1, 1, 8, backend="unfold")
        idx = extract_selected_index(cv, ExtractionStrategy.SCORE)
        ref = np.asarray(refine_barycentric_symmetric_disp(
            MatchingFunction.NCC, fv_l, fv_r, idx, 8))
        inner = ref[4:-4, 8:-12]
        assert np.abs(inner - td).mean() < 0.3

    def test_cost_symmetric(self, rng):
        H, W = 24, 64
        base = rng.uniform(0.1, 1, (H, W)).astype(np.float32)
        td = 3.4
        xs = np.arange(W)
        img_l = np.stack([np.interp(xs - td, xs, base[i])
                          for i in range(H)]).astype(np.float32)
        fv_l = normalize_feature_volume(MatchingFunction.ZNCC,
                                        unfold(1, 1, jnp.asarray(img_l)))
        fv_r = normalize_feature_volume(MatchingFunction.ZNCC,
                                        unfold(1, 1, jnp.asarray(base)))
        cv = unfold_based_cost_volume(MatchingFunction.ZNCC,
                                      jnp.asarray(img_l), jnp.asarray(base),
                                      1, 1, 8)
        idx = extract_selected_index(cv, ExtractionStrategy.SCORE)
        ref = np.asarray(refine_cost_symmetric_disp(
            MatchingFunction.ZNCC, fv_l, fv_r, idx, 8))
        inner = ref[4:-4, 8:-12]
        assert np.abs(inner - td).mean() < 0.3


class TestBgSegmentation:
    def test_foreground_object_detected(self, rng):
        H, W, d_bg, d_fg = 32, 48, 2, 6
        bg = rng.uniform(0.1, 1, (H, W)).astype(np.float32)
        bg_l = np.roll(bg, d_bg, axis=1)
        # live scene: background plus a textured square at closer disparity
        live_r = bg.copy()
        obj = rng.uniform(0.1, 1, (10, 10)).astype(np.float32)
        live_r[10:20, 20:30] = obj
        live_l = np.roll(live_r, d_bg, axis=1)
        live_l[10:20, 20 + d_fg:30 + d_fg] = obj  # object at d_fg

        func = MatchingFunction.ZNCC
        fv = lambda im: unfold(2, 2, jnp.asarray(im))
        est = DisparityEstimatorWithBackgroundRemoval(func, 0.9, 2)
        search = SearchOffset1(0, 8)
        assert est.compute_background_disp(fv(bg), fv(bg_l), search)
        live_cv = unfold_based_cost_volume(func, jnp.asarray(live_l),
                                           jnp.asarray(live_r), 2, 2, 9)
        res = est.compute_disp_and_foreground_mask(live_cv)
        mask = np.asarray(res.fg_mask)
        assert mask[13:18, 23:27].mean() > 0.6
        assert mask[:6].mean() < 0.1


class TestRefine2dBarycentric:
    def test_flow_subpixel(self, rng):
        from libstevi_tpu.ops.image_refinement import refine_barycentric_2d_disp
        from libstevi_tpu.interpolation import bilinear_sample
        H, W = 28, 32
        base = rng.uniform(0.1, 1, (H, W)).astype(np.float32)
        di, dj = 1.0, 2.4   # subpixel horizontal component
        ii, jjg = np.meshgrid(np.arange(H, dtype=np.float32),
                              np.arange(W, dtype=np.float32), indexing="ij")
        coords = jnp.asarray(np.stack([ii + di, jjg + dj], -1))
        src_img = np.asarray(bilinear_sample(jnp.asarray(base), coords))
        func = MatchingFunction.NCC
        s = unfold(1, 1, jnp.asarray(src_img))
        t = unfold(1, 1, jnp.asarray(base))
        raw = jnp.asarray(np.tile(np.array([1, 2], np.int32), (H, W, 1)))
        ref = np.asarray(refine_barycentric_2d_disp(func, s, t, raw))
        inner = ref[5:-5, 5:-7]
        err = np.abs(inner - np.array([di, dj]))
        assert err[..., 1].mean() < 0.35      # subpixel axis improves
        raw_err = abs(2 - dj)
        assert err[..., 1].mean() < raw_err


class TestCircularFft:
    def test_rotation_invariance(self, rng):
        from libstevi_tpu.sparse.descriptors import circular_fft_descriptor
        from scipy.ndimage import rotate
        img = rng.uniform(0, 1, (48, 48)).astype(np.float32)
        from libstevi_tpu.imageproc import gaussian_blur
        img = np.asarray(gaussian_blur(jnp.asarray(img), 1.5))
        rot = rotate(img, 45, reshape=False, order=1, mode="nearest")
        c = jnp.asarray([[24.0, 24.0]])
        d0 = np.asarray(circular_fft_descriptor(c, jnp.asarray(img)))
        d1 = np.asarray(circular_fft_descriptor(c, jnp.asarray(rot)))
        # compare to the descriptor at a different location
        d2 = np.asarray(circular_fft_descriptor(
            jnp.asarray([[14.0, 33.0]]), jnp.asarray(img)))
        sim_rot = np.linalg.norm(d0 - d1)
        sim_other = np.linalg.norm(d0 - d2)
        assert sim_rot < sim_other * 0.7
