"""Behavioral tests for the subpart / symmetric-2d / arbitrary-interpolation
image-based refinement variants (`image_based_refinement.h:108,373,516,885,
1071,1246,1423`)."""

import numpy as np
import jax.numpy as jnp
import pytest

from libstevi_tpu.core import MatchingFunction, DispDirection
from libstevi_tpu.core.search import SearchOffset2
from libstevi_tpu.ops.unfold import unfold
from libstevi_tpu.ops.cost_volume import normalize_feature_volume
from libstevi_tpu.ops.image_refinement import (
    refine_subpart_barycentric_symmetric_disp,
    refine_subpart_barycentric_disp,
    refine_barycentric_symmetric_2d_disp,
    refine_subpart_barycentric_symmetric_2d_disp,
    refine_arbitrary_interpolation_disp,
    refine_arbitrary_interpolation_2d_disp)


H, W = 24, 40
TRUE_D = 3.4


def _pair(rng):
    """Right image + left = right translated by TRUE_D (RIGHT_TO_LEFT
    geometry: left[j] = right[j - d] sampled at j + d)."""
    base = rng.uniform(0.1, 1.0, (H, W + 8)).astype(np.float32)
    k = np.ones(3) / 3
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    xs = np.arange(W)
    right = base[:, 4:W + 4]
    # RIGHT_TO_LEFT: source = right, matched at target[j + d] -> the left
    # image is the base shifted RIGHT by TRUE_D
    left = np.stack([np.interp(xs + 4 - TRUE_D, np.arange(W + 8), base[i])
                     for i in range(H)]).astype(np.float32)
    return left, right


def _fvs(func, left, right, r=2):
    fl = normalize_feature_volume(func, unfold(r, r, jnp.asarray(left)))
    fr = normalize_feature_volume(func, unfold(r, r, jnp.asarray(right)))
    return fl, fr


def _inner_err(refined):
    inner = np.asarray(refined)[4:-4, 8:-8]
    return np.abs(inner - TRUE_D).mean()


def test_subpart_full_enumeration_matches_default_lmeds(rng):
    """Passing the complete subset enumeration as testSetsIdxs must
    reproduce the default (enumerated) least-median path bit-for-bit —
    the subpart solver IS the default solver restricted to given subsets
    (`leastmedianoptimization.h:119-172`)."""
    from libstevi_tpu.optim.lmeds import _subsets
    from libstevi_tpu.ops.image_refinement import \
        refine_barycentric_symmetric_disp
    left, right = _pair(rng)
    fl, fr = _fvs(MatchingFunction.ZMEDAD, left, right)
    d0 = jnp.full((H, W), 3, jnp.int32)
    F = fl.shape[-1]
    sets = _subsets(F, 2)            # affine-reduced system has F rows, k=2
    want = refine_barycentric_symmetric_disp(
        MatchingFunction.ZMEDAD, fl, fr, d0, 8)
    got = refine_subpart_barycentric_symmetric_disp(
        MatchingFunction.ZMEDAD, fl, fr, d0, 8, sets)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_subpart_symmetric_bounded_deltas(rng):
    """Random small test sets: refined disparities stay within +-1 of the
    integer estimate (the |delta| < 1 acceptance rule) and finite."""
    left, right = _pair(rng)
    fl, fr = _fvs(MatchingFunction.ZMEDAD, left, right)
    d0 = np.full((H, W), 3, np.int32)
    F = fl.shape[-1]
    sets = np.stack([rng.choice(F, 2, replace=False)
                     for _ in range(24)]).astype(np.int32)
    out = np.asarray(refine_subpart_barycentric_symmetric_disp(
        MatchingFunction.ZMEDAD, fl, fr, jnp.asarray(d0), 8, sets))
    assert np.isfinite(out).all()
    assert (np.abs(out - 3) < 1.0 + 1e-6).all()


def test_subpart_twosided_runs_and_refines(rng):
    left, right = _pair(rng)
    fl, fr = _fvs(MatchingFunction.MEDAD, left, right)
    d0 = np.full((H, W), 3, np.int32)
    F = fl.shape[-1]
    sets = rng.choice(F, size=(16, 1), replace=True).astype(np.int32)
    out = np.asarray(refine_subpart_barycentric_disp(
        MatchingFunction.MEDAD, fl, fr, jnp.asarray(d0), sets))
    assert np.isfinite(out).all()
    assert (np.abs(out - 3) < 1.0 + 1e-6).all()


def test_subpart_rejects_non_median_funcs(rng):
    left, right = _pair(rng)
    fl, fr = _fvs(MatchingFunction.ZNCC, left, right)
    d0 = jnp.zeros((H, W), jnp.int32)
    with pytest.raises(NotImplementedError):
        refine_subpart_barycentric_symmetric_disp(
            MatchingFunction.ZNCC, fl, fr, d0, 8,
            np.zeros((4, 2), np.int32))


def _flow_pair(rng, di=0.0, dj=0.6):
    base = rng.uniform(0.1, 1.0, (H + 4, W + 4)).astype(np.float32)
    k = np.ones(3) / 3
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, base)
    target = base[:H, :W]
    ys, xs = np.mgrid[0:H, 0:W]
    from scipy.ndimage import map_coordinates
    source = map_coordinates(base, [ys + di, xs + dj], order=1
                             ).astype(np.float32)
    return source, target


def test_symmetric_2d_accepts_subpixel_shift(rng):
    src_img, tgt_img = _flow_pair(rng, 0.0, 0.6)
    func = MatchingFunction.ZNCC
    sfv = normalize_feature_volume(func, unfold(2, 2, jnp.asarray(src_img)))
    tfv = normalize_feature_volume(func, unfold(2, 2, jnp.asarray(tgt_img)))
    # source pixel (i, j) matches target (i, j + 0.6); integer guess (0, 1)
    sel = np.zeros((H, W, 2), np.int32)
    sel[..., 1] = 1
    out = refine_barycentric_symmetric_2d_disp(
        func, tfv, sfv, jnp.asarray(sel), SearchOffset2(-2, 2, -2, 2))
    inner = np.asarray(out)[4:-4, 4:-4]
    raw_err = np.abs(1 - 0.6)
    assert np.abs(inner[..., 1] - 0.6).mean() < raw_err
    assert np.abs(inner[..., 0]).mean() < 0.5


def test_subpart_symmetric_2d_runs(rng):
    src_img, tgt_img = _flow_pair(rng, 0.0, 0.5)
    func = MatchingFunction.ZMEDAD
    sfv = normalize_feature_volume(func, unfold(2, 2, jnp.asarray(src_img)))
    tfv = normalize_feature_volume(func, unfold(2, 2, jnp.asarray(tgt_img)))
    sel = np.zeros((H, W, 2), np.int32)
    F = sfv.shape[-1]
    sets = rng.choice(F, size=(16, 8), replace=True).astype(np.int32)
    out = refine_subpart_barycentric_symmetric_2d_disp(
        func, tfv, sfv, jnp.asarray(sel), SearchOffset2(-2, 2, -2, 2), sets)
    assert out.shape == (H, W, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("refine", [False, True])
def test_arbitrary_interpolation_recovers_subpixel(rng, refine):
    left, right = _pair(rng)
    func = MatchingFunction.ZNCC
    fl, fr = _fvs(func, left, right)
    d0 = np.full((H, W), 3, np.int32)
    out = refine_arbitrary_interpolation_disp(
        func, fl, fr, jnp.asarray(d0), n_pixels_cut=10,
        with_additional_refine=refine)
    assert _inner_err(out) < np.abs(3 - TRUE_D) - 0.1


def test_arbitrary_interpolation_2d_improves(rng):
    src_img, tgt_img = _flow_pair(rng, 0.3, 0.6)
    func = MatchingFunction.ZNCC
    sfv = normalize_feature_volume(func, unfold(2, 2, jnp.asarray(src_img)))
    tfv = normalize_feature_volume(func, unfold(2, 2, jnp.asarray(tgt_img)))
    sel = np.zeros((H, W, 2), np.int32)
    out = refine_arbitrary_interpolation_2d_disp(
        func, sfv, tfv, jnp.asarray(sel), n_pixels_cut=4,
        with_additional_refine=False)
    inner = np.asarray(out)[4:-4, 4:-4]
    base_err = np.hypot(0.3, 0.6)
    err = np.hypot(inner[..., 0] - 0.3, inner[..., 1] - 0.6).mean()
    assert err < base_err


# ---------------------------------------------------------------------------
# FeatureVol / image-level convenience wrappers (:1692-2795)
# ---------------------------------------------------------------------------

def test_fv_wrapper_matches_manual_chain(rng):
    """`refinedBarycentricSymmetricDispFeatureVol` == the hand-assembled
    normalize -> aggregate -> WTA -> refine-on-zero-mean chain
    (`image_based_refinement.h:1702-1723`)."""
    from libstevi_tpu.ops.image_refinement import (
        refined_barycentric_symmetric_disp_fv,
        refine_barycentric_symmetric_disp)
    from libstevi_tpu.ops.cost_volume import (
        aggregate_cost, extract_selected_index, channels_mean)
    from libstevi_tpu.core import ExtractionStrategy
    func = MatchingFunction.ZNCC
    left, right = _pair(rng)
    fl = unfold(2, 2, jnp.asarray(left))
    fr = unfold(2, 2, jnp.asarray(right))
    D = 8
    got = refined_barycentric_symmetric_disp_fv(func, fl, fr, D)

    nl = normalize_feature_volume(func, fl)
    nr = normalize_feature_volume(func, fr)
    cv = aggregate_cost(func, nl, nr, D)
    idx = extract_selected_index(cv, ExtractionStrategy.SCORE)
    zl = fl - channels_mean(fl)[..., None]
    zr = fr - channels_mean(fr)[..., None]
    want = refine_barycentric_symmetric_disp(func, zl, zr, idx, D)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_image_level_wrapper_recovers_subpixel(rng):
    from libstevi_tpu.ops.image_refinement import \
        refined_barycentric_symmetric_disp
    left, right = _pair(rng)
    out = refined_barycentric_symmetric_disp(
        MatchingFunction.ZNCC, jnp.asarray(left), jnp.asarray(right),
        2, 2, 8)
    assert _inner_err(out) < 0.35
    assert _inner_err(out) < abs(round(TRUE_D) - TRUE_D) + 0.05


def test_image_level_medad_routes_subpart(rng):
    """MEDAD carries the sliding-sub-window subpart solver automatically
    (:2460-2467) — must run and beat the integer WTA."""
    from libstevi_tpu.ops.image_refinement import refined_barycentric_disp
    left, right = _pair(rng)
    out = refined_barycentric_disp(
        MatchingFunction.MEDAD, jnp.asarray(left), jnp.asarray(right),
        2, 2, 8)
    assert np.isfinite(np.asarray(out)).all()
    assert _inner_err(out) <= abs(round(TRUE_D) - TRUE_D) + 1e-6


def test_image_level_2d_wrapper(rng):
    from libstevi_tpu.ops.image_refinement import \
        refined_barycentric_symmetric_2d_disp
    src_img, tgt_img = _flow_pair(rng, 0.3, 0.6)
    out = refined_barycentric_symmetric_2d_disp(
        MatchingFunction.ZNCC, jnp.asarray(tgt_img), jnp.asarray(src_img),
        2, 2, SearchOffset2(-2, 2, -2, 2),
        direction=DispDirection.RIGHT_TO_LEFT)
    inner = np.asarray(out)[4:-4, 4:-4]
    base_err = np.hypot(0.3, 0.6)
    err = np.hypot(inner[..., 0] - 0.3, inner[..., 1] - 0.6).mean()
    assert err < base_err


def test_sliding_subwindow_idxs_reference_layout():
    """3x3 window, 2x2 sub-windows: hand-checked index sets
    (`unfold.h:203-246`)."""
    from libstevi_tpu.ops.unfold import unfold_sliding_subwindow_idxs
    out = unfold_sliding_subwindow_idxs(1, 1, 2, 2, 1)
    assert out.shape == (4, 4)
    np.testing.assert_array_equal(out[0], [0, 1, 3, 4])
    np.testing.assert_array_equal(out[1], [1, 2, 4, 5])
    np.testing.assert_array_equal(out[2], [3, 4, 6, 7])
    np.testing.assert_array_equal(out[3], [4, 5, 7, 8])
