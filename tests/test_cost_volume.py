"""Oracle-parity tests for the cost-volume engine (the reference's
`testCorrelationFilters.cpp` / `test_correlation_utils.h` pattern)."""

import numpy as np
import jax.numpy as jnp
import pytest

from libstevi_tpu.core import (MatchingFunction, DispDirection,
                               ExtractionStrategy, MATCH_TRAITS,
                               TruncatedCvDirection)
from libstevi_tpu.core.search import SearchOffset1, SearchOffset2
from libstevi_tpu.ops import (unfold, census_features, census_transform_2d,
                              aggregate_cost, feature_volume_to_cost_volume,
                              unfold_based_cost_volume, extract_selected_index,
                              extract_selected_2d_index, selected_index_to_disp,
                              selected_cost, truncated_cost_volume,
                              extract_in_bound_domain)
from libstevi_tpu.ops.cost_volume import normalize_feature_volume
from libstevi_tpu.ops.unfold import PatchOrientation

import oracles

H, W, D = 17, 23, 7


def _img(rng, h=H, w=W, c=None):
    shape = (h, w) if c is None else (h, w, c)
    return rng.uniform(0.1, 1.0, shape).astype(np.float32)


class TestUnfold:
    @pytest.mark.parametrize("radius", [1, 2, 3])
    @pytest.mark.parametrize("channels", [None, 3])
    def test_matches_oracle(self, rng, radius, channels):
        img = _img(rng, c=channels)
        got = np.asarray(unfold(radius, radius, jnp.asarray(img)))
        want = oracles.unfold_oracle(radius, radius, img)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_asymmetric_radii_and_padding(self, rng):
        from libstevi_tpu.core import PaddingMargins
        img = _img(rng)
        pad = PaddingMargins.explicit(0, 1, 2, 0)
        got = np.asarray(unfold(2, 1, jnp.asarray(img), pad))
        want = oracles.unfold_oracle(2, 1, img, pad=(0, 1, 2, 0))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_rotations_permute_channels(self, rng):
        img = _img(rng)
        base = np.asarray(unfold(1, 1, jnp.asarray(img)))
        rot180 = np.asarray(unfold(1, 1, jnp.asarray(img),
                                   orientation=PatchOrientation.ROTATE_180))
        # Rotate180 reverses the (dy, dx) window order
        np.testing.assert_allclose(rot180, base[:, :, ::-1], rtol=1e-6)


class TestCensus:
    def test_matches_oracle_small(self, rng):
        fv = rng.uniform(0, 1, (5, 6, 9)).astype(np.float32)
        got = np.asarray(census_features(jnp.asarray(fv)))
        want = oracles.census_oracle(fv)
        np.testing.assert_array_equal(got, want)

    def test_matches_oracle_multiword(self, rng):
        fv = rng.uniform(0, 1, (4, 4, 49)).astype(np.float32)
        got = np.asarray(census_features(jnp.asarray(fv)))
        want = oracles.census_oracle(fv)
        assert got.shape[-1] == 2
        np.testing.assert_array_equal(got, want)

    def test_transform_2d(self, rng):
        img = _img(rng)
        got = np.asarray(census_transform_2d(jnp.asarray(img), 3, 3))
        fv = oracles.unfold_oracle(3, 3, img)
        want = oracles.census_oracle(fv)
        np.testing.assert_array_equal(got, want)


class TestAggregate:
    @pytest.mark.parametrize("func", [MatchingFunction.CC, MatchingFunction.NCC,
                                      MatchingFunction.ZNCC, MatchingFunction.SSD,
                                      MatchingFunction.SAD, MatchingFunction.ZSSD,
                                      MatchingFunction.ZSAD, MatchingFunction.MEDAD])
    @pytest.mark.parametrize("direction", [DispDirection.RIGHT_TO_LEFT,
                                           DispDirection.LEFT_TO_RIGHT])
    def test_unfold_cv_matches_oracle(self, rng, func, direction):
        img_l = _img(rng)
        img_r = _img(rng)
        traits = MATCH_TRAITS[func]

        got = np.asarray(unfold_based_cost_volume(
            func, jnp.asarray(img_l), jnp.asarray(img_r), 1, 1, D,
            direction, backend="unfold"))

        fv_l = oracles.normalize_oracle(oracles.unfold_oracle(1, 1, img_l),
                                        traits.zero_mean, traits.normalized)
        fv_r = oracles.normalize_oracle(oracles.unfold_oracle(1, 1, img_r),
                                        traits.zero_mean, traits.normalized)
        if direction is DispDirection.RIGHT_TO_LEFT:
            src, tgt, sign = fv_r, fv_l, 1
        else:
            src, tgt, sign = fv_l, fv_r, -1
        want = oracles.aggregate_oracle(traits.kernel, src, tgt,
                                        list(range(D)), sign)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    @pytest.mark.parametrize("func", [MatchingFunction.CC, MatchingFunction.NCC,
                                      MatchingFunction.ZCC, MatchingFunction.ZNCC,
                                      MatchingFunction.SSD, MatchingFunction.ZSSD,
                                      MatchingFunction.SAD])
    @pytest.mark.parametrize("direction", [DispDirection.RIGHT_TO_LEFT,
                                           DispDirection.LEFT_TO_RIGHT])
    @pytest.mark.parametrize("channels", [None, 2])
    def test_box_backend_matches_unfold_backend(self, rng, func, direction,
                                                channels):
        img_l = _img(rng, c=channels)
        img_r = _img(rng, c=channels)
        want = np.asarray(unfold_based_cost_volume(
            func, jnp.asarray(img_l), jnp.asarray(img_r), 2, 2, D,
            direction, backend="unfold"))
        got = np.asarray(unfold_based_cost_volume(
            func, jnp.asarray(img_l), jnp.asarray(img_r), 2, 2, D,
            direction, backend="box"))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    def test_census_cost_volume(self, rng):
        img_l = _img(rng)
        img_r = _img(rng)
        got = np.asarray(unfold_based_cost_volume(
            MatchingFunction.CENSUS, jnp.asarray(img_l), jnp.asarray(img_r),
            3, 3, D))
        cl = oracles.census_oracle(oracles.unfold_oracle(3, 3, img_l))
        cr = oracles.census_oracle(oracles.unfold_oracle(3, 3, img_r))
        want = oracles.aggregate_oracle("hamming", cr, cl, list(range(D)), 1)
        np.testing.assert_array_equal(got, want)

    def test_search_offset_range(self, rng):
        img_l = _img(rng)
        img_r = _img(rng)
        so = SearchOffset1(-2, 3)
        fv_l = normalize_feature_volume(MatchingFunction.NCC,
                                        unfold(1, 1, jnp.asarray(img_l)))
        fv_r = normalize_feature_volume(MatchingFunction.NCC,
                                        unfold(1, 1, jnp.asarray(img_r)))
        got = np.asarray(aggregate_cost(MatchingFunction.NCC, fv_l, fv_r, so))
        want = oracles.aggregate_oracle(
            "dot", np.asarray(fv_r, np.float64), np.asarray(fv_l, np.float64),
            list(range(-2, 4)), 1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_2d_search(self, rng):
        img_l = _img(rng)
        img_r = _img(rng)
        so = SearchOffset2(-1, 1, -2, 2)
        cv = aggregate_cost(
            MatchingFunction.SSD,
            normalize_feature_volume(MatchingFunction.SSD,
                                     unfold(1, 1, jnp.asarray(img_l))),
            normalize_feature_volume(MatchingFunction.SSD,
                                     unfold(1, 1, jnp.asarray(img_r))), so)
        assert cv.shape == (H, W, 3, 5)
        # the (d0, d1) = (0, 0) slice is the direct SSD of the two volumes
        fl = oracles.unfold_oracle(1, 1, img_l)
        fr = oracles.unfold_oracle(1, 1, img_r)
        want = ((fr - fl) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(cv[:, :, 1, 2]), want,
                                   rtol=1e-4, atol=1e-6)


class TestWta:
    def test_ties_toward_last(self, rng):
        cv = rng.integers(0, 3, (H, W, D)).astype(np.float32)
        got_c = np.asarray(extract_selected_index(jnp.asarray(cv),
                                                  ExtractionStrategy.COST))
        np.testing.assert_array_equal(got_c, oracles.wta_oracle(cv, True))
        got_s = np.asarray(extract_selected_index(jnp.asarray(cv),
                                                  ExtractionStrategy.SCORE))
        np.testing.assert_array_equal(got_s, oracles.wta_oracle(cv, False))

    def test_2d_wta(self, rng):
        cv = rng.integers(0, 3, (5, 6, 3, 4)).astype(np.float32)
        got = np.asarray(extract_selected_2d_index(jnp.asarray(cv),
                                                   ExtractionStrategy.COST))
        flat = cv.reshape(5, 6, 12)
        want_flat = oracles.wta_oracle(flat, True)
        np.testing.assert_array_equal(got[..., 0], want_flat // 4)
        np.testing.assert_array_equal(got[..., 1], want_flat % 4)

    def test_index_to_disp(self):
        idx = jnp.arange(6).reshape(2, 3).astype(jnp.int32)
        rtl = selected_index_to_disp(idx, DispDirection.RIGHT_TO_LEFT, 2)
        ltr = selected_index_to_disp(idx, DispDirection.LEFT_TO_RIGHT, 2)
        np.testing.assert_array_equal(np.asarray(rtl), np.asarray(idx) + 2)
        np.testing.assert_array_equal(np.asarray(ltr), -np.asarray(idx) + 2)

    def test_known_parallax_recovered(self, rng):
        """generateParallaxSquareImage analogue: a textured square at a known
        shift must be recovered exactly in its interior."""
        true_disp = 3
        base = rng.uniform(0.1, 1.0, (32, 48)).astype(np.float32)
        img_r = base.copy()
        img_l = np.roll(base, true_disp, axis=1)
        cv = unfold_based_cost_volume(MatchingFunction.ZNCC,
                                      jnp.asarray(img_l), jnp.asarray(img_r),
                                      2, 2, 8)
        idx = extract_selected_index(cv, ExtractionStrategy.SCORE)
        disp = np.asarray(selected_index_to_disp(idx))
        inner = disp[4:-4, 4:-4 - true_disp]
        assert (inner == true_disp).mean() > 0.99


class TestTruncatedCv:
    def test_same_direction(self, rng):
        cv = rng.uniform(0, 1, (H, W, D)).astype(np.float32)
        sel = rng.integers(0, D, (H, W)).astype(np.int32)
        r, hr, vr = 2, 1, 1
        got = np.asarray(truncated_cost_volume(
            jnp.asarray(cv), jnp.asarray(sel), hr, vr, r))
        assert got.shape == (H, W, 2 * r + 1)
        for i in range(H):
            for j in range(W):
                for k in range(2 * r + 1):
                    p = sel[i, j] + k - r
                    invalid = (p < 0 or p >= D or j < hr
                               or j + p + hr >= W or i < vr or i + vr >= H)
                    if invalid:
                        assert np.isnan(got[i, j, k])
                    else:
                        assert got[i, j, k] == cv[i, j, p]

    def test_in_bound_matches_nan_pattern(self, rng):
        cv = rng.uniform(0, 1, (H, W, D)).astype(np.float32)
        sel = rng.integers(0, D, (H, W)).astype(np.int32)
        tcv = np.asarray(truncated_cost_volume(jnp.asarray(cv),
                                               jnp.asarray(sel), 1, 1, 2))
        ib = np.asarray(extract_in_bound_domain(jnp.asarray(sel), D, 1, 1, 2))
        np.testing.assert_array_equal(ib == 1, ~np.isnan(tcv))

    def test_selected_cost(self, rng):
        cv = rng.uniform(0, 1, (H, W, D)).astype(np.float32)
        sel = rng.integers(0, D, (H, W)).astype(np.int32)
        got = np.asarray(selected_cost(jnp.asarray(cv), jnp.asarray(sel)))
        want = np.take_along_axis(cv, sel[..., None], -1)[..., 0]
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("func,direction", [
    (MatchingFunction.ZNCC, DispDirection.RIGHT_TO_LEFT),
    (MatchingFunction.SSD, DispDirection.RIGHT_TO_LEFT),
    (MatchingFunction.SAD, DispDirection.LEFT_TO_RIGHT),
])
def test_fused_fv_backend_matches_scan(rng, func, direction):
    """The streaming Pallas fv aggregation (interpret mode on CPU) must
    match the XLA scan path including the zero-target-out-of-range
    semantics (`cross_correlations.h:195-250`)."""
    from libstevi_tpu.ops.cost_volume import aggregate_cost, \
        normalize_feature_volume
    from libstevi_tpu.core.search import SearchOffset1
    fv_l = jnp.asarray(rng.uniform(0, 1, (10, 17, 5)).astype(np.float32))
    fv_r = jnp.asarray(rng.uniform(0, 1, (10, 17, 5)).astype(np.float32))
    nl = normalize_feature_volume(func, fv_l)
    nr = normalize_feature_volume(func, fv_r)
    search = SearchOffset1(-2, 6)
    want = aggregate_cost(func, nl, nr, search, direction, backend="scan")
    got = aggregate_cost(func, nl, nr, search, direction, backend="fused")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


class TestBoxPallasFused:
    """Fused single-kernel box CV (`ops/box_pallas.py`) == the scan-based
    box backend for the dot family (interpret mode).  On TPU the 'auto'
    backend dispatches to this kernel for in-scope dot-family searches
    (`ops/cost_volume.py` unfold_based_cost_volume)."""

    @pytest.mark.parametrize("func", [MatchingFunction.ZNCC,
                                      MatchingFunction.NCC,
                                      MatchingFunction.CC,
                                      MatchingFunction.ZCC])
    def test_matches_box_backend(self, rng, func):
        from libstevi_tpu.ops.box_backend import box_cost_volume
        from libstevi_tpu.ops.box_pallas import box_cost_volume_fused
        for (H2, W2, D2, r) in ((24, 40, 10, 3), (48, 40, 7, 2)):
            l = jnp.asarray(rng.uniform(0.1, 1, (H2, W2)).astype(np.float32))
            rr = jnp.asarray(rng.uniform(0.1, 1, (H2, W2)).astype(np.float32))
            want = np.asarray(box_cost_volume(func, l, rr, r, r, D2,
                                              layout="dhw"))
            got = box_cost_volume_fused(func, l, rr, r, r, D2,
                                        interpret=True)
            np.testing.assert_allclose(np.asarray(got), want,
                                       rtol=1e-4, atol=1e-5)


def test_box_pallas_backend_dispatch(rng):
    """backend='box_pallas' through the umbrella entry == the scan box
    path (bit-comparable up to float reassociation), incl. the fallback
    for an offset search."""
    from libstevi_tpu.core.search import SearchOffset1
    H2, W2, D2 = 32, 40, 12
    l = jnp.asarray(rng.uniform(0.1, 1, (H2, W2)).astype(np.float32))
    r = jnp.asarray(rng.uniform(0.1, 1, (H2, W2)).astype(np.float32))
    want = unfold_based_cost_volume(MatchingFunction.ZNCC, l, r, 2, 2, D2,
                                    backend="box")
    got = unfold_based_cost_volume(MatchingFunction.ZNCC, l, r, 2, 2, D2,
                                   backend="box_pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # offset search is out of the fused kernel's scope -> scan fallback
    so = SearchOffset1(2, D2 - 1)
    want = unfold_based_cost_volume(MatchingFunction.ZNCC, l, r, 2, 2, so,
                                    backend="box")
    got = unfold_based_cost_volume(MatchingFunction.ZNCC, l, r, 2, 2, so,
                                   backend="box_pallas")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_auto_backend_dispatch_parity(rng):
    """'auto' (which on TPU selects the fused box Pallas kernel and on
    CPU the scan box decomposition) matches the forced unfold/scan path
    on whatever backend the test runs on."""
    H2, W2, D2 = 24, 40, 10
    l = jnp.asarray(rng.uniform(0.1, 1, (H2, W2)).astype(np.float32))
    r = jnp.asarray(rng.uniform(0.1, 1, (H2, W2)).astype(np.float32))
    for layout in ("hwd", "dhw"):
        want = unfold_based_cost_volume(MatchingFunction.ZNCC, l, r, 2, 2,
                                        D2, backend="unfold", layout=layout)
        got = unfold_based_cost_volume(MatchingFunction.ZNCC, l, r, 2, 2,
                                       D2, backend="auto", layout=layout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_truncated_cv_reversed_and_both_reference_semantics(rng):
    """REVERSED / BOTH / LEFT_TO_RIGHT truncation validity replicates the
    reference's conditions verbatim (`correlation_base.h:602-670`) —
    including its direction-independent `j + p + h_radius < W` bound for
    SAME slots.  Pins the replicated behavior against a direct loop."""
    from libstevi_tpu.core.types import TruncatedCvDirection, DispDirection
    from libstevi_tpu.ops.cost_volume import truncated_cost_volume
    H2, W2, D2, hr, vr, r = 10, 20, 6, 2, 1, 1
    cv = rng.uniform(0, 5, (H2, W2, D2)).astype(np.float32)
    sel = rng.integers(0, D2, (H2, W2)).astype(np.int32)

    def oracle(sdir, direction):
        sgn = -1 if direction is DispDirection.RIGHT_TO_LEFT else 1
        n_slots = 4 * r + 1 if sdir == "both" else 2 * r + 1
        out = np.full((H2, W2, n_slots), np.nan, np.float32)
        for i in range(H2):
            for j in range(W2):
                for d in range(2 * r + 1):
                    p = sel[i, j] + d - r
                    jp = j + sgn * (d - r)
                    same_ok = (0 <= p < D2 and j >= hr
                               and j + p + hr < W2 and i >= vr
                               and i + vr < H2)
                    jp_c = -1 if (sdir == "both" and d == r) else jp
                    rev_ok = (0 <= p < D2
                              and min(jp_c, j) >= hr
                              and max(jp_c, j) + hr < W2
                              and i >= vr and i + vr < H2)
                    if sdir == "same":
                        if same_ok:
                            out[i, j, d] = cv[i, j, p]
                    elif sdir == "reversed":
                        if rev_ok:
                            out[i, j, d] = cv[i, jp, p]
                    else:
                        dd_ = 2 * d - (1 if d > r else 0)
                        dr_ = 2 * d + 1 - (1 if d > r else 0)
                        if same_ok:
                            out[i, j, dd_] = cv[i, j, p]
                        if d != r and rev_ok:
                            out[i, j, dr_] = cv[i, jp, p]
        return out

    cases = [(TruncatedCvDirection.SAME, "same",
              DispDirection.LEFT_TO_RIGHT),
             (TruncatedCvDirection.REVERSED, "reversed",
              DispDirection.RIGHT_TO_LEFT),
             (TruncatedCvDirection.REVERSED, "reversed",
              DispDirection.LEFT_TO_RIGHT),
             (TruncatedCvDirection.BOTH, "both",
              DispDirection.RIGHT_TO_LEFT)]
    for sdir_enum, sdir_name, direction in cases:
        got = np.asarray(truncated_cost_volume(
            jnp.asarray(cv), jnp.asarray(sel), hr, vr, r,
            direction=direction, sdir=sdir_enum))
        want = oracle(sdir_name, direction)
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want),
                                      err_msg=f"{sdir_name}/{direction}")
        m = ~np.isnan(want)
        np.testing.assert_allclose(got[m], want[m],
                                   err_msg=f"{sdir_name}/{direction}")


def test_box_zncc_flat_patch_no_nan(rng):
    """Flat (zero-variance) patches must yield finite ZNCC costs: the
    box decomposition's variance term cancels to a tiny negative in f32
    and an unclamped sqrt poisons the WTA argmin with NaN."""
    # NEAR-flat: true variance is tiny but positive; the unclamped
    # box(x^2)-box(x)^2/n rounds negative about half the time in f32.
    # (Exactly-flat patches are 0/0 = NaN in the reference too.)
    img = (0.5 + 1e-4 * rng.standard_normal((24, 32))).astype(np.float32)
    cv = unfold_based_cost_volume(MatchingFunction.ZNCC,
                                  jnp.asarray(img), jnp.asarray(img),
                                  2, 2, 8, backend="box")
    inner = np.asarray(cv)[:, :-8]             # in-range disparities
    assert np.isfinite(inner).all()


def test_banded_fused_cv_matches_full_resident():
    """The banded fused CV (big geometries: prev/mid/next block
    streaming instead of whole-plane residents) is bit-exact vs the
    full-resident kernel."""
    import jax.numpy as jnp
    from libstevi_tpu.ops import box_pallas as bp

    h, w, d = 72, 150, 17
    rng = np.random.default_rng(4)
    img_l = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    img_r = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    for dt, sub in ((jnp.float32, 8), (jnp.bfloat16, 16)):
        dp = -(-d // sub) * sub
        for kind in ("zncc", "zcc"):
            full = bp._fused_call(kind, img_l, img_r, 3, 3, d, dp, 24, dt,
                                  True, negate=True, pad_d_inf=True,
                                  pout_bake=100.0)
            band = bp._fused_call(kind, img_l, img_r, 3, 3, d, dp, 24, dt,
                                  True, negate=True, pad_d_inf=True,
                                  pout_bake=100.0, banded=True)
            np.testing.assert_array_equal(np.asarray(full, np.float32),
                                          np.asarray(band, np.float32))
