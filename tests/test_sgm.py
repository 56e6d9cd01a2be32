"""SGM parity tests against the sequential O(D^2) oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from libstevi_tpu.core import ExtractionStrategy, Margins
from libstevi_tpu.ops import sgm_cost_volume

import oracles

H, W, D = 11, 13, 5


def _cv(rng, h=H, w=W, d=D):
    return rng.uniform(0, 1, (h, w, d)).astype(np.float32)


@pytest.mark.parametrize("n_dirs", [4, 8, 16])
def test_cost_mode_matches_oracle(rng, n_dirs):
    cv = _cv(rng)
    got = np.asarray(sgm_cost_volume(jnp.asarray(cv), 0.1, 0.4,
                                     n_directions=n_dirs))
    want = oracles.sgm_oracle(cv, 0.1, 0.4, True, n_dirs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_dirs", [4, 8])
def test_score_mode_matches_oracle(rng, n_dirs):
    cv = _cv(rng)
    got = np.asarray(sgm_cost_volume(jnp.asarray(cv), 0.1, 0.4,
                                     n_directions=n_dirs,
                                     strategy=ExtractionStrategy.SCORE))
    want = oracles.sgm_oracle(cv, 0.1, 0.4, False, n_dirs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_margins(rng):
    cv = _cv(rng)
    m = Margins(2, 1, 2, 1)
    got = np.asarray(sgm_cost_volume(jnp.asarray(cv), 0.2, 0.6,
                                     margins=m, n_directions=4))
    want = oracles.sgm_oracle(cv, 0.2, 0.6, True, 4, margins=(2, 1, 2, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # outside the margins the volume is untouched
    np.testing.assert_array_equal(got[:1], cv[:1])
    np.testing.assert_array_equal(got[:, :2], cv[:, :2])


def test_pout_penalty_on_out_of_image_disparities(rng):
    # W < D so high disparity indices trigger j + nd >= W
    cv = _cv(rng, h=6, w=4, d=6)
    got = np.asarray(sgm_cost_volume(jnp.asarray(cv), 0.1, 0.3, Pout=5.0,
                                     n_directions=4))
    want = oracles.sgm_oracle(cv, 0.1, 0.3, True, 4, Pout=5.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_p2_less_than_p1_dense_fallback(rng):
    cv = _cv(rng)
    got = np.asarray(sgm_cost_volume(jnp.asarray(cv), 0.5, 0.2,
                                     n_directions=4))
    want = oracles.sgm_oracle(cv, 0.5, 0.2, True, 4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_smoothing_pulls_outlier_toward_neighbors():
    """A flat-disparity scene with one noisy pixel: SGM must fix the WTA."""
    rng = np.random.default_rng(3)
    H2, W2, D2 = 16, 16, 6
    cv = rng.uniform(0.4, 0.6, (H2, W2, D2)).astype(np.float32)
    cv[:, :, 2] = 0.1   # true disparity = 2 everywhere
    cv[8, 8, 2] = 0.9
    cv[8, 8, 5] = 0.0   # noisy winner at 5
    wta_before = int(np.argmin(cv[8, 8]))
    sgm = np.asarray(sgm_cost_volume(jnp.asarray(cv), 0.3, 1.0,
                                     n_directions=8))
    wta_after = int(np.argmin(sgm[8, 8]))
    assert wta_before == 5
    assert wta_after == 2


@pytest.mark.parametrize("n_dirs,margins", [
    (4, Margins()), (8, Margins()), (8, Margins(2, 1, 3, 2)),
    (16, Margins()), (16, Margins(2, 1, 3, 2)),
])
def test_fused_pallas_matches_xla(rng, n_dirs, margins):
    """The fused full-width Pallas kernels (interpret mode on CPU) must match
    the scan-based XLA path bit-closely, incl. corner doubling + margins."""
    from libstevi_tpu.ops.sgm_pallas import sgm_fused_adj  # noqa: F401
    cv = _cv(rng, 10, 14, 6)
    want = np.asarray(sgm_cost_volume(jnp.asarray(cv), 0.3, 1.1, margins,
                                      Pout=7.0, n_directions=n_dirs,
                                      backend="xla"))
    got = np.asarray(sgm_cost_volume(jnp.asarray(cv), 0.3, 1.1, margins,
                                     Pout=7.0, n_directions=n_dirs,
                                     backend="pallas"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_pallas_tall_region(rng):
    """W1 < H1 exercises the reverse-diagonal corner line j = i + (W1-H1)."""
    cv = _cv(rng, 18, 7, 5)
    want = np.asarray(sgm_cost_volume(jnp.asarray(cv), 0.2, 0.9,
                                      n_directions=8, backend="xla"))
    got = np.asarray(sgm_cost_volume(jnp.asarray(cv), 0.2, 0.9,
                                     n_directions=8, backend="pallas"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("strategy", [ExtractionStrategy.COST,
                                      ExtractionStrategy.SCORE])
def test_sgm_wta_truncated_matches_chain(rng, strategy):
    """Fused SGM+WTA+band fast path == sgm_cost_volume ->
    extract_selected_index -> truncated_cost_volume(SAME), incl. tie-last
    WTA, NaN validity masking and both strategies."""
    from libstevi_tpu.ops import (sgm_wta_truncated, extract_selected_index,
                                  truncated_cost_volume)
    cv = _cv(rng, 12, 15, 6)
    idx_f, tcv_f = sgm_wta_truncated(jnp.asarray(cv), 0.3, 1.1, Pout=7.0,
                                     n_directions=8, strategy=strategy,
                                     h_radius=2, v_radius=2,
                                     backend="pallas")
    sgm = sgm_cost_volume(jnp.asarray(cv), 0.3, 1.1, Pout=7.0,
                          n_directions=8, strategy=strategy, backend="xla")
    idx = extract_selected_index(sgm, strategy)
    vol = sgm if strategy is ExtractionStrategy.COST else -sgm
    tcv = truncated_cost_volume(vol, idx, 2, 2, 1)
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx))
    np.testing.assert_allclose(np.asarray(tcv_f), np.asarray(tcv),
                               rtol=1e-4, atol=1e-4)


def test_sgm_wta_truncated_16_directions(rng):
    """16-direction fused fast path: the DHW kernels carry the knight-move
    families (two phase carries per direction, `sgm.h:112-155,329-355`)
    alongside the principal directions; must match the XLA 16-dir chain."""
    from libstevi_tpu.ops import (sgm_wta_truncated, extract_selected_index,
                                  truncated_cost_volume)
    cv = _cv(rng, 12, 15, 6)
    idx_f, tcv_f = sgm_wta_truncated(jnp.asarray(cv), 0.3, 1.1, Pout=7.0,
                                     n_directions=16, h_radius=2, v_radius=2,
                                     backend="pallas")
    sgm = sgm_cost_volume(jnp.asarray(cv), 0.3, 1.1, Pout=7.0,
                          n_directions=16, backend="xla")
    idx = extract_selected_index(sgm, ExtractionStrategy.COST)
    tcv = truncated_cost_volume(sgm, idx, 2, 2, 1)
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx))
    np.testing.assert_allclose(np.asarray(tcv_f), np.asarray(tcv),
                               rtol=1e-4, atol=1e-4)


def test_sgm_wta_truncated_fallback_chain(rng):
    """Non-zero margins route through the exact three-op chain."""
    from libstevi_tpu.ops import (sgm_wta_truncated, extract_selected_index,
                                  truncated_cost_volume)
    cv = _cv(rng, 10, 12, 5)
    m = Margins(1, 1, 1, 1)
    idx_f, tcv_f = sgm_wta_truncated(jnp.asarray(cv), 0.2, 0.8, m,
                                     n_directions=8, backend="pallas")
    sgm = sgm_cost_volume(jnp.asarray(cv), 0.2, 0.8, m, n_directions=8,
                          backend="xla")
    idx = extract_selected_index(sgm, ExtractionStrategy.COST)
    tcv = truncated_cost_volume(sgm, idx, 0, 0, 1)
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx))
    np.testing.assert_allclose(np.asarray(tcv_f), np.asarray(tcv),
                               rtol=1e-4, atol=1e-4)


def test_fused_pallas_vmap_batches_exactly(rng):
    """jax.vmap over the fused SGM+WTA composite == per-sample results
    (the serving/batching path; pallas_call batching adds a grid dim)."""
    import jax
    from libstevi_tpu.ops import sgm_wta_truncated
    cvb = jnp.asarray(rng.uniform(0, 3, (3, 12, 16, 6)).astype(np.float32))
    f = lambda cv: sgm_wta_truncated(cv, 0.3, 1.1, n_directions=8,
                                     backend="pallas")
    idx_b, tcv_b = jax.vmap(f)(cvb)
    for b in range(3):
        i1, t1 = f(cvb[b])
        np.testing.assert_array_equal(np.asarray(idx_b[b]), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(tcv_b[b]), np.asarray(t1),
                                   rtol=1e-6)


def test_fused_dispatch_falls_back_when_carries_exceed_vmem():
    """Shapes whose full-width carries cannot fit VMEM must return None
    from the fused driver (the caller then uses the per-direction
    kernels) — checked without running any kernel."""
    from libstevi_tpu.ops.sgm_pallas import sgm_fused_adj
    big = jnp.zeros((8, 2048, 640), jnp.float32)   # Wp*Dp*4 ~ 5.9 MB/carry
    assert sgm_fused_adj(big, 0, 2048, 0.1, 0.5, 100.0, 8,
                         vmem_budget=12 * 1024 * 1024) is None


def test_pallas_shear_roundtrip(rng):
    """pallas_shear / pallas_unshear invert each other on image columns
    (the per-row dynamic-slice relayout utility)."""
    from libstevi_tpu.ops.sgm_pallas import (pallas_shear, pallas_unshear,
                                             _round_up)
    H_, W_, D_ = 10, 14, 5
    Dp = _round_up(D_, 128)
    cv = jnp.asarray(np.pad(
        rng.uniform(0, 1, (H_, W_, D_)).astype(np.float32),
        ((0, 0), (0, 0), (0, Dp - D_)), constant_values=np.inf))
    for neg in (False, True):
        S = pallas_shear(cv, H_, W_, neg=neg)
        back = pallas_unshear(S, H_, W_, neg=neg)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(cv))


def test_separate_accumulation_mode_matches(rng):
    """Forcing the large-shape (no alias-accumulation) mode via a tiny
    VMEM budget must give identical results to the normal fused mode."""
    from libstevi_tpu.ops.sgm_pallas import sgm_fused_adj
    cv = jnp.asarray(rng.uniform(0, 3, (12, 16, 6)).astype(np.float32))
    want = sgm_fused_adj(cv, 0, 16, 0.3, 1.1, 7.0, 8, interpret=True)
    # budget that admits rc=1 without the acc buffer but not with it:
    # u = 16*128*4 = 8KB; acc mode needs 3u+6u = 72KB, separate 7u = 56KB
    got = sgm_fused_adj(cv, 0, 16, 0.3, 1.1, 7.0, 8, interpret=True,
                        vmem_budget=60 * 1024)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n_dirs,cw", [(8, 16), (8, 8), (4, 8)])
def test_chunked_pallas_matches_xla(rng, n_dirs, cw):
    """W-chunked passes with edge-history relay (the huge-W*D path) ==
    the XLA scan groups, with forced small chunks."""
    from libstevi_tpu.ops.sgm_pallas import sgm_chunked_adj
    cv = _cv(rng, 12, 40, 6)
    want = np.asarray(sgm_cost_volume(jnp.asarray(cv), 0.3, 1.1, Pout=7.0,
                                      n_directions=n_dirs, backend="xla"))
    adj = sgm_chunked_adj(jnp.asarray(cv), 0, 40, 0.3, 1.1, 7.0, n_dirs,
                          interpret=True, cw_target=cw)
    np.testing.assert_allclose(np.asarray(cv + adj), want,
                               rtol=1e-4, atol=1e-4)


def test_sgm_wta_truncated_bf16_close_to_f32(rng):
    """bf16 volumes ride the packed-VPU Pallas path (4x faster on chip);
    WTA indices must agree except at near-ties and bands stay within bf16
    quantization of the f32 chain."""
    from libstevi_tpu.ops import sgm_wta_truncated
    import jax.numpy as jnp
    cv = _cv(rng, 12, 15, 6)
    idx32, tcv32 = sgm_wta_truncated(jnp.asarray(cv), 0.3, 1.1, Pout=7.0,
                                     n_directions=8, backend="pallas")
    idx16, tcv16 = sgm_wta_truncated(jnp.asarray(cv, jnp.bfloat16), 0.3,
                                     1.1, Pout=7.0, n_directions=8,
                                     backend="pallas")
    agree = (np.asarray(idx16) == np.asarray(idx32)).mean()
    assert agree > 0.9, agree
    same = np.asarray(idx16) == np.asarray(idx32)
    b32, b16 = np.asarray(tcv32)[same], np.asarray(tcv16)[same]
    ok = np.isfinite(b32) & np.isfinite(b16)
    # values accumulate ~8 direction adjustments of O(1) terms: allow a
    # few ulps of bf16 (~0.03 absolute at these magnitudes)
    np.testing.assert_allclose(b16[ok], b32[ok], atol=0.1, rtol=0.02)


def test_native_pipeline_splits_and_lane_chunks_exactly():
    """Big-geometry survival modes must be BIT-exact vs the full-width
    path: (a) the accumulate-stream split (up/fwd run 2-stream and the
    adjustment volumes add via XLA — how HD D=320 fits scoped VMEM) and
    (b) the lane-chunked WTA pass (horizontal carries are lane-local,
    so chunking the lane axis is exact)."""
    from libstevi_tpu.core import MatchingFunction
    from libstevi_tpu.ops.box_pallas import box_cost_volume_fused_padded
    from libstevi_tpu.ops import sgm_pallas_dhw as dhw

    h, w, d = 150, 200, 17
    rng = np.random.default_rng(3)
    img_l = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    img_r = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    for dt, sub in ((jnp.float32, 8), (jnp.bfloat16, 16)):
        dp = -(-d // sub) * sub
        a = box_cost_volume_fused_padded(
            MatchingFunction.ZNCC, img_l, img_r, 3, 3, d, dp, dt,
            negate=True, pout_bake=100.0, interpret=True)
        b = jnp.transpose(a, (2, 1, 0))
        full = dhw.sgm_fused_wta_from_native(
            a, b, h, w, d, 0, w, 0.1, 0.5, 100.0, 8, wta_radius=1,
            interpret=True, pout_baked=True)
        chunked = dhw.sgm_fused_wta_from_native(
            a, b, h, w, d, 0, w, 0.1, 0.5, 100.0, 8, wta_radius=1,
            interpret=True, pout_baked=True, force_wta_nl=2)
        # a tiny budget exercises rc_up=None -> split_up / split_fwd
        split = dhw.sgm_fused_wta_from_native(
            a, b, h, w, d, 0, w, 0.1, 0.5, 100.0, 8, wta_radius=1,
            interpret=True, pout_baked=True,
            vmem_budget=5 * 1024 * 1024)
        for other in (chunked, split):
            assert other is not None
            np.testing.assert_array_equal(np.asarray(full[0]),
                                          np.asarray(other[0]))
            np.testing.assert_array_equal(
                np.asarray(full[1], np.float32),
                np.asarray(other[1], np.float32))


def test_fused_subpixel_matches_composed_chain():
    """The in-kernel parabola subpixel (WTA pass ``refine``) must be
    bit-exact vs the composed _tcv_from_bands +
    refine_disp_cost_interpolation chain, including the NaN pattern of
    the SAME-mode truncated-cv validity rules."""
    from libstevi_tpu.core import MatchingFunction
    from libstevi_tpu.ops.box_pallas import box_cost_volume_fused_padded
    from libstevi_tpu.ops import sgm_pallas_dhw as dhw
    from libstevi_tpu.ops.sgm import _tcv_from_bands
    from libstevi_tpu.ops.refinement import (refine_disp_cost_interpolation,
                                             InterpolationKernel)

    h, w, d = 96, 120, 21
    rng = np.random.default_rng(5)
    img_l = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    img_r = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    for dt, sub in ((jnp.float32, 8), (jnp.bfloat16, 16)):
        dp = -(-d // sub) * sub
        a = box_cost_volume_fused_padded(
            MatchingFunction.ZNCC, img_l, img_r, 3, 3, d, dp, dt,
            negate=True, pout_bake=100.0, interpret=True)
        b = jnp.transpose(a, (2, 1, 0))
        idx, bands, disp_k = dhw.sgm_fused_wta_from_native(
            a, b, h, w, d, 0, w, 0.1, 0.5, 100.0, 8, wta_radius=1,
            interpret=True, pout_baked=True, refine=(3, 3))
        idx2, tcv = _tcv_from_bands(idx, bands, h, w, d, 3, 3, 1)
        disp_x = refine_disp_cost_interpolation(
            InterpolationKernel.PARABOLA, tcv, idx2)
        dk, dx = np.asarray(disp_k), np.asarray(disp_x)
        assert (np.isnan(dk) == np.isnan(dx)).all()
        f = np.isfinite(dk)
        np.testing.assert_array_equal(dk[f], dx[f])


def test_pout_baked_16dir_matches_unbaked_raw_bands():
    """16-direction Pout baking must reproduce the unbaked path on the
    RAW band values too — including out-of-range (j + d >= W) slots,
    where the multiplicity plane is the only thing restoring the
    penalty (a wrong plane shows up ONLY here: valid slots never see
    Pout).  idx must be exactly equal; raw bands to fp-association
    noise (the unbaked path sums per-pass penalty adds, the baked path
    applies one f32 multiply)."""
    from libstevi_tpu.core import MatchingFunction
    from libstevi_tpu.ops.box_pallas import box_cost_volume_fused_padded
    from libstevi_tpu.ops import sgm_pallas_dhw as dhw

    h, w, d = 43, 72, 17
    rng = np.random.default_rng(1)
    img_l = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    img_r = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    for nd in (4, 8, 16):
        def build(bake):
            a = box_cost_volume_fused_padded(
                MatchingFunction.ZNCC, img_l, img_r, 3, 3, d, 24,
                jnp.float32, negate=True,
                pout_bake=100.0 if bake else None, interpret=True)
            b = jnp.transpose(a, (2, 1, 0))
            return dhw.sgm_fused_wta_from_native(
                a, b, h, w, d, 0, w, 0.1, 0.5, 100.0, nd, wta_radius=1,
                interpret=True, pout_baked=bake)
        i0, b0 = build(False)
        i1, b1 = build(True)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(b1, np.float32),
                                   np.asarray(b0, np.float32),
                                   rtol=0, atol=2e-3)


def test_lane_chunked_fwd_pass_exact():
    """Round-5: the lane-chunked transposed rows pass (per-chunk carry
    scratch, shared padded lane extent) must be BIT-identical to the
    full-width pass — horizontal DP carries are lane-local."""
    import jax.numpy as jnp
    from libstevi_tpu.ops import sgm_pallas_dhw as dhw

    rng = np.random.default_rng(9)
    Wscan, Dp, Hl = 32, 16, 256          # lanes = 2 x 128
    cv_T = jnp.asarray(rng.uniform(0, 4, (Wscan, Dp, Hl))
                       .astype(np.float32))
    acc = jnp.asarray(rng.uniform(0, 1, (Wscan, Dp, Hl))
                      .astype(np.float32))
    kw = dict(RC=8, N1=30, X1=250, ml=0, W_pout=30, P1=0.3, P2=1.1,
              Pout=7.0, diag=False, transposed=True, H_corner=250,
              interpret=True)
    for reverse in (False, True):
        for baked in (False, True):
            full = dhw._rows_call(cv_T, acc, reverse=reverse,
                                  pout_baked=baked, **kw)
            chunked = dhw._rows_call(cv_T, acc, reverse=reverse,
                                     pout_baked=baked,
                                     lane_chunks=(2, 128), **kw)
            np.testing.assert_array_equal(np.asarray(full),
                                          np.asarray(chunked))
