"""PatchMatch quality tests (statistical parity — the reference's RNG is
thread-based; quality targets follow `benchmarkStereoMatchingModels.cpp`)."""

import numpy as np
import jax
import jax.numpy as jnp

from libstevi_tpu.core import MatchingFunction
from libstevi_tpu.core.search import SearchOffset1
from libstevi_tpu.ops.patchmatch import patch_match


def test_patchmatch_recovers_constant_disparity(rng):
    base = rng.uniform(0.1, 1, (40, 56)).astype(np.float32)
    true_d = 5
    img_r = base
    img_l = np.roll(base, true_d, axis=1)
    disp = patch_match(MatchingFunction.ZNCC, jnp.asarray(img_l),
                       jnp.asarray(img_r), SearchOffset1(0, 15),
                       h_radius=2, v_radius=2, n_iter=5, n_random=4,
                       key=jax.random.PRNGKey(7))
    inner = np.asarray(disp)[6:-6, 6:-6 - true_d]
    assert (inner == true_d).mean() > 0.95


def test_patchmatch_piecewise_disparity(rng):
    base = rng.uniform(0.1, 1, (40, 60)).astype(np.float32)
    img_r = base
    # two regions with different shifts
    img_l = np.roll(base, 3, axis=1)
    img_l[20:] = np.roll(base[20:], 7, axis=1)
    disp = patch_match(MatchingFunction.ZNCC, jnp.asarray(img_l),
                       jnp.asarray(img_r), SearchOffset1(0, 12),
                       h_radius=2, v_radius=2, n_iter=6,
                       key=jax.random.PRNGKey(3))
    d = np.asarray(disp)
    top = d[5:14, 8:-12]
    bot = d[26:-5, 8:-12]
    assert (top == 3).mean() > 0.9
    assert (bot == 7).mean() > 0.9


def test_patchmatch_flow_recovers_translation(rng):
    from libstevi_tpu.core.search import SearchOffset2
    from libstevi_tpu.ops.patchmatch import patch_match_flow
    from libstevi_tpu.ops import unfold
    from libstevi_tpu.ops.cost_volume import normalize_feature_volume
    base = rng.uniform(0.1, 1, (36, 40)).astype(np.float32)
    di, dj = 2, -3
    tgt_img = base
    src_img = np.roll(np.roll(base, -di, axis=0), -dj, axis=1)
    # source pixel (i, j) matches target at (i + di, j + dj)
    func = MatchingFunction.ZNCC
    s = normalize_feature_volume(func, unfold(2, 2, jnp.asarray(src_img)))
    t = normalize_feature_volume(func, unfold(2, 2, jnp.asarray(tgt_img)))
    flow = patch_match_flow(func, s, t, SearchOffset2(-4, 4, -4, 4),
                            n_iter=6, key=jax.random.PRNGKey(2))
    f = np.asarray(flow)[6:-6, 6:-6]
    good = (f[..., 0] == di) & (f[..., 1] == dj)
    assert good.mean() > 0.9


def _np_sweep(cv, disp, cost, lower, reverse):
    """Oracle: sequential propagation along axis 0 of a cost-oriented
    (L, S, D) volume; ties accept, non-finite candidates reject."""
    L, S, D = cv.shape
    disp = disp.copy()
    cost = cost.copy()
    order = range(L - 2, -1, -1) if reverse else range(1, L)
    step = 1 if reverse else -1
    for l in order:
        cand = disp[l + step]
        k = cand - lower
        sel = np.where((k >= 0) & (k < D),
                       cv[l, np.arange(S), np.clip(k, 0, D - 1)], np.inf)
        acc = np.isfinite(sel) & (sel <= cost[l])
        disp[l] = np.where(acc, cand, disp[l])
        cost[l] = np.where(acc, sel, cost[l])
    return disp, cost


def test_pallas_sweep_matches_numpy_oracle(rng):
    from libstevi_tpu.ops.patchmatch_pallas import sweep, _round_up
    L, S, D, lower = 21, 13, 9, -2
    cv = rng.uniform(0, 5, (L, S, D)).astype(np.float32)
    cv[rng.uniform(size=(L, S, D)) < 0.1] = np.inf   # some invalid entries
    disp = rng.integers(lower, lower + D, (L, S)).astype(np.int32)
    k = disp - lower
    cost = np.take_along_axis(cv, k[..., None], -1)[..., 0]

    # disparity-on-sublanes layout: (Lp, Dp, Sp)
    Lp, Sp, Dp = _round_up(L, 8), _round_up(S, 128), _round_up(D, 8)
    cv_p = np.moveaxis(np.pad(cv, ((0, Lp - L), (0, Sp - S), (0, Dp - D)),
                              constant_values=np.inf), -1, 1)
    d_p = np.pad(disp, ((0, Lp - L), (0, Sp - S)))
    c_p = np.pad(cost, ((0, Lp - L), (0, Sp - S)), constant_values=np.inf)

    for reverse in (False, True):
        want_d, want_c = _np_sweep(cv, disp, cost, lower, reverse)
        got_d, got_c = sweep(jnp.asarray(cv_p), jnp.asarray(d_p),
                             jnp.asarray(c_p), lower, D, L, reverse,
                             interpret=True)
        np.testing.assert_array_equal(np.asarray(got_d)[:L, :S], want_d)
        np.testing.assert_allclose(np.asarray(got_c)[:L, :S], want_c,
                                   rtol=1e-6)


def test_patchmatch_pallas_backend_quality(rng):
    """The CV-backed fast path reaches the same quality as the cacheless
    XLA path on the constant-disparity probe."""
    from libstevi_tpu.ops.patchmatch import patch_match_stereo
    from libstevi_tpu.ops import unfold
    from libstevi_tpu.ops.cost_volume import normalize_feature_volume
    base = rng.uniform(0.1, 1, (40, 56)).astype(np.float32)
    true_d = 5
    img_r = base
    img_l = np.roll(base, true_d, axis=1)
    func = MatchingFunction.ZNCC
    fl = normalize_feature_volume(func, unfold(2, 2, jnp.asarray(img_l)))
    fr = normalize_feature_volume(func, unfold(2, 2, jnp.asarray(img_r)))
    disp = patch_match_stereo(func, fr, fl, SearchOffset1(0, 15),
                              n_iter=5, n_random=4,
                              key=jax.random.PRNGKey(7), backend="pallas")
    inner = np.asarray(disp)[6:-6, 6:-6 - true_d]
    assert (inner == true_d).mean() > 0.95


def test_patchmatch_census_exact_words(rng):
    """Census words are packed uint32 bit patterns: the random-search
    cost path must not round them through float matmuls (bf16/f32
    one-hot) — CENSUS PatchMatch must recover a constant disparity."""
    base = rng.uniform(0.1, 1, (40, 56)).astype(np.float32)
    true_d = 5
    img_l = np.roll(base, true_d, axis=1)
    from libstevi_tpu.core.search import SearchOffset1
    from libstevi_tpu.ops.patchmatch import patch_match
    disp = np.asarray(patch_match(
        MatchingFunction.CENSUS, jnp.asarray(img_l), jnp.asarray(base),
        SearchOffset1(0, 15), h_radius=3, v_radius=3, n_iter=5))
    inner = disp[6:-6, 6:-6 - true_d]
    assert (inner == true_d).mean() > 0.9, (inner == true_d).mean()


def test_patchmatch_respects_search_range(rng):
    """Random-search +1 nudges must not escape [lower, upper]."""
    base = rng.uniform(0.1, 1, (24, 32)).astype(np.float32)
    from libstevi_tpu.core.search import SearchOffset1
    from libstevi_tpu.ops.patchmatch import patch_match
    so = SearchOffset1(2, 9)
    disp = np.asarray(patch_match(
        MatchingFunction.NCC, jnp.asarray(base), jnp.asarray(base),
        so, h_radius=2, v_radius=2, n_iter=4))
    assert disp.min() >= 2 and disp.max() <= 9, (disp.min(), disp.max())
