"""Image-based (feature-space barycentric) subpixel refinement.

Reference parity: `correlation/image_based_refinement.h` — the refinement
interpolates *feature vectors* of the target image rather than costs:
  * `refineBarycentricDisp` (:186-355): two 2-point barycentric best
    approximations (toward jd+1 and jd-1), candidate deltas accepted only in
    (0, 1) and only when the re-evaluated comparison score improves
    (interpolated target features re-normalized for Normalized functions);
  * `refineBarycentricSymmetricDisp` (:32-106): one (2r+1)-point affine
    best approximation, delta = sum(coeff_p * p), accepted when |delta| < 1;
  * per-function barycentric solvers from the traits
    (`matching_costs.h:436-650`): spherical for NCC/ZNCC, L2 for SSD/ZSSD,
    L1 for SAD/ZSAD.

TPU design: the per-pixel tiny solves batch with vmap over all pixels
(batched small lstsq on the MXU); target feature windows come from
`take_along_axis` gathers.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import (MatchingFunction, MATCH_TRAITS, ExtractionStrategy,
                          DispDirection)
from ..core.utils import Contiguity
from .matching import feature_comparison
from ..optim.lsq import (affine_best_l2_approximation,
                         spherical_affine_best_approximation)
from ..optim.l1 import affine_best_l1_approximation
from ..optim.lmeds import affine_best_least_median_approximation


def _barycentric_solver(func: MatchingFunction, test_sets=None):
    """Per-trait barycentric solver (`matching_costs.h:436-650`): spherical
    for NCC/ZNCC, L2 for SSD/ZSSD/CC/ZCC, L1 for SAD/ZSAD, least-median for
    MEDAD/ZMEDAD.  With ``test_sets`` (the reference's ``testSetsIdxs``),
    the subpart least-median solver restricted to the given row subsets —
    defined only for the least-median traits
    (`subpartBarycentricBestApproximation`, `matching_costs.h:614,645`)."""
    k = MATCH_TRAITS[func].kernel
    norm = MATCH_TRAITS[func].normalized
    if test_sets is not None:
        if k != "medad":
            raise NotImplementedError(
                "subpart barycentric refinement is only defined for the "
                "least-median matching functions (MEDAD/ZMEDAD), matching "
                "the reference traits")
        sub = np.asarray(test_sets, np.int32)
        return lambda A, b: affine_best_least_median_approximation(A, b, sub)
    if k == "medad":
        return affine_best_least_median_approximation
    if k == "dot" and norm:
        return spherical_affine_best_approximation
    if k == "ssd" or (k == "dot" and not norm):
        return affine_best_l2_approximation
    if k == "sad":
        return affine_best_l1_approximation
    raise NotImplementedError(
        f"barycentric refinement not defined for {func}")


def _gather_cols(fv: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """fv (H, W, F); cols (H, W) -> (H, W, F), clamped."""
    W = fv.shape[1]
    c = jnp.clip(cols, 0, W - 1)
    return jnp.take_along_axis(fv, c[..., None], axis=1)


def _maybe_normalize(func, v):
    if MATCH_TRAITS[func].normalized:
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                               1e-12)
    return v


def refine_barycentric_disp(func: MatchingFunction, fv_l: jnp.ndarray,
                            fv_r: jnp.ndarray, selected_index: jnp.ndarray,
                            direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
                            test_sets_idxs=None) -> jnp.ndarray:
    """Two-sided 2-point barycentric refinement (`refineBarycentricDisp`,
    `image_based_refinement.h:186-355`).  Feature volumes raw (zero-mean
    applied upstream if the trait requires; normalization happens inside per
    the reference)."""
    sign = direction.delta_sign
    source_fv, target_fv = ((fv_r, fv_l)
                            if direction is DispDirection.RIGHT_TO_LEFT
                            else (fv_l, fv_r))
    H, W, F = target_fv.shape
    d = selected_index.astype(jnp.int32)
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]
    jd = jj + sign * d

    valid = (jd >= 1) & (jd + 1 < W)

    src = source_fv
    t0 = _gather_cols(target_fv, jd)
    tp = _gather_cols(target_fv, jd + 1)
    tm = _gather_cols(target_fv, jd - 1)

    solver = _barycentric_solver(func, test_sets_idxs)

    def solve_pair(a0, a1, b):
        A = jnp.stack([a0, a1], -1)           # (F, 2)
        return solver(A, b)

    flat = lambda x: x.reshape(-1, F)
    coeffs_p = jax.vmap(solve_pair)(flat(t0), flat(tp), flat(src))
    coeffs_m = jax.vmap(solve_pair)(flat(tm), flat(t0), flat(src))
    coeffs_p = coeffs_p.reshape(H, W, 2)
    coeffs_m = coeffs_m.reshape(H, W, 2)

    dd_plus = coeffs_p[..., 1]
    dd_minus = coeffs_m[..., 0]

    src_n = _maybe_normalize(func, src)
    t0_n = _maybe_normalize(func, t0)
    base_score = feature_comparison(func, src_n, t0_n)

    interp_p = _maybe_normalize(
        func, t0 * coeffs_p[..., 0:1] + tp * coeffs_p[..., 1:2])
    interp_m = _maybe_normalize(
        func, tm * coeffs_m[..., 0:1] + t0 * coeffs_m[..., 1:2])
    score_p = feature_comparison(func, src_n, interp_p)
    score_m = feature_comparison(func, src_n, interp_m)

    is_score = MATCH_TRAITS[func].strategy is ExtractionStrategy.SCORE

    def better(a, b):
        return a > b if is_score else a < b

    delta = jnp.zeros((H, W), jnp.float32)
    score = base_score
    ok_p = (dd_plus > 0) & (dd_plus < 1) & better(score_p, score)
    delta = jnp.where(ok_p, dd_plus, delta)
    score = jnp.where(ok_p, score_p, score)
    ok_m = (dd_minus > 0) & (dd_minus < 1) & better(score_m, score)
    delta = jnp.where(ok_m, -dd_minus, delta)

    refined = d.astype(jnp.float32) + sign * delta
    return jnp.where(valid, refined, d.astype(jnp.float32))


def refine_barycentric_symmetric_disp(
        func: MatchingFunction, fv_l: jnp.ndarray, fv_r: jnp.ndarray,
        selected_index: jnp.ndarray, disp_width: int, refine_radius: int = 1,
        direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
        test_sets_idxs=None) -> jnp.ndarray:
    """Symmetric (2r+1)-point barycentric refinement
    (`refineBarycentricSymmetricDisp`, `image_based_refinement.h:32-106`)."""
    sign = direction.delta_sign
    source_fv, target_fv = ((fv_r, fv_l)
                            if direction is DispDirection.RIGHT_TO_LEFT
                            else (fv_l, fv_r))
    H, W, F = target_fv.shape
    r = refine_radius
    d = selected_index.astype(jnp.int32)
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]
    jd = jj + sign * d

    valid = ((jj + 1 < W)
             & (jd - r >= 0) & (jd + 1 <= W - r)
             & (d != 0) & (d + 1 < disp_width))

    cols = [_gather_cols(target_fv, jd + p) for p in range(-r, r + 1)]
    A = jnp.stack(cols, -1)                       # (H, W, F, 2r+1)
    solver = _barycentric_solver(func, test_sets_idxs)

    coeffs = jax.vmap(solver)(A.reshape(-1, F, 2 * r + 1),
                              source_fv.reshape(-1, F))
    coeffs = coeffs.reshape(H, W, 2 * r + 1)
    ps = jnp.arange(-r, r + 1, dtype=jnp.float32)
    delta = jnp.sum(coeffs * ps, -1)
    refined = jnp.where(jnp.abs(delta) < 1,
                        d.astype(jnp.float32) + delta,
                        d.astype(jnp.float32))
    return jnp.where(valid, refined, d.astype(jnp.float32))


_CORNER_DIRS = {Contiguity.QUEEN: ((1, 1), (1, 0), (0, 1)),
                Contiguity.ROOK: ((1, 0), (0, 1)),
                Contiguity.BISHOP: ((1, 1),)}


def refine_barycentric_2d_disp(func: MatchingFunction, source_fv: jnp.ndarray,
                               target_fv: jnp.ndarray,
                               selected_index: jnp.ndarray,
                               search=None,
                               contiguity: Contiguity = Contiguity.QUEEN,
                               test_sets_idxs=None) -> jnp.ndarray:
    """2-D barycentric refinement of an (H, W, 2) flow field
    (`refineBarycentric2dDisp`, `image_based_refinement.h:679-883`): for
    each quadrant (dir_x, dir_y) in {1,-1}^2, one barycentric best
    approximation over the contiguity's corner directions plus the
    center (`contiguity.h:140-160`: Queen = {(1,1),(1,0),(0,1)}); the
    joint delta (sum alpha_k * dir_k) is accepted when |delta0| <= 1 and
    |delta1| <= 1 and the re-evaluated comparison improves, best kept
    across quadrants.  Entries whose WTA flow falls outside ``search``
    (a `SearchOffset2`, when given) pass through unrefined, like the
    reference's searchWindows gate."""
    H, W, F = target_fv.shape
    d = selected_index.astype(jnp.int32)
    ii = jnp.arange(H, dtype=jnp.int32)[:, None]
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]
    ti = jnp.clip(ii + d[..., 0], 1, H - 2)
    tj = jnp.clip(jj + d[..., 1], 1, W - 2)
    valid = ((ii + d[..., 0] >= 1) & (ii + d[..., 0] < H - 1)
             & (jj + d[..., 1] >= 1) & (jj + d[..., 1] < W - 1))
    if search is not None:
        valid = (valid
                 & (d[..., 0] >= search.lower0) & (d[..., 0] <= search.upper0)
                 & (d[..., 1] >= search.lower1) & (d[..., 1] <= search.upper1))

    def grab(di, dj):
        return target_fv[ti + di, tj + dj]

    t0 = grab(0, 0)
    solver = _barycentric_solver(func, test_sets_idxs)
    src = source_fv
    src_n = _maybe_normalize(func, src)
    t0_n = _maybe_normalize(func, t0)
    base_score = feature_comparison(func, src_n, t0_n)
    is_score = MATCH_TRAITS[func].strategy is ExtractionStrategy.SCORE

    def better(a, b):
        return a > b if is_score else a < b

    dirs = _CORNER_DIRS[contiguity]
    nd = len(dirs) + 1
    flat = lambda x: x.reshape(-1, F)

    delta0 = jnp.zeros((H, W), jnp.float32)
    delta1 = jnp.zeros((H, W), jnp.float32)
    score = base_score
    for dx in (1, -1):
        for dy in (1, -1):
            cols = [grab(sd[0] * dx, sd[1] * dy) for sd in dirs] + [t0]
            A = jnp.stack(cols, -1)                 # (H, W, F, nd)
            alphas = jax.vmap(solver)(A.reshape(-1, F, nd),
                                      flat(src)).reshape(H, W, nd)
            td0 = sum(alphas[..., k] * (dirs[k][0] * dx)
                      for k in range(len(dirs)))
            td1 = sum(alphas[..., k] * (dirs[k][1] * dy)
                      for k in range(len(dirs)))
            interp = _maybe_normalize(
                func, jnp.einsum("hwfn,hwn->hwf", A, alphas))
            s = feature_comparison(func, src_n, interp)
            ok = ((jnp.abs(td0) <= 1.0) & (jnp.abs(td1) <= 1.0)
                  & better(s, score))
            delta0 = jnp.where(ok, td0, delta0)
            delta1 = jnp.where(ok, td1, delta1)
            score = jnp.where(ok, s, score)

    refined = d.astype(jnp.float32) + jnp.stack([delta0, delta1], -1)
    return jnp.where(valid[..., None], refined, d.astype(jnp.float32))


def refine_cost_symmetric_disp(func: MatchingFunction, fv_l, fv_r,
                               selected_index, disp_width,
                               direction=DispDirection.RIGHT_TO_LEFT,
                               cost_volume=None) -> jnp.ndarray:
    """Cost-based symmetric refinement (`refineCostSymmetricDisp`,
    `image_based_refinement.h:1592-1688`): a parabola delta from the
    COST-VOLUME triplet cv[i,j,d-1..d+1] is averaged with a second delta
    from a HALF-PIXEL-interpolated source (0.5 src(j) + 0.5 src(j+dir),
    dir opposing the first delta; delta2 = parabola(f) - 0.5 dir,
    accepted when |delta2| < 1).  The correction applies WITHOUT
    deltaSign (the reference emits d + delta directly, `:1688`).  The
    parabola formula is sign-invariant, so Cost and Score functions
    share it, as in the reference.

    ``cost_volume`` is the WTA volume; recomputed from the feature
    volumes when omitted.  Documented deviation: degenerate flat
    triplets (zero second difference) return the unrefined d instead of
    the reference's inf."""
    sign = direction.delta_sign
    source_fv, target_fv = ((fv_r, fv_l)
                            if direction is DispDirection.RIGHT_TO_LEFT
                            else (fv_l, fv_r))
    H, W, F = target_fv.shape
    d = selected_index.astype(jnp.int32)
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]
    jd = jj + sign * d

    if cost_volume is None:
        from .cost_volume import feature_volume_to_cost_volume
        cost_volume = feature_volume_to_cost_volume(func, fv_l, fv_r,
                                                    disp_width, direction)
    D = cost_volume.shape[-1]
    jjb = jnp.broadcast_to(jj, d.shape)
    valid = (jjb > 1) & (jjb + 1 < W) & (d > 0) & (d + 1 < D)

    def cv_at(dd):
        return jnp.take_along_axis(cost_volume,
                                   jnp.clip(dd, 0, D - 1)[..., None],
                                   -1)[..., 0]

    cm1, c0, c1 = cv_at(d - 1), cv_at(d), cv_at(d + 1)
    den = 2.0 * (c1 - 2.0 * c0 + cm1)
    delta = (cm1 - c1) / jnp.where(den != 0, den, 1.0)
    delta = jnp.where(den != 0, delta, 0.0)

    dir_ = jnp.where(delta > 0, -1, 1).astype(jnp.int32)
    inner = (jd > 1) & (jd + 1 < W)
    src_half = _maybe_normalize(
        func, 0.5 * source_fv + 0.5 * _gather_cols(source_fv, jjb + dir_))
    fm1 = feature_comparison(
        func, src_half, _maybe_normalize(func, _gather_cols(target_fv,
                                                            jd - 1)))
    f0 = feature_comparison(
        func, src_half, _maybe_normalize(func, _gather_cols(target_fv, jd)))
    f1 = feature_comparison(
        func, src_half, _maybe_normalize(func, _gather_cols(target_fv,
                                                            jd + 1)))
    den2 = 2.0 * (f1 - 2.0 * f0 + fm1)
    delta2 = (fm1 - f1) / jnp.where(den2 != 0, den2, 1.0) \
        - dir_.astype(jnp.float32) * 0.5
    use2 = inner & (jnp.abs(delta2) < 1.0) & (den2 != 0)
    delta = jnp.where(use2, 0.5 * (delta + delta2), delta)

    out = d.astype(jnp.float32) + delta
    return jnp.where(valid, out, d.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Subpart (test-subset least-median) variants
# ---------------------------------------------------------------------------

def refine_subpart_barycentric_disp(func, fv_l, fv_r, selected_index,
                                    test_sets_idxs,
                                    direction=DispDirection.RIGHT_TO_LEFT):
    """`refineSubpartBarycentricDisp` (`image_based_refinement.h:516-675`):
    the two-sided 2-point refinement with the subpart least-median solver
    restricted to ``test_sets_idxs`` rows (MEDAD/ZMEDAD only).  Subsets are
    (n_sets, k) row-index sets (the reference stores them column-major)."""
    return refine_barycentric_disp(func, fv_l, fv_r, selected_index,
                                   direction, test_sets_idxs)


def refine_subpart_barycentric_symmetric_disp(
        func, fv_l, fv_r, selected_index, disp_width, test_sets_idxs,
        refine_radius=1, direction=DispDirection.RIGHT_TO_LEFT):
    """`refineSubpartBarycentricSymmetricDisp`
    (`image_based_refinement.h:108-184`)."""
    return refine_barycentric_symmetric_disp(
        func, fv_l, fv_r, selected_index, disp_width, refine_radius,
        direction, test_sets_idxs)


def refine_subpart_barycentric_2d_disp(func, source_fv, target_fv,
                                       selected_index, test_sets_idxs):
    """`refineSubpartBarycentric2dDisp`
    (`image_based_refinement.h:885-1066`)."""
    return refine_barycentric_2d_disp(func, source_fv, target_fv,
                                      selected_index,
                                      test_sets_idxs=test_sets_idxs)


# ---------------------------------------------------------------------------
# Symmetric 2-D (contiguity-neighborhood) refinement
# ---------------------------------------------------------------------------

# the reference's neighbor enumeration order (`contiguity.h:99-123`); the
# center column is appended LAST, matching `image_based_refinement.h:1183`
_REF_DIRS = {
    Contiguity.QUEEN: ((1, 1), (1, 0), (1, -1), (0, 1), (0, -1),
                       (-1, 1), (-1, 0), (-1, -1)),
    Contiguity.ROOK: ((1, 0), (0, 1), (0, -1), (-1, 0)),
}


def refine_barycentric_symmetric_2d_disp(
        func, fv_l, fv_r, selected_indices, search,
        contiguity: Contiguity = Contiguity.QUEEN,
        direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
        test_sets_idxs=None) -> jnp.ndarray:
    """`refineBarycentricSymmetric2dDisp`
    (`image_based_refinement.h:1071-1241`): one affine best approximation
    over the contiguity neighbors + center of the matched target pixel;
    delta = sum(alpha_k * dir_k), accepted when |delta_0| <= 1 and
    |delta_1| <= 1 AND the re-evaluated (re-normalized) interpolated score
    improves.  ``search`` is a SearchOffset2.  With ``test_sets_idxs`` this
    is `refineSubpartBarycentricSymmetric2dDisp` (:1246)."""
    source_fv, target_fv = ((fv_r, fv_l)
                            if direction is DispDirection.RIGHT_TO_LEFT
                            else (fv_l, fv_r))
    H, W, F = target_fv.shape
    d = selected_indices.astype(jnp.int32)
    d0, d1 = d[..., 0], d[..., 1]
    ii = jnp.arange(H, dtype=jnp.int32)[:, None]
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]
    idr = ii + d0
    jdr = jj + d1
    valid = ((idr >= 1) & (idr + 1 < H) & (jdr >= 1) & (jdr + 1 < W)
             & (d0 >= search.lower0) & (d0 <= search.upper0)
             & (d1 >= search.lower1) & (d1 <= search.upper1))
    ic = jnp.clip(idr, 1, H - 2)
    jc = jnp.clip(jdr, 1, W - 2)

    dirs = _REF_DIRS[contiguity]
    cols = [target_fv[ic + di, jc + dj] for (di, dj) in dirs]
    cols.append(target_fv[ic, jc])
    A = jnp.stack(cols, -1)                         # (H, W, F, nDirs+1)
    n = len(cols)

    solver = _barycentric_solver(func, test_sets_idxs)
    src = source_fv
    alphas = jax.vmap(solver)(A.reshape(-1, F, n),
                              src.reshape(-1, F)).reshape(H, W, n)

    di_vec = jnp.asarray([p[0] for p in dirs], jnp.float32)
    dj_vec = jnp.asarray([p[1] for p in dirs], jnp.float32)
    delta0 = jnp.sum(alphas[..., :-1] * di_vec, -1)
    delta1 = jnp.sum(alphas[..., :-1] * dj_vec, -1)

    src_n = _maybe_normalize(func, src)
    base_score = feature_comparison(func, src_n,
                                    _maybe_normalize(func, cols[-1]))
    interp = jnp.einsum("hwfn,hwn->hwf", A, alphas)
    tmp_score = feature_comparison(func, src_n,
                                   _maybe_normalize(func, interp))
    is_score = MATCH_TRAITS[func].strategy is ExtractionStrategy.SCORE
    better = tmp_score > base_score if is_score else tmp_score < base_score
    accept = (jnp.abs(delta0) <= 1.0) & (jnp.abs(delta1) <= 1.0) & better

    df = d.astype(jnp.float32)
    # where (not multiply) so NaN deltas from degenerate subset solves are
    # cleanly rejected (0 * NaN would leak NaN)
    deltas = jnp.stack([delta0, delta1], -1)
    refined = df + jnp.where(accept[..., None], deltas, 0.0)
    return jnp.where(valid[..., None], refined, df)


def refine_subpart_barycentric_symmetric_2d_disp(
        func, fv_l, fv_r, selected_indices, search, test_sets_idxs,
        contiguity: Contiguity = Contiguity.QUEEN,
        direction: DispDirection = DispDirection.RIGHT_TO_LEFT):
    """`refineSubpartBarycentricSymmetric2dDisp`
    (`image_based_refinement.h:1246-1416`)."""
    return refine_barycentric_symmetric_2d_disp(
        func, fv_l, fv_r, selected_indices, search, contiguity, direction,
        test_sets_idxs)


# ---------------------------------------------------------------------------
# Arbitrary-interpolation refinement (verification-grade scan of subpixel
# candidates, `image_based_refinement.h:362-372`: "more meant to be generic
# than optimized")
# ---------------------------------------------------------------------------

def _pyramid_kernel(x):
    return max(0.0, 1.0 - abs(x))


def _bicubic_kernel(x, a=-0.5):
    x = abs(x)
    if x < 1:
        return (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1
    if x < 2:
        return a * (x ** 3 - 5 * x ** 2 + 8 * x - 4)
    return 0.0


_INTERP_KERNELS = {"pyramid": (_pyramid_kernel, 1),
                   "bicubic": (_bicubic_kernel, 2)}


def _interp_weight_table(ts, kfun, taps):
    """(n_cands, n_taps) static weights w[c, k] = kernel(t_c - tap_k)."""
    return np.asarray([[kfun(float(t) - k) for k in taps] for t in ts],
                      np.float32)


def refine_arbitrary_interpolation_disp(
        func, fv_l, fv_r, selected_index, n_pixels_cut: int = 100,
        kernel: str = "pyramid", with_additional_refine: bool = True,
        direction: DispDirection = DispDirection.RIGHT_TO_LEFT) -> jnp.ndarray:
    """`refineArbitraryInterpolationDisp`
    (`image_based_refinement.h:373-514`): scan ``n_pixels_cut`` subpixel
    cuts on each side of the matched target column, interpolate the target
    feature vector there with the chosen kernel (clamped taps at image
    borders, like the reference's Constant border on the sliced line), keep
    the best-scoring candidate (first wins on ties, like the reference's
    strict-improvement scan); with ``with_additional_refine`` each candidate
    gets a 2-point barycentric correction between the previous and current
    interpolated vectors (accepted when coeff0 in (0, 1)).

    TPU design: all 2n candidates evaluate at once — interpolation is one
    einsum of a static (cands, taps) weight table against the gathered tap
    columns, and the per-candidate barycentric corrections are one vmapped
    batch."""
    kfun, kr = _INTERP_KERNELS[kernel]
    sign_dir = direction.delta_sign
    source_fv, target_fv = ((fv_r, fv_l)
                            if direction is DispDirection.RIGHT_TO_LEFT
                            else (fv_l, fv_r))
    H, W, F = target_fv.shape
    d = selected_index.astype(jnp.int32)
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]
    jd = jj + sign_dir * d
    valid = (jd >= 1) & (jd + 1 < W)

    bw = 1.0 / n_pixels_cut
    # candidate offsets in the reference's scan order (sign=-1 first)
    ts = ([-(c + 1) * bw for c in range(n_pixels_cut)]
          + [(c + 1) * bw for c in range(n_pixels_cut)])
    t_prev = ([-c * bw for c in range(n_pixels_cut)]
              + [c * bw for c in range(n_pixels_cut)])

    # taps jd + k; reference border handling == clamping k to [-kr, kr] then
    # the column to the image (Constant border on the sliced line)
    taps = list(range(-(kr + 1), kr + 2))
    tap_vals = jnp.stack(
        [_gather_cols(target_fv, jd + max(-kr, min(kr, k))) for k in taps],
        0)                                            # (K, H, W, F)

    Wt = jnp.asarray(_interp_weight_table(ts, kfun, taps))
    Wt_prev = jnp.asarray(_interp_weight_table(t_prev, kfun, taps))
    feats = jnp.einsum("ck,khwf->chwf", Wt, tap_vals)
    n_c = len(ts)

    src = source_fv
    src_n = _maybe_normalize(func, src)
    t0 = _gather_cols(target_fv, jd)
    base_cost = feature_comparison(func, src_n, _maybe_normalize(func, t0))

    t_arr = jnp.asarray(ts, jnp.float32)[:, None, None]
    if with_additional_refine:
        prevs = jnp.einsum("ck,khwf->chwf", Wt_prev, tap_vals)
        solver = _barycentric_solver(func)

        def solve_pair(a0, a1, b):
            return solver(jnp.stack([a0, a1], -1), b)

        coeffs = jax.vmap(solve_pair)(
            prevs.reshape(-1, F), feats.reshape(-1, F),
            jnp.broadcast_to(src, (n_c,) + src.shape).reshape(-1, F))
        coeffs = coeffs.reshape(n_c, H, W, 2)
        c0 = coeffs[..., 0]
        use = (c0 > 0) & (c0 < 1)
        # DeltaD = -deltaSign*sign*coeff0*binWidth; sign*binWidth = t - t_prev
        step = t_arr - jnp.asarray(t_prev, jnp.float32)[:, None, None]
        delta_extra = jnp.where(use, -sign_dir * c0 * step, 0.0)
        feats_used = jnp.where(
            use[..., None],
            coeffs[..., 0:1] * prevs + coeffs[..., 1:2] * feats, feats)
    else:
        delta_extra = jnp.zeros((n_c, H, W), jnp.float32)
        feats_used = feats

    costs = feature_comparison(
        func, src_n[None], _maybe_normalize(func, feats_used))  # (n_c, H, W)
    if MATCH_TRAITS[func].strategy is ExtractionStrategy.SCORE:
        costs = -costs
        base = -base_cost
    else:
        base = base_cost

    positions = (d.astype(jnp.float32)[None] + sign_dir * t_arr
                 + delta_extra)
    all_costs = jnp.concatenate([base[None], costs], 0)
    all_pos = jnp.concatenate([d.astype(jnp.float32)[None], positions], 0)
    best = jnp.argmin(all_costs, axis=0)              # first wins on ties
    refined = jnp.take_along_axis(all_pos, best[None], 0)[0]
    return jnp.where(valid, refined, d.astype(jnp.float32))


def refine_arbitrary_interpolation_2d_disp(
        func, source_fv, target_fv, selected_index, n_pixels_cut: int = 10,
        kernel: str = "pyramid",
        with_additional_refine: bool = True) -> jnp.ndarray:
    """`refineArbitraryInterpolation2dDisp`
    (`image_based_refinement.h:1423-1589`): the 2-D analogue over a
    (2n)^2 grid of subpixel offsets around the matched target pixel.

    Documented deviations — the reference body has three clear bugs we fix
    to the intended semantics: (a) the additional-refine loop indexes the
    C matrix with the outer loop variable (`:1541`, `C(0,i)` for `C(0,c)`),
    (b) an accepted refine adds `pixCoord` (= kernelRadius + deltaPix)
    instead of the relative correction to the disparity (`:1548`), and
    (c) without additional refine the candidate offset `deltaPix` is never
    applied to the output even when its cost wins (`:1568`).  Here a
    winning candidate contributes `deltaPix`, and an accepted refine adds
    `C @ coeffs` on top."""
    kfun, kr = _INTERP_KERNELS[kernel]
    H, W, F = target_fv.shape
    d = selected_index.astype(jnp.int32)
    d0, d1 = d[..., 0], d[..., 1]
    ii = jnp.arange(H, dtype=jnp.int32)[:, None]
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]
    idr = ii + d0
    jdr = jj + d1
    valid = (idr >= 1) & (idr + 1 < H) & (jdr >= 1) & (jdr + 1 < W)
    ic = jnp.clip(idr, 0, H - 1)
    jc = jnp.clip(jdr, 0, W - 1)

    bw = 1.0 / n_pixels_cut
    cuts = [(c + 1) * bw for c in range(-n_pixels_cut, n_pixels_cut)]

    taps = list(range(-(kr + 1), kr + 2))
    K = len(taps)
    # (Ki, Kj, H, W, F) clamped 2-D tap grid
    tap_vals = jnp.stack([
        jnp.stack([target_fv[jnp.clip(ic + max(-kr, min(kr, ki)), 0, H - 1),
                             jnp.clip(jc + max(-kr, min(kr, kj)), 0, W - 1)]
                   for kj in taps], 0)
        for ki in taps], 0)

    wi = jnp.asarray(_interp_weight_table(cuts, kfun, taps))   # (n, K)
    n = len(cuts)

    def interp_at(wrow_i, wrow_j):
        return jnp.einsum("i,j,ijhwf->hwf", wrow_i, wrow_j, tap_vals)

    src_n = _maybe_normalize(func, source_fv)
    t0 = tap_vals[K // 2, K // 2]
    base_cost = feature_comparison(func, src_n, _maybe_normalize(func, t0))
    is_score = MATCH_TRAITS[func].strategy is ExtractionStrategy.SCORE

    wi_prev = jnp.asarray(_interp_weight_table(
        [c - bw for c in cuts], kfun, taps))
    solver = _barycentric_solver(func) if with_additional_refine else None

    best_cost = base_cost if not is_score else -base_cost
    best_d0 = d0.astype(jnp.float32)
    best_d1 = d1.astype(jnp.float32)

    # the (a, b) candidate grid runs as ONE lax.scan over n^2 steps
    # (unrolling it traced n^2 einsum + vmapped-solver fan-outs into the
    # graph — minutes of compile at the default n=20 — for identical
    # values; memory stays at one candidate's working set)
    ga, gb = np.divmod(np.arange(n * n), n)
    cuts_arr = jnp.asarray(cuts, jnp.float32)
    xs = (jnp.asarray(wi)[ga], jnp.asarray(wi)[gb],
          jnp.asarray(wi_prev)[ga], jnp.asarray(wi_prev)[gb],
          cuts_arr[ga], cuts_arr[gb])

    def body(carry, x):
        best_cost, best_d0, best_d1 = carry
        wa, wb, wpa, wpb, ca, cb = x
        feat = interp_at(wa, wb)
        dd0 = jnp.broadcast_to(ca, (H, W))
        dd1 = jnp.broadcast_to(cb, (H, W))
        if with_additional_refine:
            # square corners at (0,0), (-bw,0), (0,-bw), (-bw,-bw)
            A1 = interp_at(wpa, wb)
            A2 = interp_at(wa, wpb)
            A3 = interp_at(wpa, wpb)
            A = jnp.stack([feat, A1, A2, A3], -1)
            co = jax.vmap(solver)(A.reshape(-1, F, 4),
                                  source_fv.reshape(-1, F))
            co = co.reshape(H, W, 4)
            ok = ((co[..., 0] > 0) & (co[..., 0] < 1)
                  & (co[..., 1] > 0) & (co[..., 1] < 1)
                  & (co[..., 2] > 0) & (co[..., 2] < 1))
            ci = -bw * (co[..., 1] + co[..., 3])
            cj = -bw * (co[..., 2] + co[..., 3])
            dd0 = dd0 + jnp.where(ok, ci, 0.0)
            dd1 = dd1 + jnp.where(ok, cj, 0.0)
            feat = jnp.where(ok[..., None],
                             jnp.einsum("hwfn,hwn->hwf", A, co), feat)
        cost = feature_comparison(func, src_n,
                                  _maybe_normalize(func, feat))
        if is_score:
            cost = -cost
        win = cost < best_cost
        best_cost = jnp.where(win, cost, best_cost)
        best_d0 = jnp.where(win, d0 + dd0, best_d0)
        best_d1 = jnp.where(win, d1 + dd1, best_d1)
        return (best_cost, best_d0, best_d1), None

    (best_cost, best_d0, best_d1), _ = jax.lax.scan(
        body, (best_cost, best_d0, best_d1), xs)

    refined = jnp.stack([best_d0, best_d1], -1)
    return jnp.where(valid[..., None], refined, d.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Feature-volume and image-level convenience entry points
# (`image_based_refinement.h:1692-2795`): build the cost volume, extract
# the WTA index and refine in one call.  Trait-driven preprocessing per
# `refined*DispFeatureVol` (:1702-1767): ZeroMean+Normalized functions
# match on the normalized volumes and refine on the zero-mean ones unless
# ``pre_normalize``; Normalized-only functions refine on the raw volumes
# unless ``pre_normalize``.  The subpart (sliding-sub-window) variants are
# selected automatically for the sampling costs (MEDAD/ZMEDAD), as the
# reference's trait dispatch does (:2435-2469).
# ---------------------------------------------------------------------------

_SUBPART_FUNCS = (MatchingFunction.MEDAD, MatchingFunction.ZMEDAD)


def _trait_volumes(func, fv_l, fv_r, pre_normalize):
    """Returns ((cv_fv_l, cv_fv_r), (refine_fv_l, refine_fv_r)) per the
    matching function's ZeroMean/Normalized traits."""
    from .cost_volume import (channels_mean, channels_norm,
                              channels_zero_mean_norm)
    tr = MATCH_TRAITS[func]
    fv_l = fv_l.astype(jnp.float32)
    fv_r = fv_r.astype(jnp.float32)
    if tr.zero_mean and tr.normalized:
        ml, mr = channels_mean(fv_l), channels_mean(fv_r)
        zl, zr = fv_l - ml[..., None], fv_r - mr[..., None]
        sl = channels_zero_mean_norm(fv_l, ml)
        sr = channels_zero_mean_norm(fv_r, mr)
        nl, nr = zl / sl[..., None], zr / sr[..., None]
        return (nl, nr), ((nl, nr) if pre_normalize else (zl, zr))
    if tr.zero_mean:
        zl = fv_l - channels_mean(fv_l)[..., None]
        zr = fv_r - channels_mean(fv_r)[..., None]
        return (zl, zr), (zl, zr)
    if tr.normalized:
        nl = fv_l / channels_norm(fv_l)[..., None]
        nr = fv_r / channels_norm(fv_r)[..., None]
        return (nl, nr), ((nl, nr) if pre_normalize else (fv_l, fv_r))
    return (fv_l, fv_r), (fv_l, fv_r)


def _cv_and_index(func, cv_l, cv_r, search, direction):
    from .cost_volume import aggregate_cost, extract_selected_index
    cv = aggregate_cost(func, cv_l, cv_r, search, direction)
    return extract_selected_index(cv, MATCH_TRAITS[func].strategy)


def refined_barycentric_symmetric_disp_fv(
        func, fv_l, fv_r, search_range: int, refine_radius: int = 1,
        direction=DispDirection.RIGHT_TO_LEFT, pre_normalize: bool = False,
        test_sets_idxs=None):
    """`refinedBarycentricSymmetricDispFeatureVol`
    (`image_based_refinement.h:1693`) / `refinedSubpart...` (:1779) when
    ``test_sets_idxs`` is given."""
    (cl, cr), (rl, rr) = _trait_volumes(func, fv_l, fv_r, pre_normalize)
    idx = _cv_and_index(func, cl, cr, search_range, direction)
    return refine_barycentric_symmetric_disp(
        func, rl, rr, idx, search_range, refine_radius, direction,
        test_sets_idxs)


def refined_barycentric_disp_fv(
        func, fv_l, fv_r, search_range: int,
        direction=DispDirection.RIGHT_TO_LEFT, pre_normalize: bool = False,
        test_sets_idxs=None):
    """`refinedBarycentricDispFeatureVol` (:1855) / subpart (:1941)."""
    (cl, cr), (rl, rr) = _trait_volumes(func, fv_l, fv_r, pre_normalize)
    idx = _cv_and_index(func, cl, cr, search_range, direction)
    return refine_barycentric_disp(func, rl, rr, idx, direction,
                                   test_sets_idxs)


def refined_cost_symmetric_disp_fv(
        func, fv_l, fv_r, search_range: int,
        direction=DispDirection.RIGHT_TO_LEFT, pre_normalize: bool = False):
    """`refinedCostSymmetricDispFeatureVol` (:2352)."""
    from .cost_volume import aggregate_cost, extract_selected_index
    (cl, cr), (rl, rr) = _trait_volumes(func, fv_l, fv_r, pre_normalize)
    cv = aggregate_cost(func, cl, cr, search_range, direction)
    idx = extract_selected_index(cv, MATCH_TRAITS[func].strategy)
    return refine_cost_symmetric_disp(func, rl, rr, idx, search_range,
                                      direction, cost_volume=cv)


def refined_barycentric_2d_disp_fv(
        func, fv_l, fv_r, search, direction=DispDirection.RIGHT_TO_LEFT,
        pre_normalize: bool = False, test_sets_idxs=None):
    """`refinedBarycentric2dDispFeatureVol` (:2020) / subpart (:2108).
    ``search`` is a SearchOffset2; returns the refined (H, W, 2) flow."""
    from .cost_volume import (aggregate_cost, extract_selected_2d_index,
                              selected_2d_index_to_disp)
    (cl, cr), (rl, rr) = _trait_volumes(func, fv_l, fv_r, pre_normalize)
    cv = aggregate_cost(func, cl, cr, search, direction)
    idx = extract_selected_2d_index(cv, MATCH_TRAITS[func].strategy)
    d = selected_2d_index_to_disp(idx, search)
    src, tgt = ((rr, rl) if direction is DispDirection.RIGHT_TO_LEFT
                else (rl, rr))
    return refine_barycentric_2d_disp(func, src, tgt, d, search=search,
                                      test_sets_idxs=test_sets_idxs)


def refined_barycentric_symmetric_2d_disp_fv(
        func, fv_l, fv_r, search, contiguity: Contiguity = Contiguity.QUEEN,
        direction=DispDirection.RIGHT_TO_LEFT, pre_normalize: bool = False,
        test_sets_idxs=None):
    """`refinedBarycentricSymmetric2dDispFeatureVol` (:2187) / subpart
    (:2275)."""
    from .cost_volume import (aggregate_cost, extract_selected_2d_index,
                              selected_2d_index_to_disp)
    (cl, cr), (rl, rr) = _trait_volumes(func, fv_l, fv_r, pre_normalize)
    cv = aggregate_cost(func, cl, cr, search, direction)
    idx = extract_selected_2d_index(cv, MATCH_TRAITS[func].strategy)
    d = selected_2d_index_to_disp(idx, search)
    return refine_barycentric_symmetric_2d_disp(
        func, rl, rr, d, search, contiguity, direction, test_sets_idxs)


def _unfold_pair(img_l, img_r, h_radius, v_radius):
    from .unfold import unfold, unfold_sliding_subwindow_idxs
    fv_l = unfold(h_radius, v_radius, img_l)
    fv_r = unfold(h_radius, v_radius, img_r)
    channels = 1 if img_l.ndim == 2 else img_l.shape[2]
    sub = unfold_sliding_subwindow_idxs(h_radius, v_radius, h_radius + 1,
                                        v_radius + 1, channels)
    return fv_l, fv_r, sub


def refined_barycentric_symmetric_disp(
        func, img_l, img_r, h_radius: int, v_radius: int, search_range: int,
        refine_radius: int = 1, direction=DispDirection.RIGHT_TO_LEFT,
        pre_normalize: bool = False):
    """Image-level entry (`refinedBarycentricSymmetricDisp`, :2427):
    unfold both images, then cost volume + WTA + symmetric barycentric
    refinement; the sampling costs (MEDAD/ZMEDAD) automatically use the
    sliding-sub-window subpart solver (:2460-2467)."""
    fv_l, fv_r, sub = _unfold_pair(img_l, img_r, h_radius, v_radius)
    ts = sub if func in _SUBPART_FUNCS else None
    return refined_barycentric_symmetric_disp_fv(
        func, fv_l, fv_r, search_range, refine_radius, direction,
        pre_normalize, ts)


def refined_barycentric_disp(
        func, img_l, img_r, h_radius: int, v_radius: int, search_range: int,
        direction=DispDirection.RIGHT_TO_LEFT, pre_normalize: bool = False):
    """`refinedBarycentricDisp` (:2503)."""
    fv_l, fv_r, sub = _unfold_pair(img_l, img_r, h_radius, v_radius)
    ts = sub if func in _SUBPART_FUNCS else None
    return refined_barycentric_disp_fv(func, fv_l, fv_r, search_range,
                                       direction, pre_normalize, ts)


def refined_cost_symmetric_disp(
        func, img_l, img_r, h_radius: int, v_radius: int, search_range: int,
        direction=DispDirection.RIGHT_TO_LEFT, pre_normalize: bool = False):
    """`refinedCostSymmetricDisp` (:2574)."""
    from .unfold import unfold
    fv_l = unfold(h_radius, v_radius, img_l)
    fv_r = unfold(h_radius, v_radius, img_r)
    return refined_cost_symmetric_disp_fv(func, fv_l, fv_r, search_range,
                                          direction, pre_normalize)


def refined_barycentric_2d_disp(
        func, img_l, img_r, h_radius: int, v_radius: int, search,
        direction=DispDirection.RIGHT_TO_LEFT, pre_normalize: bool = False):
    """`refinedBarycentric2dDisp` (:2632)."""
    fv_l, fv_r, sub = _unfold_pair(img_l, img_r, h_radius, v_radius)
    ts = sub if func in _SUBPART_FUNCS else None
    return refined_barycentric_2d_disp_fv(func, fv_l, fv_r, search,
                                          direction, pre_normalize, ts)


def refined_barycentric_symmetric_2d_disp(
        func, img_l, img_r, h_radius: int, v_radius: int, search,
        contiguity: Contiguity = Contiguity.QUEEN,
        direction=DispDirection.RIGHT_TO_LEFT, pre_normalize: bool = False):
    """`refinedBarycentricSymmetric2dDisp` (:2714)."""
    fv_l, fv_r, sub = _unfold_pair(img_l, img_r, h_radius, v_radius)
    ts = sub if func in _SUBPART_FUNCS else None
    return refined_barycentric_symmetric_2d_disp_fv(
        func, fv_l, fv_r, search, contiguity, direction, pre_normalize, ts)
