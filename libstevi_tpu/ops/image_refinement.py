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

import jax
import jax.numpy as jnp

from ..core.types import (MatchingFunction, MATCH_TRAITS, ExtractionStrategy,
                          DispDirection)
from .matching import feature_comparison
from ..optim.lsq import (affine_best_l2_approximation,
                         spherical_affine_best_approximation)
from ..optim.l1 import affine_best_l1_approximation


def _barycentric_solver(func: MatchingFunction):
    k = MATCH_TRAITS[func].kernel
    norm = MATCH_TRAITS[func].normalized
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
                            direction: DispDirection = DispDirection.RIGHT_TO_LEFT
                            ) -> jnp.ndarray:
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

    solver = _barycentric_solver(func)

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
        direction: DispDirection = DispDirection.RIGHT_TO_LEFT) -> jnp.ndarray:
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
    solver = _barycentric_solver(func)

    coeffs = jax.vmap(solver)(A.reshape(-1, F, 2 * r + 1),
                              source_fv.reshape(-1, F))
    coeffs = coeffs.reshape(H, W, 2 * r + 1)
    ps = jnp.arange(-r, r + 1, dtype=jnp.float32)
    delta = jnp.sum(coeffs * ps, -1)
    refined = jnp.where(jnp.abs(delta) < 1,
                        d.astype(jnp.float32) + delta,
                        d.astype(jnp.float32))
    return jnp.where(valid, refined, d.astype(jnp.float32))


def refine_barycentric_2d_disp(func: MatchingFunction, source_fv: jnp.ndarray,
                               target_fv: jnp.ndarray,
                               selected_index: jnp.ndarray) -> jnp.ndarray:
    """2-D barycentric refinement of an (H, W, 2) flow field
    (`refineBarycentric2dDisp`, `image_based_refinement.h:679`): per axis,
    barycentric best approximation between the matched target feature and
    its +-1 neighbors along that axis; candidate deltas accepted in (0, 1)
    when the comparison improves (the 2-D analogue of
    `refine_barycentric_disp`)."""
    H, W, F = target_fv.shape
    d = selected_index.astype(jnp.int32)
    ii = jnp.arange(H, dtype=jnp.int32)[:, None]
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]
    ti = jnp.clip(ii + d[..., 0], 1, H - 2)
    tj = jnp.clip(jj + d[..., 1], 1, W - 2)
    valid = ((ii + d[..., 0] >= 1) & (ii + d[..., 0] < H - 1)
             & (jj + d[..., 1] >= 1) & (jj + d[..., 1] < W - 1))

    def grab(di, dj):
        return target_fv[ti + di, tj + dj]

    t0 = grab(0, 0)
    solver = _barycentric_solver(func)
    src = source_fv
    src_n = _maybe_normalize(func, src)
    t0_n = _maybe_normalize(func, t0)
    base_score = feature_comparison(func, src_n, t0_n)
    is_score = MATCH_TRAITS[func].strategy is ExtractionStrategy.SCORE

    def better(a, b):
        return a > b if is_score else a < b

    def axis_delta(tp, tm, score):
        flat = lambda x: x.reshape(-1, F)

        def solve_pair(a0, a1, b):
            return solver(jnp.stack([a0, a1], -1), b)

        cp = jax.vmap(solve_pair)(flat(t0), flat(tp), flat(src)).reshape(
            H, W, 2)
        cm = jax.vmap(solve_pair)(flat(tm), flat(t0), flat(src)).reshape(
            H, W, 2)
        dd_p = cp[..., 1]
        dd_m = cm[..., 0]
        ip = _maybe_normalize(func, t0 * cp[..., 0:1] + tp * cp[..., 1:2])
        im = _maybe_normalize(func, tm * cm[..., 0:1] + t0 * cm[..., 1:2])
        sp = feature_comparison(func, src_n, ip)
        sm = feature_comparison(func, src_n, im)
        delta = jnp.zeros((H, W), jnp.float32)
        ok_p = (dd_p > 0) & (dd_p < 1) & better(sp, score)
        delta = jnp.where(ok_p, dd_p, delta)
        score = jnp.where(ok_p, sp, score)
        ok_m = (dd_m > 0) & (dd_m < 1) & better(sm, score)
        delta = jnp.where(ok_m, -dd_m, delta)
        score = jnp.where(ok_m, sm, score)
        return delta, score

    delta0, s0 = axis_delta(grab(1, 0), grab(-1, 0), base_score)
    delta1, _ = axis_delta(grab(0, 1), grab(0, -1), base_score)

    refined = d.astype(jnp.float32) + jnp.stack([delta0, delta1], -1)
    return jnp.where(valid[..., None], refined, d.astype(jnp.float32))


def refine_cost_symmetric_disp(func: MatchingFunction, fv_l, fv_r,
                               selected_index, disp_width,
                               direction=DispDirection.RIGHT_TO_LEFT,
                               kernel=None) -> jnp.ndarray:
    """Cost-based symmetric refinement from feature volumes
    (`refineCostSymmetricDisp`, `image_based_refinement.h:1592`): evaluate
    the comparison at jd-1, jd, jd+1 and interpolate the cost triplet."""
    from .refinement import refine_cost_triplet, InterpolationKernel
    if kernel is None:
        kernel = InterpolationKernel.PARABOLA
    sign = direction.delta_sign
    source_fv, target_fv = ((fv_r, fv_l)
                            if direction is DispDirection.RIGHT_TO_LEFT
                            else (fv_l, fv_r))
    H, W, F = target_fv.shape
    d = selected_index.astype(jnp.int32)
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]
    jd = jj + sign * d
    valid = (jd >= 1) & (jd + 1 < W) & (d != 0) & (d + 1 < disp_width)

    cm1 = feature_comparison(func, source_fv, _gather_cols(target_fv, jd - 1))
    c0 = feature_comparison(func, source_fv, _gather_cols(target_fv, jd))
    c1 = feature_comparison(func, source_fv, _gather_cols(target_fv, jd + 1))
    if MATCH_TRAITS[func].strategy is ExtractionStrategy.SCORE:
        cm1, c0, c1 = -cm1, -c0, -c1
    delta = refine_cost_triplet(kernel, cm1, c0, c1)
    delta = jnp.where(jnp.abs(delta) < 1, delta, 0.0)
    out = d.astype(jnp.float32) + sign * delta
    return jnp.where(valid, out, d.astype(jnp.float32))
