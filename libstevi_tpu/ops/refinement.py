"""Cost-based subpixel refinement.

Reference parity: `correlation/cost_based_refinement.h` —
`refineCostTriplet` (:44; Equiangular / Parabola / Gaussian 1-D peak
kernels), `refineDispCostInterpolation` (:129), 2-D isotropic & anisotropic
line-fit refinement (`refineDisp2dCostInterpolation`, :166) and the 9-point
quadratic patch fit (`refineCostPatch`/`refineDisp2dCostPatchInterpolation`,
:72,379).  1-D refinement does NOT clamp deltas (the reference doesn't); the
2-D variants zero both deltas when |delta| > 1 or NaN (:362-366,424-428).

TPU design: everything is elementwise over (H, W) maps — pure VPU.  The
9-point patch fit's 6-parameter LSQ has a constant normal matrix, so the
pseudo-inverse is folded into static coefficients at trace time instead of a
per-pixel matrix inverse.
"""

from __future__ import annotations

import enum

import numpy as np
import jax.numpy as jnp


class InterpolationKernel(enum.Enum):
    EQUIANGULAR = 0
    PARABOLA = 1
    GAUSSIAN = 2


class IsotropyHypothesis(enum.Enum):
    ISOTROPIC = 0
    ANISOTROPIC = 1


def refine_cost_triplet(kernel: InterpolationKernel, cm1, c0, c1):
    """Subpixel offset from a (c[-1], c[0], c[1]) triplet
    (`refineCostTriplet`, `cost_based_refinement.h:44-69`)."""
    if kernel is InterpolationKernel.EQUIANGULAR:
        alpha = jnp.copysign(1.0, c0 - cm1) * jnp.maximum(
            jnp.abs(c0 - cm1), jnp.abs(c1 - c0))
        return (c1 - cm1) / (2 * alpha)
    if kernel is InterpolationKernel.PARABOLA:
        return (cm1 - c1) / (2 * (c1 - 2 * c0 + cm1))
    lm1, l0, l1 = jnp.log(cm1), jnp.log(c0), jnp.log(c1)
    return (lm1 - l1) / (2 * (l1 - 2 * l0 + lm1))


def refine_disp_cost_interpolation(kernel: InterpolationKernel,
                                   truncated_cv: jnp.ndarray,
                                   raw_disparity: jnp.ndarray) -> jnp.ndarray:
    """refined = raw + triplet offset around the center slot of an
    (H, W, 2r+1) truncated cost volume (`refineDispCostInterpolation`,
    `cost_based_refinement.h:129-163`)."""
    r = (truncated_cv.shape[-1] - 1) // 2
    if r < 1 or 2 * r + 1 != truncated_cv.shape[-1]:
        raise ValueError("truncated cost volume must have odd width >= 3")
    delta = refine_cost_triplet(kernel, truncated_cv[..., r - 1],
                                truncated_cv[..., r], truncated_cv[..., r + 1])
    return raw_disparity.astype(jnp.float32) + delta


# ---------------------------------------------------------------------------
# 2-D refinement
# ---------------------------------------------------------------------------

def _is_score_volume(tcv: jnp.ndarray) -> jnp.ndarray:
    """Heuristic score/cost detection from the central pixel
    (`cost_based_refinement.h:184-203`)."""
    H, W = tcv.shape[0], tcv.shape[1]
    r0 = (tcv.shape[2] - 1) // 2
    r1 = (tcv.shape[3] - 1) // 2
    v0 = tcv[H // 2, W // 2, r0, r1]
    return ((v0 > tcv[H // 2, W // 2, r0 + 1, r1])
            | (v0 > tcv[H // 2, W // 2, r0 - 1, r1])
            | (v0 > tcv[H // 2, W // 2, r0, r1 + 1])
            | (v0 > tcv[H // 2, W // 2, r0, r1 - 1]))


def _guarded(delta0, delta1, raw):
    bad = ((jnp.abs(delta0) > 1) | (jnp.abs(delta1) > 1)
           | jnp.isnan(delta0) | jnp.isnan(delta1))
    delta0 = jnp.where(bad, 0.0, delta0)
    delta1 = jnp.where(bad, 0.0, delta1)
    return jnp.stack([raw[..., 0] + delta0, raw[..., 1] + delta1], axis=-1)


def refine_disp_2d_cost_interpolation(
        kernel: InterpolationKernel, truncated_cv: jnp.ndarray,
        raw_disparity: jnp.ndarray,
        isotropy: IsotropyHypothesis = IsotropyHypothesis.ISOTROPIC
        ) -> jnp.ndarray:
    """2-D subpixel refinement on an (H, W, 2r0+1, 2r1+1) truncated CV
    (`refineDisp2dCostInterpolation`, `cost_based_refinement.h:166-376`)."""
    H, W, S0, S1 = truncated_cv.shape
    r0, r1 = (S0 - 1) // 2, (S1 - 1) // 2
    if S0 % 2 == 0 or S1 % 2 == 0:
        raise ValueError("2-D truncated cost volume widths must be odd "
                         "(2r+1; `cost_based_refinement.h:180`)")
    if r0 < 1 or r1 < 1:
        raise ValueError("2-D truncated cost volume radii must be >= 1")
    tcv = truncated_cv.astype(jnp.float32)
    raw = raw_disparity.astype(jnp.float32)

    if isotropy is IsotropyHypothesis.ISOTROPIC:
        delta0 = refine_cost_triplet(kernel, tcv[..., r0 - 1, r1],
                                     tcv[..., r0, r1], tcv[..., r0 + 1, r1])
        delta1 = refine_cost_triplet(kernel, tcv[..., r0, r1 - 1],
                                     tcv[..., r0, r1], tcv[..., r0, r1 + 1])
        return _guarded(delta0, delta1, raw)

    is_score = _is_score_volume(tcv)

    def tie_last_argopt(vals, axis):
        # ties toward the last index, matching the reference's >= / <= loops
        D = vals.shape[axis]
        flipped = jnp.flip(vals, axis=axis)
        amin = D - 1 - jnp.argmin(flipped, axis=axis)
        amax = D - 1 - jnp.argmax(flipped, axis=axis)
        return jnp.where(is_score, amax, amin)

    def line_delta(along0: bool):
        """Fit delta_a = a * delta_b + b from triplet refinements on the
        center row/col and its two neighbors (:272-353)."""
        if along0:
            center = refine_cost_triplet(kernel, tcv[..., r0 - 1, r1],
                                         tcv[..., r0, r1], tcv[..., r0 + 1, r1])
            deltas = [None, center, None]
            for side, off in ((0, -1), (2, +1)):
                col = tcv[..., :, r1 + off]              # (H, W, S0)
                am = tie_last_argopt(col, -1)
                interior = (am > 0) & (am < S0 - 1)
                amc = jnp.clip(am, 1, S0 - 2).astype(jnp.int32)
                cm1 = jnp.take_along_axis(col, (amc - 1)[..., None], -1)[..., 0]
                c0 = jnp.take_along_axis(col, amc[..., None], -1)[..., 0]
                c1 = jnp.take_along_axis(col, (amc + 1)[..., None], -1)[..., 0]
                d = amc - r0 + refine_cost_triplet(kernel, cm1, c0, c1)
                deltas[side] = jnp.where(interior, d, center)
        else:
            center = refine_cost_triplet(kernel, tcv[..., r0, r1 - 1],
                                         tcv[..., r0, r1], tcv[..., r0, r1 + 1])
            deltas = [None, center, None]
            for side, off in ((0, -1), (2, +1)):
                row = tcv[..., r0 + off, :]              # (H, W, S1)
                am = tie_last_argopt(row, -1)
                interior = (am > 0) & (am < S1 - 1)
                amc = jnp.clip(am, 1, S1 - 2).astype(jnp.int32)
                cm1 = jnp.take_along_axis(row, (amc - 1)[..., None], -1)[..., 0]
                c0 = jnp.take_along_axis(row, amc[..., None], -1)[..., 0]
                c1 = jnp.take_along_axis(row, (amc + 1)[..., None], -1)[..., 0]
                d = amc - r1 + refine_cost_triplet(kernel, cm1, c0, c1)
                deltas[side] = jnp.where(interior, d, center)
        a = (deltas[2] - deltas[0]) / 2
        b = (deltas[0] + deltas[1] + deltas[2]) / 3
        return a, b

    a0, b0 = line_delta(True)
    a1, b1 = line_delta(False)
    denom = 1 - a0 * a1
    delta0 = (a0 * b1 + b0) / denom
    delta1 = (a1 * b0 + b1) / denom
    return _guarded(delta0, delta1, raw)


# Static pseudo-inverse of the 9-point quadratic design matrix
# (`refineCostPatch`, `cost_based_refinement.h:85-116`): rows are
# [dv^2, dv*dh, dh^2, dv, dh, 1] for (dv, dh) on the 3x3 stencil.
def _patch_pinv() -> np.ndarray:
    dv = np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], np.float64)
    dh = np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], np.float64)
    A = np.stack([dv * dv, dv * dh, dh * dh, dv, dh, np.ones(9)], axis=1)
    return np.linalg.inv(A.T @ A) @ A.T  # (6, 9)


_PATCH_PINV = _patch_pinv().astype(np.float32)


def refine_cost_patch(kernel: InterpolationKernel, patch: jnp.ndarray):
    """Newton step of a 6-parameter quadratic fit to a (..., 3, 3) cost patch;
    returns (delta0, delta1)."""
    if kernel is InterpolationKernel.GAUSSIAN:
        patch = jnp.log(patch)
    elif kernel is not InterpolationKernel.PARABOLA:
        raise ValueError("patch refinement supports Parabola or Gaussian")
    L = patch.reshape(patch.shape[:-2] + (9,))
    fitted = jnp.einsum("...j,kj->...k", L, jnp.asarray(_PATCH_PINV))
    a, b, c, d, e = fitted[..., 0], fitted[..., 1], fitted[..., 2], \
        fitted[..., 3], fitted[..., 4]
    # solve [[2a, b], [b, 2c]] x = [-d, -e]
    det = 4 * a * c - b * b
    delta0 = (-2 * c * d + b * e) / det
    delta1 = (b * d - 2 * a * e) / det
    return delta0, delta1


def refine_disp_2d_cost_patch_interpolation(
        kernel: InterpolationKernel, truncated_cv: jnp.ndarray,
        raw_disparity: jnp.ndarray) -> jnp.ndarray:
    """9-point quadratic patch refinement
    (`refineDisp2dCostPatchInterpolation`, `cost_based_refinement.h:379-436`)."""
    S0, S1 = truncated_cv.shape[2], truncated_cv.shape[3]
    r0, r1 = (S0 - 1) // 2, (S1 - 1) // 2
    patch = truncated_cv[..., r0 - 1:r0 + 2, r1 - 1:r1 + 2].astype(jnp.float32)
    delta0, delta1 = refine_cost_patch(kernel, patch)
    return _guarded(delta0, delta1, raw_disparity.astype(jnp.float32))
