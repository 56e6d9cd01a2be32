"""Hierarchical (coarse-to-fine) matcher.

Reference parity: `correlation/hierarchical.h` — `buildFeaturePyramid` (:46,
unfold at each x2 average-pooled level), `computeGuidedCV` (:74: bilinear
align-corners-style upsample of the coarse disparity guide with the
reference's exact edge handling, x2 disparity upscale, truncated CV of
radius `upscale_disp_radius` around the guide, window recentering when a
better local optimum is found), and `hiearchicalTruncatedCostVolume` (:236,
recursive descent, coarsest level = full CV + WTA at (disp_width+1)/2^depth).

TPU design: the reference's sequential recentering loop (:194-226) is
algebraically equivalent to evaluating the truncated window twice — once
around the guide to find the refined optimum d_r, once around d_r — because
the shifted+refilled window ends up exactly centered on d_r.  Both passes
are batched per-pixel gathers over the target feature volume
(`take_along_axis` along W), vectorized over the window offsets.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core.types import (MatchingFunction, MATCH_TRAITS, ExtractionStrategy,
                          DispDirection, disp_dtype)
from .unfold import unfold
from .cost_volume import (normalize_feature_volume, unfold_based_cost_volume,
                          extract_selected_index, _source_target)
from .matching import feature_comparison
from ..interpolation.downsampling import average_pooling_downsample


@dataclass
class OffsetedCostVolume:
    """`OffsetedCostVolume` (`hierarchical.h:34-37`): the truncated cost
    volume around the estimate plus the (positive) disparity estimate."""

    truncated_cost_volume: jnp.ndarray
    disp_estimate: jnp.ndarray


def _bilinear_guide(disp_guide: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Upsample the coarse guide to (h, w) with the reference's exact
    bilinear scheme (`hierarchical.h:116-155`), including the x2 disparity
    upscale."""
    hg, wg = disp_guide.shape
    g = disp_guide.astype(jnp.float32)

    v_pos = jnp.arange(h, dtype=jnp.float32) * (hg - 1) / (h - 1)
    h_pos = jnp.arange(w, dtype=jnp.float32) * (wg - 1) / (w - 1)

    def bounds(pos, size):
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.ceil(pos).astype(jnp.int32)
        hi = jnp.where(lo == hi, hi + 1, hi)
        shift = hi == size
        lo = jnp.where(shift, lo - 1, lo)
        hi = jnp.where(shift, hi - 1, hi)
        return lo, hi

    v0, v1 = bounds(v_pos, hg)
    h0, h1 = bounds(h_pos, wg)

    wv = (v_pos - v0.astype(jnp.float32))[:, None]
    wh = (h_pos - h0.astype(jnp.float32))[None, :]

    g11 = g[v1][:, h1]
    g01 = g[v0][:, h1]
    g10 = g[v1][:, h0]
    g00 = g[v0][:, h0]

    interp = (wv * wh * g11 + (1 - wv) * wh * g01
              + wv * (1 - wh) * g10 + (1 - wv) * (1 - wh) * g00)
    return interp * 2.0


def _window_costs(func: MatchingFunction, source_fv, target_fv, center,
                  radius: int, dir_sign: int, cv_dtype):
    """costs[..., k] = compare(source[i,j], target[i, j + center + dir_sign *
    (k - radius)]), zero target vector out of range.  center is (H, W) int32
    of *index-space* disparities (already sign-folded).

    The per-pixel W-axis lookup runs as a one-hot matmul on the MXU
    (out-of-range rows are all-zero, matching the reference's
    zero-target-vector convention).  The one-hot is built PER SLOT from
    the slot's own target index, so validity is per-slot (a shared
    center one-hot zeroed every slot of a pixel whose CENTER was out of
    range, even when the slot itself was in-image).  Census-family
    features are packed uint32 bit words — float matmuls round them
    (bf16 above 256, f32 above 2^24) — so they take an exact gather."""
    from ..core.types import MATCH_TRAITS as _MT
    H, W, F = target_fv.shape
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]
    hot_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                 else jnp.float32)
    base_j = jj + center
    census = _MT[func].census
    tgtc = target_fv if census else target_fv.astype(hot_dtype)
    outs = []
    for k in range(2 * radius + 1):
        sh = dir_sign * (k - radius)
        t_j = base_j + sh
        inb = (t_j >= 0) & (t_j < W)
        if census:
            tj = jnp.clip(t_j, 0, W - 1)
            g = jnp.take_along_axis(tgtc, tj[..., None], axis=1)
            g = jnp.where(inb[..., None], g, 0)
        else:
            onehot = (t_j[..., None] == jnp.arange(W, dtype=jnp.int32)
                      ).astype(hot_dtype)                # (H, W, W)
            g = jnp.einsum("hjw,hwf->hjf", onehot, tgtc,
                           preferred_element_type=jnp.float32)
        outs.append(feature_comparison(func, source_fv, g).astype(cv_dtype))
    return jnp.stack(outs, axis=-1)


def compute_guided_cv(func: MatchingFunction, fv_l: jnp.ndarray,
                      fv_r: jnp.ndarray, disp_guide: jnp.ndarray,
                      upscale_disp_radius: int = 2,
                      direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
                      cv_dtype=jnp.float32) -> OffsetedCostVolume:
    """Truncated cost volume around the (upscaled) disparity guide with
    recentering (`computeGuidedCV`, `hierarchical.h:74-233`).  Feature
    volumes must already be normalized for ``func``."""
    traits = MATCH_TRAITS[func]
    source_fv, target_fv = _source_target(direction, fv_l, fv_r)
    dir_sign = direction.delta_sign
    H, W, _ = source_fv.shape
    r = upscale_disp_radius

    guide = _bilinear_guide(disp_guide, H, W)
    d0 = (dir_sign * jnp.round(guide)).astype(jnp.int32)  # index-space center

    # pass 1: window around d0.  The reference stores slot
    # dirSign*delta + r for delta in [-r, r] (slot k <-> delta =
    # dir_sign * (k - r), target position j + d0 + delta); _window_costs
    # evaluates slots at j + d0 + (k - r), so LEFT_TO_RIGHT flips the slot
    # axis to match.
    costs0 = _window_costs(func, source_fv, target_fv, d0, r, 1, cv_dtype)
    if dir_sign == -1:
        costs0 = jnp.flip(costs0, -1)

    # refined optimum: the reference iterates delta = -r..r with strict
    # improvement, so the FIRST optimum in delta order wins; in slot order
    # that is ascending k for RIGHT_TO_LEFT and descending k for
    # LEFT_TO_RIGHT.
    vals = costs0 if traits.strategy is ExtractionStrategy.COST else -costs0
    if dir_sign == 1:
        k_best = jnp.argmin(vals, axis=-1)          # first (lowest k) wins
    else:
        Dk = vals.shape[-1]
        k_best = Dk - 1 - jnp.argmin(jnp.flip(vals, -1), axis=-1)
    delta_best = dir_sign * (k_best.astype(jnp.int32) - r)
    d_r = d0 + delta_best
    disp_estimate = (dir_sign * d_r).astype(disp_dtype)

    # pass 2: window centered on d_r (equivalent to the reference's shift +
    # refill, `hierarchical.h:194-226`)
    costs1 = _window_costs(func, source_fv, target_fv, d_r, r, 1, cv_dtype)
    if dir_sign == -1:
        costs1 = jnp.flip(costs1, -1)

    return OffsetedCostVolume(costs1, disp_estimate)


def hierarchical_truncated_cost_volume(
        func: MatchingFunction, img_l: jnp.ndarray, img_r: jnp.ndarray,
        h_radius, v_radius, disp_width: int, depth: int = 2,
        upscale_disp_radius: int = 2,
        direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
        cv_dtype=jnp.float32) -> OffsetedCostVolume:
    """Coarse-to-fine matcher (`hiearchicalTruncatedCostVolume`,
    `hierarchical.h:236-314`).  ``h_radius``/``v_radius`` may be ints (same
    at all levels) or sequences of length depth+1 (coarsest first)."""
    if depth < 1:
        raise ValueError("minimum depth is 1")
    if isinstance(h_radius, int):
        h_radius = [h_radius] * (depth + 1)
    if isinstance(v_radius, int):
        v_radius = [v_radius] * (depth + 1)

    # build the image pyramid (x2 average pooling per level)
    pyramid = [(img_l, img_r)]
    for _ in range(depth):
        l, r = pyramid[-1]
        pyramid.append((average_pooling_downsample(l, 2),
                        average_pooling_downsample(r, 2)))

    # coarsest level: full cost volume + WTA
    dw = disp_width
    for _ in range(depth):
        dw = (dw + 1) // 2
    cl, cr = pyramid[depth]
    cv = unfold_based_cost_volume(func, cl, cr, h_radius[0], v_radius[0], dw,
                                  direction, cv_dtype)
    disp = extract_selected_index(cv, MATCH_TRAITS[func].strategy)

    # guided refinement up the pyramid
    result = None
    for level in range(depth - 1, -1, -1):
        li, ri = pyramid[level]
        hr = h_radius[depth - level]
        vr = v_radius[depth - level]
        fv_l = normalize_feature_volume(func, unfold(hr, vr, li))
        fv_r = normalize_feature_volume(func, unfold(hr, vr, ri))
        result = compute_guided_cv(func, fv_l, fv_r, disp,
                                   upscale_disp_radius, direction, cv_dtype)
        disp = result.disp_estimate
    return result
