"""Cost-volume construction and disparity extraction.

Reference parity:
  * feature normalization — `channelsMean` (`correlation/correlation_base.h:1080`),
    `channelsNorm`/`channelsZeroMeanNorm` (`correlation/cross_correlations.h:36-191`),
    `getFeatureVolumeForMatchFunc` (`cross_correlations.h:647-722`);
  * aggregation — `aggregateCost` (`cross_correlations.h:195,252,311`): source /
    target roles from the disparity direction (`condImgRef`,
    `correlation_base.h:824-878`; RIGHT_TO_LEFT means source = right image and
    target sampled at ``j + d``), out-of-range target feature vectors are all
    zeros;
  * umbrella entries — `featureVolume2CostVolume` (:724),
    `unfoldBasedCostVolume` (:740), `unfoldBased2dDisparityCostVolume` (:794);
  * WTA extraction — `extractSelectedIndex`/`extractSelected2dIndex`
    (`correlation_base.h:428,467`; ties break toward the LAST optimal index
    because the reference uses `<=` / `>=`), `selectedIndexToDisp` (:512),
    `selectedCost` (:557), `truncatedCostVolume` (:582),
    `truncatedBidirectionaCostVolume` (:679), `extractInBoundDomain` (:730).

TPU design:
  * The disparity loop is a `lax.scan` over static shifts of one zero-padded
    target volume — no (D, H, W, F) materialization, no gathers; each step is
    a fused multiply-reduce on the VPU.
  * For the dot/SSD family, `unfold_based_cost_volume` defaults to a
    box-filter decomposition (`box_backend.py`) that never materializes the
    unfold at all: O(H*W*D) instead of the reference's O(H*W*D*F).
  * WTA is `argmin`/`argmax` on a flipped disparity axis so tie-breaking
    matches the reference bit-for-bit.
"""

from __future__ import annotations

from typing import Union

import jax
import numpy as np
import jax.numpy as jnp

from ..core.types import (MatchingFunction, MATCH_TRAITS, ExtractionStrategy,
                          DispDirection, TruncatedCvDirection, disp_dtype)
from ..core.search import SearchOffset1, SearchOffset2
from .unfold import unfold
from .census import census_features
from .matching import feature_comparison

SearchRange = Union[int, SearchOffset1, SearchOffset2]


# ---------------------------------------------------------------------------
# Feature-volume normalization
# ---------------------------------------------------------------------------

def channels_mean(fv: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel mean over the feature axis (`correlation_base.h:1080`)."""
    return jnp.mean(fv, axis=-1)


def channels_norm(fv: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel L2 norm over the feature axis (`cross_correlations.h:124-191`)."""
    return jnp.sqrt(jnp.sum(fv * fv, axis=-1))


def channels_zero_mean_norm(fv: jnp.ndarray, mean: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-pixel L2 norm of the mean-subtracted features
    (`cross_correlations.h:36-122`)."""
    if mean is None:
        mean = channels_mean(fv)
    d = fv - mean[..., None]
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def normalize_feature_volume(func: MatchingFunction, fv: jnp.ndarray) -> jnp.ndarray:
    """Apply the zero-mean / normalization / census preprocessing a matching
    function requires (`getFeatureVolumeForMatchFunc`,
    `cross_correlations.h:647-722`)."""
    traits = MATCH_TRAITS[func]
    fv = fv.astype(jnp.float32) if not traits.census else fv
    if traits.zero_mean and traits.normalized:
        mean = channels_mean(fv)
        sigma = channels_zero_mean_norm(fv, mean)
        fv = (fv - mean[..., None]) / sigma[..., None]
    elif traits.zero_mean:
        fv = fv - channels_mean(fv)[..., None]
    elif traits.normalized:
        fv = fv / channels_norm(fv)[..., None]
    if traits.census:
        fv = census_features(fv)
    return fv


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------

def _source_target(func_dir: DispDirection, fv_l: jnp.ndarray, fv_r: jnp.ndarray):
    """`condImgRef` role assignment (`correlation_base.h:824-878`)."""
    if func_dir is DispDirection.RIGHT_TO_LEFT:
        return fv_r, fv_l
    return fv_l, fv_r


def _shifted_compare_scan(func: MatchingFunction, source_fv: jnp.ndarray,
                          target_fv: jnp.ndarray, shifts: jnp.ndarray,
                          min_shift: int, max_shift: int,
                          cv_dtype) -> jnp.ndarray:
    """cost[d, i, j] = compare(source[i, j, :], target[i, j + shifts[d], :])
    with zero target features out of range.  `lax.scan` over the (static
    length) shift array; each step dynamic-slices one aligned view of a single
    zero-padded copy of the target."""
    H, W, _ = source_fv.shape
    pad_left = max(0, -min_shift)
    pad_right = max(0, max_shift)
    padded = jnp.pad(target_fv, ((0, 0), (pad_left, pad_right), (0, 0)))

    def step(_, shift):
        shifted = jax.lax.dynamic_slice_in_dim(padded, pad_left + shift, W, axis=1)
        cost = feature_comparison(func, source_fv, shifted).astype(cv_dtype)
        return None, cost

    _, cv = jax.lax.scan(step, None, shifts)
    return cv  # (D, H, W)


def aggregate_cost(func: MatchingFunction, fv_l: jnp.ndarray, fv_r: jnp.ndarray,
                   search: SearchRange,
                   direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
                   cv_dtype=jnp.float32, backend: str = "auto") -> jnp.ndarray:
    """Build a cost volume from two *already normalized* feature volumes.

    1-D search (int width or SearchOffset1) returns (H, W, D); 2-D search
    (SearchOffset2) returns (H, W, D0, D1).  Matches `aggregateCost`
    (`cross_correlations.h:195,252,311`).

    ``backend='auto'`` routes the dot/SSD/SAD families through the fused
    Pallas kernel on TPU (one streaming read of each feature volume vs the
    scan path's D re-reads — ~10x at D=120 F=49); 'scan' forces the XLA
    scan, 'fused' forces the kernel (interpret-mode off-TPU).
    """
    source_fv, target_fv = _source_target(direction, fv_l, fv_r)
    sign = direction.delta_sign

    if isinstance(search, SearchOffset2):
        # 2-D flow search: target sampled at (i + d0, j + d1); the reference's
        # 2-D overload ignores the direction sign (`cross_correlations.h:359`).
        H, W, _ = source_fv.shape
        D0, D1 = search.count0, search.count1
        padded = jnp.pad(
            target_fv,
            ((max(0, -search.lower0), max(0, search.upper0)),
             (max(0, -search.lower1), max(0, search.upper1)), (0, 0)))
        off0 = max(0, -search.lower0)
        off1 = max(0, -search.lower1)

        d0s = jnp.arange(D0, dtype=jnp.int32) + search.lower0
        d1s = jnp.arange(D1, dtype=jnp.int32) + search.lower1
        grid = jnp.stack(jnp.meshgrid(d0s, d1s, indexing="ij"), -1).reshape(-1, 2)

        def step(_, d01):
            shifted = jax.lax.dynamic_slice(
                padded, (off0 + d01[0], off1 + d01[1], 0),
                (H, W, target_fv.shape[2]))
            return None, feature_comparison(func, source_fv, shifted).astype(cv_dtype)

        _, cv = jax.lax.scan(step, None, grid)
        return jnp.moveaxis(cv.reshape(D0, D1, H, W), (0, 1), (2, 3))

    if isinstance(search, SearchOffset1):
        disps = jnp.arange(search.count, dtype=jnp.int32) + search.lower
        lo, hi = search.lower, search.upper
    else:
        disps = jnp.arange(int(search), dtype=jnp.int32)
        lo, hi = 0, int(search) - 1

    if backend == "auto":
        from ..core.types import MATCH_TRAITS
        from .fv_backend import FUSABLE_KERNELS
        k = MATCH_TRAITS[func].kernel
        backend = ("fused" if jax.default_backend() == "tpu"
                   and k in FUSABLE_KERNELS and source_fv.ndim == 3
                   else "scan")
        if backend == "fused":
            # VMEM feasibility: the fused kernel's double-buffered
            # (rc, Dp, Wp) blocks must fit the ~16 MB scoped budget —
            # wide images / large D fall back to the scan path instead
            # of failing at Mosaic compile time
            Wp = -(-source_fv.shape[1] // 128) * 128
            n_d = (search.count if isinstance(search, SearchOffset1)
                   else int(search))
            Dp = -(-n_d // 8) * 8
            if 4 * 4 * Dp * Wp * 4 > 14 * 2 ** 20:
                backend = "scan" 
    if backend == "fused":
        from ..core.types import MATCH_TRAITS
        from .fv_backend import fused_fv_cost_volume
        static_shifts = [sign * int(d) for d in
                         (range(search.lower, search.upper + 1)
                          if isinstance(search, SearchOffset1)
                          else range(int(search)))]
        return fused_fv_cost_volume(MATCH_TRAITS[func].kernel, source_fv,
                                    target_fv, static_shifts, cv_dtype)

    shifts = sign * disps
    min_shift = min(sign * lo, sign * hi)
    max_shift = max(sign * lo, sign * hi)
    cv = _shifted_compare_scan(func, source_fv, target_fv, shifts,
                               min_shift, max_shift, cv_dtype)
    return jnp.moveaxis(cv, 0, -1)  # (H, W, D)


def feature_volume_to_cost_volume(func: MatchingFunction, fv_l: jnp.ndarray,
                                  fv_r: jnp.ndarray, search: SearchRange,
                                  direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
                                  cv_dtype=jnp.float32,
                                  backend: str = "auto") -> jnp.ndarray:
    """Normalize per the matching function's traits, then aggregate
    (`featureVolume2CostVolume`, `cross_correlations.h:724-738`)."""
    return aggregate_cost(func,
                          normalize_feature_volume(func, fv_l),
                          normalize_feature_volume(func, fv_r),
                          search, direction, cv_dtype, backend=backend)


def unfold_based_cost_volume(func: MatchingFunction, img_l: jnp.ndarray,
                             img_r: jnp.ndarray, h_radius: int, v_radius: int,
                             search: SearchRange,
                             direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
                             cv_dtype=jnp.float32,
                             backend: str = "auto",
                             layout: str = "hwd") -> jnp.ndarray:
    """unfold -> normalize -> aggregate (`unfoldBasedCostVolume`,
    `cross_correlations.h:740-765`).

    ``backend='box'`` uses the box-filter decomposition (no unfold
    materialization; exact up to float summation order) for the dot/SSD
    family; ``'unfold'`` forces the general scan path; ``'auto'`` picks 'box'
    when the function supports it.

    ``layout='dhw'`` returns the volume as (H, D, W) — disparity on VPU
    sublanes, the layout the SGM Pallas fast path consumes natively.
    """
    auto = backend == "auto"
    if auto:
        from .box_backend import supports_box
        if supports_box(func) and not isinstance(search, SearchOffset2):
            # Prefer the fused single-kernel box CV on TPU (inputs +
            # window statistics stay VMEM-resident, only the volume is
            # written): 0.44/0.61 ms f32/bf16 vs 1.16 ms for the scan
            # box path at 480x640 D=120 (device-chained, v5e).  The
            # branch below resolves the platform at LOWERING time
            # (lax.platform_dependent), so tracing for a non-default
            # device picks the right implementation; it falls back to
            # 'box' when statically out of scope.
            backend = "box_pallas"
        else:
            backend = "unfold"
    if backend == "box_pallas":
        # single fused kernel (box_pallas.box_cost_volume_fused): inputs
        # + window statistics stay VMEM-resident and only the volume is
        # written.  Falls back to the scan box path out of scope
        # (non-dot family, offset searches, L2R, too-tall images).
        from .box_pallas import box_cost_volume_fused, box_fused_in_scope
        dw = None
        if isinstance(search, (int, np.integer)) and not isinstance(search,
                                                                    bool):
            dw = int(search)
        elif isinstance(search, SearchOffset1) and search.lower == 0:
            dw = search.upper + 1
        in_scope = (
            dw is not None and direction == DispDirection.RIGHT_TO_LEFT
            and box_fused_in_scope(func, img_l.shape, h_radius, v_radius,
                                   dw, cv_dtype) is not None)
        if in_scope and auto:
            from .box_backend import box_cost_volume

            def _fused(l, r):
                return box_cost_volume_fused(func, l, r, h_radius,
                                             v_radius, dw, cv_dtype,
                                             interpret=False)

            def _scan_box(l, r):
                return box_cost_volume(func, l, r, h_radius, v_radius,
                                       search, direction, cv_dtype, "dhw")

            cvf = jax.lax.platform_dependent(img_l, img_r, tpu=_fused,
                                             default=_scan_box)
            return cvf if layout == "dhw" else jnp.moveaxis(cvf, 1, -1)
        if in_scope:
            cvf = box_cost_volume_fused(func, img_l, img_r, h_radius,
                                        v_radius, dw, cv_dtype)
            return cvf if layout == "dhw" else jnp.moveaxis(cvf, 1, -1)
        backend = "box"
    if backend == "box":
        from .box_backend import box_cost_volume
        return box_cost_volume(func, img_l, img_r, h_radius, v_radius,
                               search, direction, cv_dtype, layout)
    fv_l = unfold(h_radius, v_radius, img_l)
    fv_r = unfold(h_radius, v_radius, img_r)
    # 'unfold' genuinely forces the XLA scan path (otherwise the inner
    # auto dispatch would re-route to the fused Pallas kernel on TPU)
    cv = feature_volume_to_cost_volume(
        func, fv_l, fv_r, search, direction, cv_dtype,
        backend="scan" if backend == "unfold" else "auto")
    if layout == "dhw":
        return jnp.moveaxis(cv, -1, 1)
    return cv


def unfold_based_2d_disparity_cost_volume(
        func: MatchingFunction, img_l: jnp.ndarray, img_r: jnp.ndarray,
        h_radius: int, v_radius: int, search: SearchOffset2,
        direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
        cv_dtype=jnp.float32) -> jnp.ndarray:
    """2-D (optical-flow style) cost volume
    (`unfoldBased2dDisparityCostVolume`, `cross_correlations.h:794-822`)."""
    fv_l = unfold(h_radius, v_radius, img_l)
    fv_r = unfold(h_radius, v_radius, img_r)
    return feature_volume_to_cost_volume(func, fv_l, fv_r, search,
                                         direction, cv_dtype)


# ---------------------------------------------------------------------------
# WTA extraction
# ---------------------------------------------------------------------------

def extract_selected_index(cv: jnp.ndarray,
                           strategy: ExtractionStrategy) -> jnp.ndarray:
    """WTA argmin (COST) / argmax (SCORE) over the last axis of an
    (H, W, D) cost volume, breaking ties toward the LAST optimal index to
    match `extractSelectedIndex` (`correlation_base.h:428-464`, which uses
    `<=` / `>=`)."""
    D = cv.shape[-1]
    flipped = jnp.flip(cv, axis=-1)
    if strategy is ExtractionStrategy.COST:
        idx = jnp.argmin(flipped, axis=-1)
    else:
        idx = jnp.argmax(flipped, axis=-1)
    return (D - 1 - idx).astype(disp_dtype)


def extract_selected_2d_index(cv: jnp.ndarray,
                              strategy: ExtractionStrategy) -> jnp.ndarray:
    """WTA over the last two axes of an (H, W, D0, D1) cost volume, ties
    toward the last (d0, d1) in row-major scan order
    (`extractSelected2dIndex`, `correlation_base.h:467-509`)."""
    H, W, D0, D1 = cv.shape
    flat = jnp.flip(cv.reshape(H, W, D0 * D1), axis=-1)
    if strategy is ExtractionStrategy.COST:
        idx = jnp.argmin(flat, axis=-1)
    else:
        idx = jnp.argmax(flat, axis=-1)
    idx = D0 * D1 - 1 - idx
    return jnp.stack([idx // D1, idx % D1], axis=-1).astype(disp_dtype)


def selected_index_to_disp(selected_index: jnp.ndarray,
                           direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
                           disp_offset: int = 0) -> jnp.ndarray:
    """disp = delta_sign * index + offset (`selectedIndexToDisp`,
    `correlation_base.h:511-532`)."""
    return direction.delta_sign * selected_index + disp_offset


def selected_2d_index_to_disp(selected_index: jnp.ndarray,
                              search: SearchOffset2) -> jnp.ndarray:
    """(`selected2dIndexToDisp`, `correlation_base.h:534-555`)."""
    offs = jnp.asarray([search.lower0, search.lower1], selected_index.dtype)
    return selected_index + offs


def selected_cost(cv: jnp.ndarray, selected_index: jnp.ndarray) -> jnp.ndarray:
    """Cost value at the selected index (`selectedCost`,
    `correlation_base.h:557-577`)."""
    return _gather_disp(cv, selected_index)


# ---------------------------------------------------------------------------
# Truncated cost volumes (for subpixel refinement)
# ---------------------------------------------------------------------------

def _gather_disp(cv: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """cv[i, j, p[i, j]] with p clipped (validity handled by the caller).

    Implemented as a masked sum over the D axis instead of a gather: TPU
    gathers cost tens of ns per element while the O(D) select-and-reduce is
    plain VPU streaming — ~20x faster at D ~ 100."""
    D = cv.shape[-1]
    pc = jnp.clip(p, 0, D - 1).astype(jnp.int32)
    dd = jnp.arange(D, dtype=jnp.int32)
    mask = dd == pc[..., None]
    return jnp.sum(jnp.where(mask, cv, 0.0), axis=-1)


def truncated_cost_volume(cv: jnp.ndarray, selected_index: jnp.ndarray,
                          h_radius: int, v_radius: int, cost_vol_radius: int,
                          direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
                          sdir: TruncatedCvDirection = TruncatedCvDirection.SAME
                          ) -> jnp.ndarray:
    """Extract a (2r+1)-wide band around the selected disparity, NaN outside
    validity bounds (`truncatedCostVolume`, `correlation_base.h:582-674`).

    SAME samples cv[i, j, sel+k]; REVERSED samples cv[i, j+sgn*k, sel+k]
    (sgn = -1 for RIGHT_TO_LEFT); BOTH interleaves the two (2*(2r+1)-1 slots,
    direct/reversed pairs sharing the center slot).

    Validity replicates the reference's conditions VERBATIM
    (`correlation_base.h:602-670`), including two quirks: the SAME bound
    `j + p + h_radius < W` is direction-independent (for LEFT_TO_RIGHT
    the sampled target actually sits at j - p), and REVERSED slots check
    only the source-window bounds of the shifted pixel, not the sampled
    entry's own target window.  Both are pinned by tests.
    """
    H, W, D = cv.shape
    r = cost_vol_radius
    sgn = -1 if direction is DispDirection.RIGHT_TO_LEFT else 1

    ii = jnp.arange(H, dtype=jnp.int32)[:, None]
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]
    nan = jnp.float32(jnp.nan)

    def same_slot(k: int):
        p = selected_index + (k - r)
        valid = ((p >= 0) & (p < D)
                 & (jj >= h_radius) & (jj + p + h_radius < W)
                 & (ii >= v_radius) & (ii + v_radius < H))
        return jnp.where(valid, _gather_disp(cv, p), nan)

    def reversed_slot(k: int):
        p = selected_index + (k - r)
        jp = jj + sgn * (k - r)
        valid = ((p >= 0) & (p < D)
                 & (jnp.minimum(jp, jj) >= h_radius)
                 & (jnp.maximum(jp, jj) + h_radius < W)
                 & (ii >= v_radius) & (ii + v_radius < H))
        # shift the cv by the static offset sgn*(k-r) along W, zero-extended
        s = sgn * (k - r)
        shifted = jnp.roll(cv, -s, axis=1)
        val = jnp.where(valid, _gather_disp(shifted, p), nan)
        return val

    if sdir is TruncatedCvDirection.SAME:
        slots = [same_slot(k) for k in range(2 * r + 1)]
    elif sdir is TruncatedCvDirection.REVERSED:
        slots = [reversed_slot(k) for k in range(2 * r + 1)]
    else:
        # BOTH: slots 2k = direct, 2k+1 = reversed; center (k == r) shares one
        # slot and the reference forces the reversed sample invalid there by
        # setting jp = -1 (`correlation_base.h:643-650`).
        slots = [None] * (4 * r + 1)
        for k in range(2 * r + 1):
            d_d = 2 * k if k <= r else 2 * k - 1
            slots[d_d] = same_slot(k)
            if k != r:
                d_r = 2 * k + 1 if k < r else 2 * k
                slots[d_r] = reversed_slot(k)
    return jnp.stack(slots, axis=-1)


def truncated_bidirectional_cost_volume(cv: jnp.ndarray,
                                        selected_index: jnp.ndarray,
                                        radius0: int = 1, radius1: int = 1
                                        ) -> jnp.ndarray:
    """Truncated window of a 4-D (H, W, D0, D1) cost volume around the
    selected 2-D index, NaN out of range
    (`truncatedBidirectionaCostVolume`, `correlation_base.h:679-725`)."""
    H, W, D0, D1 = cv.shape
    r0 = max(1, radius0)
    r1 = radius1 if radius1 >= 1 else r0

    sel0 = selected_index[..., 0]
    sel1 = selected_index[..., 1]
    nan = jnp.float32(jnp.nan)
    out = []
    flat = cv.reshape(H, W, D0 * D1)
    for k0 in range(2 * r0 + 1):
        row = []
        for k1 in range(2 * r1 + 1):
            p0 = sel0 + (k0 - r0)
            p1 = sel1 + (k1 - r1)
            valid = (p0 >= 0) & (p0 < D0) & (p1 >= 0) & (p1 < D1)
            lin = jnp.clip(p0, 0, D0 - 1) * D1 + jnp.clip(p1, 0, D1 - 1)
            # masked-sum lookup (_gather_disp): TPU gathers along the
            # disparity axis are ~20x slower (see selected_cost note)
            val = _gather_disp(flat, lin.astype(jnp.int32))
            row.append(jnp.where(valid, val, nan))
        out.append(jnp.stack(row, axis=-1))
    return jnp.stack(out, axis=-2)


def extract_in_bound_domain(selected_index: jnp.ndarray, width: int,
                            h_radius: int, v_radius: int, cost_vol_radius: int,
                            direction: DispDirection = DispDirection.RIGHT_TO_LEFT,
                            sdir: TruncatedCvDirection = TruncatedCvDirection.SAME,
                            dtype=jnp.int32) -> jnp.ndarray:
    """Binary validity mask matching `truncated_cost_volume`'s slots
    (`extractInBoundDomain`, `correlation_base.h:730-820`)."""
    H, W = selected_index.shape
    r = cost_vol_radius
    sgn = -1 if direction is DispDirection.RIGHT_TO_LEFT else 1
    ii = jnp.arange(H, dtype=jnp.int32)[:, None]
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]

    def same_valid(k: int):
        p = selected_index + (k - r)
        return ((p >= 0) & (p < width)
                & (jj >= h_radius) & (jj + p + h_radius < W)
                & (ii >= v_radius) & (ii + v_radius < H))

    def reversed_valid(k: int):
        p = selected_index + (k - r)
        jp = jj + sgn * (k - r)
        return ((p >= 0) & (p < width)
                & (jnp.minimum(jp, jj) >= h_radius)
                & (jnp.maximum(jp, jj) + h_radius < W)
                & (ii >= v_radius) & (ii + v_radius < H))

    if sdir is TruncatedCvDirection.SAME:
        slots = [same_valid(k) for k in range(2 * r + 1)]
    elif sdir is TruncatedCvDirection.REVERSED:
        slots = [reversed_valid(k) for k in range(2 * r + 1)]
    else:
        slots = [None] * (4 * r + 1)
        for k in range(2 * r + 1):
            d_d = 2 * k if k <= r else 2 * k - 1
            slots[d_d] = same_valid(k)
            if k != r:
                d_r = 2 * k + 1 if k < r else 2 * k
                slots[d_r] = reversed_valid(k)
    return jnp.stack(slots, axis=-1).astype(dtype)
