"""Disparity estimation with background removal.

Reference parity: `correlation/disparity_plus_background_segmentation.h` —
`DisparityEstimatorWithBackgroundRemoval` (:64): precompute a background
cost volume + WTA disparity from a background image pair
(`computeBackgroundDisp`, :82); for a live pair, a pixel is background when
its cost at the background disparity is within a relative threshold of the
background's own cost there (`computeDispAndForegroundMask`, :106);
foreground pixels get a fresh WTA disparity.

Documented deviation: the reference runs BFS chains over neighboring pixels
to confirm foreground regions (`:130-220`, a sequential flood fill); here
region consistency is enforced by a vectorized morphological opening of the
foreground mask — same intent (suppress isolated false foreground), SPMD
friendly.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..core.types import MatchingFunction, MATCH_TRAITS, ExtractionStrategy, \
    disp_dtype
from ..core.search import SearchOffset1
from .cost_volume import (feature_volume_to_cost_volume,
                          extract_selected_index)


@dataclass
class StereoDispWithBgMask:
    disp: jnp.ndarray
    fg_mask: jnp.ndarray     # bool, True = foreground


class DisparityEstimatorWithBackgroundRemoval:
    def __init__(self, func: MatchingFunction,
                 relative_threshold: float = 0.8, disp_tol: int = 2):
        self.func = func
        self.rel_threshold = relative_threshold
        self.disp_tol = disp_tol
        self.bg_cv = None
        self.bg_idx = None
        self.search = None

    def compute_background_disp(self, source_fv, target_fv,
                                search: SearchOffset1) -> bool:
        if not search.is_valid:
            return False
        self.search = search
        self.bg_cv = feature_volume_to_cost_volume(
            self.func, target_fv, source_fv, search)
        self.bg_idx = extract_selected_index(
            self.bg_cv, MATCH_TRAITS[self.func].strategy)
        return True

    def compute_disp_and_foreground_mask(self, live_cv: jnp.ndarray
                                         ) -> StereoDispWithBgMask:
        """live_cv: the live pair's cost volume over the same search range."""
        from ..imageproc.morphology import opening, dilation
        assert self.bg_cv is not None, "background not computed"
        idx = self.bg_idx[..., None].astype(jnp.int32)
        cost_bg = jnp.take_along_axis(self.bg_cv, idx, -1)[..., 0]
        cost_fg = jnp.take_along_axis(live_cv, idx, -1)[..., 0]

        # RAW min/max ratio like the reference (`:163`): sign-opposite
        # scores (e.g. an anti-correlated occluder under ZNCC) give a
        # negative ratio and are correctly NOT similar — an abs() ratio
        # would call them background
        lo = jnp.minimum(cost_bg, cost_fg)
        hi = jnp.maximum(cost_bg, cost_fg)
        ratio = lo / jnp.where(jnp.abs(hi) > 1e-12, hi, 1e-12)
        similar = ratio > self.rel_threshold
        live_idx = extract_selected_index(
            live_cv, MATCH_TRAITS[self.func].strategy)
        # the reference's disp_tol (`:199`) stops region GROWTH at pixels
        # whose live optimum sits within the tolerance of the background
        # disparity: only disparity-displaced dissimilar pixels seed
        # regions; cost-dissimilar-but-near-bg pixels join only when
        # adjacent to a seeded region (vectorized analogue of the BFS)
        moved = jnp.abs(live_idx.astype(jnp.int32)
                        - self.bg_idx.astype(jnp.int32)) >= self.disp_tol
        strong = (~similar) & moved
        seed = opening(strong.astype(jnp.float32), radius=1) > 0.5
        grown = dilation(seed.astype(jnp.float32), radius=1) > 0.5
        fg = seed | ((~similar) & grown)
        disp_fg = live_idx + self.search.lower
        disp_bg = self.bg_idx + self.search.lower
        disp = jnp.where(fg, disp_fg, disp_bg).astype(disp_dtype)
        return StereoDispWithBgMask(disp=disp, fg_mask=fg)
