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
        from ..imageproc.morphology import opening
        assert self.bg_cv is not None, "background not computed"
        idx = self.bg_idx[..., None].astype(jnp.int32)
        cost_bg = jnp.take_along_axis(self.bg_cv, idx, -1)[..., 0]
        cost_fg = jnp.take_along_axis(live_cv, idx, -1)[..., 0]

        lo = jnp.minimum(jnp.abs(cost_bg), jnp.abs(cost_fg))
        hi = jnp.maximum(jnp.abs(cost_bg), jnp.abs(cost_fg))
        similar = lo / jnp.maximum(hi, 1e-12) > self.rel_threshold
        fg = ~similar
        # region consistency (vectorized replacement for the BFS chains)
        fg = opening(fg.astype(jnp.float32), radius=1) > 0.5

        live_idx = extract_selected_index(
            live_cv, MATCH_TRAITS[self.func].strategy)
        disp_fg = live_idx + self.search.lower
        disp_bg = self.bg_idx + self.search.lower
        disp = jnp.where(fg, disp_fg, disp_bg).astype(disp_dtype)
        return StereoDispWithBgMask(disp=disp, fg_mask=fg)
