"""On-demand cost / feature volumes.

Reference parity: `correlation/on_demand_cost_volume.h` —
`GenericOnDemandCostVolume` (:37: a lazily-filled dense volume with a
computed mask), `CachelessOnDemandCostVolume` (:347: recompute on every
access), the stereo/flow aliases (:330,335,615,620) and
`on_demand_features_volume.h` (:35,169: arbitrary-offset feature windows
with a zero-mean/normalized decorator).

TPU design: lazy per-(pixel, disparity) memoization does not fit SPMD
(SURVEY.md §7, hard parts) — the idiomatic equivalent evaluates whole
*fields* of (pixel -> candidate) queries in one batched call.  The classes
below keep the reference's API shape (`cost_value`, `truncated_cost_volume`)
but their query granularity is an (H, W) candidate field; scalar access is
provided for tests and pays a full-field evaluation (cacheless semantics).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import MatchingFunction, MATCH_TRAITS
from ..core.search import SearchOffset1, SearchOffset2
from .matching import feature_comparison
from .unfold import unfold_offsets
from .cost_volume import normalize_feature_volume


class OnDemandFeaturesVolume:
    """Feature vectors from an arbitrary (di, dj[, c]) offset window
    (`on_demand_features_volume.h:35`), densely materialized — on TPU the
    dense unfold IS the cheap representation."""

    def __init__(self, offsets, image, func: MatchingFunction | None = None):
        fv = unfold_offsets(offsets, image)
        if func is not None:
            fv = normalize_feature_volume(func, fv)
        self.features = fv

    def feature_vector(self, i: int, j: int):
        return self.features[i, j]


class CachelessOnDemandStereoCostVolume:
    """1-D (stereo) on-demand costs (`on_demand_cost_volume.h:615`)."""

    def __init__(self, func: MatchingFunction, source_fv, target_fv,
                 search: SearchOffset1):
        self.func = func
        self.source = source_fv
        self.target = target_fv
        self.search = search
        self.traits = MATCH_TRAITS[func]

    @property
    def shape(self):
        return self.source.shape[:2] + (self.search.count,)

    def cost_field(self, disp: jnp.ndarray) -> jnp.ndarray:
        """Costs of an (H, W) disparity-candidate field (the SPMD query)."""
        H, W, F = self.target.shape
        jj = jnp.arange(W, dtype=jnp.int32)[None, :]
        tgt_j = jj + disp
        inb = ((tgt_j >= 0) & (tgt_j < W)
               & (disp >= self.search.lower) & (disp <= self.search.upper))
        tj = jnp.clip(tgt_j, 0, W - 1)
        tgt = jnp.take_along_axis(self.target, tj[..., None], axis=1)
        c = feature_comparison(self.func, self.source, tgt)
        bad = jnp.inf if self.traits.strategy.name == "COST" else -jnp.inf
        return jnp.where(inb, c, bad)

    def cost_value(self, pos, disp):
        """Scalar access for API parity: None outside the search range or
        image (matching `costValue`'s empty optional, and the memoizing
        subclass — a +-inf sentinel here would leak into reductions as a
        'real' cost), else the evaluated candidate."""
        i, j = pos
        d = disp[0] if isinstance(disp, (tuple, list)) else int(disp)
        W = self.source.shape[1]
        if not (self.search.lower <= d <= self.search.upper):
            return None
        if not (0 <= j + d < W):
            return None
        field = jnp.full(self.source.shape[:2], jnp.int32(d))
        return self.cost_field(field)[i, j]

    def truncated_cost_volume(self, disp: jnp.ndarray, radius: int
                              ) -> jnp.ndarray:
        """(H, W, 2r+1) window of costs around a disparity field
        (`on_demand_cost_volume.h:188`)."""
        outs = [self.cost_field(disp + k) for k in range(-radius, radius + 1)]
        return jnp.stack(outs, -1)


class OnDemandStereoCostVolume(CachelessOnDemandStereoCostVolume):
    """Memoizing variant (`GenericOnDemandCostVolume`,
    `on_demand_cost_volume.h:37,105-181`): the reference lazily fills a
    dense volume one (pos, disp) scalar at a time behind a computed
    mask, so memory and compute grow with what was actually queried.
    The TPU memoization unit is a DISPARITY PLANE: the first access to a
    disparity d evaluates and caches its (H, W) cost plane (one fused
    device call); later accesses gather from the cache.  Querying k
    distinct disparities costs k planes of memory and compute — the
    reference's proportional-to-queries semantics at SPMD granularity —
    instead of the full (H, W, D) volume."""

    def __init__(self, func, source_fv, target_fv, search: SearchOffset1):
        super().__init__(func, source_fv, target_fv, search)
        self._planes: dict[int, jnp.ndarray] = {}

    @property
    def n_computed_planes(self) -> int:
        return len(self._planes)

    def _plane(self, d: int) -> jnp.ndarray:
        d = int(d)
        if d not in self._planes:
            H, W = self.source.shape[:2]
            self._planes[d] = self.cost_field(
                jnp.full((H, W), jnp.int32(d)))
        return self._planes[d]

    def cost_value(self, pos, disp):
        """Scalar access (`costValue`, :105): None outside the search
        range or image, else the memoized cost."""
        i, j = pos
        d = disp[0] if isinstance(disp, (tuple, list)) else int(disp)
        W = self.source.shape[1]
        if not (self.search.lower <= d <= self.search.upper):
            return None
        if not (0 <= j + d < W):
            return None
        return self._plane(d)[i, j]

    def cost_field(self, disp: jnp.ndarray, memoize: bool = False
                   ) -> jnp.ndarray:
        """(H, W) candidate-field query.  With ``memoize`` the distinct
        disparities in the field are evaluated as cached planes and the
        result gathered from them (touched planes stay warm for later
        queries); without it the field is evaluated directly."""
        if not memoize:
            return super().cost_field(disp)
        import numpy as np
        dn = np.asarray(disp)
        bad = -jnp.inf if self.traits.strategy.name == "SCORE" else jnp.inf
        out = jnp.full(dn.shape, bad, jnp.float32)
        for d in np.unique(dn):
            p = self._plane(int(d))
            out = jnp.where(jnp.asarray(dn == d), p, out)
        return out

    def full_volume(self) -> jnp.ndarray:
        from .cost_volume import aggregate_cost
        return aggregate_cost(self.func, self.target, self.source,
                              self.search)


class CachelessOnDemandImageFlowVolume:
    """2-D (flow) on-demand costs (`on_demand_cost_volume.h:620`)."""

    def __init__(self, func: MatchingFunction, source_fv, target_fv,
                 search: SearchOffset2):
        self.func = func
        self.source = source_fv
        self.target = target_fv
        self.search = search
        self.traits = MATCH_TRAITS[func]

    def cost_field(self, flow: jnp.ndarray) -> jnp.ndarray:
        """flow: (H, W, 2) of (di, dj) candidates."""
        H, W, F = self.target.shape
        ii = jnp.arange(H, dtype=jnp.int32)[:, None]
        jj = jnp.arange(W, dtype=jnp.int32)[None, :]
        ti = ii + flow[..., 0]
        tj = jj + flow[..., 1]
        inb = ((ti >= 0) & (ti < H) & (tj >= 0) & (tj < W)
               & (flow[..., 0] >= self.search.lower0)
               & (flow[..., 0] <= self.search.upper0)
               & (flow[..., 1] >= self.search.lower1)
               & (flow[..., 1] <= self.search.upper1))
        tic = jnp.clip(ti, 0, H - 1)
        tjc = jnp.clip(tj, 0, W - 1)
        tgt = self.target[tic, tjc]
        c = feature_comparison(self.func, self.source, tgt)
        bad = jnp.inf if self.traits.strategy.name == "COST" else -jnp.inf
        return jnp.where(inb, c, bad)
