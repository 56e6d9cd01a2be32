"""Fast approximate scanline matching.

Reference parity: `correlation/fast_approximate_matching.h` —
`fastmatch` (:105-246): NO dense cost volume is ever built.  Each row
starts with a full search (`fullDispAtIdx`, :44); every following pixel
evaluates only THREE candidates (the previous pixel's disparity and its
+-1 neighbours, costs computed on demand from the feature volumes,
strictly-better replacement in the order 0, -1, +1 per
`optimalDispAndCost`, `matching_costs.h:724`); after two consecutive
jumps the pixel falls back to a full search.  `previous_jumped` starts
True, so a jump at the second column re-searches immediately.

TPU design: rows run in parallel; the column sweep is a `lax.scan`
carrying (disparity, jumped) per row.  Per step the three candidate
costs are three batched feature comparisons against gathered target
columns — O(H * 3 * F) per column instead of O(H * D * F) — and the
full-search fallback is a `lax.cond`-guarded full-D evaluation of the
column, executed only when some row needs it, so total work stays
proportional to (3 + research_rate * D), the reference's point.

Documented deviation: `fullDispAtIdx` (:58) scans d in
[lower, upper) — an exclusive upper bound that makes the top disparity
reachable only by +1 propagation; we search the inclusive range.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import (MatchingFunction, MATCH_TRAITS, ExtractionStrategy,
                          disp_dtype)
from ..core.search import SearchOffset1
from .matching import feature_comparison


def fastmatch(func: MatchingFunction, source_fv: jnp.ndarray,
              target_fv: jnp.ndarray, search: SearchOffset1 | int
              ) -> jnp.ndarray:
    """(H, W, F) source/target feature volumes -> (H, W) disparities
    (search offsets, possibly negative) with the propagate-or-research
    policy.  Feature volumes must already be normalized per the matching
    function's traits (as the reference's on-demand volume does
    internally)."""
    if not isinstance(search, SearchOffset1):
        search = SearchOffset1(0, int(search) - 1)
    H, W, F = source_fv.shape
    lo, hi = search.lower, search.upper
    D = search.count
    is_score = MATCH_TRAITS[func].strategy is ExtractionStrategy.SCORE
    bad = jnp.float32(-jnp.inf if is_score else jnp.inf)
    src = source_fv
    tgt = target_fv

    def cost_at(j, d_vec):
        """Costs of per-row disparity candidates d_vec (H,) at column j."""
        tj = j + d_vec
        ok = (tj >= 0) & (tj < W) & (d_vec >= lo) & (d_vec <= hi)
        feats = tgt[jnp.arange(H), jnp.clip(tj, 0, W - 1)]
        c = feature_comparison(func, src[:, j], feats)
        return jnp.where(ok, c, bad)

    def full_search(j):
        """(H,) best disparity of column j over the whole range."""
        ds = jnp.arange(D, dtype=jnp.int32) + lo
        tj = j + ds[None, :]                        # (1, D)
        ok = (tj >= 0) & (tj < W)
        tjc = jnp.clip(tj, 0, W - 1)
        feats = tgt[jnp.arange(H)[:, None], tjc]    # (H, D, F)
        c = feature_comparison(func, src[:, j][:, None, :], feats)
        c = jnp.where(ok, c, bad)
        arg = jnp.argmax(c, 1) if is_score else jnp.argmin(c, 1)
        return (arg + lo).astype(jnp.int32)

    def better(a, b):
        return a > b if is_score else a < b

    def step(carry, j):
        d_prev, prev_jumped = carry
        c0 = cost_at(j, d_prev)
        d_cur, c_cur = d_prev, c0
        for delta in (-1, 1):                       # order: 0, -1, +1
            cand = d_prev + delta
            cc = cost_at(j, cand)
            take = better(cc, c_cur)
            d_cur = jnp.where(take, cand, d_cur)
            c_cur = jnp.where(take, cc, c_cur)
        jumped = d_cur != d_prev
        research = jumped & prev_jumped
        d_new = jax.lax.cond(
            jnp.any(research),
            lambda: jnp.where(research, full_search(j), d_cur),
            lambda: d_cur)
        return (d_new, jumped), d_new

    d0 = full_search(0)
    init = (d0, jnp.ones((H,), bool))               # previous_jumped = True
    _, ds = jax.lax.scan(step, init, jnp.arange(1, W))
    out = jnp.concatenate([d0[:, None], jnp.moveaxis(ds, 0, 1)], 1)
    return out.astype(disp_dtype)


def fastmatch_from_cv(func: MatchingFunction, cv: jnp.ndarray) -> jnp.ndarray:
    """Propagate-or-research over a PRECOMPUTED (H, W, D) cost volume
    (a diagnostic variant; the reference's fastmatch never builds one —
    use `fastmatch` for the on-demand path).  Returns disparity
    indices."""
    H, W, D = cv.shape
    is_score = MATCH_TRAITS[func].strategy is ExtractionStrategy.SCORE
    vals = -cv if is_score else cv
    vals = vals.astype(jnp.float32)

    full_arg = jnp.argmin(vals, axis=-1).astype(jnp.int32)   # (H, W)

    def step(carry, xs):
        d_prev, prev_jumped = carry
        col_vals, col_full = xs         # (H, D), (H,)

        cand = jnp.stack([d_prev, d_prev - 1, d_prev + 1], -1)
        ok = (cand >= 0) & (cand < D)
        cc = jnp.take_along_axis(col_vals, jnp.clip(cand, 0, D - 1), 1)
        cc = jnp.where(ok, cc, jnp.inf)
        best = jnp.argmin(cc, axis=-1)
        d_prop = jnp.take_along_axis(cand, best[:, None], 1)[:, 0]

        jumped = d_prop != d_prev
        research = jumped & prev_jumped
        d_new = jnp.where(research, col_full, d_prop)
        return (d_new, jumped), d_new

    init = (full_arg[:, 0], jnp.ones((H,), bool))
    xs = (jnp.moveaxis(vals, 1, 0)[1:], full_arg.T[1:])
    _, ds = jax.lax.scan(step, init, xs)
    out = jnp.concatenate([full_arg[:, :1], jnp.moveaxis(ds, 0, 1)], 1)
    return out.astype(disp_dtype)
