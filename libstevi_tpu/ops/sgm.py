"""Semi-global matching as cost-volume smoothing.

Reference parity: `correlation/sgm.h` — 16 scanline directions as step-pair
traits (`directionTraits`, :57-155; the 16-direction set alternates two step
vectors, giving knight-move lines), per-line DP recurrence with P1 (|delta d|
= 1), P2 (|delta d| > 1), Pout (disparity index pointing out of image:
``j + nd >= W``), min-normalization by the previous pixel's best cost, and
per-direction accumulation ``sgm_cv += L_dir - cv_base`` starting from
``sgm_cv = cv_base`` (:298-300,361-404).  Lines start on the region edges
exactly as `addDirectionalCost` enumerates them (:329-355), including the
double-covered corner/edge starts.

Documented deviations from the reference:
  * `sgm.h:331,345` starts reverse (EndPos) lines one past the last in-bounds
    position, so the traverse loop exits immediately and reverse directions
    contribute nothing — an off-by-one bug.  We start at the last in-bounds
    position (the intended behavior).
  * The Cost-strategy inner loop (`sgm.h:281-283`) assigns ``min_a_cost =
    c_score`` instead of ``p_score`` — another reference bug that collapses
    cost-mode SGM to ``2*c - min(prev)``.  We implement the correct recurrence
    (the mirror of the reference's Score branch, which is correct).

TPU design: per direction, a static numpy index map (lines x steps) turns the
scanline recurrence into a gather -> `lax.scan` over the step axis (all lines
advance in lockstep, vectorized over lines x disparities on the VPU) -> masked
scatter-add.  The O(D^2) inner min collapses to O(D): ``min(prev[d],
prev[d-1]+P1, prev[d+1]+P1, min(prev)+P2)``, exact whenever P2 >= P1 (if
P2 < P1 we fall back to the dense penalty matrix).  Score mode reuses the
cost-mode engine on the negated volume.  Cross-tile carry exchange for the
distributed version lives in `libstevi_tpu.parallel.sgm_dist`.
"""

from __future__ import annotations

import enum
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import ExtractionStrategy
from ..core.margins import Margins


class SgmDirection(enum.Enum):
    """(vertical step pair, horizontal step pair); traversal alternates the
    two entries (`sgm.h:214-216`: step c uses index c % 2)."""

    UP2DOWN = ((1, 1), (0, 0))
    DOWN2UP = ((-1, -1), (0, 0))
    LEFT2RIGHT = ((0, 0), (1, 1))
    RIGHT2LEFT = ((0, 0), (-1, -1))
    UPLEFT2DOWNRIGHT = ((1, 1), (1, 1))
    DOWNRIGHT2UPLEFT = ((-1, -1), (-1, -1))
    UPRIGHT2DOWNLEFT = ((1, 1), (-1, -1))
    DOWNLEFT2UPRIGHT = ((-1, -1), (1, 1))
    UPLEFT2RIGHT = ((0, 1), (1, 1))
    DOWNRIGHT2LEFT = ((0, -1), (-1, -1))
    UPRIGHT2LEFT = ((0, 1), (-1, -1))
    DOWNLEFT2RIGHT = ((0, -1), (1, 1))
    UPLEFT2DOWN = ((1, 1), (0, 1))
    DOWNRIGHT2UP = ((-1, -1), (0, -1))
    UPRIGHT2DOWN = ((1, 1), (0, -1))
    DOWNLEFT2UP = ((-1, -1), (0, 1))


_DIRS_4 = [SgmDirection.UP2DOWN, SgmDirection.DOWN2UP,
           SgmDirection.LEFT2RIGHT, SgmDirection.RIGHT2LEFT]
_DIRS_8 = _DIRS_4 + [SgmDirection.UPLEFT2DOWNRIGHT, SgmDirection.DOWNRIGHT2UPLEFT,
                     SgmDirection.UPRIGHT2DOWNLEFT, SgmDirection.DOWNLEFT2UPRIGHT]
_DIRS_16 = _DIRS_8 + [SgmDirection.UPLEFT2DOWN, SgmDirection.DOWNRIGHT2UP,
                      SgmDirection.UPRIGHT2DOWN, SgmDirection.DOWNLEFT2UP,
                      SgmDirection.UPLEFT2RIGHT, SgmDirection.DOWNRIGHT2LEFT,
                      SgmDirection.UPRIGHT2LEFT, SgmDirection.DOWNLEFT2RIGHT]


def directions_for(n_directions: int):
    if n_directions == 4:
        return _DIRS_4
    if n_directions == 8:
        return _DIRS_8
    if n_directions == 16:
        return _DIRS_16
    raise ValueError("SGM operates with 4, 8 or 16 directions")


@lru_cache(maxsize=None)
def _build_lines(H: int, W: int, margins: tuple, direction: SgmDirection):
    """Static (lines, steps) index maps for one direction.

    Returns int32 arrays (ii, jj) of shape (L, T) plus a bool active mask;
    inactive (trailing) steps are clipped to the last active pixel.  Start
    positions follow `addDirectionalCost` (`sgm.h:329-355`): for each
    direction, lines start on the horizontal edge (iterating start rows)
    and/or the vertical edge (iterating start columns).
    """
    ml, mt, mr, mb = margins
    sv, sh = direction.value
    starts = []
    if sh != (0, 0):  # rowStartPos: iterate vertical starts on a column edge
        sj = ml if (sh[0] >= 0 and sh[1] >= 0) else W - mr - 1
        for si in range(mt, H - mb):
            starts.append((si, sj))
    if sv != (0, 0):  # colStartPos: iterate horizontal starts on a row edge
        si = mt if (sv[0] >= 0 and sv[1] >= 0) else H - mb - 1
        for sj in range(ml, W - mr):
            starts.append((si, sj))

    lines = []
    max_len = 0
    for (si, sj) in starts:
        i, j, c = si, sj, 0
        coords = []
        while mt <= i < H - mb and ml <= j < W - mr:
            coords.append((i, j))
            i += sv[c % 2]
            j += sh[c % 2]
            c += 1
        if coords:
            lines.append(coords)
            max_len = max(max_len, len(coords))

    L = len(lines)
    ii = np.zeros((L, max_len), np.int32)
    jj = np.zeros((L, max_len), np.int32)
    active = np.zeros((L, max_len), bool)
    for k, coords in enumerate(lines):
        n = len(coords)
        arr = np.asarray(coords, np.int32)
        ii[k, :n] = arr[:, 0]
        jj[k, :n] = arr[:, 1]
        active[k, :n] = True
        ii[k, n:] = arr[-1, 0]
        jj[k, n:] = arr[-1, 1]
    return ii, jj, active


def _line_recurrence(prev: jnp.ndarray, base: jnp.ndarray, j: jnp.ndarray,
                     W: int, P1: float, P2: float, Pout: float):
    """One DP step of the (cost-mode) SGM recurrence, vectorized over leading
    line axes: prev/base are (..., D), j is (...,) column coordinates for the
    Pout out-of-image test (`sgm.h:230-300`).  Returns (cur, adj) with
    cur = base + adj the new carry and adj the ``actual - base`` contribution.

    Uses the O(D) min-shift collapse ``min(prev[d], prev[d+-1]+P1,
    min(prev)+P2)`` when P2 >= P1 (exact there), else the dense penalty
    matrix."""
    D = base.shape[-1]
    inf = jnp.float32(jnp.inf)
    dd = jnp.arange(D, dtype=jnp.int32)
    prevf = jnp.where(jnp.isfinite(prev), prev, inf)
    m = jnp.min(prevf, axis=-1, keepdims=True)
    if P2 >= P1:
        pad = jnp.full(prevf.shape[:-1] + (1,), inf)
        left = jnp.concatenate([pad, prevf[..., :-1]], -1)
        right = jnp.concatenate([prevf[..., 1:], pad], -1)
        agg = jnp.minimum(jnp.minimum(prevf, m + P2),
                          jnp.minimum(left + P1, right + P1))
    else:
        delta = jnp.abs(dd[:, None] - dd[None, :])
        pen = jnp.where(delta == 1, P1, jnp.where(delta > 1, P2, 0.0))
        agg = jnp.min(prevf[..., None, :] + pen, axis=-1)
    agg = agg + jnp.where(j[..., None] + dd >= W, Pout, 0.0)
    adj = jnp.where(jnp.isfinite(agg) & jnp.isfinite(m), agg - m, 0.0)
    return base + adj, adj


def _cost_mode_pass(cv: jnp.ndarray, ii, jj, active, P1: float, P2: float,
                    Pout: float) -> jnp.ndarray:
    """One direction's ``L_dir - cv`` contribution (cost mode), scatter-added
    into a zero volume."""
    H, W, D = cv.shape
    L, T = ii.shape

    lines_cv = cv[ii, jj, :]          # (L, T, D) gather
    lines_j = jnp.asarray(jj)
    lines_active = jnp.asarray(active)

    def step(prev, xs):
        base, j_col = xs                       # (L, D), (L,)
        cur, adj = _line_recurrence(prev, base, j_col, W, P1, P2, Pout)
        return cur, adj

    xs = (jnp.moveaxis(lines_cv, 1, 0), jnp.moveaxis(
        jnp.broadcast_to(lines_j, (L, T)), 1, 0))
    init = jnp.zeros((L, D), jnp.float32)
    _, adjs = jax.lax.scan(step, init, xs)     # (T, L, D)
    adjs = jnp.moveaxis(adjs, 0, 1)            # (L, T, D)
    adjs = jnp.where(lines_active[..., None], adjs, 0.0)

    out = jnp.zeros((H, W, D), jnp.float32)
    return out.at[ii.reshape(-1), jj.reshape(-1)].add(
        adjs.reshape(L * T, D))


def sgm_cost_volume(cv: jnp.ndarray, P1: float, P2: float,
                    margins: Margins = Margins(), Pout: float = 100.0,
                    n_directions: int = 8,
                    strategy: ExtractionStrategy = ExtractionStrategy.COST
                    ) -> jnp.ndarray:
    """Aggregate a (H, W, D) cost volume along 4/8/16 scanline directions
    (`sgmCostVolume`, `sgm.h:361-404`).  Returns float32."""
    H, W, D = cv.shape
    cv = cv.astype(jnp.float32)
    if strategy is ExtractionStrategy.SCORE:
        return -sgm_cost_volume(-cv, P1, P2, margins, Pout, n_directions,
                                ExtractionStrategy.COST)

    m = (margins.left, margins.top, margins.right, margins.bottom)
    sgm = cv
    for direction in directions_for(n_directions):
        ii, jj, active = _build_lines(H, W, m, direction)
        if ii.size == 0:
            continue
        sgm = sgm + _cost_mode_pass(cv, ii, jj, active, float(P1), float(P2),
                                    float(Pout))
    return sgm
