"""Semi-global matching as cost-volume smoothing.

Reference parity: `correlation/sgm.h` — 16 scanline directions as step-pair
traits (`directionTraits`, :57-155; the 16-direction set alternates two step
vectors, giving knight-move lines), per-line DP recurrence with P1 (|delta d|
= 1), P2 (|delta d| > 1), Pout (disparity index pointing out of image:
``j + nd >= W``), min-normalization by the previous pixel's best cost, and
per-direction accumulation ``sgm_cv += L_dir - cv_base`` starting from
``sgm_cv = cv_base`` (:298-300,361-404).  Line starts follow
`addDirectionalCost` (:329-355) including the double-covered corner starts of
the diagonal directions (the corner line is enumerated by both start blocks
and therefore contributes twice).

Documented deviations from the reference:
  * `sgm.h:331,345` starts reverse (EndPos) lines one past the last in-bounds
    position, so the traverse loop exits immediately and reverse directions
    contribute nothing — an off-by-one bug.  We start at the last in-bounds
    position (the intended behavior).
  * The Cost-strategy inner loop (`sgm.h:281-283`) assigns ``min_a_cost =
    c_score`` instead of ``p_score`` — another reference bug that collapses
    cost-mode SGM to ``2*c - min(prev)``.  We implement the correct recurrence
    (the mirror of the reference's Score branch, which is correct).

TPU design — three gather-free pass groups:
  * horizontal (L2R + R2L): one `lax.scan` over columns, lines = rows of the
    forward block stacked with the column-flipped block;
  * vertical (U2D + D2U): same with the volume transposed;
  * diagonal (the four (+-1, +-1) directions): each row is shifted by +-1
    per row with the pad-flatten-reshape shear trick, turning diagonals into
    columns — pure layout changes XLA lowers to copies, NO gathers — then
    scanned like the vertical group; the inverse shear is the mirrored
    reshape.  The double-covered corner line is doubled with a one-hot
    multiply instead of a scatter.

The O(D^2) inner min collapses to O(D) (``min(prev[d], prev[d+-1]+P1,
min(prev)+P2)``), exact whenever P2 >= P1; the dense penalty matrix is the
fallback.  Score mode reuses the cost-mode engine on the negated volume.  On
the Pallas backend the 8 knight-move directions of the 16-direction set are
first-class: the DHW kernels carry them (two phase carries per direction)
inside the same four streaming passes as the principal directions
(`sgm_pallas_dhw._knight_row`).  The XLA fallback runs them through a
generic index-map gather path.  Cross-tile carry exchange for the
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


_KNIGHT_DIRS = [SgmDirection.UPLEFT2DOWN, SgmDirection.DOWNRIGHT2UP,
                SgmDirection.UPRIGHT2DOWN, SgmDirection.DOWNLEFT2UP,
                SgmDirection.UPLEFT2RIGHT, SgmDirection.DOWNRIGHT2LEFT,
                SgmDirection.UPRIGHT2LEFT, SgmDirection.DOWNLEFT2RIGHT]


def directions_for(n_directions: int):
    if n_directions not in (4, 8, 16):
        raise ValueError("SGM operates with 4, 8 or 16 directions")
    dirs = [SgmDirection.UP2DOWN, SgmDirection.DOWN2UP,
            SgmDirection.LEFT2RIGHT, SgmDirection.RIGHT2LEFT]
    if n_directions >= 8:
        dirs += [SgmDirection.UPLEFT2DOWNRIGHT, SgmDirection.DOWNRIGHT2UPLEFT,
                 SgmDirection.UPRIGHT2DOWNLEFT, SgmDirection.DOWNLEFT2UPRIGHT]
    if n_directions >= 16:
        dirs += _KNIGHT_DIRS
    return dirs


# ---------------------------------------------------------------------------
# DP recurrence
# ---------------------------------------------------------------------------

def _line_recurrence(prev: jnp.ndarray, base: jnp.ndarray, j: jnp.ndarray,
                     W: int, P1: float, P2: float, Pout: float):
    """One DP step of the (cost-mode) SGM recurrence, vectorized over leading
    line axes: prev/base are (..., D), j is (...,) column coordinates for the
    Pout out-of-image test (`sgm.h:230-300`).  Returns (cur, adj) with
    cur = base + adj the new carry and adj the ``actual - base`` contribution.
    """
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


def _scan_adj(blocks: jnp.ndarray, jmaps: jnp.ndarray, valid, W: int,
              P1: float, P2: float, Pout: float) -> jnp.ndarray:
    """Run the recurrence along axis 1 of (L, T, D) line blocks; `valid`
    (L, T) masks padded steps (carry resets to the line-start state there).
    Returns adj (L, T, D)."""
    L, T, D = blocks.shape

    def step(prev, xs):
        if valid is None:
            base, j = xs
            cur, adj = _line_recurrence(prev, base, j, W, P1, P2, Pout)
        else:
            base, j, v = xs
            cur, adj = _line_recurrence(prev, base, j, W, P1, P2, Pout)
            cur = jnp.where(v[:, None], cur, 0.0)
            adj = jnp.where(v[:, None], adj, 0.0)
        return cur, adj

    xs = (jnp.moveaxis(blocks, 1, 0), jmaps.T)
    if valid is not None:
        xs = xs + (jnp.asarray(valid).T,)
    init = jnp.zeros_like(blocks[:, 0, :])
    _, adjs = jax.lax.scan(step, init, xs)
    return jnp.moveaxis(adjs, 0, 1)


# ---------------------------------------------------------------------------
# Gather-free pass groups (zero-margin region volumes)
# ---------------------------------------------------------------------------

def _horizontal_group(cv, ml, P1, P2, Pout, W):
    """LEFT2RIGHT + RIGHT2LEFT in one scan over columns."""
    H1, W1, D = cv.shape
    jrow = jnp.broadcast_to(ml + jnp.arange(W1, dtype=jnp.int32), (H1, W1))
    blocks = jnp.concatenate([cv, jnp.flip(cv, 1)], 0)
    jmaps = jnp.concatenate([jrow, jnp.flip(jrow, 1)], 0)
    adj = _scan_adj(blocks, jmaps, None, W, P1, P2, Pout)
    return adj[:H1] + jnp.flip(adj[H1:], 1)


def _vertical_group(cv, ml, P1, P2, Pout, W):
    """UP2DOWN + DOWN2UP: transpose so lines are columns."""
    H1, W1, D = cv.shape
    cvt = jnp.swapaxes(cv, 0, 1)                 # (W1, H1, D)
    jmap = jnp.broadcast_to((ml + jnp.arange(W1, dtype=jnp.int32))[:, None],
                            (W1, H1))
    blocks = jnp.concatenate([cvt, jnp.flip(cvt, 1)], 0)
    jmaps = jnp.concatenate([jmap, jmap], 0)
    adj = _scan_adj(blocks, jmaps, None, W, P1, P2, Pout)
    out = adj[:W1] + jnp.flip(adj[W1:], 1)
    return jnp.swapaxes(out, 0, 1)


def _shear_pos(cv):
    """S[i, c] = cv[i, c - (H-1) + i] — down-right diagonals become columns.
    Pure pad + flatten + reshape (no gather); width Wd+1 where
    Wd = W + H - 1 (the final column alias-reads and is masked)."""
    H1, W1, D = cv.shape
    Wd = W1 + H1 - 1
    P = jnp.pad(cv, ((0, 0), (H1 - 1, 0), (0, 0)))          # (H1, Wd, D)
    flat = P.reshape(H1 * Wd, D)
    flat = jnp.pad(flat, ((0, H1), (0, 0)))
    return flat.reshape(H1, Wd + 1, D)                       # S[i, c]=P[i, c+i]


def _unshear_pos(S, H1, W1):
    """Inverse of `_shear_pos` restricted to valid image positions."""
    D = S.shape[-1]
    Wd = W1 + H1 - 1
    flat = S.reshape(H1 * (Wd + 1), D)[: H1 * Wd]
    P = flat.reshape(H1, Wd, D)                              # P[i, m]=S[i, m-i]
    return P[:, H1 - 1:H1 - 1 + W1, :]


def _shear_neg(cv):
    """S[i, c] = cv[i, c - i] — down-left diagonals become columns."""
    H1, W1, D = cv.shape
    Wd = W1 + H1 - 1
    P = jnp.pad(cv, ((0, 0), (0, Wd + 1 - W1), (0, 0)))      # width Wd+1
    flat = P.reshape(H1 * (Wd + 1), D)[: H1 * Wd]
    return flat.reshape(H1, Wd, D)                           # S[i, c]=P[i, c-i]


def _unshear_neg(S, H1, W1):
    D = S.shape[-1]
    Wd = W1 + H1 - 1
    flat = S.reshape(H1 * Wd, D)
    flat = jnp.pad(flat, ((0, H1), (0, 0)))
    Q = flat.reshape(H1, Wd + 1, D)                          # Q[i, m]=S[i, m+i]
    return Q[:, :W1, :]


def _diagonal_group(cv, ml, P1, P2, Pout, W):
    """The four (+-1, +-1) directions via shears, one scan over rows, with the
    reference's double-covered corner lines doubled by a one-hot multiply."""
    H1, W1, D = cv.shape
    Wd = W1 + H1 - 1

    ii = jax.lax.broadcasted_iota(jnp.int32, (H1, Wd + 1), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (H1, Wd + 1), 1)

    # down-right family: img j = c - (H1-1) + i
    Sp = _shear_pos(cv)                                      # (H1, Wd+1, D)
    jp = ml + cc - (H1 - 1) + ii
    vp = (jp >= ml) & (jp < ml + W1)
    # down-left family: img j = c - i  (width Wd)
    Sn = _shear_neg(cv)
    ccn = cc[:, :Wd]
    jn = ml + ccn - ii[:, :Wd]
    vn = (jn >= ml) & (jn < ml + W1)

    def run(S, jmap, vmap, corner_fwd, corner_bwd):
        Hs, Ws, _ = S.shape
        blocks = jnp.concatenate([S, jnp.flip(S, 0)], 1)     # lines=columns
        blocks = jnp.swapaxes(blocks, 0, 1)                  # (2Ws, Hs, D)
        jm = jnp.concatenate([jmap, jnp.flip(jmap, 0)], 1).T
        vm = jnp.concatenate([vmap, jnp.flip(vmap, 0)], 1).T
        adj = _scan_adj(blocks, jm, vm, W, P1, P2, Pout)     # (2Ws, Hs, D)
        fwd = jnp.swapaxes(adj[:Ws], 0, 1)                   # (Hs, Ws, D)
        bwd = jnp.flip(jnp.swapaxes(adj[Ws:], 0, 1), 0)
        # double the corner-start lines (reference enumerates them twice)
        one_f = (jnp.arange(Ws) == corner_fwd).astype(jnp.float32)
        one_b = (jnp.arange(Ws) == corner_bwd).astype(jnp.float32)
        fwd = fwd * (1.0 + one_f)[None, :, None]
        bwd = bwd * (1.0 + one_b)[None, :, None]
        return fwd + bwd

    # corner columns: UPLEFT2DOWNRIGHT starts (0,0) -> c = H1-1;
    # DOWNRIGHT2UPLEFT starts (H1-1, W1-1) -> c = W1-1;
    # UPRIGHT2DOWNLEFT starts (0, W1-1) -> c = W1-1 (c = i+j);
    # DOWNLEFT2UPRIGHT starts (H1-1, 0) -> c = H1-1.
    adj_p = run(Sp, jp, vp, H1 - 1, W1 - 1)
    adj_n = run(Sn, jn, vn, W1 - 1, H1 - 1)
    return _unshear_pos(adj_p, H1, W1) + _unshear_neg(adj_n, H1, W1)


# ---------------------------------------------------------------------------
# Generic gather path (knight-move directions of the 16-set)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=32)  # bounded: maps are O((H+W)*line_len) per key
def _build_lines(H: int, W: int, margins: tuple, direction: SgmDirection):
    """Static (lines, steps) index maps for one direction, following
    `addDirectionalCost`'s start enumeration (`sgm.h:329-355`)."""
    ml, mt, mr, mb = margins
    sv, sh = direction.value
    starts = []
    if sh != (0, 0):
        sj = ml if (sh[0] >= 0 and sh[1] >= 0) else W - mr - 1
        for si in range(mt, H - mb):
            starts.append((si, sj))
    if sv != (0, 0):
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


def _cost_mode_pass(cv: jnp.ndarray, ii, jj, active, P1: float, P2: float,
                    Pout: float) -> jnp.ndarray:
    """One direction's contribution via gather + scan + scatter-add (used
    only for knight-move directions)."""
    H, W, D = cv.shape
    L, T = ii.shape
    lines_cv = cv[ii, jj, :]
    adjs = _scan_adj(lines_cv, jnp.asarray(jj), jnp.asarray(active), W,
                     P1, P2, Pout)
    out = jnp.zeros((H, W, D), jnp.float32)
    return out.at[ii.reshape(-1), jj.reshape(-1)].add(adjs.reshape(L * T, D))


# ---------------------------------------------------------------------------
# Pallas backend dispatch
# ---------------------------------------------------------------------------

def _pallas_adj(region, ml, P1, P2, Pout, W, n_directions,
                try_dhw=True):
    """All principal-direction contributions via the Pallas kernels, by
    preference order: the DHW (disparity-on-sublanes) fused passes —
    2.2x the HWD per-op rate, and since round 4 they reach HD D=320 by
    splitting the accumulate stream — then the old full-width HWD passes
    (`sgm_fused_adj`), then the W-chunked HWD passes with edge-history
    relay (`sgm_chunked_adj`) as the last resort.  ``try_dhw=False``
    skips the DHW attempt (the 16-direction caller already tried it)."""
    from .sgm_pallas import sgm_fused_adj, sgm_chunked_adj
    if try_dhw:
        from .sgm_pallas_dhw import sgm_fused_adj_dhw
        a = sgm_fused_adj_dhw(jnp.moveaxis(region, -1, 1), ml, W, P1, P2,
                              Pout, n_directions)
        if a is not None:
            return jnp.moveaxis(a, 1, -1)
    adj = sgm_fused_adj(region, ml, W, P1, P2, Pout, n_directions)
    if adj is None:
        adj = sgm_chunked_adj(region, ml, W, P1, P2, Pout, n_directions)
    return adj


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def sgm_cost_volume(cv: jnp.ndarray, P1: float, P2: float,
                    margins: Margins = Margins(), Pout: float = 100.0,
                    n_directions: int = 8,
                    strategy: ExtractionStrategy = ExtractionStrategy.COST,
                    backend: str = "auto") -> jnp.ndarray:
    """Aggregate a (H, W, D) cost volume along 4/8/16 scanline directions
    (`sgmCostVolume`, `sgm.h:361-404`).  Returns float32.

    ``backend``: 'pallas' (TPU kernel), 'xla' (scan-based), or 'auto'
    (pallas on TPU, xla elsewhere)."""
    if n_directions not in (4, 8, 16):
        raise ValueError("SGM operates with 4, 8 or 16 directions")
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    H, W, D = cv.shape
    cv = cv.astype(jnp.float32)
    if strategy is ExtractionStrategy.SCORE:
        return -sgm_cost_volume(-cv, P1, P2, margins, Pout, n_directions,
                                ExtractionStrategy.COST, backend)

    P1, P2, Pout = float(P1), float(P2), float(Pout)
    ml, mt, mr, mb = margins.left, margins.top, margins.right, margins.bottom
    region = cv[mt:H - mb if mb else H, ml:W - mr if mr else W, :]
    if region.shape[0] == 0 or region.shape[1] == 0:
        return cv

    adj = None
    knight_done = False
    if backend == "pallas" and P2 >= P1:
        if n_directions >= 16:
            # the DHW kernels carry the knight families alongside the
            # principal directions in the same four streaming passes
            from .sgm_pallas_dhw import sgm_fused_adj_dhw
            a = sgm_fused_adj_dhw(jnp.moveaxis(region, -1, 1), ml, W,
                                  P1, P2, Pout, 16)
            if a is not None:
                adj = jnp.moveaxis(a, 1, -1)
                knight_done = True
        if adj is None:
            adj = _pallas_adj(region, ml, P1, P2, Pout, W, n_directions,
                              try_dhw=n_directions < 16)
    if adj is None:
        adj = _horizontal_group(region, ml, P1, P2, Pout, W)
        adj = adj + _vertical_group(region, ml, P1, P2, Pout, W)
        if n_directions >= 8:
            adj = adj + _diagonal_group(region, ml, P1, P2, Pout, W)

    sgm = cv + jnp.pad(adj, ((mt, mb), (ml, mr), (0, 0)))

    if n_directions >= 16 and not knight_done:
        m = (ml, mt, mr, mb)
        for direction in _KNIGHT_DIRS:
            ii, jj, active = _build_lines(H, W, m, direction)
            if ii.size == 0:
                continue
            sgm = sgm + _cost_mode_pass(cv, ii, jj, active, P1, P2, Pout)
    return sgm


def _tcv_from_bands(idx, bands, H, W, D, h_radius, v_radius, r):
    """Assemble the SAME-mode truncated cost volume from the fused WTA
    kernel's (idx, bands) maps: out-of-range / margin-clipped slots go
    NaN, matching `truncated_cost_volume` (`correlation_base.h:582-674`)."""
    ii = jnp.arange(H, dtype=jnp.int32)[:, None]
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]
    nan = jnp.float32(jnp.nan)
    slots = []
    for k in range(2 * r + 1):
        p = idx + (k - r)
        valid = ((p >= 0) & (p < D)
                 & (jj >= h_radius) & (jj + p + h_radius < W)
                 & (ii >= v_radius) & (ii + v_radius < H))
        slots.append(jnp.where(valid, bands[..., k], nan))
    from ..core.types import disp_dtype
    return idx.astype(disp_dtype), jnp.stack(slots, axis=-1)


def dense_sgm_stereo(func, img_l: jnp.ndarray, img_r: jnp.ndarray,
                     h_radius: int, v_radius: int, disp_width: int,
                     P1: float, P2: float, *, Pout: float = 100.0,
                     n_directions: int = 8, cost_vol_radius: int = 1,
                     refine_kernel=None, cv_dtype=jnp.float32,
                     backend: str = "auto"):
    """Dense SGM stereo end-to-end: cost volume -> 4/8/16-direction SGM
    -> tie-last WTA -> truncated band -> optional cost-based subpixel —
    the dense hot loop of `examples/stereo-match/main.cpp:234-258`.

    On TPU with a dot-family matching cost this runs the native-layout
    fast path: the fused box kernel EMITS the cost volume as (Hp, Dp, Wp)
    — disparity on sublanes, already negated for SCORE functions and
    +inf-d-padded — feeding the down/up passes directly; the horizontal
    + WTA passes read its (Wp, Dp, Hp) transpose.  The only full-volume
    relayouts in the whole pipeline are that transpose and the down/up
    adjustment transpose — worth ~1 ms/frame at 480x640 D=120 against
    the compose-it-yourself chain.  Everywhere else it is exactly
    ``unfold_based_cost_volume`` -> ``sgm_wta_truncated`` ->
    ``refine_disp_cost_interpolation``.

    Returns ``(disp, idx, tcv)``: refined disparity (H, W) f32 (equal to
    ``idx`` when ``refine_kernel`` is None), the raw WTA index map, and
    the truncated cost volume (COST orientation)."""
    from ..core.types import MATCH_TRAITS
    from .refinement import refine_disp_cost_interpolation
    strategy = MATCH_TRAITS[func].strategy
    sign = 1.0 if strategy is ExtractionStrategy.COST else -1.0
    H, W = img_l.shape[:2]
    D = int(disp_width)
    r = cost_vol_radius
    # the fused native-layout fast path is gray-image only (the builders
    # are); multichannel inputs take the general composed chain below
    use_pallas = backend in ("auto", "pallas") \
        and jax.default_backend() == "tpu" and img_l.ndim == 2

    idx = tcv = None
    if use_pallas and n_directions in (4, 8, 16) and P2 >= P1:
        from .box_pallas import box_cost_volume_fused_padded
        from .sgm_pallas_dhw import sgm_fused_wta_from_native
        dt = jnp.bfloat16 if cv_dtype == jnp.bfloat16 else jnp.float32
        if dt == jnp.bfloat16 and n_directions >= 16:
            dt = jnp.float32       # knight streams break packed-pair bf16
        sub = 8 if jnp.dtype(dt).itemsize == 4 else 16
        Dp = -(-D // sub) * sub
        # Pout baking (always on here): the out-of-image penalty rides
        # the cost stream once, dropping the per-carry +Pout add from
        # every issue-limited DP row; the WTA pass restores the
        # per-pixel direction multiplicity (incl. corner doubling and,
        # for 16 directions, the knight seed weights) via a
        # constant-folded plane in one f32 op.  Bit-identical carries
        # (see `sgm_pallas_dhw._dw_step` / `_bake_mult_plane`).
        cv_nat = box_cost_volume_fused_padded(
            func, img_l, img_r, h_radius, v_radius, D, Dp, dt,
            negate=sign < 0, pout_bake=float(Pout), interpret=False)
        if cv_nat is not None:
            # the transposed volume comes from ONE pad-free XLA relayout
            # of the padded volume (measured faster in context than a
            # second axis-swapped kernel invocation — the per-disparity
            # sublane shifts make the transposed builder ~1 ms vs ~0.4 ms
            # for XLA's tile transpose; see docs/PERF.md round-4 notes).
            # The barrier pins the relayout RIGHT AFTER the builder,
            # before the DP passes — without it the scheduler floats the
            # copy into the issue-limited chain: 3.45 vs 3.51 ms
            # end-to-end, consistent across interleaved reps
            # (scripts/exp_r5_sched.py)
            cv_T = jnp.transpose(cv_nat, (2, 1, 0))
            cv_nat, cv_T = jax.lax.optimization_barrier((cv_nat, cv_T))
            from .refinement import InterpolationKernel
            fuse_refine = (refine_kernel is InterpolationKernel.PARABOLA
                           and r >= 1)
            res = sgm_fused_wta_from_native(
                cv_nat, cv_T, H, W, D, 0, W, float(P1), float(P2),
                float(Pout), n_directions, wta_radius=r, interpret=False,
                pout_baked=True,
                refine=(h_radius, v_radius) if fuse_refine else None)
            if res is not None:
                idx, tcv = _tcv_from_bands(res[0], res[1], H, W, D,
                                           h_radius, v_radius, r)
                if fuse_refine:
                    # subpixel computed in-kernel (tiny band-row ops);
                    # idx/tcv stay available and are DCE'd when unused
                    return res[2], idx, tcv

    if idx is None:
        from .cost_volume import unfold_based_cost_volume
        cv = unfold_based_cost_volume(func, img_l, img_r, h_radius,
                                      v_radius, D, cv_dtype=cv_dtype,
                                      backend="auto", layout="dhw")
        idx, tcv = sgm_wta_truncated(
            cv, P1, P2, Pout=Pout, n_directions=n_directions,
            strategy=strategy, h_radius=h_radius, v_radius=v_radius,
            cost_vol_radius=r, backend=backend, layout="dhw")

    if refine_kernel is None:
        disp = idx.astype(jnp.float32)
    else:
        disp = refine_disp_cost_interpolation(refine_kernel, tcv, idx)
    return disp, idx, tcv


def sgm_wta_truncated(cv: jnp.ndarray, P1: float, P2: float,
                      margins: Margins = Margins(), Pout: float = 100.0,
                      n_directions: int = 8,
                      strategy: ExtractionStrategy = ExtractionStrategy.COST,
                      h_radius: int = 0, v_radius: int = 0,
                      cost_vol_radius: int = 1,
                      backend: str = "auto", layout: str = "hwd"):
    """Fused fast path for the chain ``sgm_cost_volume`` ->
    ``extract_selected_index`` -> ``truncated_cost_volume`` (SAME mode) —
    the dense-SGM hot loop of `examples/stereo-match/main.cpp:234-258`.

    Returns ``(selected_index, truncated_cv)``; the truncated volume is
    always in COST orientation (for SCORE inputs it holds the negated SGM
    scores), which is what cost-based subpixel refinement consumes.  On TPU
    with zero margins, 4/8 directions and P2 >= P1 the WTA and band
    extraction happen inside the final SGM kernel pass (saving four
    full-volume HBM sweeps); otherwise this is exactly the three-op chain.

    ``layout='dhw'`` declares ``cv`` as (H, D, W) — disparity on VPU
    sublanes — the native layout of the Pallas fast path (zero extra
    relayout when the cost volume was built with ``layout='dhw'``).
    """
    from .cost_volume import (extract_selected_index, truncated_cost_volume,
                              TruncatedCvDirection)
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if layout == "dhw":
        H, D, W = cv.shape
    else:
        H, W, D = cv.shape
    r = cost_vol_radius
    zero_margins = (margins.left == margins.top == margins.right
                    == margins.bottom == 0)

    if (backend == "pallas" and zero_margins and n_directions in (4, 8, 16)
            and P2 >= P1):
        from .sgm_pallas_dhw import sgm_fused_wta_dhw
        sign = 1.0 if strategy is ExtractionStrategy.COST else -1.0
        cv_dhw = cv if layout == "dhw" else jnp.moveaxis(cv, -1, 1)
        if cv_dhw.dtype != jnp.bfloat16:   # bf16 volumes stay bf16 (packed
            cv_dhw = cv_dhw.astype(jnp.float32)   # VPU fast path)
        elif n_directions >= 16:
            # measured (device-chained, v5e, incl. streamed knight weight
            # planes): bf16 16-dir 7.56 ms vs f32 6.06 ms at 480x640
            # D=120 — the extra knight streams still break packed-pair
            # bf16 operation, so 16-dir prefers f32
            cv_dhw = cv_dhw.astype(jnp.float32)
        res = sgm_fused_wta_dhw(sign * cv_dhw, 0, W,
                                float(P1), float(P2), float(Pout),
                                n_directions, wta_radius=r)
        if res is not None:
            idx, bands = res
            return _tcv_from_bands(idx, bands, H, W, D, h_radius,
                                   v_radius, r)

    if layout == "dhw":
        cv = jnp.moveaxis(cv, 1, -1)
    sgm = sgm_cost_volume(cv, P1, P2, margins, Pout, n_directions, strategy,
                          backend)
    idx = extract_selected_index(sgm, strategy)
    vol = sgm if strategy is ExtractionStrategy.COST else -sgm
    tcv = truncated_cost_volume(vol, idx, h_radius, v_radius, r,
                                sdir=TruncatedCvDirection.SAME)
    return idx, tcv
