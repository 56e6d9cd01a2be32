"""PatchMatch stereo (1-D) and image-flow (2-D) correspondence search.

Reference parity: `correlation/patchmatch.h` — `randomDispInit` (:58 uniform
init over the search range), `patchMatchTestCost` (:168; ties ACCEPT the
candidate), `patchMatchPropagate` (:373: per-iteration direction cycling
over the four diagonal sweeps, row scans then column scans, each sequential
along its axis and parallel across lines), `patchMatchSearch` (:234:
nRandomSearch uniform candidates scaled toward the current solution by
(k+1)/(nSearch+1), forced off the current value), `patchMatchImpl` (:450).

TPU design — two backends:
  * 'pallas' (`_patch_match_stereo_cv`): the reference's CACHED on-demand
    volume semantics (`on_demand_cost_volume.h:330`) — the dense cost
    volume is precomputed once (box backend from images) and propagation
    runs as grid-sequential Pallas sweep kernels with fused probe updates
    (`patchmatch_pallas`);
  * 'xla' (cacheless): costs recomputed per evaluation from normalized
    feature volumes; sweeps are `lax.scan`s carrying the updated line.
Both accept ties and reject invalid candidates before comparison
(`patchmatch.h:199-218`).  The RNG is counter-based (`jax.random`) rather
than the reference's per-thread engines, so parity is statistical (same
convergence quality), not bitwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import (MatchingFunction, MATCH_TRAITS, ExtractionStrategy,
                          disp_dtype)
from ..core.search import SearchOffset1, SearchOffset2
from .matching import feature_comparison


def _better(traits, cand_cost, cur_cost):
    """Candidate acceptance: ties accept (`patchmatch.h:210-218`)."""
    if traits.strategy is ExtractionStrategy.SCORE:
        return cand_cost >= cur_cost
    return cand_cost <= cur_cost


class _StereoEval:
    """cost(i, j, d) = compare(source[i, j], target[i, j + d]); invalid
    target positions evaluate to None in the reference (candidate rejected)
    — here a worst-cost sentinel."""

    def __init__(self, func, source_fv, target_fv):
        self.func = func
        self.traits = MATCH_TRAITS[func]
        self.source = source_fv
        self.target = target_fv
        self.worst = (jnp.inf if self.traits.strategy is ExtractionStrategy.COST
                      else -jnp.inf)

    def cost_cols(self, j, d_col):
        """Costs for one column j of source pixels with per-row disparities
        d_col (H,)."""
        H, W, F = self.target.shape
        tgt_j = j + d_col
        inb = (tgt_j >= 0) & (tgt_j < W)
        tj = jnp.clip(tgt_j, 0, W - 1)
        tgt = self.target[jnp.arange(H), tj]            # (H, F)
        c = feature_comparison(self.func, self.source[:, j, :], tgt)
        return jnp.where(inb, c, self.worst)

    def cost_field(self, d: jnp.ndarray):
        """Costs for a full (H, W) disparity field.

        The per-pixel W-axis lookup runs as a one-hot matmul on the MXU
        (out-of-range rows are all-zero -> zero target vector, matching the
        reference convention) instead of a TPU gather; bf16 one-hot halves
        the streaming cost on TPU.  Census-family features are packed
        uint32 BIT WORDS — any float matmul rounds them (bf16 above 256,
        f32 above 2^24), so they take an exact gather instead."""
        H, W, F = self.target.shape
        jj = jnp.arange(W, dtype=jnp.int32)[None, :]
        tgt_j = jj + d
        inb = (tgt_j >= 0) & (tgt_j < W)
        if self.traits.census:
            tj = jnp.clip(tgt_j, 0, W - 1)
            tgt = jnp.take_along_axis(self.target, tj[..., None], axis=1)
            tgt = jnp.where(inb[..., None], tgt, 0)
        else:
            hot_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                         else jnp.float32)
            onehot = (tgt_j[..., None] == jnp.arange(W, dtype=jnp.int32)
                      ).astype(hot_dtype)
            tgt = jnp.einsum("hjw,hwf->hjf", onehot,
                             self.target.astype(hot_dtype),
                             preferred_element_type=jnp.float32)
        c = feature_comparison(self.func, self.source, tgt)
        return jnp.where(inb, c, self.worst)


def _row_sweep(ev: _StereoEval, disp, cost, forward: bool):
    """Sequential propagation along columns, all rows in parallel: pixel
    (i, j) tests the (already updated) disparity of (i, j -+ 1)."""
    H, W = disp.shape
    js = jnp.arange(W, dtype=jnp.int32)
    if not forward:
        js = jnp.flip(js)

    def step2(state, j):
        d, c = state                        # (H, W) disparity + cost fields
        prev_j = jnp.where(forward, j - 1, j + 1)
        ok = (prev_j >= 0) & (prev_j < W)
        prev_d = d[:, jnp.clip(prev_j, 0, W - 1)]
        cand_cost = ev.cost_cols(j, prev_d)
        accept = ok & _better(ev.traits, cand_cost, c[:, j])
        d = d.at[:, j].set(jnp.where(accept, prev_d, d[:, j]))
        c = c.at[:, j].set(jnp.where(accept, cand_cost, c[:, j]))
        return (d, c), accept.sum()

    (disp, cost), changes = jax.lax.scan(step2, (disp, cost), js,
                                        unroll=8)
    return disp, cost, changes.sum()


def _col_sweep(ev: _StereoEval, disp, cost, forward: bool):
    H, W = disp.shape
    iis = jnp.arange(H, dtype=jnp.int32)
    if not forward:
        iis = jnp.flip(iis)

    def step(state, i):
        d, c = state
        prev_i = jnp.where(forward, i - 1, i + 1)
        ok = (prev_i >= 0) & (prev_i < H)
        prev_d = d[jnp.clip(prev_i, 0, H - 1), :]
        # costs for row i with disparities prev_d: use field eval on one row
        Ht, Wt, F = ev.target.shape
        jj = jnp.arange(Wt, dtype=jnp.int32)
        tgt_j = jj + prev_d
        inb = (tgt_j >= 0) & (tgt_j < Wt)
        tj = jnp.clip(tgt_j, 0, Wt - 1)
        tgt = ev.target[i][tj]                     # (W, F)
        cand_cost = feature_comparison(ev.func, ev.source[i], tgt)
        cand_cost = jnp.where(inb, cand_cost, ev.worst)
        accept = ok & _better(ev.traits, cand_cost, c[i, :])
        d = d.at[i, :].set(jnp.where(accept, prev_d, d[i, :]))
        c = c.at[i, :].set(jnp.where(accept, cand_cost, c[i, :]))
        return (d, c), accept.sum()

    (disp, cost), changes = jax.lax.scan(step, (disp, cost), iis,
                                        unroll=8)
    return disp, cost, changes.sum()


def _random_search(ev: _StereoEval, disp, cost, search: SearchOffset1,
                   n_random: int, key):
    """Geometric-decay random probes (`patchMatchSearch`,
    `patchmatch.h:234-366`)."""
    H, W = disp.shape
    keys = jax.random.split(key, n_random)
    for k in range(n_random):
        cand = jax.random.randint(keys[k], (H, W), search.lower,
                                  search.upper + 1, dtype=disp_dtype)
        delta = ((cand - disp) * (k + 1)) // (n_random + 1)
        cand = disp + delta
        cand = jnp.where(cand == disp, disp + 1, cand)
        cand_cost = ev.cost_field(cand)
        # the +1 nudge (and geometric rounding) can leave the search
        # range: reject out-of-range candidates before the tie-accepting
        # compare (`patchmatch.h:199-218`; the Pallas probe kernel's
        # in_range check is the same contract)
        in_rng = (cand >= search.lower) & (cand <= search.upper)
        cand_cost = jnp.where(in_rng, cand_cost, ev.worst)
        accept = in_rng & _better(ev.traits, cand_cost, cost)
        disp = jnp.where(accept, cand, disp)
        cost = jnp.where(accept, cand_cost, cost)
    return disp, cost


# the four diagonal sweep direction pairs, cycled per iteration
# (`utils/propagation_direction.h:27-90`): (row forward?, col forward?)
_SWEEP_DIRS = [(True, True), (False, True), (True, False), (False, False)]


def _patch_match_stereo_cv(func, source_fv, target_fv, search, n_iter,
                           n_random, key, interpret=False, cv=None):
    """CV-backed fast path: the reference's *cached* on-demand volume
    semantics (`on_demand_cost_volume.h:330`) — costs precomputed once,
    sweeps as grid-sequential Pallas kernels, random search as masked
    reductions over the volume.  Bit-identical cost values; out-of-image /
    out-of-range candidates rejected before the tie-accepting compare
    (`patchmatch.h:199-218`)."""
    from .cost_volume import aggregate_cost
    from .patchmatch_pallas import sweep, probe, _round_up
    traits = MATCH_TRAITS[func]
    if source_fv is not None:
        H, W = source_fv.shape[:2]
    else:
        H, W = cv.shape[:2]
    lower, upper = search.lower, search.upper
    D = upper - lower + 1

    if cv is None:
        # aggregate_cost's RIGHT_TO_LEFT roles: fv_r = source, fv_l = target
        cv = aggregate_cost(func, target_fv, source_fv, search)
    costc = cv if traits.strategy is ExtractionStrategy.COST else -cv
    jj = jnp.arange(W, dtype=jnp.int32)[None, :, None]
    dv = lower + jnp.arange(D, dtype=jnp.int32)[None, None, :]
    tgt = jj + dv
    costc = jnp.where((tgt >= 0) & (tgt < W), costc.astype(jnp.float32),
                      jnp.inf)

    # disparity-on-sublanes layout (see patchmatch_pallas): both image
    # dims pad to 128 so the same state arrays serve as lanes in one
    # orientation and scan rows in the other
    Dp = _round_up(D, 8)
    Hp = _round_up(H, 128)
    Wp = _round_up(W, 128)
    cv_p = jnp.moveaxis(
        jnp.pad(costc, ((0, Hp - H), (0, Wp - W), (0, Dp - D)),
                constant_values=jnp.inf), -1, 1)        # (Hp, Dp, Wp)
    cvT_p = jnp.transpose(cv_p, (2, 1, 0))              # (Wp, Dp, Hp)

    key, k0 = jax.random.split(key)
    disp = jax.random.randint(k0, (Hp, Wp), lower, upper + 1,
                              dtype=jnp.int32)
    # init: probe against +inf adopts each pixel's own cost
    disp, cost = probe(cv_p, disp, disp,
                       jnp.full((Hp, Wp), jnp.inf, jnp.float32), lower, D,
                       interpret=interpret)

    for it in range(n_iter):
        row_fwd, col_fwd = _SWEEP_DIRS[it % 4]
        dT, cT = sweep(cvT_p, jnp.swapaxes(disp, 0, 1),
                       jnp.swapaxes(cost, 0, 1), lower, D, W,
                       reverse=not row_fwd, interpret=interpret)
        disp = jnp.swapaxes(dT, 0, 1)
        cost = jnp.swapaxes(cT, 0, 1)
        disp, cost = sweep(cv_p, disp, cost, lower, D, H,
                           reverse=not col_fwd, interpret=interpret)
        key, ks = jax.random.split(key)
        keys = jax.random.split(ks, n_random)
        if n_random:
            # all n_random candidate fields are generated from the
            # pre-probe disparity and evaluated sequentially inside ONE
            # volume read (vs the reference's re-centering each probe on
            # the just-updated disparity, `patchmatch.h:234-366` — a
            # statistical-parity deviation like the counter-based RNG;
            # acceptance order within the batch matches the reference)
            cands = []
            for k in range(n_random):
                cand = jax.random.randint(keys[k], (Hp, Wp), lower,
                                          upper + 1, dtype=jnp.int32)
                delta = ((cand - disp) * (k + 1)) // (n_random + 1)
                cand = disp + delta
                cand = jnp.where(cand == disp, disp + 1, cand)
                cands.append(cand)
            disp, cost = probe(cv_p, jnp.stack(cands, axis=1), disp, cost,
                               lower, D, interpret=interpret)
    return disp[:H, :W].astype(disp_dtype)


def patch_match_stereo(func: MatchingFunction, source_fv: jnp.ndarray,
                       target_fv: jnp.ndarray, search: SearchOffset1,
                       n_iter: int = 5, n_random: int = 4,
                       key: jax.Array | None = None,
                       backend: str = "auto") -> jnp.ndarray:
    """1-D PatchMatch: returns the (H, W) disparity field (index-space, i.e.
    target at ``j + d``).  Feature volumes must be normalized for ``func``
    (`cachelessPatchMatch`, `patchmatch.h:561`).

    ``backend``: 'pallas' (CV-backed sweep kernels — the cached on-demand
    variant's semantics; pays a full aggregate_cost build, so it wins when
    the volume is cheap — see the `patch_match` image wrapper, which feeds
    a box-filter volume), 'xla' (cacheless scans), 'auto' (xla: for
    feature-volume inputs the aggregation dominates).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if backend == "auto":
        backend = "xla"
    if backend == "pallas":
        return _patch_match_stereo_cv(func, source_fv, target_fv, search,
                                      n_iter, n_random, key,
                                      interpret=jax.default_backend()
                                      != "tpu")
    ev = _StereoEval(func, source_fv, target_fv)
    H, W, _ = source_fv.shape

    key, k0 = jax.random.split(key)
    disp = jax.random.randint(k0, (H, W), search.lower, search.upper + 1,
                              dtype=disp_dtype)
    cost = ev.cost_field(disp)

    for it in range(n_iter):
        row_fwd, col_fwd = _SWEEP_DIRS[it % 4]
        disp, cost, _ = _row_sweep(ev, disp, cost, row_fwd)
        disp, cost, _ = _col_sweep(ev, disp, cost, col_fwd)
        key, ks = jax.random.split(key)
        disp, cost = _random_search(ev, disp, cost, search, n_random, ks)
    return disp


class _FlowEval:
    """cost(i, j, (di, dj)) = compare(source[i, j], target[i+di, j+dj])."""

    def __init__(self, func, source_fv, target_fv):
        self.func = func
        self.traits = MATCH_TRAITS[func]
        self.source = source_fv
        self.target = target_fv
        self.worst = (jnp.inf if self.traits.strategy is ExtractionStrategy.COST
                      else -jnp.inf)

    def cost_field(self, flow: jnp.ndarray):
        H, W, F = self.target.shape
        ii = jnp.arange(H, dtype=jnp.int32)[:, None]
        jj = jnp.arange(W, dtype=jnp.int32)[None, :]
        ti = ii + flow[..., 0]
        tj = jj + flow[..., 1]
        inb = (ti >= 0) & (ti < H) & (tj >= 0) & (tj < W)
        tgt = self.target[jnp.clip(ti, 0, H - 1), jnp.clip(tj, 0, W - 1)]
        c = feature_comparison(self.func, self.source, tgt)
        return jnp.where(inb, c, self.worst)


def patch_match_flow(func: MatchingFunction, source_fv: jnp.ndarray,
                     target_fv: jnp.ndarray, search: SearchOffset2,
                     n_iter: int = 5, n_random: int = 4,
                     key: jax.Array | None = None) -> jnp.ndarray:
    """2-D PatchMatch (image flow, `patchMatch` with searchSpaceDim == 2):
    returns the (H, W, 2) flow field (di, dj).  Propagation sweeps and the
    scaled random search mirror the 1-D variant with 2-D candidates."""
    if key is None:
        key = jax.random.PRNGKey(0)
    ev = _FlowEval(func, source_fv, target_fv)
    H, W, _ = source_fv.shape

    key, k0, k1 = jax.random.split(key, 3)
    flow = jnp.stack([
        jax.random.randint(k0, (H, W), search.lower0, search.upper0 + 1,
                           dtype=disp_dtype),
        jax.random.randint(k1, (H, W), search.lower1, search.upper1 + 1,
                           dtype=disp_dtype)], -1)
    cost = ev.cost_field(flow)

    def row_sweep(flow, cost, forward):
        js = jnp.arange(W, dtype=jnp.int32)
        if not forward:
            js = jnp.flip(js)

        def step(state, j):
            f, c = state
            prev_j = jnp.where(forward, j - 1, j + 1)
            ok = (prev_j >= 0) & (prev_j < W)
            cand = f[:, jnp.clip(prev_j, 0, W - 1)]       # (H, 2)
            # evaluate only column j: gather target at (i+di, j+dj)
            ti = jnp.arange(H, dtype=jnp.int32) + cand[:, 0]
            tj = j + cand[:, 1]
            inb = (ti >= 0) & (ti < H) & (tj >= 0) & (tj < W)
            tgt = ev.target[jnp.clip(ti, 0, H - 1), jnp.clip(tj, 0, W - 1)]
            cc = feature_comparison(ev.func, ev.source[:, j, :], tgt)
            cc = jnp.where(inb, cc, ev.worst)
            accept = ok & _better(ev.traits, cc, c[:, j])
            f = f.at[:, j].set(jnp.where(accept[:, None], cand, f[:, j]))
            c = c.at[:, j].set(jnp.where(accept, cc, c[:, j]))
            return (f, c), None

        (flow, cost), _ = jax.lax.scan(step, (flow, cost), js,
                                       unroll=8)
        return flow, cost

    def col_sweep(flow, cost, forward):
        iis = jnp.arange(H, dtype=jnp.int32)
        if not forward:
            iis = jnp.flip(iis)

        def step(state, i):
            f, c = state
            prev_i = jnp.where(forward, i - 1, i + 1)
            ok = (prev_i >= 0) & (prev_i < H)
            cand = f[jnp.clip(prev_i, 0, H - 1), :]       # (W, 2)
            ti = i + cand[:, 0]
            tj = jnp.arange(W, dtype=jnp.int32) + cand[:, 1]
            inb = (ti >= 0) & (ti < H) & (tj >= 0) & (tj < W)
            tgt = ev.target[jnp.clip(ti, 0, H - 1), jnp.clip(tj, 0, W - 1)]
            cc = feature_comparison(ev.func, ev.source[i], tgt)
            cc = jnp.where(inb, cc, ev.worst)
            accept = ok & _better(ev.traits, cc, c[i, :])
            f = f.at[i, :].set(jnp.where(accept[:, None], cand, f[i, :]))
            c = c.at[i, :].set(jnp.where(accept, cc, c[i, :]))
            return (f, c), None

        (flow, cost), _ = jax.lax.scan(step, (flow, cost), iis,
                                       unroll=8)
        return flow, cost

    for it in range(n_iter):
        row_fwd, col_fwd = _SWEEP_DIRS[it % 4]
        flow, cost = row_sweep(flow, cost, row_fwd)
        flow, cost = col_sweep(flow, cost, col_fwd)
        key, ka, kb = jax.random.split(key, 3)
        for k in range(n_random):
            ka, k0, k1 = jax.random.split(ka, 3)
            cand = jnp.stack([
                jax.random.randint(k0, (H, W), search.lower0,
                                   search.upper0 + 1, dtype=disp_dtype),
                jax.random.randint(k1, (H, W), search.lower1,
                                   search.upper1 + 1, dtype=disp_dtype)], -1)
            delta = ((cand - flow) * (k + 1)) // (n_random + 1)
            cand = flow + delta
            same = jnp.all(cand == flow, -1, keepdims=True)
            cand = jnp.where(same, flow + 1, cand)
            cc = ev.cost_field(cand)
            in_rng = ((cand[..., 0] >= search.lower0)
                      & (cand[..., 0] <= search.upper0)
                      & (cand[..., 1] >= search.lower1)
                      & (cand[..., 1] <= search.upper1))
            cc = jnp.where(in_rng, cc, ev.worst)
            accept = in_rng & _better(ev.traits, cc, cost)
            flow = jnp.where(accept[..., None], cand, flow)
            cost = jnp.where(accept, cc, cost)
    return flow


def patch_match(func: MatchingFunction, img_or_fv_l, img_or_fv_r,
                search: SearchOffset1, h_radius: int | None = None,
                v_radius: int | None = None, n_iter: int = 5,
                n_random: int = 4, key=None) -> jnp.ndarray:
    """Convenience wrapper from raw images (`patchMatch`,
    `patchmatch.h:497`): unfold + normalize + run.  RIGHT_TO_LEFT roles
    (source = right)."""
    from .unfold import unfold
    from .cost_volume import normalize_feature_volume
    if key is None:
        key = jax.random.PRNGKey(0)
    if h_radius is not None and jax.default_backend() == "tpu":
        from .box_backend import supports_box
        if supports_box(func):
            # CV-backed fast path straight from images: the box-filter
            # decomposition builds the volume in O(HWD) — far cheaper than
            # aggregating from unfolded features
            from .cost_volume import unfold_based_cost_volume
            cv = unfold_based_cost_volume(func, img_or_fv_l, img_or_fv_r,
                                          h_radius, v_radius, search)
            return _patch_match_stereo_cv(func, None, None, search, n_iter,
                                          n_random, key, cv=cv)
    if h_radius is not None:
        fv_l = normalize_feature_volume(func, unfold(h_radius, v_radius,
                                                     img_or_fv_l))
        fv_r = normalize_feature_volume(func, unfold(h_radius, v_radius,
                                                     img_or_fv_r))
    else:
        fv_l, fv_r = img_or_fv_l, img_or_fv_r
    return patch_match_stereo(func, fv_r, fv_l, search, n_iter, n_random, key)
