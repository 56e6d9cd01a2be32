"""Pallas TPU SGM kernels in the disparity-on-sublanes layout.

The round-1 kernels (`sgm_pallas.py`) keep the disparity axis on VPU
*lanes*: every d+-1 shift is a lane rotate and every min-over-D a lane
reduction — measured ~125-130 cycles per (640, 128) tile versus ~20 for
the equivalent sublane ops.  Packing the volume as (H, D, W) — disparity
on sublanes, image columns on lanes — runs the identical DP step 2.2x
faster (93 us vs 205 us per full-volume step at 480x640 D=120).

Pass structure (8 principal + 8 knight-move directions,
`correlation/sgm.h:57-155`):
  * down/up passes on the (H, D, W) volume: vertical + both diagonal
    families, carried together in (Dp, Wp) VMEM scratch; diagonal
    carries advance by one *lane* shift per row (the shifted-in zero
    column is the line-start state);
  * the volume and the down/up adjustment are transposed once each to
    (W, D, H) (XLA relayout, ~bandwidth);
  * horizontal fwd/rev run as down/up passes over the transposed volume
    (scan over image columns, rows on lanes) — no per-column small-op
    loops; the reverse pass fuses the tie-last WTA + truncated-band
    extraction as sublane reductions;
  * with ``n_directions=16`` each pass additionally carries its two
    knight-move families (4 extra (Dp, Xp) carries: 2 drift signs x 2
    seed phases — see `_knight_row`), so 16 directions still take
    exactly four streaming passes.

Disparity pads to a multiple of 8 (sublanes) with +inf — D=120 and
D=320 pad to themselves, unlike the 128-lane padding of the old layout.
Lane padding (image columns / rows) pads with zeros and zero Pout so
padded lanes self-sustain exact zero carries: min(0, P2, P1) - 0 = 0,
which is precisely the line-start state a diagonal shifting in from the
image edge must see.

Reference parity: `correlation/sgm.h:187-306` recurrence with P1/P2/Pout
and min-normalization; tie-last WTA (`correlation_base.h:446-455`);
SAME-mode truncated band (`correlation_base.h:582-674`).  Oracle-exact
(see tests/test_sgm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")

# In-context pipeline tuning hooks (scripts/exp_r5_pipeline.py).
# Round-5 measured results at the flagship geometry (480x640 D=120
# bf16, interleaved in one window):
#   rc_down=2        3.504 ms vs 3.534 production — small, consistent
#                    across reps (isolated: down rc=2 0.635 vs rc=8
#                    0.753; the 3-stream acc passes prefer rc=8) —
#                    adopted via _RC_DOWN_CALIB below;
#   force_split_up   3.655 ms — NEGATIVE: although a transpose with an
#                    XLA producer measures ~free in isolation (0.046 ms
#                    for 78 MB — the producer writes directly in the
#                    flipped layout), in context XLA materializes the
#                    `adj_d + adj_u` add and still pays the relayout,
#                    so the extra 2-stream write loses to the acc pass.
TUNE = {"rc_down": None, "rc_up": None, "rc_fwd": None,
        "force_split_up": False, "adj_T_barrier": False,
        "downup_barrier": False}

# Scoped-VMEM pool: all acceptance bounds shift with the pool size when
# LIBTPU_INIT_ARGS raises it (utils/vmem.py); at the default 16 MB pool
# these equal the round-4/5 calibrated constants exactly.
from ..utils.vmem import scope_delta as _scope_delta
_SCOPED_LIMIT = 15_900_000 + _scope_delta()   # pool minus Mosaic margin
_VMEM_BUDGET = 12 * 1024 * 1024 + max(0, _scope_delta()) * 3 // 4

# Measured-best down-pass row chunks per (Dp, Xp, itemsize); geometries
# not listed use the generic picker.
_RC_DOWN_CALIB = {(128, 640, 2): 2}


def _round_up(x, m):
    return (x + m - 1) // m * m


def _dw_step(prev, base, pout_add, P1, P2):
    """One O(D) min-shift DP step on a (Dp, X) tile (disparity on
    sublanes).  `prev` is the carry with +inf at padded d rows; returns
    (cur, adj) with cur = base + adj (`sgm.h:230-300`).  Dtype-generic:
    bf16 tiles run packed 2-per-lane on the VPU (measured 4.2x over f32
    per pass), with P1/P2 weak-typed into the tile dtype.

    ``pout_add=None`` is the Pout-BAKED mode: the out-of-image penalty
    already rides the cost stream (`box_pallas` ``pout_bake``), so the
    per-row +Pout add disappears from the issue-limited chain.  Because
    the in-range cost at out-of-range (j+d >= W) entries is exactly 0,
    ``base = Pout`` there and ``cur = base + (agg - m)`` is bit-identical
    to the unbaked ``cur = 0 + (agg - m + Pout)``."""
    m = jnp.min(prev, axis=0, keepdims=True)
    inf_row = jnp.full((1, prev.shape[1]), _INF, prev.dtype)
    up = jnp.concatenate([inf_row, prev[:-1]], axis=0)
    dn = jnp.concatenate([prev[1:], inf_row], axis=0)
    agg = jnp.minimum(jnp.minimum(prev, m + P2),
                      jnp.minimum(up, dn) + P1)
    adj = agg - m if pout_add is None else agg - m + pout_add
    return base + adj, adj


def _knight_row(c_k, base, pa, t, t_par, lanes, X1, P1, P2, upd, dt, zcol,
                w_stream=None):
    """One scan row's contribution from the four half-diagonal ("knight")
    carries of a pass.  `sgm.h:112-155` alternating step traits: the line
    advances one scan row every step and drifts one lane every OTHER step,
    so its lane shift happens on a fixed parity of the step index ``t``
    (distance from the pass's start edge).  Each drift sign needs TWO
    carries because `addDirectionalCost` seeds lines from both edges
    (`sgm.h:329-355`): phase A holds the start-edge seeds plus the
    even-offset side seeds (drifts entering even t), phase B the odd side
    seeds (drifts entering odd t).  B lines exist only past the side-seed
    frontier (t >= 2u + 1 with u = lane distance from the drift's entry
    edge — each drift step lets one more side line enter at lane 0), and
    the doubly-enumerated corner seed (u == t//2) counts twice.  ``t_par``
    is the parity of ``t``: a CONCRETE int when the caller can prove it
    at trace time (even row chunks, even shard offsets), else a TRACED
    scalar — the lane shift then becomes a select between shifted and
    unshifted carries (4 extra selects/row; only the distributed
    odd-shard path pays this).  Returns (new carries, summed adj
    contribution).

    ``upd`` receives the PRE-shift carry as ``prev`` so that relay
    pass-through rows (``with_carries`` mode) keep the carry exactly at
    the last real row's post-step state — the next real row (possibly on
    the next shard) re-derives the shift from its own global parity."""
    concrete_par = isinstance(t_par, int)
    extra = None
    new = []
    for kk, c in enumerate(c_k):
        plus = kk < 2                    # drift toward higher lanes
        phase_b = kk % 2 == 1
        c_pre = c
        want = 1 if phase_b else 0
        if concrete_par:
            if t_par == want:
                c = (jnp.concatenate([zcol, c[:, :-1]], 1) if plus
                     else jnp.concatenate([c[:, 1:], zcol], 1))
        else:
            shifted = (jnp.concatenate([zcol, c[:, :-1]], 1) if plus
                       else jnp.concatenate([c[:, 1:], zcol], 1))
            c = jnp.where(t_par == want, shifted, c)
        cur, adj = _dw_step(c, base, pa, P1, P2)
        new.append(upd(c_pre, cur))
        if w_stream is not None:
            # precomputed seed-frontier/corner weights (see
            # `_knight_weights`) — bit-identical, fewer ops per row
            w = w_stream[kk:kk + 1]
        else:
            u = lanes if plus else (X1 - 1 - lanes)
            if phase_b:
                w = (u <= (t - 1) // 2).astype(dt)
            else:
                w = 1.0 + (u == t // 2).astype(dt)
        extra = adj * w if extra is None else extra + adj * w
    return new, extra


def _dhw_rows_kernel(*refs, RC, Dp, Xp, Np, N1, X1, ml, W_pout, P1, P2,
                     Pout, reverse, diag, accumulate, transposed,
                     with_carries, H_corner, knight=False, N_glob=None,
                     corner_stream=False, knight_stream=False,
                     pout_baked=False, parity_traced=False,
                     lane_grid=False):
    """One streaming pass over scan rows of a (N, Dp, Xp) volume.

    Normal orientation (``transposed=False``): scan rows are image rows,
    lanes are image columns — carries the vertical direction and (with
    ``diag``) both diagonal families, whose carries shift by one lane per
    row.  Transposed orientation: scan rows are image *columns*, lanes
    are image rows — carries one horizontal direction (``diag`` unused).

    ``knight`` adds this pass's two half-diagonal 16-direction families
    (see `_knight_row`); requires even ``RC`` so the drift parity is
    concrete at trace time.

    ``with_carries`` runs the pass as one shard of a row-distributed
    image: initial carries come from relayed inputs, final carries are
    emitted, and an i0 scalar gives the shard's global scan-row offset
    for Pout/corner masks (``H_corner`` = global image height).

    ``N_glob`` is the global scan extent (defaults to ``N1``): in
    ``with_carries`` mode the knight drift parity and the transposed
    Pout gate key on the GLOBAL scan index ``i0 + i``.  Knight relay
    prefers ``i0`` even (even shard scan extents) so the drift parity
    stays concrete at trace time; ``parity_traced`` lifts that by
    deriving the parity from the traced global index (the knight lane
    shifts become selects — odd shard extents then work at a small
    per-row cost)."""
    if knight and RC % 2 and not parity_traced:
        raise ValueError("knight passes need an even row chunk "
                         "(or parity_traced)")
    if N_glob is None:
        N_glob = N1
    n_carries = (3 if diag else 1) + (4 if knight else 0)
    if with_carries:
        if accumulate:
            cv_ref, acc_ref, i0_ref = refs[:3]
            rest = refs[3:]
        else:
            cv_ref, i0_ref = refs[:2]
            acc_ref = None
            rest = refs[2:]
        cins = rest[:n_carries]
        out_ref = rest[n_carries]
        couts = rest[n_carries + 1:n_carries + 1 + n_carries]
        carries = rest[n_carries + 1 + n_carries:]
        i0 = i0_ref[0, 0]
    else:
        rest = list(refs)
        cv_ref = rest.pop(0)
        acc_ref = rest.pop(0) if accumulate else None
        cw_ref = rest.pop(0) if corner_stream else None
        kw_ref = rest.pop(0) if knight_stream else None
        out_ref, *carries = rest
        cins = couts = None
        i0 = 0
    k_carries = []
    if knight:
        carries, k_carries = carries[:-4], carries[-4:]
    if diag:
        cv_carry, cp_carry, cn_carry = carries
    else:
        (cv_carry,) = carries

    # lane-chunked grids put the lane chunk OUTERMOST (scan innermost:
    # each chunk completes its whole scan before the next, reusing the
    # per-chunk carry scratch reset at h == 0)
    h = pl.program_id(1 if lane_grid else 0)
    n = pl.num_programs(1 if lane_grid else 0)

    dt = cv_ref.dtype

    n_principal = 3 if diag else 1

    @pl.when(h == 0)
    def _():
        if with_carries:
            cv_carry[:] = cins[0][:]
            if diag:
                cp_carry[:] = cins[1][:]
                cn_carry[:] = cins[2][:]
            for kk, kc in enumerate(k_carries):
                kc[:] = cins[n_principal + kk][:]
        else:
            cv_carry[:] = jnp.zeros((Dp, Xp), dt)
            if diag:
                cp_carry[:] = jnp.zeros((Dp, Xp), dt)
                cn_carry[:] = jnp.zeros((Dp, Xp), dt)
            for kc in k_carries:
                kc[:] = jnp.zeros((Dp, Xp), dt)

    dd = jax.lax.broadcasted_iota(jnp.int32, (Dp, Xp), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (Dp, Xp), 1)
    lane_ok = lanes < X1
    if pout_baked or transposed:
        # baked: the penalty rides the cost stream (no per-row add).
        # transposed (unbaked): Pout depends on the scan position (image
        # column) and d only; computed per row below.  Padded scan rows
        # get zero Pout so their carries self-sustain zero.
        pout_add = None
        dd_col = jax.lax.broadcasted_iota(jnp.int32, (Dp, 1), 0)
    else:
        # lanes are image columns: Pout grid is constant across rows.
        pout_add = jnp.where(lane_ok & (ml + lanes + dd >= W_pout),
                             Pout, 0.0).astype(dt)
    b = (n - 1 - h) if reverse else h

    c_v = cv_carry[:]
    if diag:
        c_p = cp_carry[:]
        c_n = cn_carry[:]
    c_k = [kc[:] for kc in k_carries]
    zcol = jnp.zeros((Dp, 1), dt)
    need_row_mask = (Np != N1) or with_carries
    need_lane_mask = (diag or knight) and (X1 != Xp)

    rows = range(RC - 1, -1, -1) if reverse else range(RC)
    for rr in rows:
        i = b * RC + rr
        ig = i0 + i                     # global scan row
        base = cv_ref[rr]
        row_ok = i < N1

        if transposed and not pout_baked:
            pa = jnp.where((ml + ig + dd_col >= W_pout) & (ig < N_glob),
                           Pout, 0.0).astype(dt)
        else:
            pa = pout_add

        def upd(prev, cur):
            if with_carries:
                # padded rows between shards are NOT image rows: the
                # carry passes through untouched so the relay hands
                # shard k's last-real-row state to shard k+1 exactly
                if need_lane_mask:
                    cur = jnp.where(lane_ok, cur, 0.0)
                return jnp.where(row_ok, cur, prev)
            if need_lane_mask:
                cur = jnp.where(lane_ok, cur, 0.0)
            if need_row_mask:
                cur = jnp.where(row_ok, cur, 0.0)
            return cur

        total = acc_ref[rr] if accumulate else jnp.zeros((Dp, Xp), dt)
        cur, adj = _dw_step(c_v, base, pa, P1, P2)
        c_v = upd(c_v, cur)
        total = total + adj
        if diag:
            # pos family (lines j - i = const): SE forward / NW reverse —
            # carry shifts one lane toward higher columns going down
            shift = (jnp.concatenate([zcol, c_p[:, :-1]], 1) if not reverse
                     else jnp.concatenate([c_p[:, 1:], zcol], 1))
            cur, adj = _dw_step(shift, base, pa, P1, P2)
            c_p = upd(c_p, cur)
            # double-covered corner lines (`sgm.h:329-355`) as a one-hot
            # lane multiplier; ``corner_stream`` replaces the in-kernel
            # iota/compare/convert chain with a precomputed (constant-
            # folded) per-row weight plane — bit-identical values, ~6
            # fewer VPU ops per row on the issue-limited DP chain
            if corner_stream:
                total = total + adj * cw_ref[rr, 0:1]
            else:
                cj = ig if not reverse else (X1 - H_corner + ig)
                total = total + adj * (1.0 + (lanes == cj).astype(dt))
            # neg family (lines i + j = const): SW forward / NE reverse
            shift = (jnp.concatenate([c_n[:, 1:], zcol], 1) if not reverse
                     else jnp.concatenate([zcol, c_n[:, :-1]], 1))
            cur, adj = _dw_step(shift, base, pa, P1, P2)
            c_n = upd(c_n, cur)
            if corner_stream:
                total = total + adj * cw_ref[rr, 1:2]
            else:
                cj = (X1 - 1 - ig) if not reverse else (H_corner - 1 - ig)
                total = total + adj * (1.0 + (lanes == cj).astype(dt))
        if knight:
            # GLOBAL step index from the pass start edge; parity is
            # concrete when RC is even (b * RC cannot flip it) and, in
            # with_carries mode, the caller keeps i0 even — else
            # ``parity_traced`` derives it from the traced index
            t = ig if not reverse else (N_glob - 1 - ig)
            if parity_traced:
                t_par = t % 2
            else:
                t_par = (rr % 2) if not reverse \
                    else ((N_glob - 1 - rr) % 2)
            c_k, extra = _knight_row(
                c_k, base, pa, t, t_par, lanes, X1, P1, P2, upd, dt, zcol,
                w_stream=kw_ref[rr] if knight_stream else None)
            total = total + extra
        out_ref[rr] = total
    cv_carry[:] = c_v
    if diag:
        cp_carry[:] = c_p
        cn_carry[:] = c_n
    for kc, c in zip(k_carries, c_k):
        kc[:] = c
    if with_carries:
        @pl.when(h == n - 1)
        def _():
            couts[0][:] = c_v
            if diag:
                couts[1][:] = c_p
                couts[2][:] = c_n
            for kk in range(len(c_k)):
                couts[n_principal + kk][:] = c_k[kk]


def _dhw_wta_kernel(*refs, RC, Dp, Xp, N1, X1, D, ml, W_pout, P1, P2,
                    Pout, r, knight=False, knight_stream=False,
                    baked=False, refine=None):
    """The reverse-horizontal pass over the transposed (W, Dp, H) volume,
    fused with tie-last WTA + truncated-band extraction: per image
    column j (scan row) emits the argmin index over d of the complete
    SGM value C = cv + adj_total, and C at idx-r..idx+r — all as sublane
    reductions on (Dp, H-lanes) tiles.  The center band is the min value
    itself.  ``acc`` holds the accumulated down + up + forward-horizontal
    adjustment.  Outputs are (W, H) maps (caller transposes back).

    ``baked`` enables the Pout-BAKED mode: the other passes carried no
    +Pout adds (the penalty rides the cost stream once), so this pass
    restores the remaining direction multiplicity in one f32 op:
    C += pa * mult_plane, where the streamed (scan-row, lane) plane
    carries n_dirs - 1 plus the double-covered corner-line indicators
    (`sgm.h:329-355`) plus, with 16 directions, the knight seed/corner
    weights summed over all four passes (`_bake_mult_plane`) — all
    data-independent, so the plane constant-folds.

    The grid is (lane chunks, scan chunks): the horizontal DP carries
    are LANE-LOCAL (vertical/diagonal interactions live in the other
    passes), so big geometries split the lane extent into 128-multiple
    chunks, resetting the carry at each chunk's first scan step — this
    is what lets the fused WTA run at HD D=320 within scoped VMEM.
    Knight carries DO lane-shift, so lane chunking is gated off with 16
    directions."""
    n_scr = 1 + (4 if knight else 0)
    rest = list(refs)
    cv_ref = rest.pop(0)
    acc_ref = rest.pop(0)
    kw_ref = rest.pop(0) if knight_stream else None
    mult_ref = rest.pop(0) if baked else None
    n_maps = 1 + 2 * r + 1 + (1 if refine is not None else 0)
    idx_ref, *band_refs = rest[:n_maps]
    if refine is not None:
        disp_ref = band_refs.pop()
    scr = rest[-n_scr:]
    carry_ref = scr[0]
    k_refs = scr[1:]
    h = pl.program_id(1)                # scan chunk (innermost)
    n = pl.num_programs(1)
    l0 = pl.program_id(0) * Xp          # lane-chunk global offset

    dt = cv_ref.dtype

    @pl.when(h == 0)
    def _():
        # each lane chunk's scan starts fresh (lane-local carries)
        carry_ref[:] = jnp.zeros((Dp, Xp), dt)
        for kc in k_refs:
            kc[:] = jnp.zeros((Dp, Xp), dt)

    dd = jax.lax.broadcasted_iota(jnp.int32, (Dp, Xp), 0)
    dd_col = jax.lax.broadcasted_iota(jnp.int32, (Dp, 1), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (Dp, Xp), 1) + l0
    zcol = jnp.zeros((Dp, 1), dt)
    b = n - 1 - h
    carry = carry_ref[:]
    c_k = [kc[:] for kc in k_refs]
    row_mask = pl.cdiv(N1, RC) * RC != N1
    for rr in range(RC - 1, -1, -1):
        j = b * RC + rr                 # image column
        base = cv_ref[rr]
        pa32 = jnp.where((ml + j + dd_col >= W_pout) & (j < N1),
                         jnp.float32(Pout), 0.0)
        pa = None if baked else pa32.astype(dt)
        cur, adj = _dw_step(carry, base, pa, P1, P2)
        carry = jnp.where(j < N1, cur, jnp.zeros((), dt)) \
            if row_mask else cur
        if knight:
            t = N1 - 1 - j               # concrete parity: RC even
            t_par = (N1 - 1 - rr) % 2

            def upd_k(_prev, kcur):
                if X1 != Xp:
                    kcur = jnp.where(lanes < X1, kcur, 0.0)
                return jnp.where(j < N1, kcur, 0.0) if row_mask else kcur

            c_k, extra = _knight_row(
                c_k, base, pa, t, t_par, lanes, X1, P1, P2, upd_k, dt,
                zcol, w_stream=kw_ref[rr] if knight_stream else None)
            adj = adj + extra
        # WTA + band extraction run in f32 regardless of the DP dtype:
        # packed-bf16 compare masks cannot relayout against the i32 iota
        # (Mosaic restriction), and the bands are f32 outputs anyway.
        C = (acc_ref[rr] + adj + base).astype(jnp.float32)
        if baked:
            # restore the out-of-image penalty multiplicity: the cost
            # stream carried pa ONCE; the true SGM value counts it per
            # direction (plus corner doubling / knight weights).
            # Affects only out-of-range (j + d >= W) entries, which
            # never win the argmin and whose band slots are NaN-masked
            # downstream.
            C = C + pa32 * mult_ref[rr].reshape(1, Xp)
        m = jnp.min(C, axis=0, keepdims=True)
        idx = jnp.max(jnp.where(C == m, dd, -1), axis=0)
        idx_ref[rr] = idx
        band_vals = []
        for k in range(2 * r + 1):
            if k == r:
                band_vals.append(m)              # C[idx] IS the min
                band_refs[k][rr] = m[0]
                continue
            # C shifted so sublane idx holds C[idx + (k - r)]
            if k < r:
                pad = jnp.full((r - k, Xp), _INF, jnp.float32)
                sh = jnp.concatenate([pad, C[:-(r - k)]], axis=0)
            else:
                pad = jnp.full((k - r, Xp), _INF, jnp.float32)
                sh = jnp.concatenate([C[k - r:], pad], axis=0)
            # one-hot select-and-reduce (exact: a single non-zero term)
            band = jnp.sum(jnp.where(dd == idx[None, :], sh, 0.0),
                           axis=0, keepdims=True)
            band_vals.append(band)
            band_refs[k][rr] = band[0]
        if refine is not None:
            # parabola subpixel fused in-kernel: tiny (1, Xp) ops on the
            # bands already in registers, replacing the post-pipeline
            # slot/refine op tail.  Slot validity replicates
            # `truncated_cost_volume`'s SAME-mode NaN rules
            # (`correlation_base.h:582-674`) so delta — and hence the
            # refined disparity — is NaN exactly where the composed
            # chain produces NaN.
            h_rad, v_rad = refine
            idx2 = idx[None, :]
            li_row = jax.lax.broadcasted_iota(jnp.int32, (1, Xp), 1) + l0

            def slot(k):
                p = idx2 + (k - r)
                valid = ((p >= 0) & (p < D) & (j >= h_rad)
                         & (j + p + h_rad < N1) & (li_row >= v_rad)
                         & (li_row + v_rad < X1))
                return jnp.where(valid, band_vals[k],
                                 jnp.float32(jnp.nan))

            cm1, c0, c1 = slot(r - 1), slot(r), slot(r + 1)
            delta = (cm1 - c1) / (2.0 * (c1 - 2.0 * c0 + cm1))
            disp_ref[rr] = (idx2.astype(jnp.float32) + delta)[0]
    carry_ref[:] = carry
    for kc, c in zip(k_refs, c_k):
        kc[:] = c


def _corner_weights(Np, Xp, X1, H_corner, reverse, dt):
    """Precomputed double-covered-corner weight planes (1.0 + one-hot,
    `sgm.h:329-355`) for the pos/neg diagonal families — data-independent,
    so XLA constant-folds them; the kernel trades the per-row iota
    compare chain for a single broadcast multiply.  (Np, 2, Xp)."""
    rows = jnp.arange(Np, dtype=jnp.int32)
    lanes = jnp.arange(Xp, dtype=jnp.int32)
    cj_p = rows if not reverse else (X1 - H_corner + rows)
    cj_n = (X1 - 1 - rows) if not reverse else (H_corner - 1 - rows)
    w_p = 1.0 + (lanes[None, :] == cj_p[:, None]).astype(dt)
    w_n = 1.0 + (lanes[None, :] == cj_n[:, None]).astype(dt)
    return jnp.stack([w_p, w_n], axis=1).astype(dt)


def _knight_weights(Np, Xp, X1, N_glob, reverse, dt):
    """Precomputed knight seed-frontier / corner-doubling weights (see
    `_knight_row` — phase A: 1 + corner one-hot, phase B: side-seed
    frontier mask), per scan row.  Data-independent -> constant-folded.
    (Np, 4, Xp)."""
    i = jnp.arange(Np, dtype=jnp.int32)[:, None]
    t = i if not reverse else (N_glob - 1 - i)
    lanes = jnp.arange(Xp, dtype=jnp.int32)[None, :]
    planes = []
    for kk in range(4):
        u = lanes if kk < 2 else (X1 - 1 - lanes)
        if kk % 2 == 1:
            w = (u <= (t - 1) // 2).astype(dt)
        else:
            w = 1.0 + (u == t // 2).astype(dt)
        planes.append(w)
    return jnp.stack(planes, axis=1).astype(dt)


def _bake_mult_plane(Wp_rows, Hl, H1, W1, n_dirs):
    """(Wp_rows, Hl) f32 plane for the Pout-baked WTA correction: the
    per-pixel total direction multiplicity MINUS the one already banked
    in the cost stream.  The base counts only the PRINCIPAL carriers
    (min(n_dirs, 8) - 1), plus the four double-covered diagonal
    corner-line indicators (8+ directions), plus the knight
    seed-frontier/corner weights summed over all four passes (16
    directions) — the knight planes already carry each knight carrier's
    base coverage (phase A is 1 + corner one-hot), so the base must NOT
    count the 8 knight directions again.  Data-independent ->
    constant-folded by XLA."""
    jj = jnp.arange(Wp_rows, dtype=jnp.int32)[:, None]   # image column
    ii = jnp.arange(Hl, dtype=jnp.int32)[None, :]        # image row
    m = jnp.full((Wp_rows, Hl), float(min(n_dirs, 8) - 1), jnp.float32)
    if n_dirs >= 8:
        c4 = ((ii == jj).astype(jnp.float32)
              + (ii == jj - (W1 - H1)).astype(jnp.float32)
              + (ii == W1 - 1 - jj).astype(jnp.float32)
              + (ii == H1 - 1 - jj).astype(jnp.float32))
        m = m + jnp.where(ii < H1, c4, 0.0)
    if n_dirs >= 16:
        f32 = jnp.float32
        kw_du = (_knight_weights(Hl, Wp_rows, W1, H1, False, f32)
                 + _knight_weights(Hl, Wp_rows, W1, H1, True, f32))
        kw_fr = (_knight_weights(Wp_rows, Hl, H1, W1, False, f32)
                 + _knight_weights(Wp_rows, Hl, H1, W1, True, f32))
        m = m + kw_du.sum(axis=1).T + kw_fr.sum(axis=1)
    return m


def _rows_call(cv_p, acc, *, RC, N1, X1, ml, W_pout, P1, P2, Pout,
               reverse, diag, transposed, H_corner, interpret,
               knight=False, corner_stream=False, pout_baked=False,
               lane_chunks=None):
    Np, Dp, Xp = cv_p.shape
    n_chunks = Np // RC
    if lane_chunks:
        # lane-chunked grid for TRANSPOSED passes: the horizontal DP
        # carries are lane-local (image rows), so big Dp x lanes tiles
        # split into 128-multiple chunks with per-chunk carry scratch —
        # this restores large row chunks when full-width streams exceed
        # scoped VMEM (HD D=320: rc 2 -> 8).  Exact for non-shifting
        # carries only (no diag/knight/corner streams; the kernel's
        # transposed-mode Pout gate is lane-independent).
        if diag or knight or corner_stream or not transposed:
            raise ValueError("lane chunking: transposed non-shifting "
                             "passes only")
        nl, Lc = lane_chunks
        if Xp != nl * Lc:
            raise ValueError("lane chunking needs the array lane dim "
                             "pre-padded to nl * Lc")
        Xp = Lc
        if reverse:
            spec = pl.BlockSpec((RC, Dp, Lc),
                                lambda lc, h: (n_chunks - 1 - h, 0, lc),
                                memory_space=pltpu.VMEM)
        else:
            spec = pl.BlockSpec((RC, Dp, Lc), lambda lc, h: (h, 0, lc),
                                memory_space=pltpu.VMEM)
        grid = (nl, n_chunks)
        cw_spec = None
    elif reverse:
        spec = pl.BlockSpec((RC, Dp, Xp), lambda h: (n_chunks - 1 - h, 0, 0),
                            memory_space=pltpu.VMEM)
        cw_spec = pl.BlockSpec((RC, 2, Xp), lambda h: (n_chunks - 1 - h, 0, 0),
                               memory_space=pltpu.VMEM)
        grid = (n_chunks,)
    else:
        spec = pl.BlockSpec((RC, Dp, Xp), lambda h: (h, 0, 0),
                            memory_space=pltpu.VMEM)
        cw_spec = pl.BlockSpec((RC, 2, Xp), lambda h: (h, 0, 0),
                               memory_space=pltpu.VMEM)
        grid = (n_chunks,)
    corner_stream = corner_stream and diag and not transposed
    knight_stream = knight
    kernel = functools.partial(
        _dhw_rows_kernel, RC=RC, Dp=Dp, Xp=Xp, Np=Np, N1=N1, X1=X1, ml=ml,
        W_pout=W_pout, P1=float(P1), P2=float(P2), Pout=float(Pout),
        reverse=reverse, diag=diag, accumulate=acc is not None,
        transposed=transposed, with_carries=False, H_corner=H_corner,
        knight=knight, corner_stream=corner_stream,
        knight_stream=knight_stream, pout_baked=pout_baked,
        lane_grid=lane_chunks is not None)
    in_specs = [spec] if acc is None else [spec, spec]
    args = (cv_p,) if acc is None else (cv_p, acc)
    if corner_stream:
        in_specs = in_specs + [cw_spec]
        args = args + (_corner_weights(Np, Xp, X1, H_corner, reverse,
                                       cv_p.dtype),)
    if knight_stream:
        kw_spec = pl.BlockSpec(
            (RC, 4, Xp),
            (lambda h: (n_chunks - 1 - h, 0, 0)) if reverse
            else (lambda h: (h, 0, 0)),
            memory_space=pltpu.VMEM)
        in_specs = in_specs + [kw_spec]
        args = args + (_knight_weights(Np, Xp, X1, N1, reverse,
                                       cv_p.dtype),)
    # NOTE: no input_output_aliases on the acc stream — aliasing the acc
    # input to the output serializes Mosaic's block prefetch against the
    # output write-back and measures 2x slower (0.92 -> 1.73 ms per pass
    # at 480x640x120); the extra HBM allocation is cheap by comparison.
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(cv_p.shape, cv_p.dtype),
        scratch_shapes=[pltpu.VMEM((Dp, Xp), cv_p.dtype)]
        * ((3 if diag else 1) + (4 if knight else 0)),
        interpret=interpret)(*args)


def _pick_rc(Dp, Xp, n_carries, vmem_budget, n_streams=3, max_rc=8,
             itemsize=4):
    """Largest row-chunk whose double-buffered streams + carries fit with
    headroom for Mosaic stack temporaries.  The stack holds the row
    expression's live (Dp, Xp) intermediates (~11 tiles measured: an HD
    D=320 bf16 up-pass ran 16.31 MB against the 16 MB scoped limit with
    a constant 1.5 MB estimate), so the slack scales with the tile size.
    Undersizing rc wastes grid steps; oversizing collapses
    double-buffering (the fwd-T acc pass measures 1.7 ms at rc=8/11.8 MB
    vs ~0.9 ms at rc=4)."""
    if vmem_budget is None:
        vmem_budget = _VMEM_BUDGET
    u = Dp * Xp * itemsize
    slack = 3 * (1 << 19)
    scoped_limit = _SCOPED_LIMIT       # scoped vmem pool minus margin
    stack = 11 * u                     # live row-expression intermediates
    for rc in (8, 4, 2, 1):
        if rc > max_rc:
            continue
        bufs = n_carries * u + 2 * n_streams * rc * u
        if bufs + slack <= vmem_budget and bufs + stack <= scoped_limit:
            return rc
    return None


def sgm_fused_adj_dhw(region: jnp.ndarray, ml: int, W_pout: int, P1: float,
                      P2: float, Pout: float, n_directions: int,
                      vmem_budget: int | None = None,
                      interpret: bool | None = None):
    """All principal-direction adj contributions for a (H1, D, W1) volume
    in the disparity-on-sublanes layout.  Returns adj as (H1, D, W1), or
    None when the full-width carries cannot fit VMEM."""
    H1, D, W1 = region.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    diag = n_directions >= 8
    res = _run_dhw(region, ml, W_pout, P1, P2, Pout, diag, vmem_budget,
                   interpret, wta_radius=None,
                   knight=n_directions >= 16)
    return res


def sgm_fused_wta_dhw(region: jnp.ndarray, ml: int, W_pout: int, P1: float,
                      P2: float, Pout: float, n_directions: int,
                      wta_radius: int,
                      vmem_budget: int | None = None,
                      interpret: bool | None = None):
    """SGM + tie-last WTA + truncated band for a (H1, D, W1) volume.
    Returns (idx (H1, W1) int32, bands (H1, W1, 2r+1) f32) or None."""
    H1, D, W1 = region.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    diag = n_directions >= 8
    return _run_dhw(region, ml, W_pout, P1, P2, Pout, diag, vmem_budget,
                    interpret, wta_radius=wta_radius,
                    knight=n_directions >= 16)


def sgm_fused_wta_from_native(cv_nat, cv_T_nat, H1: int, W1: int, D: int,
                              ml: int, W_pout: int, P1: float, P2: float,
                              Pout: float, n_directions: int,
                              wta_radius: int,
                              vmem_budget: int | None = None,
                              interpret: bool | None = None,
                              pout_baked: bool = False,
                              force_wta_nl: int | None = None,
                              refine: tuple | None = None):
    """SGM + WTA from cost volumes PRE-BUILT in both kernel-native
    layouts: ``cv_nat`` (Hp, Dp, Wp) — disparity on axis 1 (sublanes),
    image columns on lanes — and ``cv_T_nat`` (Wp, Dp, Hl) — image rows
    on lanes (`box_cost_volume_fused_padded` returns the former; the
    latter is its (2, 1, 0) transpose).  The only full-volume relayouts
    in the pipeline are that transpose and the down/up adjustment
    transpose.  Returns (idx, bands) or None when the geometry cannot
    fit the fused path."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _run_dhw(None, ml, W_pout, P1, P2, Pout, n_directions >= 8,
                    vmem_budget, interpret, wta_radius,
                    knight=n_directions >= 16,
                    native=(cv_nat, cv_T_nat, H1, W1, D),
                    pout_baked=pout_baked, force_wta_nl=force_wta_nl,
                    refine=refine)


def _run_dhw(region, ml, W_pout, P1, P2, Pout, diag, vmem_budget,
             interpret, wta_radius, knight=False, native=None,
             pout_baked=False, force_wta_nl=None, refine=None):
    if native is not None:
        cv_nat, cv_T_nat, H1, W1, D = native
        dt = cv_nat.dtype
    else:
        H1, D, W1 = region.shape
        dt = region.dtype if region.dtype in (jnp.bfloat16, jnp.float32) \
            else jnp.float32
    isz = jnp.dtype(dt).itemsize
    sub = 8 if isz == 4 else 16          # min sublane tile per dtype
    Dp = _round_up(D, sub)
    Wp = _round_up(W1, 128)
    # lane extent of the T volume: the minor dim may be RAGGED (Mosaic
    # masks the last tile), so only 8-align it — it then matches the
    # row-padded height exactly and the transpose needs NO pad op
    # (measured ~0.12 ms/frame at 480x640 vs 128-rounding)
    Hp_lanes = _round_up(H1, 8)

    nck = 4 if knight else 0             # knight: 2 dirs x 2 phases/pass
    nc = (3 if diag else 1) + nck
    rc_down = _pick_rc(Dp, Wp, nc, vmem_budget, n_streams=2, itemsize=isz)
    rc_up = _pick_rc(Dp, Wp, nc, vmem_budget, n_streams=3, itemsize=isz)
    if rc_down is not None and not knight:
        calib = _RC_DOWN_CALIB.get((Dp, Wp, isz))
        if calib:
            rc_down = min(calib, rc_down)
    if TUNE.get("rc_down") and rc_down is not None:
        rc_down = min(TUNE["rc_down"], rc_down)
    if TUNE.get("rc_up") and rc_up is not None:
        rc_up = min(TUNE["rc_up"], rc_up)
    # big geometries (e.g. HD D=320): the 3-stream accumulate pass does
    # not fit scoped VMEM at full width, but a 2-stream pass does — run
    # up WITHOUT the accumulator stream and add the two adjustment
    # volumes with a plain XLA add (costs one extra full-volume stream,
    # far cheaper than falling back to the old W-chunked lane-layout
    # kernels: 105 -> ~40 ms at 720p D=320 bf16)
    split_up = rc_up is None and rc_down is not None
    if split_up:
        rc_up = rc_down
    elif TUNE.get("force_split_up") and rc_down is not None:
        split_up = True
    rc_fwd = _pick_rc(Dp, Hp_lanes, 1 + nck, vmem_budget, n_streams=3,
                      itemsize=isz)
    if TUNE.get("rc_fwd") and rc_fwd is not None:
        rc_fwd = min(TUNE["rc_fwd"], rc_fwd)
    split_fwd = rc_fwd is None
    if split_fwd:
        rc_fwd = _pick_rc(Dp, Hp_lanes, 1 + nck, vmem_budget, n_streams=2,
                          itemsize=isz)
    if knight:
        # drift parity must be concrete at trace time -> even row chunks
        rc_down = None if rc_down == 1 else rc_down
        rc_up = None if rc_up == 1 else rc_up
        rc_fwd = None if rc_fwd == 1 else rc_fwd
    # The WTA maps are 2-D outputs whose block sublane dim must be a
    # multiple of 8, so the WTA pass row chunk is fixed at 8 (2 input
    # streams + small map outputs).  Its row expression runs in f32
    # (~8 live (Dp, Lc) tiles measured: HD D=320 bf16 hit 25.26 MB
    # against the 16 MB scoped limit), so the stack term scales with
    # the f32 tile size.  When the full lane extent does not fit, the
    # lane axis splits into 128-multiple chunks — the horizontal DP
    # carries are lane-local, so chunking is exact (not with knight
    # carries, which lane-shift).
    rc_t = 8
    if None in (rc_down, rc_up, rc_fwd):
        return None
    wta_nl, wta_lc = 1, Hp_lanes
    if force_wta_nl is not None and wta_radius is not None:
        # test / tuning hook: force the lane-chunk count
        wta_nl = force_wta_nl
        wta_lc = Hp_lanes if wta_nl == 1 \
            else _round_up(-(-Hp_lanes // wta_nl), 128)
    elif wta_radius is not None:
        def wta_est(lc):
            # stack term: ~11 live f32 row-expression tiles, same
            # calibration as _pick_rc; acceptance bound is the REAL
            # scoped limit minus margin, not budget+slack (Dp=304
            # Hl=480 bf16 passed the looser bound and OOMed at 16.33 MB
            # against the 16 MB scoped limit — bench grid D=300 bf16)
            return ((1 + nck) * Dp * lc * isz + 4 * rc_t * Dp * lc * isz
                    + 11 * Dp * lc * 4)
        found = False
        for nl_c in (1, 2, 3, 4, 6, 8, 12, 16):
            lc_c = Hp_lanes if nl_c == 1                 else _round_up(-(-Hp_lanes // nl_c), 128)
            if wta_est(lc_c) <= _SCOPED_LIMIT:
                wta_nl, wta_lc, found = nl_c, lc_c, True
                break
            if knight:
                break              # lane chunking breaks knight carries
        if not found:
            return None
    # FWD lane chunking (round 5): when scoped VMEM forces a small row
    # chunk on the full-width transposed acc pass (HD D=320: rc_fwd=2),
    # split the lane axis like the WTA pass does — horizontal carries
    # are lane-local, so chunking is exact (knight carries lane-shift
    # and are excluded).  The fwd and WTA passes share ONE padded lane
    # extent (nl * Lc).
    fwd_chunks = None
    if (not knight and wta_radius is not None and force_wta_nl is None
            and not split_fwd and rc_fwd is not None and rc_fwd < 8):
        for nl_c in (2, 3, 4, 6, 8):
            lc_c = _round_up(-(-Hp_lanes // nl_c), 128)
            rc_c = _pick_rc(Dp, lc_c, 1, vmem_budget, n_streams=3,
                            itemsize=isz)
            if rc_c == 8 and wta_est(lc_c) <= _SCOPED_LIMIT:
                fwd_chunks = (nl_c, lc_c)
                rc_fwd = 8
                wta_nl, wta_lc = nl_c, lc_c
                break
    Hp = _round_up(H1, 8)
    Wp_rows = Wp                         # lane pad of the normal passes
                                         # doubles as T-side scan-row pad

    if native is not None:
        assert cv_nat.shape == (Hp, Dp, Wp), (cv_nat.shape, (Hp, Dp, Wp))
        assert cv_T_nat.shape == (Wp, Dp, Hp_lanes), cv_T_nat.shape
        cv_rows, cv_cols = cv_nat, cv_T_nat
    else:
        # +inf at padded d sublanes; zeros at padded rows/lanes (padded
        # lanes self-sustain zero carries: their Pout is gated off)
        cv_p = jnp.pad(region.astype(dt),
                       ((0, 0), (0, Dp - D), (0, 0)),
                       constant_values=jnp.inf)
        cv_p = jnp.pad(cv_p, ((0, Hp - H1), (0, 0), (0, Wp - W1)))
        cv_rows = cv_p

    kw = dict(ml=ml, W_pout=W_pout, P1=P1, P2=P2, Pout=Pout,
              interpret=interpret, knight=knight, pout_baked=pout_baked)
    # vertical + diagonals: two streaming passes over image rows (corner
    # doubling rides a precomputed weight stream — fewer ops on the
    # issue-limited row chain)
    adj = _rows_call(cv_rows, None, RC=rc_down, N1=H1, X1=W1, reverse=False,
                     diag=diag, transposed=False, H_corner=H1,
                     corner_stream=True, **kw)
    if TUNE.get("downup_barrier"):
        cv_rows, adj = jax.lax.optimization_barrier((cv_rows, adj))
    if split_up:
        adj_up = _rows_call(cv_rows, None, RC=rc_up, N1=H1, X1=W1,
                            reverse=True, diag=diag, transposed=False,
                            H_corner=H1, corner_stream=True, **kw)
        adj = adj + adj_up
    else:
        adj = _rows_call(cv_rows, adj, RC=rc_up, N1=H1, X1=W1, reverse=True,
                         diag=diag, transposed=False, H_corner=H1,
                         corner_stream=True, **kw)

    # transpose to (W, D, H) for the horizontal passes: Hp_lanes == Hp,
    # so this is a pure relayout with no pad
    def to_T(x):
        return jnp.transpose(x, (2, 1, 0))

    if native is None:
        cv_cols = to_T(cv_p)            # keeps +inf d-pad, zero lane pad
    adj_T = to_T(adj)                   # the ONE full-volume relayout
    if TUNE.get("adj_T_barrier"):
        cv_cols, adj_T = jax.lax.optimization_barrier((cv_cols, adj_T))

    if fwd_chunks is not None:
        # pad the lane extent once for BOTH the chunked fwd pass and
        # the lane-chunked WTA (the pads fuse into the transpose
        # producer copies); pad lanes carry zero cost and lane-local
        # carries, and their outputs are sliced away
        nl_f, lc_f = fwd_chunks
        lp = nl_f * lc_f - Hp_lanes
        if lp:
            cv_cols = jnp.pad(cv_cols, ((0, 0), (0, 0), (0, lp)))
            adj_T = jnp.pad(adj_T, ((0, 0), (0, 0), (0, lp)))

    if split_fwd:
        adj_fT = _rows_call(cv_cols, None, RC=rc_fwd, N1=W1, X1=H1,
                            reverse=False, diag=False, transposed=True,
                            H_corner=H1, **kw)
        adj_T = adj_T + adj_fT
    else:
        adj_T = _rows_call(cv_cols, adj_T, RC=rc_fwd, N1=W1, X1=H1,
                           reverse=False, diag=False, transposed=True,
                           H_corner=H1, lane_chunks=fwd_chunks, **kw)

    if wta_radius is None:
        if split_fwd:
            adj_rT = _rows_call(cv_cols, None, RC=rc_fwd, N1=W1, X1=H1,
                                reverse=True, diag=False, transposed=True,
                                H_corner=H1, **kw)
            adj_T = adj_T + adj_rT
        else:
            adj_T = _rows_call(cv_cols, adj_T, RC=rc_fwd, N1=W1, X1=H1,
                               reverse=True, diag=False, transposed=True,
                               H_corner=H1, **kw)
        return jnp.transpose(adj_T[:W1, :D, :H1], (2, 1, 0))

    r = wta_radius
    n_chunks = Wp_rows // rc_t
    nl, Lc = wta_nl, wta_lc
    Hl_pad = nl * Lc
    if Hl_pad != cv_cols.shape[-1]:
        # the pads fuse into the to_T/transpose producer copies (no-op
        # when the chunked fwd pass already padded to the shared extent)
        cv_cols = jnp.pad(cv_cols, ((0, 0), (0, 0),
                                    (0, Hl_pad - cv_cols.shape[-1])))
        adj_T = jnp.pad(adj_T, ((0, 0), (0, 0),
                                (0, Hl_pad - adj_T.shape[-1])))
    spec = pl.BlockSpec((rc_t, Dp, Lc),
                        lambda lc, h: (n_chunks - 1 - h, 0, lc),
                        memory_space=pltpu.VMEM)
    map_spec = pl.BlockSpec((rc_t, Lc),
                            lambda lc, h: (n_chunks - 1 - h, lc),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _dhw_wta_kernel, RC=rc_t, Dp=Dp, Xp=Lc, N1=W1, X1=H1, D=D,
        ml=ml, W_pout=W_pout, P1=float(P1), P2=float(P2), Pout=float(Pout),
        r=r, knight=knight, knight_stream=knight,
        baked=pout_baked, refine=refine)
    in_specs = [spec, spec]
    args = (cv_cols, adj_T)
    if knight:
        kw_spec = pl.BlockSpec((rc_t, 4, Lc),
                               lambda lc, h: (n_chunks - 1 - h, 0, lc),
                               memory_space=pltpu.VMEM)
        in_specs.append(kw_spec)
        args = args + (_knight_weights(Wp_rows, Hl_pad, H1, W1, True,
                                       cv_cols.dtype),)
    if pout_baked:
        in_specs.append(map_spec)
        args = args + (_bake_mult_plane(
            Wp_rows, Hl_pad, H1, W1,
            16 if knight else (8 if diag else 4)),)
    n_maps = 2 + 2 * r + (1 if refine is not None else 0)
    outs = pl.pallas_call(
        kernel, grid=(nl, n_chunks), in_specs=in_specs,
        out_specs=[map_spec] * n_maps,
        out_shape=([jax.ShapeDtypeStruct((Wp_rows, Hl_pad), jnp.int32)]
                   + [jax.ShapeDtypeStruct((Wp_rows, Hl_pad), jnp.float32)]
                   * (n_maps - 1)),
        scratch_shapes=[pltpu.VMEM((Dp, Lc), cv_cols.dtype)]
        * (5 if knight else 1),
        interpret=interpret)(*args)
    idx = outs[0][:W1, :H1].T
    bands = jnp.stack([b[:W1, :H1].T
                       for b in outs[1:2 + 2 * r]], axis=-1)
    if refine is not None:
        return idx, bands, outs[-1][:W1, :H1].T
    return idx, bands


# ---------------------------------------------------------------------------
# Row-sharded (distributed) shard passes
# ---------------------------------------------------------------------------

def pad_shard_volume_dhw(region: jnp.ndarray):
    """Pad one shard's (H_loc, W, D) block to the DHW kernel layout
    (H, D, W with +inf d-pad, zero row/lane pad).  Returns the padded
    volume and its (Hp, Dp, Wp) dims."""
    H1, W1, D = region.shape
    dt = region.dtype if region.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32
    sub = 8 if jnp.dtype(dt).itemsize == 4 else 16
    Dp = _round_up(D, sub)
    Wp = _round_up(W1, 128)
    Hp = _round_up(H1, 8)
    cv = jnp.moveaxis(region.astype(dt), -1, 1)
    cv = jnp.pad(cv, ((0, 0), (0, Dp - D), (0, 0)),
                 constant_values=jnp.inf)
    return jnp.pad(cv, ((0, Hp - H1), (0, 0), (0, Wp - W1)))


def sgm_rows_shard_pass_dhw(cv_p: jnp.ndarray, acc, carries, i0, *,
                            H1: int, W1: int, H_img: int, ml: int,
                            W_pout: int, P1: float, P2: float,
                            Pout: float, reverse: bool, diag: bool,
                            knight: bool = False, transposed: bool = False,
                            N_glob: int | None = None,
                            parity_traced: bool = False,
                            vmem_budget: int | None = None,
                            interpret: bool = False):
    """One shard's down (or up) DHW pass with carry injection
    (`_dhw_rows_kernel` with_carries mode): ``carries`` is 1 (vertical)
    or 3 (vertical + both diagonal families) relayed (Dp, Wp) arrays,
    plus 4 knight carries when ``knight`` (16 directions), ``i0`` the
    shard's global first scan row, ``H_img`` the global height for the
    double-covered corner masks.  Returns (adj_or_acc, carries_out).
    The carry passes through padded shard rows untouched so the relay
    hand-off is exact.

    ``transposed`` runs the pass over a column-sharded TRANSPOSED volume
    (scan rows are image columns, lanes are image rows): used by the
    16-direction distributed pipeline, which reshards row->column with
    an `all_to_all` so the horizontal knight families relay across
    column shards exactly like the vertical ones do across row shards.
    ``N_glob`` is then the global column count.  Knight relays keep the
    drift parity concrete when shard scan extents are even; for odd
    extents pass ``parity_traced`` (the parity is derived from the
    traced global index at a small per-row select cost)."""
    Hp, Dp, Wp = cv_p.shape
    isz = jnp.dtype(cv_p.dtype).itemsize
    n_car = (3 if diag else 1) + (4 if knight else 0)
    rc = _pick_rc(Dp, Wp, 3 * n_car, vmem_budget,
                  n_streams=3 if acc is not None else 2, itemsize=isz)
    if knight and rc == 1 and not parity_traced:
        rc = None                        # drift parity needs even chunks
    if rc is None:
        raise ValueError("shard volume too wide for the fused DHW pass")
    n_chunks = Hp // rc if Hp % rc == 0 else -(-Hp // rc)
    Hp_pad = n_chunks * rc
    if Hp_pad != Hp:
        cv_p = jnp.pad(cv_p, ((0, Hp_pad - Hp), (0, 0), (0, 0)))
        if acc is not None:
            acc = jnp.pad(acc, ((0, Hp_pad - Hp), (0, 0), (0, 0)))

    if reverse:
        spec = pl.BlockSpec((rc, Dp, Wp), lambda h: (n_chunks - 1 - h, 0, 0),
                            memory_space=pltpu.VMEM)
    else:
        spec = pl.BlockSpec((rc, Dp, Wp), lambda h: (h, 0, 0),
                            memory_space=pltpu.VMEM)
    car_spec = pl.BlockSpec((Dp, Wp), lambda h: (0, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda h: (0, 0),
                        memory_space=pltpu.SMEM)
    kernel = functools.partial(
        _dhw_rows_kernel, RC=rc, Dp=Dp, Xp=Wp, Np=Hp_pad, N1=H1, X1=W1,
        ml=ml, W_pout=W_pout, P1=float(P1), P2=float(P2),
        Pout=float(Pout), reverse=reverse, diag=diag, knight=knight,
        accumulate=acc is not None, transposed=transposed,
        with_carries=True, H_corner=H_img,
        N_glob=H_img if N_glob is None else N_glob,
        parity_traced=parity_traced)
    in_specs = [spec] + ([spec] if acc is not None else []) \
        + [smem] + [car_spec] * n_car
    args = ((cv_p,) + ((acc,) if acc is not None else ())
            + (jnp.asarray(i0, jnp.int32).reshape(1, 1),) + tuple(carries))
    outs = pl.pallas_call(
        kernel, grid=(n_chunks,), in_specs=in_specs,
        out_specs=[spec] + [car_spec] * n_car,
        out_shape=([jax.ShapeDtypeStruct((Hp_pad, Dp, Wp), cv_p.dtype)]
                   + [jax.ShapeDtypeStruct((Dp, Wp), cv_p.dtype)] * n_car),
        scratch_shapes=[pltpu.VMEM((Dp, Wp), cv_p.dtype)] * n_car,
        interpret=interpret)(*args)
    return outs[0][:Hp], tuple(outs[1:])


def sgm_cols_shard_pass_dhw(cv_p: jnp.ndarray, acc, *, H1: int, W1: int,
                            ml: int, W_pout: int, P1: float, P2: float,
                            Pout: float, reverse: bool,
                            vmem_budget: int | None = None,
                            interpret: bool = False):
    """One shard's horizontal pass (the scan axis W is not sharded, so
    this is fully local): transpose to (W, D, H_loc) and run the
    transposed DHW pass, accumulating onto ``acc``."""
    Hp, Dp, Wp = cv_p.shape
    Hp_lanes = _round_up(Hp, 128)

    def to_T(x):
        xt = jnp.transpose(x, (2, 1, 0))
        return jnp.pad(xt, ((0, 0), (0, 0), (0, Hp_lanes - Hp)))

    isz = jnp.dtype(cv_p.dtype).itemsize
    rc = _pick_rc(Dp, Hp_lanes, 1, vmem_budget, n_streams=3, itemsize=isz)
    if rc is None:
        raise ValueError("shard volume too tall for the fused DHW pass")
    cv_T = to_T(cv_p)
    acc_T = to_T(acc)
    adj_T = _rows_call(cv_T, acc_T, RC=rc, N1=W1, X1=H1, ml=ml,
                       W_pout=W_pout, P1=P1, P2=P2, Pout=Pout,
                       reverse=reverse, diag=False, transposed=True,
                       H_corner=H1, interpret=interpret)
    return jnp.transpose(adj_T[:, :, :Hp], (2, 1, 0))
