"""Pallas TPU kernels for SGM.

Primary path — the FUSED full-width kernels (`sgm_fused_adj`): the eight
principal directions run in 4 streaming passes over one Dp-padded volume:
  * down kernel: UP2DOWN + both down-diagonals, carried together in VMEM
    scratch; diagonal carries advance by one-sublane shifts per row (the
    inserted zero row IS the line-start state), so no sheared copies exist;
  * up kernel: the three mirrored directions, alias-accumulating;
  * horizontal fwd/rev: column-scanning grids (no transpose), the reverse
    pass optionally fusing the tie-exact WTA + truncated-band extraction
    (`_make_fused_cols_wta`).
Total HBM traffic ~5 volume sweeps instead of ~20; the recurrence's
isfinite guards drop out (agg <= min(prev) + P2 is always finite in the
full-width layout).  `sgm_rows_shard_pass` exposes the same kernels with
carry injection/extraction for the distributed relay
(`parallel/sgm_dist.distributed_sgm_fused`).

Large shapes (e.g. HD D=320) use the separate-accumulation mode — down/up
adj volumes summed in XLA instead of alias-accumulated — which halves the
VMEM block count; shapes beyond even that fall back to `sgm.py`'s XLA scan
groups.  The disparity axis is padded to a multiple of 128 with +inf so
the d+-1 shifts see +inf past D.  `pallas_shear`/`_shift_rows` (per-row
dynamic-slice relayouts, ~25x faster than XLA flat-reshape shears) remain
as general utilities.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")


def _round_up(x, m):
    return (x + m - 1) // m * m


def _shift_rows_kernel(in_ref, out_ref, *, RC, W_out, start_base,
                       start_slope, start_max):
    """out[r, :] = in[r, start_r : start_r + W_out] with
    start_r = clamp(start_base + start_slope * i, 0, start_max) — the
    per-row dynamic slice that implements shears and unshears as one clean
    streaming copy (the flat-reshape shear trick costs ~25x more in XLA
    relayouts)."""
    h = pl.program_id(0)
    for r in range(RC):
        i = h * RC + r
        start = start_base + start_slope * i
        start = max(0, min(start, start_max)) if isinstance(start, int) \
            else jnp.clip(start, 0, start_max)
        out_ref[r] = in_ref[r, pl.ds(start, W_out)]


def _shift_rows(x: jnp.ndarray, W_out: int, start_base: int,
                start_slope: int, rc: int = 4,
                interpret: bool | None = None) -> jnp.ndarray:
    """Apply the per-row shifted-window copy; x is (H, W_in, Dp) with Dp a
    multiple of 128 and W_in >= W_out + max(start)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W_in, Dp = x.shape
    Hp = _round_up(H, rc)
    if Hp != H:
        x = jnp.pad(x, ((0, Hp - H), (0, 0), (0, 0)),
                    constant_values=jnp.inf)
    start_max = W_in - W_out
    kernel = functools.partial(
        _shift_rows_kernel, RC=rc, W_out=W_out, start_base=start_base,
        start_slope=start_slope, start_max=start_max)
    out = pl.pallas_call(
        kernel,
        grid=(Hp // rc,),
        in_specs=[pl.BlockSpec((rc, W_in, Dp), lambda h: (h, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rc, W_out, Dp), lambda h: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, W_out, Dp), jnp.float32),
        interpret=interpret,
    )(x)
    return out[:H]


def pallas_shear(cv_dp: jnp.ndarray, H: int, W: int, neg: bool) -> jnp.ndarray:
    """Diagonal shear on a Dp-padded (H, W, Dp) volume: returns (H, Wd, Dp)
    with Wd = W + H - 1; column c holds the down-right (neg=False,
    c = j + H-1 - i) or down-left (neg=True, c = i + j) diagonal."""
    Wd = W + H - 1
    pad_l = H - 1
    x = jnp.pad(cv_dp, ((0, 0), (pad_l, H), (0, 0)),
                constant_values=jnp.inf)
    # pos: S[i, c] = cv[i, c - (H-1) + i] = padded[i, c + i] -> start = i
    # neg: S[i, c] = cv[i, c - i] = padded[i, c + (H-1) - i]
    if neg:
        return _shift_rows(x, Wd, H - 1, -1)
    return _shift_rows(x, Wd, 0, 1)


def pallas_unshear(S: jnp.ndarray, H: int, W: int, neg: bool) -> jnp.ndarray:
    """Inverse of `pallas_shear` restricted to image columns."""
    # pos: adj[i, j] = S[i, j + (H-1) - i]; neg: adj[i, j] = S[i, j + i]
    if neg:
        return _shift_rows(S, W, 0, 1)
    return _shift_rows(S, W, H - 1, -1)


# ---------------------------------------------------------------------------
# Fused all-directions kernels (3 pallas_calls for the 8 principal directions)
# ---------------------------------------------------------------------------
#
# A per-direction design (one kernel pass per direction over sheared /
# transposed layouts) would stream the volume 8+ times; the fused design
# keeps full-width rows in VMEM and carries ALL vertically-advancing
# directions at once:
#   * down kernel:  UP2DOWN + UPLEFT2DOWNRIGHT + UPRIGHT2DOWNLEFT, one
#     top-to-bottom streaming pass; each diagonal's carry advances by a
#     one-sublane shift per row (zeros shifted in = line starts), so no
#     sheared copies are ever materialized;
#   * up kernel:    the three mirrored directions, accumulating onto the
#     down kernel's output (aliased);
#   * horizontal kernel (x2, fwd/rev): LEFT2RIGHT / RIGHT2LEFT as a
#     column-scanning grid on the SAME padded volume — no transpose.
# Total HBM traffic: ~5 volume sweeps instead of ~20, and the isfinite
# guards of `_line_recurrence` drop out entirely: in the full-width layout
# every cell is a real pixel, and agg <= min(prev) + P2 is always finite.


def _fused_step(prev, base, pout_add, P1, P2):
    """One O(D) min-shift DP step on a (rows/cols, Dp) tile.  `prev` is the
    finite carry (padded-lane entries +inf so the d+-1 shifts see +inf
    neighbours); returns (cur, adj) with cur = base + adj."""
    m = jnp.min(prev, axis=-1, keepdims=True)
    inf_col = jnp.full(prev.shape[:-1] + (1,), _INF, jnp.float32)
    left = jnp.concatenate([inf_col, prev[:, :-1]], axis=-1)
    right = jnp.concatenate([prev[:, 1:], inf_col], axis=-1)
    # one shared +P1 after the neighbor min (one fewer vector add)
    agg = jnp.minimum(jnp.minimum(prev, m + P2),
                      jnp.minimum(left, right) + P1)
    adj = agg - m + pout_add
    return base + adj, adj


def _fused_rows_kernel(*refs, RC, Wp, Dp, H1, W1, ml, W_pout, P1, P2, Pout,
                       reverse, diag, accumulate, with_carries, H_corner):
    """One streaming pass over rows carrying the vertical direction and (with
    `diag`) both diagonal families.  Carries are (Wp, Dp) VMEM scratch tiles
    persisting across grid steps; diagonal carries shift by one sublane per
    row (the inserted zero row IS the line-start state).  The reference's
    double-covered corner lines (`sgm.h:329-355`) become a per-row one-hot
    column multiplier on the diagonal contributions.

    With ``with_carries`` the pass runs as one SHARD of a row-distributed
    image: initial carries come from (relayed) inputs, final carries are
    emitted as outputs, an i0 scalar gives the shard's global row offset
    for the corner-line masks, and ``H_corner`` is the GLOBAL image height
    those masks use (== H1 single-chip)."""
    n_carries = 3 if diag else 1
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
        if accumulate:
            cv_ref, acc_ref, out_ref, *carries = refs
        else:
            cv_ref, out_ref, *carries = refs
            acc_ref = None
        cins = couts = None
        i0 = 0
    if diag:
        cv_carry, cp_carry, cn_carry = carries
    else:
        (cv_carry,) = carries

    h = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(h == 0)
    def _():
        if with_carries:
            cv_carry[:] = cins[0][:]
            if diag:
                cp_carry[:] = cins[1][:]
                cn_carry[:] = cins[2][:]
        else:
            cv_carry[:] = jnp.zeros((Wp, Dp), jnp.float32)
            if diag:
                cp_carry[:] = jnp.zeros((Wp, Dp), jnp.float32)
                cn_carry[:] = jnp.zeros((Wp, Dp), jnp.float32)

    cols = jax.lax.broadcasted_iota(jnp.int32, (Wp, 1), 0)
    dd = jax.lax.broadcasted_iota(jnp.int32, (Wp, Dp), 1)
    pout_add = jnp.where(ml + cols + dd >= W_pout,
                         jnp.float32(Pout), jnp.float32(0.0))
    col_ok = cols < W1
    b = (n - 1 - h) if reverse else h

    c_v = cv_carry[:]
    if diag:
        c_p = cp_carry[:]
        c_n = cn_carry[:]
    zrow = jnp.zeros((1, Dp), jnp.float32)

    rows = range(RC - 1, -1, -1) if reverse else range(RC)
    for rr in rows:
        i = b * RC + rr
        ig = i0 + i                       # global row (corner-line masks)
        base = cv_ref[rr]
        row_ok = i < H1
        ok = col_ok & row_ok

        def upd(prev, cur):
            if with_carries:
                # padded rows between shards are NOT image rows: the carry
                # must pass through untouched (incl. NO diagonal shift) so
                # the relay hands shard k's last-real-row state to shard
                # k+1's first row exactly
                return jnp.where(row_ok, jnp.where(col_ok, cur, 0.0), prev)
            return jnp.where(ok, cur, 0.0)

        total = acc_ref[rr] if accumulate else jnp.zeros((Wp, Dp),
                                                         jnp.float32)
        cur, adj = _fused_step(c_v, base, pout_add, P1, P2)
        c_v = upd(c_v, cur)
        total = total + adj
        if diag:
            # pos family (lines j - i = const): SE forward / NW reverse —
            # carry shifts down a sublane on the forward pass, up on reverse
            shift = (jnp.concatenate([zrow, c_p[:-1]], 0) if not reverse
                     else jnp.concatenate([c_p[1:], zrow], 0))
            cur, adj = _fused_step(shift, base, pout_add, P1, P2)
            c_p = upd(c_p, cur)
            cj = ig if not reverse else (W1 - H_corner + ig)
            total = total + adj * (1.0 + (cols == cj).astype(jnp.float32))
            # neg family (lines i + j = const): SW forward / NE reverse
            shift = (jnp.concatenate([c_n[1:], zrow], 0) if not reverse
                     else jnp.concatenate([zrow, c_n[:-1]], 0))
            cur, adj = _fused_step(shift, base, pout_add, P1, P2)
            c_n = upd(c_n, cur)
            cj = (W1 - 1 - ig) if not reverse else (H_corner - 1 - ig)
            total = total + adj * (1.0 + (cols == cj).astype(jnp.float32))
        out_ref[rr] = total
    cv_carry[:] = c_v
    if diag:
        cp_carry[:] = c_p
        cn_carry[:] = c_n
    if with_carries:
        @pl.when(h == n - 1)
        def _():
            couts[0][:] = c_v
            if diag:
                couts[1][:] = c_p
                couts[2][:] = c_n


def _fused_cols_kernel(*refs, CC, Dp, W1, ml, W_pout, P1, P2, Pout, reverse):
    """LEFT2RIGHT / RIGHT2LEFT as a column-scanning grid (col chunks are the
    innermost grid axis so the (RT, Dp) carry persists per row tile) —
    replaces the transpose + row-scan of the per-direction path."""
    cv_ref, acc_ref, out_ref, carry_ref = refs
    w = pl.program_id(1)
    nw = pl.num_programs(1)

    @pl.when(w == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    RT = carry_ref.shape[0]
    dd = jax.lax.broadcasted_iota(jnp.int32, (RT, Dp), 1)
    b = (nw - 1 - w) if reverse else w
    carry = carry_ref[:]
    cols = range(CC - 1, -1, -1) if reverse else range(CC)
    for cc in cols:
        j = b * CC + cc
        base = cv_ref[:, cc]
        pout_add = jnp.where(ml + j + dd >= W_pout,
                             jnp.float32(Pout), jnp.float32(0.0))
        cur, adj = _fused_step(carry, base, pout_add, P1, P2)
        carry = jnp.where(j < W1, cur, 0.0)
        out_ref[:, cc] = acc_ref[:, cc] + adj
    carry_ref[:] = carry


def _make_fused_cols_wta(CC, Dp, W1, ml, W_pout, P1, P2, Pout, r):
    """The final (reverse-horizontal) pass fused with WTA + band extraction:
    instead of writing the adj volume it emits, per pixel, the tie-last
    argmin index of the complete cost-mode SGM value C = cv + adj_total and
    the C values at idx - r .. idx + r (the SAME-mode truncated cost volume
    before validity masking, `correlation_base.h:582-674`).  Saves the adj
    write, the separate cv + adj add, the WTA read and the truncation read.
    The center band is the min value itself (one fewer masked reduction);
    map outputs are W-major so their (CC, RT) blocks satisfy the (8, 128)
    tiling — the driver transposes them back."""

    def kernel(*refs):
        cv_ref, acc_ref, idx_ref, *band_refs, carry_ref = refs
        w = pl.program_id(1)
        nw = pl.num_programs(1)

        @pl.when(w == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        RT = carry_ref.shape[0]
        dd = jax.lax.broadcasted_iota(jnp.int32, (RT, Dp), 1)
        b = nw - 1 - w
        carry = carry_ref[:]
        for cc in range(CC - 1, -1, -1):
            j = b * CC + cc
            base = cv_ref[:, cc]
            pout_add = jnp.where(ml + j + dd >= W_pout,
                                 jnp.float32(Pout), jnp.float32(0.0))
            cur, adj = _fused_step(carry, base, pout_add, P1, P2)
            carry = jnp.where(j < W1, cur, 0.0)
            C = acc_ref[:, cc] + adj + base
            m = jnp.min(C, axis=-1, keepdims=True)
            idx = jnp.max(jnp.where(C == m, dd, -1), axis=-1)
            idx_ref[cc] = idx
            for k in range(2 * r + 1):
                if k == r:
                    band_refs[k][cc] = m[:, 0]   # C[idx] IS the min
                    continue
                p = idx + (k - r)
                band_refs[k][cc] = jnp.sum(
                    jnp.where(dd == p[:, None], C, 0.0), axis=-1)
        carry_ref[:] = carry

    return kernel


def sgm_fused_adj(region: jnp.ndarray, ml: int, W_pout: int, P1: float,
                  P2: float, Pout: float, n_directions: int,
                  vmem_budget: int = 12 * 1024 * 1024,
                  interpret: bool | None = None,
                  wta_radius: int | None = None):
    """All principal-direction adj contributions of `sgm.py` in 4 fused
    pallas_calls (down, up, horizontal fwd/rev — each aliasing the previous
    accumulator).  Returns None when the full-width carries would not fit
    VMEM (caller falls back to the per-direction path).

    With ``wta_radius`` the final pass additionally performs the WTA and
    band extraction (`_make_fused_cols_wta`) and the return value is
    ``(idx, bands)`` with idx (H1, W1) int32 and bands (H1, W1, 2r+1) the
    raw C values around idx (validity masking is the caller's job)."""
    H1, W1, D = region.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Dp = _round_up(D, 128)
    Wp = _round_up(W1, 8)
    u = Wp * Dp * 4
    n_car = 3 if n_directions >= 8 else 1
    diag = n_directions >= 8
    RC = None
    for rc in (8, 4, 2, 1):
        # up-kernel worst case: 3 double-buffered (rc, Wp, Dp) blocks +
        # carries
        if n_car * u + 6 * rc * u <= vmem_budget:
            RC = rc
            break
    # large-shape mode: the alias-accumulating up kernel does not fit, but
    # carries + 2 double-buffered blocks at rc=1 (+ ~4u of Mosaic stack
    # temporaries for the per-row expressions) might — run down/up WITHOUT
    # the accumulator input and add the two adj volumes in XLA instead.
    # Shapes beyond ~11u (e.g. HD D=320 in f32) return None and take the
    # XLA scan groups.
    separate_rows = RC is None
    if separate_rows:
        if wta_radius is not None or 11 * u > vmem_budget + 3 * 2 ** 20:
            return None
        RC = 1

    RT = min(128, _round_up(H1, 8))
    CC = 8
    while 6 * RT * CC * Dp * 4 + RT * Dp * 4 > vmem_budget and CC > 1:
        CC //= 2
    Hp = _round_up(H1, RT)
    Wp = _round_up(Wp, CC)

    # lanes pad with +inf (d+-1 shifts need +inf neighbours past D); padded
    # rows/cols pad with 0 so no inf - inf can reach a NaN anywhere
    cv_p = jnp.pad(region.astype(jnp.float32), ((0, 0), (0, 0), (0, Dp - D)),
                   constant_values=jnp.inf)
    cv_p = jnp.pad(cv_p, ((0, Hp - H1), (0, Wp - W1), (0, 0)))

    kw = dict(Wp=Wp, Dp=Dp, H1=H1, W1=W1, ml=ml, W_pout=W_pout,
              P1=float(P1), P2=float(P2), Pout=float(Pout), diag=diag,
              with_carries=False, H_corner=H1)
    n_chunks = Hp // RC
    spec_f = pl.BlockSpec((RC, Wp, Dp), lambda h: (h, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_r = pl.BlockSpec((RC, Wp, Dp), lambda h: (n_chunks - 1 - h, 0, 0),
                          memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((Wp, Dp), jnp.float32)] * (3 if diag else 1)
    out_sds = jax.ShapeDtypeStruct((Hp, Wp, Dp), jnp.float32)

    def rows_call(acc, reverse):
        spec = spec_r if reverse else spec_f
        kernel = functools.partial(_fused_rows_kernel, RC=RC, reverse=reverse,
                                   accumulate=acc is not None, **kw)
        in_specs = [spec] if acc is None else [spec, spec]
        args = (cv_p,) if acc is None else (cv_p, acc)
        return pl.pallas_call(
            kernel, grid=(n_chunks,), in_specs=in_specs, out_specs=spec,
            out_shape=out_sds, scratch_shapes=scratch,
            input_output_aliases={} if acc is None else {1: 0},
            interpret=interpret)(*args)

    if separate_rows:
        adj = rows_call(None, reverse=False)
        adj_up = rows_call(None, reverse=True)
    else:
        adj = rows_call(None, reverse=False)
        adj = rows_call(adj, reverse=True)

    nwc = Wp // CC
    hspec_f = pl.BlockSpec((RT, CC, Dp), lambda r, w: (r, w, 0),
                           memory_space=pltpu.VMEM)
    hspec_r = pl.BlockSpec((RT, CC, Dp), lambda r, w: (r, nwc - 1 - w, 0),
                           memory_space=pltpu.VMEM)

    def cols_call(acc, reverse):
        spec = hspec_r if reverse else hspec_f
        kernel = functools.partial(
            _fused_cols_kernel, CC=CC, Dp=Dp, W1=W1, ml=ml, W_pout=W_pout,
            P1=float(P1), P2=float(P2), Pout=float(Pout), reverse=reverse)
        return pl.pallas_call(
            kernel, grid=(Hp // RT, nwc), in_specs=[spec, spec],
            out_specs=spec, out_shape=out_sds,
            scratch_shapes=[pltpu.VMEM((RT, Dp), jnp.float32)],
            input_output_aliases={1: 0}, interpret=interpret)(cv_p, adj)

    adj = cols_call(adj, reverse=False)

    if wta_radius is None:
        adj = cols_call(adj, reverse=True)
        if separate_rows:
            adj = adj + adj_up
        return adj[:H1, :W1, :D]

    r = wta_radius
    map_spec = pl.BlockSpec((CC, RT), lambda rr, w: (nwc - 1 - w, rr),
                            memory_space=pltpu.VMEM)
    kernel = _make_fused_cols_wta(CC, Dp, W1, ml, W_pout, float(P1),
                                  float(P2), float(Pout), r)
    outs = pl.pallas_call(
        kernel, grid=(Hp // RT, nwc), in_specs=[hspec_r, hspec_r],
        out_specs=[map_spec] * (2 + 2 * r),
        out_shape=([jax.ShapeDtypeStruct((Wp, Hp), jnp.int32)]
                   + [jax.ShapeDtypeStruct((Wp, Hp), jnp.float32)]
                   * (2 * r + 1)),
        scratch_shapes=[pltpu.VMEM((RT, Dp), jnp.float32)],
        interpret=interpret)(cv_p, adj)
    idx = outs[0].T[:H1, :W1]
    bands = jnp.stack([b.T[:H1, :W1] for b in outs[1:]], axis=-1)
    return idx, bands


# ---------------------------------------------------------------------------
# Row-shard drivers (distributed SGM: carry injection/extraction per shard)
# ---------------------------------------------------------------------------

def sgm_shard_dims(H1: int, W1: int, D: int):
    """Padded dims shared by all shard passes: (Hp, Wp, Dp, RC, RT, CC)."""
    Dp = _round_up(D, 128)
    CC = 8
    Wp = _round_up(_round_up(W1, 8), CC)
    RC = 4
    RT = min(128, _round_up(H1, 8))
    Hp = _round_up(H1, RT)
    return Hp, Wp, Dp, RC, RT, CC


def pad_shard_volume(region: jnp.ndarray) -> jnp.ndarray:
    """Pad a (H1, W1, D) block to the shard-kernel layout (+inf lanes,
    zero rows/cols)."""
    H1, W1, D = region.shape
    Hp, Wp, Dp, _, _, _ = sgm_shard_dims(H1, W1, D)
    cv_p = jnp.pad(region.astype(jnp.float32),
                   ((0, 0), (0, 0), (0, Dp - D)), constant_values=jnp.inf)
    return jnp.pad(cv_p, ((0, Hp - H1), (0, Wp - W1), (0, 0)))


def sgm_rows_shard_pass(cv_p: jnp.ndarray, acc, carries, i0, *, H1: int,
                        W1: int, H_img: int, ml: int, W_pout: int,
                        P1: float, P2: float, Pout: float, reverse: bool,
                        diag: bool, interpret: bool = False):
    """One shard's down (or up) pass with carry injection: ``carries`` is a
    tuple of 1 (vertical) or 3 (vertical + both diagonal families) padded
    (Wp, Dp) arrays relayed from the neighbouring shard; ``i0`` is the
    shard's global starting row (int32 scalar) and ``H_img`` the global
    image height (for the double-covered corner-line masks).  Returns
    (adj_or_acc, carries_out)."""
    Hp, Wp, Dp = cv_p.shape
    _, _, _, RC, _, _ = sgm_shard_dims(H1, W1, Dp)
    n_chunks = Hp // RC
    n_car = 3 if diag else 1
    if reverse:
        spec = pl.BlockSpec((RC, Wp, Dp), lambda h: (n_chunks - 1 - h, 0, 0),
                            memory_space=pltpu.VMEM)
    else:
        spec = pl.BlockSpec((RC, Wp, Dp), lambda h: (h, 0, 0),
                            memory_space=pltpu.VMEM)
    car_spec = pl.BlockSpec((Wp, Dp), lambda h: (0, 0),
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((1, 1), lambda h: (0, 0),
                             memory_space=pltpu.SMEM)
    kernel = functools.partial(
        _fused_rows_kernel, RC=RC, Wp=Wp, Dp=Dp, H1=H1, W1=W1, ml=ml,
        W_pout=W_pout, P1=float(P1), P2=float(P2), Pout=float(Pout),
        reverse=reverse, diag=diag, accumulate=acc is not None,
        with_carries=True, H_corner=H_img)

    in_specs = [spec] + ([spec] if acc is not None else []) \
        + [smem_spec] + [car_spec] * n_car
    args = ((cv_p,) + ((acc,) if acc is not None else ())
            + (jnp.asarray(i0, jnp.int32).reshape(1, 1),) + tuple(carries))
    aliases = {1: 0} if acc is not None else {}
    outs = pl.pallas_call(
        kernel, grid=(n_chunks,), in_specs=in_specs,
        out_specs=[spec] + [car_spec] * n_car,
        out_shape=([jax.ShapeDtypeStruct((Hp, Wp, Dp), jnp.float32)]
                   + [jax.ShapeDtypeStruct((Wp, Dp), jnp.float32)] * n_car),
        scratch_shapes=[pltpu.VMEM((Wp, Dp), jnp.float32)] * n_car,
        input_output_aliases=aliases,
        interpret=interpret)(*args)
    return outs[0], tuple(outs[1:])


def sgm_cols_shard_pass(cv_p: jnp.ndarray, acc, *, H1: int, W1: int,
                        ml: int, W_pout: int, P1: float, P2: float,
                        Pout: float, reverse: bool,
                        interpret: bool = False):
    """One shard's horizontal pass (fully local — the scan axis W is not
    sharded), accumulating onto ``acc``."""
    Hp, Wp, Dp = cv_p.shape
    _, _, _, _, RT, CC = sgm_shard_dims(H1, W1, Dp)
    nwc = Wp // CC
    if reverse:
        spec = pl.BlockSpec((RT, CC, Dp), lambda r, w: (r, nwc - 1 - w, 0),
                            memory_space=pltpu.VMEM)
    else:
        spec = pl.BlockSpec((RT, CC, Dp), lambda r, w: (r, w, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _fused_cols_kernel, CC=CC, Dp=Dp, W1=W1, ml=ml, W_pout=W_pout,
        P1=float(P1), P2=float(P2), Pout=float(Pout), reverse=reverse)
    return pl.pallas_call(
        kernel, grid=(Hp // RT, nwc), in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp, Dp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((RT, Dp), jnp.float32)],
        input_output_aliases={1: 0}, interpret=interpret)(cv_p, acc)


# ---------------------------------------------------------------------------
# W-chunked passes (huge W*D: full-width carries cannot fit VMEM)
# ---------------------------------------------------------------------------
#
# The full-width kernels need (Wp, Dp) carries resident; at e.g. HD D=320
# (u ~ 2 MB) no fused variant fits the 16 MB VMEM.  Here the W axis is cut
# into chunks processed by SEQUENTIAL pallas_calls; the diagonal carry that
# crosses a chunk boundary is a per-row (Hp, Dp) "edge history" array the
# producing chunk writes (its boundary column's post-row carry) and the
# consuming chunk shifts in.  Chunk order follows the diagonal's horizontal
# flow, so the 8 principal directions become 4 chunked row passes:
#   P1 fwd  vertical + SE   chunks left->right   (hist: last col -> col 0)
#   P2 fwd  SW              chunks right->left   (hist: first col -> last)
#   P3 rev  vertical + NE   chunks left->right
#   P4 rev  NW              chunks right->left
# plus the (small-block, unchunked) horizontal passes.


def _chunked_rows_kernel(*refs, RC, Dp, H1, Wc, c0, ml, W_pout,
                         P1, P2, Pout, reverse, shift_down, corner_c0,
                         corner_slope, with_vertical, with_diag,
                         accumulate):
    """One chunk of a diagonal(+vertical) pass.  ``shift_down`` means the
    diagonal carry moves toward higher columns each row (SE on forward
    scans, NE on reverse — both consume the LEFT neighbour chunk's edge
    history); the mirror (SW / NW) consumes the RIGHT neighbour's.  The
    double-covered corner line sits at global column
    corner_c0 + corner_slope * i.  ``c0`` is the chunk's global first
    column, ``Wc`` its real width."""
    idx = 0
    cv_ref = refs[idx]; idx += 1
    acc_ref = None
    if accumulate:
        acc_ref = refs[idx]; idx += 1
    hin_ref = refs[idx]; idx += 1
    out_ref = refs[idx]; idx += 1
    hout_ref = refs[idx]; idx += 1
    carries = refs[idx:]
    if with_vertical:
        vcarry_ref, dcarry_ref = carries
    else:
        (dcarry_ref,) = carries

    h = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(h == 0)
    def _():
        dcarry_ref[:] = jnp.zeros_like(dcarry_ref)
        if with_vertical:
            vcarry_ref[:] = jnp.zeros_like(vcarry_ref)

    CWp = dcarry_ref.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (CWp, 1), 0)
    dd = jax.lax.broadcasted_iota(jnp.int32, (CWp, Dp), 1)
    jg = ml + c0 + cols                       # global image column
    pout_add = jnp.where(jg + dd >= W_pout,
                         jnp.float32(Pout), jnp.float32(0.0))
    col_ok = cols < Wc
    b = (n - 1 - h) if reverse else h

    c_d = dcarry_ref[:]
    if with_vertical:
        c_v = vcarry_ref[:]

    rows = range(RC - 1, -1, -1) if reverse else range(RC)
    for rr in rows:
        i = b * RC + rr
        base = cv_ref[rr]
        ok = col_ok & (i < H1)
        total = acc_ref[rr] if accumulate else jnp.zeros((CWp, Dp),
                                                         jnp.float32)
        if with_vertical:
            cur, adj = _fused_step(c_v, base, pout_add, P1, P2)
            c_v = jnp.where(ok, cur, 0.0)
            total = total + adj
        if with_diag:
            hrow = hin_ref[0, rr].reshape(1, Dp)
            if shift_down:
                shift = jnp.concatenate([hrow, c_d[:-1]], 0)
            else:
                shift = jnp.concatenate([c_d[1:], hrow], 0)
            cur, adj = _fused_step(shift, base, pout_add, P1, P2)
            c_d = jnp.where(ok, cur, 0.0)
            # the boundary column's post-row carry feeds the neighbour
            # chunk: THIS chunk's last real column when shifting down, its
            # first when shifting up (padded columns were zeroed by `ok`)
            hout_ref[0, rr] = c_d[Wc - 1] if shift_down else c_d[0]
            # double-covered corner line (`sgm.h:329-355`), global coords
            cj = (corner_c0 + corner_slope * i) - c0
            total = total + adj * (1.0 + (cols == cj).astype(jnp.float32))
        else:
            hout_ref[0, rr] = hin_ref[0, rr]
        out_ref[rr] = total
    dcarry_ref[:] = c_d
    if with_vertical:
        vcarry_ref[:] = c_v


def _chunked_pass(cv_chunk, acc, hist, *, H1, Wc, c0, ml, W_pout, P1,
                  P2, Pout, reverse, shift_down, corner_c0, corner_slope,
                  with_vertical, with_diag, rc, interpret):
    """One chunk invocation: returns (adj_chunk, hist_out)."""
    Hp, CWp, Dp = cv_chunk.shape
    n_chunks = Hp // rc
    hist = hist.reshape(n_chunks, rc, Dp)
    if reverse:
        spec = pl.BlockSpec((rc, CWp, Dp), lambda h: (n_chunks - 1 - h, 0, 0),
                            memory_space=pltpu.VMEM)
        hspec = pl.BlockSpec((1, rc, Dp), lambda h: (n_chunks - 1 - h, 0, 0),
                             memory_space=pltpu.VMEM)
    else:
        spec = pl.BlockSpec((rc, CWp, Dp), lambda h: (h, 0, 0),
                            memory_space=pltpu.VMEM)
        hspec = pl.BlockSpec((1, rc, Dp), lambda h: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _chunked_rows_kernel, RC=rc, Dp=Dp, H1=H1, Wc=Wc, c0=c0,
        ml=ml, W_pout=W_pout, P1=float(P1), P2=float(P2),
        Pout=float(Pout), reverse=reverse, shift_down=shift_down,
        corner_c0=corner_c0, corner_slope=corner_slope,
        with_vertical=with_vertical, with_diag=with_diag,
        accumulate=acc is not None)
    in_specs = [spec] + ([spec] if acc is not None else []) + [hspec]
    args = (cv_chunk,) + ((acc,) if acc is not None else ()) + (hist,)
    scratch = [pltpu.VMEM((CWp, Dp), jnp.float32)] * (2 if with_vertical
                                                      else 1)
    out, hout = pl.pallas_call(
        kernel, grid=(n_chunks,),
        in_specs=in_specs, out_specs=[spec, hspec],
        out_shape=[jax.ShapeDtypeStruct((Hp, CWp, Dp), jnp.float32),
                   jax.ShapeDtypeStruct((n_chunks, rc, Dp), jnp.float32)],
        scratch_shapes=scratch,
        input_output_aliases={1: 0} if acc is not None else {},
        interpret=interpret)(*args)
    return out, hout.reshape(Hp, Dp)


def sgm_chunked_adj(region: jnp.ndarray, ml: int, W_pout: int, P1: float,
                    P2: float, Pout: float, n_directions: int,
                    vmem_budget: int = 12 * 1024 * 1024,
                    interpret: bool | None = None,
                    cw_target: int | None = None):
    """All principal-direction adj contributions for volumes whose
    full-width carries exceed VMEM, via W-chunked sequential passes with
    edge-history relay.  Exact vs `sgm_fused_adj` / the XLA groups."""
    H1, W1, D = region.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Dp = _round_up(D, 128)
    # chunk width: biggest multiple of 8 whose pass fits the 16 MB scoped
    # vmem: 3 double-buffered rc=2 streams (12 units) + 2 carries + ~11
    # Mosaic stack temporaries, all CW*Dp*4 (an HD D=320 run with the
    # previous 12-unit estimate allocated 19.06 M against the 16 M limit)
    if cw_target is None:
        cw_target = max(8, (15_900_000 // (25 * Dp * 4)) // 8 * 8)
    CW = min(_round_up(W1, 8), _round_up(cw_target, 8))
    Wp = _round_up(W1, CW)
    n_w = Wp // CW
    RC = 2 if 25 * CW * Dp * 4 <= 15_900_000 else 1
    RT = min(128, _round_up(H1, 8))
    Hp = _round_up(_round_up(H1, RT), RC)

    cv_p = jnp.pad(region.astype(jnp.float32), ((0, 0), (0, 0), (0, Dp - D)),
                   constant_values=jnp.inf)
    cv_p = jnp.pad(cv_p, ((0, Hp - H1), (0, Wp - W1), (0, 0)))
    chunks = [cv_p[:, w * CW:(w + 1) * CW] for w in range(n_w)]

    kw = dict(H1=H1, ml=ml, W_pout=W_pout, P1=P1, P2=P2, Pout=Pout,
              rc=RC, interpret=interpret)
    adj = [None] * n_w
    diag = n_directions >= 8

    zrow = jnp.zeros((1, Dp), jnp.float32)

    def run_pass(order, reverse, shift_down, corner, with_vertical):
        hist = jnp.zeros((Hp, Dp), jnp.float32)
        for w in order:
            wc = min(CW, W1 - w * CW)
            adj[w], hout = _chunked_pass(
                chunks[w], adj[w], hist, Wc=wc, c0=w * CW,
                reverse=reverse, shift_down=shift_down,
                corner_c0=corner[0], corner_slope=corner[1],
                with_vertical=with_vertical, with_diag=diag, **kw)
            # the consumer at row i shifts in the producer's post-row state
            # of row i-1 (i+1 on reverse scans) — shift the edge history by
            # one row in the scan direction; the inserted zero row is the
            # out-of-image line start
            if reverse:
                hist = jnp.concatenate([hout[1:], zrow], 0)
            else:
                hist = jnp.concatenate([zrow, hout[:-1]], 0)

    # direction table (scan, carry shift, consumed edge -> chunk order,
    # double-covered corner line j = c0 + slope*i):
    #   SE fwd  shift-down left  L->R  j = i
    #   SW fwd  shift-up   right R->L  j = W1-1-i
    #   NE rev  shift-down left  L->R  j = H1-1-i
    #   NW rev  shift-up   right R->L  j = i + (W1-H1)
    # verticals ride the two left->right passes (chunk order irrelevant)
    run_pass(range(n_w), False, True, (0, 1), True)
    run_pass(range(n_w), True, True, (H1 - 1, -1), True)
    if diag:
        run_pass(reversed(range(n_w)), False, False, (W1 - 1, -1), False)
        run_pass(reversed(range(n_w)), True, False, (W1 - H1, 1), False)

    adj_full = jnp.concatenate(adj, axis=1)

    # horizontal passes: small blocks, unchunked
    CC = 8
    while 6 * RT * CC * Dp * 4 + RT * Dp * 4 > vmem_budget and CC > 1:
        CC //= 2
    nwc = Wp // CC
    hspec_f = pl.BlockSpec((RT, CC, Dp), lambda r, w: (r, w, 0),
                           memory_space=pltpu.VMEM)
    hspec_r = pl.BlockSpec((RT, CC, Dp), lambda r, w: (r, nwc - 1 - w, 0),
                           memory_space=pltpu.VMEM)

    def cols_call(acc_v, reverse):
        spec = hspec_r if reverse else hspec_f
        kernel = functools.partial(
            _fused_cols_kernel, CC=CC, Dp=Dp, W1=W1, ml=ml, W_pout=W_pout,
            P1=float(P1), P2=float(P2), Pout=float(Pout), reverse=reverse)
        return pl.pallas_call(
            kernel, grid=(Hp // RT, nwc), in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((Hp, Wp, Dp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((RT, Dp), jnp.float32)],
            input_output_aliases={1: 0}, interpret=interpret)(cv_p, acc_v)

    adj_full = cols_call(adj_full, reverse=False)
    adj_full = cols_call(adj_full, reverse=True)
    return adj_full[:H1, :W1, :D]
