"""Pallas TPU kernel for SGM directional passes.

One kernel covers all eight principal directions of `sgm.py`: vertical scans
run on the volume directly, horizontal scans on its transpose, diagonal
scans on its sheared layout.  Reverse orientations are folded into the
kernel's block index map plus an in-block reversed row loop — no flipped
copies of the volume are materialized, and forward/reverse share one padded
volume.

Kernel structure (per direction pass):
  * grid = (col_tiles, row_chunks); the row-chunk axis is innermost, so grid
    steps for one column tile are consecutive and the DP carry lives in a
    VMEM scratch persisting across grid steps (reset at chunk 0).
  * each grid step works on an (RC, TC, Dp) block (Pallas double-buffers the
    HBM->VMEM streaming automatically), looping over its RC rows with
    `fori_loop` and applying the O(D) min-shift recurrence on a (TC, Dp)
    tile per row — pure VPU work on 128-lane-aligned tiles.
  * Pout and shear-validity masks come from program ids + iota; no index
    arrays are streamed.  Step-validity resets the carry to the line-start
    state (0) over padded rows, so the first real pixel of a reverse pass
    sees prev = 0 exactly like `sgm.py::_line_recurrence`.

The disparity axis is padded to a multiple of 128 with +inf: the
recurrence's isfinite guards keep padded lanes inert.
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


def _sgm_dir_kernel(*refs, RC, TC, Dp, H, W_lines, W_img, W_pout, P1, P2,
                    Pout, reverse, shear, ml, corner, accumulate):
    """One directional pass over a padded line-major volume.  `shear` in
    {'none', 'step', 'pos', 'neg'} selects how the image column j derives
    from (original row i, line c) for the Pout test and validity mask; with
    `accumulate` the pass adds onto the aliased accumulator input."""
    if accumulate:
        cv_ref, acc_ref, adj_ref, carry_ref = refs
    else:
        cv_ref, adj_ref, carry_ref = refs
        acc_ref = None
    w = pl.program_id(0)
    h = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(h == 0)
    def _():
        carry_ref[:] = jnp.zeros((TC, Dp), jnp.float32)

    dd = jax.lax.broadcasted_iota(jnp.int32, (TC, Dp), 1)
    cols = w * TC + jax.lax.broadcasted_iota(jnp.int32, (TC, 1), 0)
    b = (n_chunks - 1 - h) if reverse else h

    def row_body(rr, carry):
        # rr is a STATIC row index (the loop below is unrolled at trace
        # time) so every VMEM access is a static slice
        i = b * RC + rr           # original (padded) row index

        base = cv_ref[rr]
        prevf = jnp.where(jnp.isfinite(carry), carry, _INF)
        m = jnp.min(prevf, axis=-1, keepdims=True)
        left = jnp.concatenate(
            [jnp.full((TC, 1), _INF), prevf[:, :-1]], axis=1)
        right = jnp.concatenate(
            [prevf[:, 1:], jnp.full((TC, 1), _INF)], axis=1)
        agg = jnp.minimum(jnp.minimum(prevf, m + P2),
                          jnp.minimum(left + P1, right + P1))

        # step-validity: padded rows reset the carry to the line-start state
        step_ok = (i >= 0) & (i < H)
        if shear == "none":
            # vertical scan: lines are image columns
            j_img = ml + cols
            valid = (cols < W_lines) & step_ok
        elif shear == "step":
            # horizontal scan on the transposed volume: the image column is
            # the scan step, lines are image rows
            j_img = jnp.full((TC, 1), ml, jnp.int32) + i
            valid = (cols < W_lines) & step_ok
        elif shear == "pos":
            j_img = ml + cols - (H - 1) + i
            valid = ((j_img >= ml) & (j_img < ml + W_img)
                     & (cols < W_lines) & step_ok)
        else:  # 'neg'
            j_img = ml + cols - i
            valid = ((j_img >= ml) & (j_img < ml + W_img)
                     & (cols < W_lines) & step_ok)

        # Pout penalizes disparity indices pointing out of the FULL volume
        # width (`sgm.h:247`: j + nd >= cv_shape[1])
        agg = agg + jnp.where(j_img + dd >= W_pout, Pout, 0.0)

        adj = jnp.where(jnp.isfinite(agg) & jnp.isfinite(m), agg - m, 0.0)
        cur = base + adj
        adj = jnp.where(valid, adj, 0.0)
        cur = jnp.where(valid, cur, 0.0)
        if corner is not None:
            adj = adj * jnp.where(cols == corner, 2.0, 1.0)
        if accumulate:
            adj_ref[rr] = acc_ref[rr] + adj
        else:
            adj_ref[rr] = adj
        return cur

    carry = carry_ref[:]
    rows = range(RC - 1, -1, -1) if reverse else range(RC)
    for rr in rows:
        carry = row_body(rr, carry)
    carry_ref[:] = carry


def _pass_on_padded(cv_p, H, L, *, W_img, W_pout, ml, P1, P2, Pout, reverse,
                    shear, corner, RC, TC, acc=None):
    Hp, Lp, Dp = cv_p.shape
    kernel = functools.partial(
        _sgm_dir_kernel, RC=RC, TC=TC, Dp=Dp, H=H, W_lines=L, W_img=W_img,
        W_pout=W_pout, P1=float(P1), P2=float(P2), Pout=float(Pout),
        reverse=reverse, shear=shear, ml=ml, corner=corner,
        accumulate=acc is not None)

    n_chunks = Hp // RC
    if reverse:
        index_map = lambda w, h: (n_chunks - 1 - h, w, 0)
    else:
        index_map = lambda w, h: (h, w, 0)

    spec = pl.BlockSpec((RC, TC, Dp), index_map, memory_space=pltpu.VMEM)
    if acc is None:
        in_specs = [spec]
        args = (cv_p,)
        aliases = {}
    else:
        # the accumulator input aliases the output buffer: the pass adds its
        # contribution in-place, eliminating a separate XLA add
        in_specs = [spec, spec]
        args = (cv_p, acc)
        aliases = {1: 0}
    return pl.pallas_call(
        kernel,
        grid=(Lp // TC, n_chunks),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Hp, Lp, Dp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TC, Dp), jnp.float32)],
        input_output_aliases=aliases,
    )(*args)


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
                start_slope: int, rc: int = 4) -> jnp.ndarray:
    """Apply the per-row shifted-window copy; x is (H, W_in, Dp) with Dp a
    multiple of 128 and W_in >= W_out + max(start)."""
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


def sgm_direction_pair(cv_lines: jnp.ndarray, *, W_img: int, W_pout: int,
                       ml: int, P1: float, P2: float, Pout: float, shear: str,
                       corner_fwd: int | None = None,
                       corner_bwd: int | None = None,
                       rc: int = 32) -> jnp.ndarray:
    """Forward + reverse DP passes over a line-major (H steps, L lines, D)
    volume, sharing one padded copy; returns the summed adj contributions
    (H, L, D)."""
    H, L, D = cv_lines.shape
    Dp = _round_up(D, 128)
    TC = min(128, _round_up(L, 8))
    Lp = _round_up(L, TC)
    RC = rc
    Hp = _round_up(H, RC)

    cv_p = jnp.pad(cv_lines, ((0, Hp - H), (0, Lp - L), (0, Dp - D)),
                   constant_values=jnp.inf)
    kw = dict(W_img=W_img, W_pout=W_pout, ml=ml, P1=P1, P2=P2, Pout=Pout,
              shear=shear, RC=RC, TC=TC)
    adj = _pass_on_padded(cv_p, H, L, reverse=False, corner=corner_fwd, **kw)
    adj = _pass_on_padded(cv_p, H, L, reverse=True, corner=corner_bwd,
                          acc=adj, **kw)
    return adj[:H, :L, :D]
