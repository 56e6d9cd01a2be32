"""Distributed SGM over a row-sharded image (mesh axis ``tile``).

No reference counterpart (the reference's SGM parallelism is one OpenMP
thread per scanline on a single host, `correlation/sgm.h:336-353`).  Design:

  * Horizontal directions (LEFT2RIGHT / RIGHT2LEFT): scanlines are rows, so a
    row-sharded volume computes them fully in parallel with zero
    communication.
  * Vertical directions (UP2DOWN / DOWN2UP): the per-line DP carry
    (`previous_cost[D]`, `sgm.h:203-304`) crosses shard boundaries.  The
    carry rows (W, D) are relayed shard-to-shard with `lax.ppermute` — a
    nearest-neighbor ICI hop — and each shard runs its local `lax.scan`
    when the relay reaches it (`lax.cond` keeps inactive shards idle).  The
    relay is exact (bit-identical to the single-chip scan) at the price of
    serializing the vertical passes across shards; the two vertical
    directions relay in opposite orders so their pipelines overlap when
    interleaved by the scheduler.

Must be called inside `shard_map`; supports the 4-direction set (the
single-chip engine covers 8/16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.sgm import _line_recurrence


def _horizontal_pass(cv: jnp.ndarray, reverse: bool, P1, P2, Pout) -> jnp.ndarray:
    """L2R / R2L adjustment contributions; lines are rows, scan over columns.
    Local to each shard."""
    H, W, D = cv.shape
    cols = jnp.arange(W, dtype=jnp.int32)
    xs_cv = jnp.moveaxis(cv, 1, 0)          # (W, H, D)
    if reverse:
        xs_cv = jnp.flip(xs_cv, 0)
        cols = jnp.flip(cols, 0)

    def step(prev, xs):
        base, j = xs
        cur, adj = _line_recurrence(prev, base, j, W, P1, P2, Pout)
        return cur, adj

    init = jnp.zeros_like(cv[:, 0, :])  # zeros_like keeps the
    # shard_map varying-manual-axes type tied to the sharded operand
    _, adjs = jax.lax.scan(step, init, (xs_cv, cols))
    if reverse:
        adjs = jnp.flip(adjs, 0)
    return jnp.moveaxis(adjs, 0, 1)         # (H, W, D)


def _vertical_scan(cv: jnp.ndarray, carry_in: jnp.ndarray, reverse: bool,
                   P1, P2, Pout):
    """One shard's vertical pass: lines are columns, scan over local rows,
    starting from the relayed carry.  Returns (adjustments, carry_out)."""
    H, W, D = cv.shape
    cols = jnp.arange(W, dtype=jnp.int32)
    xs_cv = cv if not reverse else jnp.flip(cv, 0)   # (H, W, D)

    def step(prev, base):
        cur, adj = _line_recurrence(prev, base, cols, W, P1, P2, Pout)
        return cur, adj

    carry_out, adjs = jax.lax.scan(step, carry_in, xs_cv)
    if reverse:
        adjs = jnp.flip(adjs, 0)
    return adjs, carry_out


def _vertical_relay(cv: jnp.ndarray, reverse: bool, P1, P2, Pout,
                    axis_name: str) -> jnp.ndarray:
    """Relay the vertical DP across shards: shard k runs its scan at relay
    step k (or n-1-k for the reverse direction), then ppermutes its outgoing
    carry to the next shard."""
    H, W, D = cv.shape
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    my_turn_at = (n - 1 - me) if reverse else me
    perm = ([(i, i - 1) for i in range(1, n)] if reverse
            else [(i, i + 1) for i in range(n - 1)])

    def relay_step(state, step):
        carry, adj = state

        def run(c):
            return _vertical_scan(cv, c, reverse, P1, P2, Pout)

        def idle(c):
            return jnp.zeros_like(cv), c

        new_adj, carry_out = jax.lax.cond(step == my_turn_at, run, idle, carry)
        adj = adj + new_adj
        carry_next = jax.lax.ppermute(carry_out, axis_name, perm)
        return (carry_next, adj), None

    init = (jnp.zeros_like(cv[0]), jnp.zeros_like(cv))
    (_, adj), _ = jax.lax.scan(relay_step, init,
                               jnp.arange(n, dtype=jnp.int32))
    return adj


def distributed_sgm(cv_local: jnp.ndarray, P1: float, P2: float,
                    Pout: float = 100.0, axis_name: str = "tile") -> jnp.ndarray:
    """4-direction SGM on a row-sharded (H_loc, W, D) cost volume block.
    Exact vs. the single-chip `sgm_cost_volume(..., n_directions=4)` with
    zero margins.  Call inside `shard_map`."""
    cv_local = cv_local.astype(jnp.float32)
    sgm = cv_local
    sgm = sgm + _horizontal_pass(cv_local, False, P1, P2, Pout)
    sgm = sgm + _horizontal_pass(cv_local, True, P1, P2, Pout)
    sgm = sgm + _vertical_relay(cv_local, False, P1, P2, Pout, axis_name)
    sgm = sgm + _vertical_relay(cv_local, True, P1, P2, Pout, axis_name)
    return sgm
