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
    """Relay the vertical DP across shards via the shared `_carry_relay`
    protocol: shard k runs its scan at relay step k (n-1-k reversed) and
    accumulates its adjustments only on its own turn (idle shards just
    forward carries — no full-volume zero adds)."""
    def pass_fn(acc, carries, rev):
        adj, carry_out = _vertical_scan(cv, carries[0], rev, P1, P2, Pout)
        return acc + adj, (carry_out,)

    return _carry_relay(jnp.zeros_like(cv), reverse=reverse,
                        axis_name=axis_name, n_car=1,
                        carry_shape=cv.shape[1:], dtype=cv.dtype,
                        run_pass=pass_fn,
                        init_carries=(jnp.zeros_like(cv[0]),))


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


def _carry_relay(acc, *, reverse, axis_name, n_car, carry_shape, dtype,
                 run_pass, init_carries=None):
    """The shared shard-to-shard DP carry relay: shard k runs its pass at
    relay step k (n-1-k for reverse), then ppermutes its outgoing carries
    one shard along; inactive shards forward carries untouched.  One
    protocol for the lane-layout, DHW and transposed-column relays."""
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    my_turn = (n - 1 - me) if reverse else me
    perm = ([(i, i - 1) for i in range(1, n)] if reverse
            else [(i, i + 1) for i in range(n - 1)])

    def step(state, s):
        carries, acc = state

        def run(ops):
            carries, acc = ops
            out, couts = run_pass(acc, carries, reverse)
            return tuple(couts), out

        carries, acc = jax.lax.cond(s == my_turn, run,
                                    lambda ops: ops, (carries, acc))
        carries = tuple(jax.lax.ppermute(c, axis_name, perm)
                        for c in carries)
        return (carries, acc), None

    # init_carries lets callers tie the zeros to a sharded operand
    # (zeros_like keeps shard_map's varying-manual-axes type; a plain
    # jnp.zeros is replicated and breaks lax.scan carry typing)
    zc = (tuple(init_carries) if init_carries is not None
          else tuple(jnp.zeros(carry_shape, dtype) for _ in range(n_car)))
    (_, acc), _ = jax.lax.scan(step, (zc, acc),
                               jnp.arange(n, dtype=jnp.int32))
    return acc


def distributed_sgm_fused(cv_local: jnp.ndarray, P1: float, P2: float,
                          Pout: float = 100.0, axis_name: str = "tile",
                          n_directions: int = 8,
                          interpret: bool | None = None) -> jnp.ndarray:
    """8-direction SGM on a row-sharded (H_loc, W, D) block using the fused
    Pallas kernels per shard (`sgm_pallas.sgm_rows_shard_pass`): the
    vertical AND diagonal carries relay shard-to-shard with `ppermute`
    (down-scan top-to-bottom, up-scan bottom-to-top; each shard's kernel
    passes carries through its padded rows untouched so the hand-off is
    exact), horizontals run fully local.  Exact vs the single-chip
    `sgm_cost_volume(..., n_directions=8)` with zero margins.  Call inside
    `shard_map` with equal row blocks."""
    from ..ops.sgm_pallas import (pad_shard_volume, sgm_rows_shard_pass,
                                  sgm_cols_shard_pass, sgm_shard_dims)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cv_local = cv_local.astype(jnp.float32)
    H1, W1, D = cv_local.shape
    diag = n_directions >= 8
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    H_img = H1 * n
    i0 = me * H1
    cv_p = pad_shard_volume(cv_local)
    Hp, Wp, Dp, _, _, _ = sgm_shard_dims(H1, W1, D)
    n_car = 3 if diag else 1

    def pass_fn(acc, carries, reverse):
        return sgm_rows_shard_pass(
            cv_p, acc, carries, i0, H1=H1, W1=W1, H_img=H_img,
            ml=0, W_pout=W1, P1=P1, P2=P2, Pout=Pout,
            reverse=reverse, diag=diag, interpret=interpret)

    def relay(acc, reverse):
        return _carry_relay(acc, reverse=reverse, axis_name=axis_name,
                            n_car=n_car, carry_shape=(Wp, Dp),
                            dtype=cv_p.dtype, run_pass=pass_fn)

    adj = jnp.zeros_like(cv_p)
    adj = relay(adj, reverse=False)
    adj = relay(adj, reverse=True)
    adj = sgm_cols_shard_pass(cv_p, adj, H1=H1, W1=W1, ml=0, W_pout=W1,
                              P1=P1, P2=P2, Pout=Pout, reverse=False,
                              interpret=interpret)
    adj = sgm_cols_shard_pass(cv_p, adj, H1=H1, W1=W1, ml=0, W_pout=W1,
                              P1=P1, P2=P2, Pout=Pout, reverse=True,
                              interpret=interpret)
    return cv_local + adj[:H1, :W1, :D]


def distributed_sgm_fused_dhw(cv_local: jnp.ndarray, P1: float, P2: float,
                              Pout: float = 100.0, axis_name: str = "tile",
                              n_directions: int = 8,
                              interpret: bool | None = None) -> jnp.ndarray:
    """`distributed_sgm_fused` on the DHW-layout kernels
    (`sgm_pallas_dhw`, disparity on sublanes — 2.2x the per-step rate of
    the lane-layout shard kernels): the vertical + diagonal carries relay
    shard-to-shard as (Dp, Wp) tiles, horizontals run locally through the
    transposed passes.  Exact vs the single-chip
    `sgm_cost_volume(..., n_directions=8)` with zero margins.  Call
    inside `shard_map` with equal row blocks.

    ``n_directions=16`` adds the knight-move families
    (`correlation/sgm.h:57-155,367`): the down/up knights relay across
    row shards with 4 extra (Dp, Wp) carries (even shard heights keep
    the drift parity concrete; odd heights derive it from the traced
    global row index — `sgm_pallas_dhw` ``parity_traced`` — at a small
    per-row select cost), and the horizontal knights — which drift one
    ROW per two columns, crossing row shards mid-scan — run after an
    `all_to_all` reshard to COLUMN shards, where they become plain
    scan-axis carries and relay with the same mechanism (W that does
    not split into even per-shard column counts is zero-padded on the
    right and sliced back — exact, because zero-cost pad columns with a
    globally-gated Pout self-sustain the zero line-start carry)."""
    from ..ops.sgm_pallas_dhw import (pad_shard_volume_dhw,
                                      sgm_rows_shard_pass_dhw,
                                      sgm_cols_shard_pass_dhw)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cv_local = cv_local.astype(jnp.float32)
    H1, W1, D = cv_local.shape
    diag = n_directions >= 8
    knight = n_directions >= 16
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    H_img = H1 * n
    i0 = me * H1
    cv_p = pad_shard_volume_dhw(cv_local)
    Hp, Dp, Wp = cv_p.shape
    n_car = (3 if diag else 1) + (4 if knight else 0)
    # odd shard heights make the global drift parity shard-dependent —
    # derive it from the traced global row index instead of trace-time
    par_traced = bool(knight and H1 % 2)

    def pass_fn(acc, carries, reverse):
        return sgm_rows_shard_pass_dhw(
            cv_p, acc, carries, i0, H1=H1, W1=W1, H_img=H_img,
            ml=0, W_pout=W1, P1=P1, P2=P2, Pout=Pout,
            reverse=reverse, diag=diag, knight=knight,
            parity_traced=par_traced, interpret=interpret)

    def relay(acc, reverse):
        return _carry_relay(acc, reverse=reverse, axis_name=axis_name,
                            n_car=n_car, carry_shape=(Dp, Wp),
                            dtype=cv_p.dtype, run_pass=pass_fn)

    adj = jnp.zeros_like(cv_p)
    adj = relay(adj, reverse=False)
    adj = relay(adj, reverse=True)
    if not knight:
        adj = sgm_cols_shard_pass_dhw(cv_p, adj, H1=H1, W1=W1, ml=0,
                                      W_pout=W1, P1=P1, P2=P2, Pout=Pout,
                                      reverse=False, interpret=interpret)
        adj = sgm_cols_shard_pass_dhw(cv_p, adj, H1=H1, W1=W1, ml=0,
                                      W_pout=W1, P1=P1, P2=P2, Pout=Pout,
                                      reverse=True, interpret=interpret)
        return cv_local + jnp.moveaxis(adj[:H1, :D, :W1], 1, -1)
    return cv_local + _transposed_knight_stage(
        cv_local, jnp.moveaxis(adj[:H1, :D, :W1], 1, -1), P1, P2, Pout,
        axis_name, interpret)


def _transposed_knight_stage(cv_local, adj_local, P1, P2, Pout, axis_name,
                             interpret):
    """The 16-direction horizontal stage: reshard (H_loc, W, D) row
    shards to (H, W_loc, D) column shards with an `all_to_all`, run the
    transposed forward/reverse passes (1 horizontal + 4 knight carries
    each) with the carry relay across COLUMN shards, and reshard the
    accumulated adjustment back.  Exactness: the transposed knight
    families drift one lane (image row) per two scan steps (columns);
    with columns as the sharded scan axis and full-height lanes, the
    drift never crosses a shard — only the scan carry does, which the
    relay hands off bit-exactly.

    W that does not split into even per-shard column counts is
    zero-padded on the right before the reshard and sliced back after:
    pad columns carry zero cost and a globally-gated Pout (the Pout /
    knight-weight masks key on ``N_glob = W`` real), so a reverse scan
    entering from the pad region holds the exact zero line-start carry
    when it reaches the last real column."""
    from ..ops.sgm_pallas_dhw import (pad_shard_volume_dhw,
                                      sgm_rows_shard_pass_dhw)
    H1, W, D = cv_local.shape
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    H = H1 * n
    # per-shard column count: ceil to an even count (concrete drift
    # parity via even j0) and pad the global right edge to n * W_loc
    W_loc = -(-W // n)
    W_loc = W_loc + (W_loc % 2)
    W_pad = W_loc * n
    if W_pad != W:
        pad = ((0, 0), (0, W_pad - W), (0, 0))
        cv_local = jnp.pad(cv_local, pad)
        adj_local = jnp.pad(adj_local, pad)

    def to_cols(x):                      # (H1, W, D) -> (W_loc, H, D)
        x = jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=0,
                               tiled=True)
        return jnp.moveaxis(x, 1, 0)

    cv_c = to_cols(cv_local)             # scan rows = image columns
    adj_c = to_cols(adj_local)
    cv_cp = pad_shard_volume_dhw(cv_c)   # (W_locp, Dp, Hp_lanes)
    Wp_loc, Dp, Hp_lanes = cv_cp.shape
    adj_cp = jnp.moveaxis(adj_c, -1, 1)
    adj_cp = jnp.pad(adj_cp, ((0, Wp_loc - W_loc), (0, Dp - D),
                              (0, Hp_lanes - H1 * n)))
    j0 = me * W_loc

    def pass_fn(acc, carries, reverse):
        return sgm_rows_shard_pass_dhw(
            cv_cp, acc, carries, j0, H1=W_loc, W1=H,
            H_img=W, ml=0, W_pout=W, P1=P1, P2=P2, Pout=Pout,
            reverse=reverse, diag=False, knight=True,
            transposed=True, N_glob=W, interpret=interpret)

    def relay_T(acc, reverse):
        return _carry_relay(acc, reverse=reverse, axis_name=axis_name,
                            n_car=1 + 4, carry_shape=(Dp, Hp_lanes),
                            dtype=cv_cp.dtype, run_pass=pass_fn)

    adj_cp = relay_T(adj_cp, reverse=False)
    adj_cp = relay_T(adj_cp, reverse=True)
    out = jnp.moveaxis(adj_cp[:W_loc, :D, :H], 1, -1)   # (W_loc, H, D)
    out = jnp.moveaxis(out, 0, 1)                       # (H, W_loc, D)
    out = jax.lax.all_to_all(out, axis_name, split_axis=0, concat_axis=1,
                             tiled=True)                # (H1, W_pad, D)
    return out[:, :W, :]                 # drop the even-split pad columns
