"""Halo exchange along a row-sharded image axis.

No reference counterpart (SURVEY.md §2.8): this replaces the implicit
shared-memory overlap OpenMP threads get for free.  Each shard sends its
boundary rows to its neighbors with `lax.ppermute` (nearest-neighbor ICI
traffic) and concatenates received halos, producing a locally-padded block on
which window ops (unfold/census/box filters) are exact.

Must be called inside `shard_map` over the named mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_exchange_rows(x: jnp.ndarray, halo_up: int, halo_down: int,
                       axis_name: str) -> jnp.ndarray:
    """Return x extended with `halo_up` rows from the previous shard and
    `halo_down` rows from the next shard (zeros at the global boundary,
    matching the engine's zero-padding convention).

    x: (H_loc, ...) local block, sharded along axis 0.  The halo must
    not exceed the local shard height: the exchange only reaches the
    IMMEDIATE neighbors, so a larger request would silently splice the
    wrong rows into the extended block.
    """
    H_loc = x.shape[0]
    if max(halo_up, halo_down) > H_loc:
        raise ValueError(
            f"halo ({max(halo_up, halo_down)}) exceeds the local shard "
            f"height ({H_loc}); use more rows per shard or a smaller "
            f"window radius")
    n = jax.lax.axis_size(axis_name)
    parts = []
    if halo_up > 0:
        # previous shard's last rows -> my top halo
        src_dst_fwd = [(i, (i + 1) % n) for i in range(n)]
        top = jax.lax.ppermute(x[-halo_up:], axis_name, src_dst_fwd)
        idx = jax.lax.axis_index(axis_name)
        top = jnp.where(idx == 0, jnp.zeros_like(top), top)
        parts.append(top)
    parts.append(x)
    if halo_down > 0:
        src_dst_bwd = [(i, (i - 1) % n) for i in range(n)]
        bot = jax.lax.ppermute(x[:halo_down], axis_name, src_dst_bwd)
        idx = jax.lax.axis_index(axis_name)
        bot = jnp.where(idx == n - 1, jnp.zeros_like(bot), bot)
        parts.append(bot)
    return jnp.concatenate(parts, axis=0)
