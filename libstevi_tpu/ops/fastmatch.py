"""Fast approximate scanline matching.

Reference parity: `correlation/fast_approximate_matching.h` —
`FastMatchTraits` (:30), `fullDispAtIdx` (:44), `fastmatch` (:105): full
search at each row start, then propagate the previous pixel's disparity
+-1 (3 candidates), falling back to a full re-search after two consecutive
jumps (hot loop :146-237).

TPU design: rows run in parallel; the column scan is a `lax.scan` carrying
(current disparity, consecutive-jump counter) per row.  The "full
re-search" consults a precomputed full-D WTA column (the dense argmin the
box backend already produces cheaply), keeping the data-dependent control
flow as vectorized selects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import (MatchingFunction, MATCH_TRAITS, ExtractionStrategy,
                          disp_dtype)


def fastmatch(func: MatchingFunction, cv: jnp.ndarray) -> jnp.ndarray:
    """(H, W, D) cost volume -> (H, W) disparity indices with the
    propagate-or-research policy."""
    H, W, D = cv.shape
    is_score = MATCH_TRAITS[func].strategy is ExtractionStrategy.SCORE
    vals = -cv if is_score else cv
    vals = vals.astype(jnp.float32)

    full_arg = jnp.argmin(vals, axis=-1).astype(jnp.int32)   # (H, W)

    def step(carry, xs):
        d_prev, jumps = carry           # (H,), (H,)
        col_vals, col_full = xs         # (H, D), (H,)

        cand = jnp.stack([d_prev - 1, d_prev, d_prev + 1], -1)
        cand = jnp.clip(cand, 0, D - 1)
        cc = jnp.take_along_axis(col_vals, cand, 1)
        best = jnp.argmin(cc, axis=-1)
        d_prop = jnp.take_along_axis(cand, best[:, None], 1)[:, 0]

        jumped = d_prop != d_prev
        jumps_new = jnp.where(jumped, jumps + 1, 0)
        research = jumps_new >= 2
        d_new = jnp.where(research, col_full, d_prop)
        jumps_new = jnp.where(research, 0, jumps_new)
        return (d_new, jumps_new), d_new

    init = (full_arg[:, 0], jnp.zeros((H,), jnp.int32))
    xs = (jnp.moveaxis(vals, 1, 0)[1:], full_arg.T[1:])
    _, ds = jax.lax.scan(step, init, xs)
    out = jnp.concatenate([full_arg[:, :1], jnp.moveaxis(ds, 0, 1)], 1)
    return out.astype(disp_dtype)
