"""Non-local-maximum point selection.

Reference parity: `sparseMatching/nonLocalMaximumPointSelection.h:13` — pick
up to N highest-scoring points above a threshold such that no two selected
points are within `radius` of each other; returns float (x, y) coordinates.

TPU design: a local-max pre-filter via `reduce_window` max (keeps only
pixels equal to their neighborhood max) followed by a fixed-iteration
greedy selection: pick the global argmax, suppress a radius around it,
repeat N times — O(N) reductions over the score map, all on-device and
jit-friendly (invalid selections get score -inf and are flagged).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def non_local_maximum_point_selection(score: jnp.ndarray, radius: float,
                                      n_points: int,
                                      threshold: float = -jnp.inf):
    """Returns (coords (N, 2) float32 [x, y], values (N,), valid (N,) bool).
    Unfilled slots have valid=False."""
    H, W = score.shape
    s = score.astype(jnp.float32)

    # local-maximum prefilter over the suppression radius
    r = max(1, int(radius))
    win = 2 * r + 1
    local_max = jax.lax.reduce_window(s, -jnp.inf, jax.lax.max,
                                      (win, win), (1, 1), "SAME")
    s = jnp.where((s == local_max) & (s > threshold), s, -jnp.inf)

    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    r2 = float(radius) ** 2

    def step(state, _):
        s = state
        flat = jnp.argmax(s)
        i = flat // W
        j = flat % W
        v = s[i, j]
        ok = jnp.isfinite(v)
        supp = ((ii - i) ** 2 + (jj - j) ** 2).astype(jnp.float32) <= r2
        s = jnp.where(supp, -jnp.inf, s)
        return s, (jnp.stack([j.astype(jnp.float32),
                              i.astype(jnp.float32)]), v, ok)

    _, (coords, values, valid) = jax.lax.scan(step, s, None, length=n_points)
    return coords, values, valid
