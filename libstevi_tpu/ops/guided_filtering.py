"""Guided (cross/bilateral-style) cost-volume filtering.

Reference parity: `correlation/guided_cost_filtering.h` —
`computeAggregationWindows` (:27: per-pixel aggregation weights over a
window from a guide image, spatial weight x match weight functors) and
`variableCostVolumeAggregation` (:102: weighted window sum of the cost
volume).

TPU design: the window loop is a static offset loop of shifted slices;
weights and the weighted aggregation fuse into VPU elementwise work — no
per-pixel windows are materialized.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shifted(x, di, dj, fill=0.0):
    H, W = x.shape[:2]
    pads = ((max(0, -di), max(0, di)), (max(0, -dj), max(0, dj))) \
        + ((0, 0),) * (x.ndim - 2)
    p = jnp.pad(x, pads, constant_values=fill)
    return p[max(0, di):max(0, di) + H, max(0, dj):max(0, dj) + W]


def compute_aggregation_weights(guide: jnp.ndarray, radius: int,
                                sigma_spatial: float = 3.0,
                                sigma_value: float = 0.1) -> jnp.ndarray:
    """(H, W, (2r+1)^2) bilateral weights from the guide
    (`computeAggregationWindows`, `guided_cost_filtering.h:27`)."""
    g = guide.astype(jnp.float32)
    if g.ndim == 3:
        g = jnp.mean(g, -1)
    H, W = g.shape
    ii = jnp.arange(H, dtype=jnp.int32)[:, None]
    jj = jnp.arange(W, dtype=jnp.int32)[None, :]
    ws = []
    for di in range(-radius, radius + 1):
        for dj in range(-radius, radius + 1):
            spatial = jnp.exp(-(di * di + dj * dj)
                              / (2.0 * sigma_spatial ** 2))
            diff = _shifted(g, di, dj) - g
            match = jnp.exp(-(diff * diff) / (2.0 * sigma_value ** 2))
            # out-of-image window slots carry ZERO weight (their zero-
            # filled guide diff would otherwise keep near-full weight at
            # dark border pixels and deflate the normalized aggregate)
            inb = ((ii + di >= 0) & (ii + di < H)
                   & (jj + dj >= 0) & (jj + dj < W))
            ws.append(jnp.where(inb, spatial * match, 0.0))
    w = jnp.stack(ws, -1)
    return w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-12)


def guided_cost_volume_aggregation(cv: jnp.ndarray, guide: jnp.ndarray,
                                   radius: int, sigma_spatial: float = 3.0,
                                   sigma_value: float = 0.1) -> jnp.ndarray:
    """Weighted CV aggregation (`variableCostVolumeAggregation`,
    `guided_cost_filtering.h:102`)."""
    w = compute_aggregation_weights(guide, radius, sigma_spatial, sigma_value)
    out = jnp.zeros_like(cv)
    k = 0
    for di in range(-radius, radius + 1):
        for dj in range(-radius, radius + 1):
            out = out + w[..., k:k + 1] * _shifted(cv, di, dj)
            k += 1
    return out
