"""Central finite differences.

Reference parity: `imageProcessing/finiteDifferences.h:12,74` — central
differences (x[i+1] - x[i-1]) / 2 along a chosen axis, one-sided at the
borders.
"""

from __future__ import annotations

import jax.numpy as jnp


def finite_difference(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    fwd = jnp.roll(x, -1, axis)
    bwd = jnp.roll(x, 1, axis)
    central = (fwd - bwd) / 2.0

    n = x.shape[axis]
    idx = jnp.arange(n)
    shape = [1] * x.ndim
    shape[axis] = n
    idx = idx.reshape(shape)
    first = jnp.take(x, jnp.asarray([1]), axis) - jnp.take(x, jnp.asarray([0]), axis)
    last = jnp.take(x, jnp.asarray([n - 1]), axis) - jnp.take(x, jnp.asarray([n - 2]), axis)
    out = jnp.where(idx == 0, first, central)
    out = jnp.where(idx == n - 1, last, out)
    return out


def gradient_2d(img: jnp.ndarray):
    """(d/drow, d/dcol) central-difference gradients."""
    return finite_difference(img, 0), finite_difference(img, 1)
