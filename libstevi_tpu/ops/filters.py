"""Box / mean / sigma filters.

Reference parity: `meanFilter2D` (`correlation/correlation_base.h:882-938`,
a separable sliding box mean valid in the interior region) and `sigmaFilter`
(`correlation_base.h:1007`).

TPU design: box sums are two 1-D `lax.reduce_window` passes (zero 'SAME'
padding == the reference's out-of-image = 0 convention), which XLA fuses and
vectorizes; no sequential sliding recurrences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_filter_2d(x: jnp.ndarray, h_radius: int, v_radius: int) -> jnp.ndarray:
    """Sum over a (2*v_radius+1, 2*h_radius+1) window, zero outside the image.
    Works on (H, W) or (H, W, C) arrays (per-channel)."""
    v = 2 * v_radius + 1
    h = 2 * h_radius + 1
    window = (v, h) + (1,) * (x.ndim - 2)
    return jax.lax.reduce_window(x, jnp.zeros((), x.dtype), jax.lax.add,
                                 window, (1,) * x.ndim, "SAME")


def mean_filter_2d(image: jnp.ndarray, h_radius: int, v_radius: int) -> jnp.ndarray:
    """Box mean; exact in the interior (the only region the reference
    initializes, `correlation_base.h:896-934`), border values are the
    zero-padded box mean."""
    n = (2 * v_radius + 1) * (2 * h_radius + 1)
    return box_filter_2d(image.astype(jnp.float32), h_radius, v_radius) / n


def sigma_filter(image: jnp.ndarray, h_radius: int, v_radius: int) -> jnp.ndarray:
    """Per-pixel window standard deviation (population), computed from box
    sums of x and x^2 (`sigmaFilter`, `correlation_base.h:1007`)."""
    x = image.astype(jnp.float32)
    n = (2 * v_radius + 1) * (2 * h_radius + 1)
    s = box_filter_2d(x, h_radius, v_radius)
    s2 = box_filter_2d(x * x, h_radius, v_radius)
    var = jnp.maximum(s2 / n - (s / n) ** 2, 0.0)
    return jnp.sqrt(var)
