"""Covariance kernel family.

Reference parity: `statistics/covarianceKernels.h:41` — Matérn kernels
(including the nu = 1/2 exponential and nu -> inf Gaussian limits).
"""

from __future__ import annotations

import jax.numpy as jnp


def exponential_kernel(d: jnp.ndarray, length_scale: float = 1.0,
                       variance: float = 1.0) -> jnp.ndarray:
    return variance * jnp.exp(-jnp.abs(d) / length_scale)


def gaussian_kernel(d: jnp.ndarray, length_scale: float = 1.0,
                    variance: float = 1.0) -> jnp.ndarray:
    return variance * jnp.exp(-(d * d) / (2.0 * length_scale * length_scale))


def matern_kernel(d: jnp.ndarray, nu: float = 1.5, length_scale: float = 1.0,
                  variance: float = 1.0) -> jnp.ndarray:
    """Matérn covariance for nu in {0.5, 1.5, 2.5} (closed forms) or the
    Gaussian limit for nu = inf."""
    r = jnp.abs(d) / length_scale
    if nu == 0.5:
        return variance * jnp.exp(-r)
    if nu == 1.5:
        s = jnp.sqrt(3.0) * r
        return variance * (1.0 + s) * jnp.exp(-s)
    if nu == 2.5:
        s = jnp.sqrt(5.0) * r
        return variance * (1.0 + s + s * s / 3.0) * jnp.exp(-s)
    if nu == jnp.inf or nu == float("inf"):
        return gaussian_kernel(d, length_scale, variance)
    raise ValueError("supported nu: 0.5, 1.5, 2.5, inf")
