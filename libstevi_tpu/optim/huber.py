"""Huber loss family.

Reference parity: `optimization/huber_kernel.h:34-148` — Huber, pseudo-Huber
and sqrt-Huber kernels with derivatives (derivatives come free from autodiff
here; the value functions match the reference definitions).
"""

from __future__ import annotations

import jax.numpy as jnp


def huber_loss(r: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    a = jnp.abs(r)
    return jnp.where(a <= delta, 0.5 * r * r, delta * (a - 0.5 * delta))


def pseudo_huber_loss(r: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    return delta * delta * (jnp.sqrt(1.0 + (r / delta) ** 2) - 1.0)


def sqrt_huber_loss(r: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """sqrt of the Huber kernel — usable as a robust residual reweighting
    in Gauss-Newton (`huber_kernel.h:120-148`)."""
    return jnp.sqrt(huber_loss(r, delta))


def huber_weight(r: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """IRLS weight w(r) = psi(r)/r for the Huber kernel."""
    a = jnp.abs(r)
    return jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12))
