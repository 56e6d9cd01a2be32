"""L1 (least absolute differences) solvers.

Reference parity: `optimization/l1optimization.h` — `weighted_median` (:62)
and `leastAbsoluteDifferences` (:100; exact active-set descent with weighted
medians).  `affineBestL1Approximation` is the sum(x)==1 constrained variant
(the barycentric hook of the SAD/ZSAD refinement traits).

Documented deviation: the reference's exact combinatorial descent is
inherently sequential and data-dependent; here L1 is solved by IRLS
(iteratively reweighted least squares with epsilon-smoothed weights, fixed
iteration count) — same minimizer up to the smoothing tolerance, and
jit/vmap/TPU-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_median(elements: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Element at the 50% point of the weight distribution (lower weighted
    median, `l1optimization.h:36-66`)."""
    order = jnp.argsort(elements, axis=-1)
    se = jnp.take_along_axis(elements, order, -1)
    sw = jnp.take_along_axis(weights, order, -1)
    cum = jnp.cumsum(sw, -1)
    half = cum[..., -1:] / 2.0
    idx = jnp.argmax(cum >= half, axis=-1)
    return jnp.take_along_axis(se, idx[..., None], -1)[..., 0]


def least_absolute_differences(A: jnp.ndarray, b: jnp.ndarray,
                               tol: float = 1e-6, iters: int = 30
                               ) -> jnp.ndarray:
    """argmin_x ||Ax - b||_1 via IRLS (`leastAbsoluteDifferences`,
    `l1optimization.h:100-257`)."""
    x0 = jnp.linalg.lstsq(A, b)[0]

    def body(_, x):
        r = A @ x - b
        w = 1.0 / jnp.sqrt(r * r + tol)
        Aw = A * w[:, None]
        return jnp.linalg.lstsq(Aw.T @ A, Aw.T @ b)[0]

    return jax.lax.fori_loop(0, iters, body, x0)


def affine_best_l1_approximation(A: jnp.ndarray, b: jnp.ndarray,
                                 tol: float = 1e-6, iters: int = 30
                                 ) -> jnp.ndarray:
    """argmin_x ||Ax - b||_1 s.t. sum(x) == 1
    (`affineBestL1Approximation`, `l1optimization.h:258+`)."""
    from .lsq import _affine_parts, _full_coeffs
    M, b0 = _affine_parts(A)
    alpha = least_absolute_differences(M, b - b0, tol, iters)
    return _full_coeffs(alpha)
