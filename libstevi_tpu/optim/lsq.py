"""L2 and spherical best-approximation solvers.

Reference parity: `optimization/l2optimization.h:36-64` (`leastSquares` via
QR; `affineBestL2Approximation`: min ||Ax-b|| s.t. sum(x)=1 by substituting
the last coefficient) and `optimization/sphericaloptimization.h:36-66`
(`sphericalAffineBestApproximation`: closed-form best direction on the unit
sphere within the affine constraint — the barycentric hook of the NCC/ZNCC
refinement traits, `matching_costs.h:436-439`).

All solvers broadcast over leading batch dimensions (vmap-compatible) and
use `jnp.linalg.lstsq`, which XLA maps onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def least_squares(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """argmin_x ||Ax - b||_2 (minimum-norm for underdetermined systems)."""
    return jnp.linalg.lstsq(A, b)[0]


def _affine_parts(A: jnp.ndarray):
    """Affine-constraint substitution with the LAST column as reference
    (referenceId = -1, `l2optimization.h:54`): x = e_n + spread(alpha),
    A x = M alpha + b0 where M = A[:, :-1] - A[:, -1:] and b0 = A[:, -1]."""
    M = A[..., :, :-1] - A[..., :, -1:]
    b0 = A[..., :, -1]
    return M, b0


def _full_coeffs(alpha: jnp.ndarray) -> jnp.ndarray:
    last = 1.0 - jnp.sum(alpha, axis=-1, keepdims=True)
    return jnp.concatenate([alpha, last], axis=-1)


def affine_best_l2_approximation(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """argmin_x ||Ax - b||_2 subject to sum(x) == 1
    (`affineBestL2Approximation`, `l2optimization.h:50-64`)."""
    M, b0 = _affine_parts(A)
    alpha = jnp.linalg.lstsq(M, b - b0)[0]
    return _full_coeffs(alpha)


def spherical_affine_best_approximation(A: jnp.ndarray, b: jnp.ndarray
                                        ) -> jnp.ndarray:
    """argmin_x || Ax/||Ax|| - b/||b|| ||_2 subject to sum(x) == 1
    (`sphericalAffineBestApproximation`, `sphericaloptimization.h:36-66`):
    project b onto col(A), scale the affine offset's residual, solve."""
    M, b0 = _affine_parts(A)
    b_perp = A @ jnp.linalg.lstsq(A, b)[0]
    a_perp = b0 - M @ jnp.linalg.lstsq(M, b0)[0]
    g = jnp.dot(a_perp, a_perp) / jnp.dot(a_perp, b_perp)
    alpha = jnp.linalg.lstsq(M, g * b_perp - b0)[0]
    return _full_coeffs(alpha)
