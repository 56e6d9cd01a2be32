"""PCA and affine-subspace utilities.

Reference parity: `optimization/principalComponentsAnalysis.h:11`
(`principalComponents` via SVD) and `optimization/affine_utils.h:28,99`
(`AffineSpace`: the sum(coeffs)==1 subspace parameterization shared by the
constrained solvers).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


def principal_components(data: jnp.ndarray, n_components: int | None = None):
    """Rows are observations.  Returns (components (k, d), singular values,
    mean)."""
    mean = jnp.mean(data, axis=0)
    centered = data - mean
    u, s, vt = jnp.linalg.svd(centered, full_matrices=False)
    if n_components is not None:
        vt = vt[:n_components]
        s = s[:n_components]
    return vt, s, mean


@dataclass(frozen=True)
class AffineSpace:
    """x = e_ref + spread(alpha) with sum(x) == 1, reference = last
    coefficient (`affine_utils.h:28-99`)."""

    A: jnp.ndarray

    @property
    def M(self) -> jnp.ndarray:
        return self.A[..., :, :-1] - self.A[..., :, -1:]

    @property
    def b(self) -> jnp.ndarray:
        return self.A[..., :, -1]

    @staticmethod
    def full_coeffs(alpha: jnp.ndarray) -> jnp.ndarray:
        last = 1.0 - jnp.sum(alpha, axis=-1, keepdims=True)
        return jnp.concatenate([alpha, last], axis=-1)
