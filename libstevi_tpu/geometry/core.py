"""Core geometry types.

Reference parity: `geometry/core.h` — `skew`/`unskew` (:28,38),
`IterativeTermination` (:56), `AffineTransform<T>` (:65; R,t with
composition and batched apply).

TPU design: transforms are frozen pytree dataclasses of jnp arrays; every
operation broadcasts over arbitrary leading batch dimensions so vmap/jit
compose naturally, and points are (..., 3) row vectors.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import jax
import jax.numpy as jnp


class IterativeTermination(enum.Enum):
    ERROR = 0
    CONVERGED = 1
    MAX_STEP_REACHED = 2


def skew(r: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = r[..., 0], r[..., 1], r[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)


def unskew(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3), inverse of `skew` for antisymmetric m."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], -1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AffineTransform:
    """x -> R @ x + t.  R: (..., 3, 3), t: (..., 3)."""

    R: jnp.ndarray
    t: jnp.ndarray

    @classmethod
    def identity(cls) -> "AffineTransform":
        return cls(jnp.eye(3), jnp.zeros(3))

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        """pts: (..., 3) -> (..., 3)."""
        return jnp.einsum("...ij,...j->...i", self.R, pts) + self.t

    def __mul__(self, other: "AffineTransform") -> "AffineTransform":
        """Composition: (self * other)(x) == self(other(x))."""
        return AffineTransform(self.R @ other.R,
                               self.apply(other.t))

    def inverse(self) -> "AffineTransform":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return AffineTransform(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))
